"""Epoch-based training runner — replaces mmcv Runner + its hook stack (LR
schedule is folded into the optimizer; checkpointing, text logging and
timing are explicit)."""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vps_tpu.train.optim import build_lr_schedule, build_optimizer
from vps_tpu.train.step import TrainState, make_train_step, make_mesh, shard_batch, replicate
from vps_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from vps_tpu.utils.logging import get_root_logger


class Runner:
    def __init__(
        self,
        detector,
        loader,
        cfg,
        work_dir: str,
        total_epochs: int = 12,
        log_interval: int = 10,
        ckpt_interval: int = 4,
        seed: int = 0,
        eval_fn=None,
        eval_interval: int = 1,
        remat: bool = False,
    ):
        self.detector = detector
        self.loader = loader
        self.cfg = cfg
        self.work_dir = work_dir
        self.total_epochs = total_epochs
        self.log_interval = log_interval
        self.ckpt_interval = ckpt_interval
        self.seed = seed
        # post-epoch validation hook (the reference's DistEvalHook family,
        # core/evaluation/eval_hooks.py:18-74): eval_fn(state, epoch) -> dict
        # of metrics, invoked every eval_interval epochs on EVERY host
        # (rank-sharded; see train/eval_hook.py — host 0 merges and returns
        # the metrics, other hosts return {}).
        self.eval_fn = eval_fn
        self.eval_interval = eval_interval
        # jax.checkpoint the per-sample loss (see make_loss_fn): required to
        # fit the f32-compute train default at the reference 800x1600 crop
        # on one v5e (un-remat'd f32 exceeds HBM by ~0.4 GB)
        self.remat = remat
        self.logger = get_root_logger()
        self.mesh = make_mesh()
        from vps_tpu.utils.metrics import Speedometer

        self.speedometer = Speedometer(frequent=50, logger=self.logger)

    def init_state(self, sample: Dict[str, np.ndarray]) -> TrainState:
        det = self.detector
        s0 = {k: jnp.asarray(v[0]) for k, v in sample.items()}
        variables = det.init(
            {"params": jax.random.PRNGKey(self.seed),
             "sampler": jax.random.PRNGKey(self.seed + 1)},
            img=s0["img"][None], ref_img=s0["ref_img"][None],
            gt_bboxes=s0["gt_bboxes"], gt_labels=s0["gt_labels"],
            gt_valid=s0["gt_valid"], gt_masks=s0["gt_masks"],
            gt_semantic_seg=s0["gt_semantic_seg"][None],
            gt_semantic_seg_Nx=s0["gt_semantic_seg_Nx"][None],
            gt_pids=s0["gt_pids"], ref_bboxes=s0["ref_bboxes"],
            ref_valid=s0["ref_valid"], method=det.loss,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt = self.cfg.get("optimizer", {})
        steps_per_epoch = self.loader.steps_per_epoch()
        lr_cfg = self.cfg.get("lr_config", {})
        schedule = build_lr_schedule(
            opt.get("lr", 0.005), steps_per_epoch, self.total_epochs,
            decay_epochs=lr_cfg.get("step", (8, 11)),
            warmup_iters=lr_cfg.get("warmup_iters", 500),
            warmup_ratio=lr_cfg.get("warmup_ratio", 1.0 / 3),
        )
        opt_cfg = self.cfg.get("optimizer_config", {})
        grad_clip = opt_cfg.get("grad_clip", {}).get("max_norm", 35.0)
        self.tx, _ = build_optimizer(
            params, schedule, momentum=opt.get("momentum", 0.9),
            weight_decay=opt.get("weight_decay", 1e-4), grad_clip=grad_clip,
            frozen_stages=self.detector.backbone.get("frozen_stages", 1),
            skip_nonfinite=opt_cfg.get("skip_nonfinite", 8),
        )
        return TrainState(params, batch_stats, self.tx.init(params), jnp.asarray(0))

    def run(self, load_from: Optional[str] = None, resume_from: Optional[str] = None):
        first_batch = None
        for batch in self.loader.epoch(0):
            first_batch = batch
            break
        if first_batch is None:
            raise ValueError(
                f"empty first epoch: dataset ({len(self.loader.dataset)} "
                f"samples) is smaller than the global batch "
                f"({self.loader.batch_size} = batch/host x hosts); "
                f"reduce data.imgs_per_gpu or the device count"
            )
        state = self.init_state(first_batch)

        start_epoch = 0
        if resume_from:
            restored = load_checkpoint(resume_from, {
                "params": state.params, "opt_state": state.opt_state,
                "batch_stats": state.batch_stats,
            })
            state = TrainState(
                restored["params"], restored["batch_stats"],
                restored["opt_state"], state.step,
            )
            import json, os.path as osp

            meta_path = resume_from + ".meta.json"
            if osp.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                start_epoch = int(meta.get("epoch", 0))
                state = state._replace(step=jnp.asarray(int(meta.get("step", 0))))
        elif load_from:
            restored = load_checkpoint(load_from, {"params": state.params,
                                                   "batch_stats": state.batch_stats})
            state = state._replace(
                params=restored["params"], batch_stats=restored["batch_stats"]
            )

        state = replicate(state, self.mesh)
        step_fn = make_train_step(self.detector, self.tx, remat=self.remat)
        rng = jax.random.PRNGKey(self.seed + 12345)

        for epoch in range(start_epoch, self.total_epochs):
            t_iter = time.time()
            for i, batch in enumerate(self.loader.epoch(epoch)):
                sharded = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()}, self.mesh
                )
                rng, sub = jax.random.split(rng)
                state, log_vars = step_fn(state, sharded, sub)
                self.speedometer(batch_size=next(iter(batch.values())).shape[0])
                if (i + 1) % self.log_interval == 0:
                    log_vars = {k: float(v) for k, v in log_vars.items()}
                    dt = (time.time() - t_iter) / self.log_interval
                    t_iter = time.time()
                    msg = ", ".join(f"{k}: {v:.4f}" for k, v in sorted(log_vars.items()))
                    self.logger.info(
                        f"Epoch [{epoch + 1}][{i + 1}] time: {dt:.3f}s, {msg}"
                    )
            if (epoch + 1) % self.ckpt_interval == 0 or epoch + 1 == self.total_epochs:
                if jax.process_index() == 0:
                    save_checkpoint(
                        self.work_dir, int(state.step), state.params,
                        state.opt_state, state.batch_stats,
                        meta=dict(epoch=epoch + 1, step=int(state.step)),
                    )
            if (
                self.eval_fn is not None
                and (epoch + 1) % self.eval_interval == 0
            ):
                # every host participates (rank-sharded validation, like the
                # reference's DistEvalHook); non-0 hosts return {} after
                # dropping their shard into the file-exchange barrier
                metrics = self.eval_fn(state, epoch + 1)
                if metrics and jax.process_index() == 0:
                    msg = ", ".join(
                        f"{k}: {v:.4f}" for k, v in sorted(metrics.items())
                    )
                    self.logger.info(f"Eval [{epoch + 1}] {msg}")
        return state
