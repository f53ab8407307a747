"""Train-step timing on real hardware: one FuseTrack data-parallel step at
the reference's training crop (800×1600, imgs_per_gpu=1,
configs/cityscapes/fusetrack.py) with synthetic data.

Reference baseline for scale: Mask R-CNN R-50-FPN trains at 0.453 s/iter on
8×V100 (docs/MODEL_ZOO.md:92); VPSNet-FuseTrack adds FlowNet2 + fuse neck +
track head + panoptic loss on top.

Usage: python tools/profile_train.py [--size 800x1600] [--iters 3]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="800x1600")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--max-gt", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="apply zoo.f32_compute_overrides (the tools/train.py "
                         "TRAINING default) instead of the config's bf16 "
                         "knobs — A/B the f32-train cost")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the per-sample loss as "
                         "tools/train.py does by default")
    ap.add_argument("--sections", action="store_true",
                    help="also time forward-only and value_and_grad jits "
                         "(one extra compile each) for the step budget split")
    ap.add_argument("--config", default=None,
                    help="ALSO time the full Runner-style loop (real loader "
                         "+ step) on this config's train dataset: reports "
                         "loader-wait fraction of step time")
    ap.add_argument("--workers", type=int, default=None,
                    help="loader workers for --config (default: config's "
                         "workers_per_gpu x local devices)")
    ap.add_argument("--batch", type=int, default=None,
                    help="per-host batch for --config (default: local "
                         "device count)")
    args = ap.parse_args()

    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()

    from vps_tpu.utils.platform import configure_compile_cache
    configure_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vps_tpu import zoo
    from vps_tpu.models.detectors import PanopticFuseTrack
    from vps_tpu.train import build_optimizer
    from vps_tpu.train.step import TrainState, make_train_step

    h, w = (int(v) for v in args.size.split("x"))
    mg = args.max_gt

    cfg = zoo.fusetrack_model_cfg()
    if args.f32:
        cfg = zoo.f32_compute_overrides(cfg)
    cfg.pop("type")
    det = PanopticFuseTrack(
        train_cfg=zoo.fusetrack_train_cfg(), test_cfg=zoo.fusetrack_test_cfg(),
        **cfg,
    )

    r = np.random.RandomState(0)
    nv = 6
    gt_bboxes = np.zeros((mg, 4), np.float32)
    gt_valid = np.zeros((mg,), bool)
    gt_labels = np.zeros((mg,), np.int32)
    gt_masks = np.zeros((mg, h, w), np.float32)
    for i in range(nv):
        x0, y0 = r.randint(0, w - 200), r.randint(0, h - 200)
        bw, bh = r.randint(40, 200), r.randint(40, 200)
        gt_bboxes[i] = [x0, y0, min(x0 + bw, w - 1), min(y0 + bh, h - 1)]
        gt_valid[i] = True
        gt_labels[i] = r.randint(1, 9)
        gt_masks[i, y0:y0 + bh, x0:x0 + bw] = 1.0
    gt_pids = np.zeros((mg,), np.int32)
    gt_pids[:nv] = np.arange(1, nv + 1)

    batch = dict(
        img=r.randn(1, h, w, 3).astype(np.float32),
        ref_img=r.randn(1, h, w, 3).astype(np.float32),
        gt_bboxes=gt_bboxes[None],
        gt_labels=gt_labels[None],
        gt_valid=gt_valid[None],
        gt_masks=gt_masks[None],
        gt_semantic_seg=r.randint(0, 19, (1, h, w)).astype(np.int32),
        gt_semantic_seg_Nx=r.randint(0, 19, (1, h // 4, w // 4)).astype(np.int32),
        gt_pids=gt_pids[None],
        ref_bboxes=gt_bboxes[None],
        ref_valid=gt_valid[None],
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    variables = jax.jit(
        lambda k: det.init(
            {"params": k, "sampler": jax.random.PRNGKey(1)},
            **{k2: (v[0] if k2 not in ("img", "ref_img", "gt_semantic_seg",
                                       "gt_semantic_seg_Nx") else v)
               for k2, v in batch.items()},
            method=det.loss,
        )
    )(rng)
    jax.block_until_ready(variables)
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx, _ = build_optimizer(params, 0.005, momentum=0.9,
                            weight_decay=0.0001, grad_clip=35.0)
    state = TrainState(params, batch_stats, tx.init(params), jnp.asarray(0))
    step = make_train_step(det, tx, donate=False, remat=args.remat)

    t0 = time.time()
    state2, logs = step(state, batch, rng)
    # host fetch is the only trustworthy sync on the tunneled TPU
    loss0 = float(logs["loss"])
    print(f"compile+first step: {time.time()-t0:.1f}s  loss={loss0:.3f}",
          flush=True)
    for k in sorted(logs):
        print(f"  {k:16s} {float(logs[k]):.4f}", flush=True)

    ts = []
    for i in range(args.iters):
        t0 = time.time()
        state2, logs = step(state, batch, rng)
        _ = float(logs["loss"])
        ts.append(time.time() - t0)
    sec = min(ts)
    print(f"train step {args.size}: {sec*1000:.0f} ms/iter "
          f"({[f'{t*1000:.0f}' for t in ts]})", flush=True)

    if args.sections:
        from vps_tpu.train.step import make_loss_fn

        loss_fn = make_loss_fn(det)

        fwd = jax.jit(lambda p: loss_fn(p, batch_stats, batch, rng)[0])
        t0 = time.time()
        _ = float(fwd(params))
        print(f"  fwd-only compile+first: {time.time()-t0:.1f}s", flush=True)
        fts = []
        for _i in range(args.iters):
            t0 = time.time()
            _ = float(fwd(params))
            fts.append(time.time() - t0)
        print(f"  fwd-only: {min(fts)*1000:.0f} ms", flush=True)

        vg = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, batch_stats, batch, rng), has_aux=True))
        t0 = time.time()
        (tot, _lv), _g = vg(params)
        _ = float(tot)
        print(f"  fwd+bwd compile+first: {time.time()-t0:.1f}s", flush=True)
        vts = []
        for _i in range(args.iters):
            t0 = time.time()
            (tot, _lv), _g = vg(params)
            _ = float(tot)
            vts.append(time.time() - t0)
        print(f"  fwd+bwd: {min(vts)*1000:.0f} ms  "
              f"(optimizer+skip-guard = step - fwd+bwd = "
              f"{(sec - min(vts))*1000:.0f} ms)", flush=True)

    if args.config:
        # ---- loader-in-loop: the wall the input pipeline actually adds ----
        from vps_tpu.config import Config
        from vps_tpu.data import build_dataset, build_loader
        from vps_tpu.train.step import make_mesh, shard_batch

        cfg2 = Config.fromfile(args.config)
        dataset = build_dataset(cfg2.data["train"])
        bsz = args.batch or jax.local_device_count()
        workers = args.workers if args.workers is not None else (
            cfg2.data.get("workers_per_gpu", 2) * max(
                jax.local_device_count(), 1))
        loader = build_loader(dataset, bsz, num_workers=workers)
        mesh = make_mesh()
        t_wait, t_step, n = 0.0, 0.0, 0
        it = loader.epoch(0)
        try:
            while n < args.iters + 1:
                t0 = time.time()
                raw = next(it, None)
                t_wait_i = time.time() - t0
                if raw is None:
                    break
                t0 = time.time()
                sharded = shard_batch(
                    {k: jnp.asarray(v) for k, v in raw.items()}, mesh)
                _, logs = step(state, sharded, rng)
                _ = float(logs["loss"])
                dt = time.time() - t0
                if n > 0:  # skip the (re)compile iteration
                    t_wait += t_wait_i
                    t_step += dt
                n += 1
        finally:
            it.close()
            loader.close()
        if t_step > 0:
            frac = t_wait / t_step
            print(f"loader-in-loop ({workers} workers, batch {bsz}): "
                  f"wait {t_wait / max(n - 1, 1) * 1000:.0f} ms/iter, step "
                  f"{t_step / max(n - 1, 1) * 1000:.0f} ms/iter, "
                  f"wait/step = {frac:.3f}", flush=True)


if __name__ == "__main__":
    main()
