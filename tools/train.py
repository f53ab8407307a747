"""Train a detector (reference tools/train.py equivalent).

Usage: python tools/train.py CONFIG [--work_dir D] [--resume_from CKPT]
       [--seed N] [--total_epochs N]

Scaling: run one process per host (jax.distributed); devices on each host
form the data-parallel mesh automatically.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a VPS detector")
    p.add_argument("config")
    p.add_argument("--work_dir")
    p.add_argument("--load_from")
    p.add_argument("--resume_from")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--total_epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None,
                   help="global batch (default: one sample per device)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(TPU pod / SLURM rendezvous from the environment)")
    # explicit rendezvous (the reference dist_train.sh's
    # torch.distributed.launch --nproc_per_node equivalent for local
    # multi-process runs, e.g. CPU integration tests): all three must be
    # given together and imply --distributed
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (explicit rendezvous)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--bf16-compute", dest="bf16_compute", action="store_true",
                   help="keep the config's bf16 compute_dtype knobs for "
                        "TRAINING instead of the f32 default (known XLA:TPU "
                        "bf16 backward mis-fusion — see PERF.md)")
    p.add_argument("--no-remat", dest="remat", action="store_false",
                   help="disable jax.checkpoint of the per-sample loss "
                        "(remat is on by default: the f32 train compute "
                        "doubles activation memory and the 800x1600 step "
                        "otherwise exceeds one v5e's HBM — see PERF.md)")
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()

    if args.coordinator is not None:
        # reference init_dist with explicit rendezvous (the local
        # multi-process launch path of tools/dist_train.sh)
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    elif args.distributed:
        # reference init_dist (apis/env.py:13-50) equivalent: rendezvous is
        # discovered from the TPU runtime or SLURM_* env vars.
        jax.distributed.initialize()

    from vps_tpu.utils.platform import configure_compile_cache
    configure_compile_cache()

    from vps_tpu.config import Config
    from vps_tpu.data import build_dataset, build_loader
    from vps_tpu.models import build_detector
    from vps_tpu.train.runner import Runner
    from vps_tpu.utils.logging import get_root_logger, set_random_seed

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(log_file=os.path.join(work_dir, "train.log"))
    seed = args.seed if args.seed is not None else 0
    set_random_seed(seed)

    model_cfg = cfg.model
    if not args.bf16_compute:
        # training computes in f32 by default (bf16 backward mis-fusion on
        # XLA:TPU — zoo.f32_compute_overrides docstring / PERF.md); params
        # are f32 either way, so checkpoints stay preset-compatible.
        from vps_tpu import zoo

        model_cfg = zoo.f32_compute_overrides(dict(model_cfg))
    detector = build_detector(
        model_cfg, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg
    )
    dataset = build_dataset(cfg.data["train"])
    batch = args.batch_size or jax.local_device_count()
    # reference semantics (build_loader.py:17-48): workers_per_gpu × #gpus
    # loader workers; here #local devices plays the gpu count.
    workers = cfg.data.get("workers_per_gpu", 2) * max(
        jax.local_device_count(), 1)
    loader = build_loader(
        dataset, batch, seed=seed,
        num_hosts=jax.process_count(), host_id=jax.process_index(),
        num_workers=workers,
    )
    logger.info(
        f"devices={jax.device_count()} hosts={jax.process_count()} "
        f"batch/host={batch} steps/epoch={loader.steps_per_epoch()}"
    )

    # train-time validation (the reference's DistEvalHook,
    # eval_hooks.py:18-74): videos sharded across hosts, streams across
    # local devices, file-exchange gather on host 0.
    eval_fn = None
    eval_interval = 1
    ev = cfg.get("evaluation")
    if ev and cfg.data.get("val"):
        from vps_tpu.train.eval_hook import make_video_eval_hook

        val_cfg = dict(cfg.data["val"])
        val_cfg.setdefault("test_mode", True)
        val_dataset = build_dataset(val_cfg)
        eval_fn = make_video_eval_hook(
            detector, val_dataset, work_dir,
            chunk=ev.get("chunk", 4),
            track_cap=ev.get("track_cap", 256),
        )
        eval_interval = ev.get("interval", 1)

    runner = Runner(
        detector, loader, cfg, work_dir,
        total_epochs=args.total_epochs or cfg.get("total_epochs", 12),
        log_interval=cfg.get("log_config", {}).get("interval", 10),
        ckpt_interval=cfg.get("checkpoint_config", {}).get("interval", 4),
        seed=seed,
        eval_fn=eval_fn,
        eval_interval=eval_interval,
        remat=args.remat,
    )
    runner.run(
        load_from=args.load_from or cfg.get("load_from"),
        resume_from=args.resume_from or cfg.get("resume_from"),
    )


if __name__ == "__main__":
    main()
