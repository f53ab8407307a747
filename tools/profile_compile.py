"""Compile-time budget: where does the first-run cost of each entry point
go — JAX tracing/lowering (host Python) vs XLA/Mosaic backend compile?

Round-1 measured 613 s uncached first compile of the full bench graph
(BENCH_r01.json); this tool splits that budget so regressions are
attributable. Uses jax's AOT API: jit(fn).lower(*args) times tracing +
StableHLO emission; .compile() times the backend.

Usage: python tools/profile_compile.py [--size 512x1024] [--cpu]
       [--entries predict,train,video]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="512x1024")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--entries", default="predict,video,train")
    ap.add_argument("--cache", action="store_true",
                    help="enable the persistent compile cache (default off "
                         "so backend numbers are genuinely cold)")
    args = ap.parse_args()

    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    import jax.numpy as jnp

    from vps_tpu import zoo
    from vps_tpu.models.detectors import (
        PanopticFuseTrack,
        empty_track_state,
        predict_video,
    )

    h, w = (int(v) for v in args.size.split("x"))
    cfg = zoo.fusetrack_model_cfg()
    cfg.pop("type")
    det = PanopticFuseTrack(
        train_cfg=zoo.fusetrack_train_cfg(), test_cfg=zoo.fusetrack_test_cfg(),
        **cfg,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    state = empty_track_state(cap=256)

    t0 = time.time()
    variables = jax.jit(
        lambda k: det.init({"params": k}, img, img, state, method=det.predict)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    init_s = time.time() - t0

    report = {"init_s": round(init_s, 1), "size": f"{h}x{w}",
              "platform": jax.devices()[0].platform}

    def measure(name, fn, *fargs):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*fargs)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        hlo_bytes = len(lowered.as_text())
        report[name] = dict(
            lower_s=round(t_lower, 1),
            backend_compile_s=round(t_compile, 1),
            stablehlo_mb=round(hlo_bytes / 1e6, 1),
        )
        print(f"{name}: lower {t_lower:.1f}s, backend {t_compile:.1f}s, "
              f"HLO {hlo_bytes / 1e6:.1f} MB", file=sys.stderr)

    entries = args.entries.split(",")
    if "predict" in entries:
        def predict_fn(variables, img, ref_img, state):
            return det.apply(variables, img, ref_img, state,
                             method=det.predict)

        measure("predict", predict_fn, variables, img, img, state)

    if "video" in entries:
        clip = jnp.asarray(rng.randn(4, 1, h, w, 3).astype(np.float32))
        resets = jnp.zeros((4,), bool)
        feats0 = jax.jit(
            lambda v, im: det.apply(v, im, method=det.extract_feat)
        )(variables, img)

        def video_fn(variables, clip, state, prev_img, prev_feats):
            return predict_video(det, variables, clip, resets, state,
                                 prev_img, prev_feats=prev_feats)

        measure("video", video_fn, variables, clip, state, img, feats0)

    if "train" in entries:
        from vps_tpu.train import build_lr_schedule, build_optimizer, \
            make_train_step
        from vps_tpu.train.step import TrainState

        max_gt = 8
        th, tw = max(h // 2, 64), max(w // 2, 128)
        r = np.random.RandomState(1)
        batch = dict(
            img=jnp.asarray(r.randn(1, th, tw, 3), jnp.float32),
            ref_img=jnp.asarray(r.randn(1, th, tw, 3), jnp.float32),
            gt_bboxes=jnp.zeros((1, max_gt, 4), jnp.float32),
            gt_labels=jnp.zeros((1, max_gt), jnp.int32),
            gt_valid=jnp.zeros((1, max_gt), bool),
            gt_masks=jnp.zeros((1, max_gt, th, tw), jnp.float32),
            gt_semantic_seg=jnp.zeros((1, th, tw), jnp.int32),
            gt_semantic_seg_Nx=jnp.zeros((1, th // 4, tw // 4), jnp.int32),
            gt_pids=jnp.zeros((1, max_gt), jnp.int32),
            ref_bboxes=jnp.zeros((1, max_gt, 4), jnp.float32),
            ref_valid=jnp.zeros((1, max_gt), bool),
        )
        tv = det.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            img=batch["img"], ref_img=batch["ref_img"],
            gt_bboxes=batch["gt_bboxes"][0], gt_labels=batch["gt_labels"][0],
            gt_valid=batch["gt_valid"][0], gt_masks=batch["gt_masks"][0],
            gt_semantic_seg=batch["gt_semantic_seg"],
            gt_semantic_seg_Nx=batch["gt_semantic_seg_Nx"],
            gt_pids=batch["gt_pids"][0], ref_bboxes=batch["ref_bboxes"][0],
            ref_valid=batch["ref_valid"][0], method=det.loss,
        )
        params = tv["params"]
        schedule = build_lr_schedule(0.005, steps_per_epoch=100,
                                     total_epochs=12)
        tx, _ = build_optimizer(params, schedule)
        ts = TrainState(params, tv.get("batch_stats", {}), tx.init(params),
                        jnp.asarray(0))
        step = make_train_step(det, tx, donate=False)
        measure("train", lambda ts, b, k: step(ts, b, k), ts, batch,
                jax.random.PRNGKey(7))

    print(json.dumps(report))


if __name__ == "__main__":
    main()
