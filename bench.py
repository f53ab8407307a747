"""Headline benchmark: FuseTrack panoptic+tracking inference throughput at
Cityscapes-VPS eval resolution (1024×2048) on one chip, measured through the
on-device lax.scan video runner (one dispatch per clip of --iters frames).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the only inference fps the reference repo publishes is Mask R-CNN
R-50-FPN at 10.6 fps on a V100 (docs/MODEL_ZOO.md:92); VPSNet-FuseTrack adds
FlowNet2 + fusion + tracking + panoptic fusion on top, so 10.6 is a
generous stand-in denominator (the real FuseTrack is several× slower).

Usage: python bench.py [--size HxW] [--iters N] [--warmup N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 10.6  # docs/MODEL_ZOO.md:92 (Mask R-CNN R-50-FPN, V100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1024x2048")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument("--preset", default="exact", choices=["exact", "fast"],
                    help="'fast' applies zoo.fast_overrides (documented "
                         "approximations, PERF.md); metric name is suffixed")
    args = ap.parse_args()

    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()

    # persistent XLA compile cache: the full-res FuseTrack graph takes
    # minutes to compile; cache hits bring reruns down to seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vps_tpu import zoo
    from vps_tpu.models.detectors import PanopticFuseTrack, empty_track_state

    h, w = (int(v) for v in args.size.split("x"))
    cfg = zoo.fusetrack_model_cfg()
    if args.preset == "fast":
        cfg = zoo.fast_overrides(cfg)
    cfg.pop("type")
    det = PanopticFuseTrack(
        train_cfg=zoo.fusetrack_train_cfg(), test_cfg=zoo.fusetrack_test_cfg(),
        **cfg,
    )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    ref_img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    state = empty_track_state(cap=256)

    t0 = time.time()
    init_fn = jax.jit(
        lambda k: det.init({"params": k}, img, ref_img, state, method=det.predict)
    )
    variables = init_fn(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    # params as ARGUMENT, not closure: closed-over device arrays are embedded
    # as MLIR constants whose lowering does a device→host fetch of every
    # weight — minutes over a tunneled TPU.
    #
    # The workload is the on-device video runner (predict_video): a lax.scan
    # over a clip of distinct frames carrying tracking state + the previous
    # frame's FPN pyramid in-graph — one dispatch per clip, as tools/
    # test_vpq.py --chunk runs it. A device-side checksum over every frame's
    # panoptic map is fetched ONCE to sync (block_until_ready on a tunneled
    # TPU returns early; per-frame fetches would add ~31 ms tunnel RTT each).
    from vps_tpu.models.detectors import predict_video

    clip = jnp.asarray(
        rng.randn(args.iters, 1, h, w, 3).astype(np.float32)
    )
    no_resets = jnp.zeros((args.iters,), bool)

    @jax.jit
    def run_clip(variables, clip, state, prev_img, prev_feats):
        outputs, (state, feats, last) = predict_video(
            det, variables, clip, no_resets, state, prev_img,
            prev_feats=prev_feats,
        )
        chk = jnp.sum(outputs["panoptic_outputs"].astype(jnp.int32))
        return chk, state, feats, last

    prev_feats = jax.jit(
        lambda v, im: det.apply(v, im, method=det.extract_feat)
    )(variables, ref_img)

    t0 = time.time()
    chk, state, prev_feats, prev_img = run_clip(
        variables, clip, state, ref_img, prev_feats
    )
    float(chk)
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    for _ in range(max(args.warmup // args.iters, 1)):
        chk, state, prev_feats, prev_img = run_clip(
            variables, clip, state, prev_img, prev_feats
        )
    float(chk)

    t0 = time.time()
    chk, state, prev_feats, prev_img = run_clip(
        variables, clip, state, prev_img, prev_feats
    )
    float(chk)  # single scalar host fetch = hard sync of the whole clip
    dt = (time.time() - t0) / args.iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": f"fusetrack_inference_fps_{h}x{w}"
                  + ("_fast" if args.preset == "fast" else ""),
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
