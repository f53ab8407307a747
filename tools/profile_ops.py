"""Micro-op timing with in-graph repetition: each candidate op is repeated
REPS times inside one jitted fori_loop (a tiny carry-perturbation forces
sequential dependency), so one dispatch + one scalar fetch times REPS
executions — immune to the tunneled TPU's per-call RTT.

Usage: python tools/profile_ops.py [--reps 20]
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
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()

    from vps_tpu.utils.platform import configure_compile_cache
    configure_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    REPS = args.reps

    def bench(name, fn, *xs):
        """fn: pytree args -> pytree. Times REPS sequential executions."""

        def chk(out):
            leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
            return sum(
                jnp.sum(l.astype(jnp.float32) * 0 + jnp.float32(1)) * 0
                + jnp.sum(l.astype(jnp.float32))
                for l in leaves
            )

        @jax.jit
        def run(*xs):
            def body(i, carry):
                # carry*1e-30 perturbation: forces iteration i to depend on
                # i-1 so XLA cannot hoist or overlap the loop body
                xs2 = jax.tree.map(
                    lambda a: a + (carry * 1e-30).astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    xs,
                )
                return chk(fn(*xs2))

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        c = run(*xs)
        float(c)  # compile+warm
        t0 = time.time()
        c = run(*xs)
        float(c)
        dt = (time.time() - t0) / REPS * 1000
        print(f"{name:42s} {dt:8.2f} ms")
        return dt

    rng = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))

    from vps_tpu.ops.correlation import _correlation_pallas_2d, _correlation_xla
    from vps_tpu.ops.warp import flow_warp, resample2d
    from vps_tpu.ops import multilevel_roi_align, deform_conv
    from vps_tpu.ops.nms import nms

    H, W, C = 256, 512, 256

    # --- fuse-neck suspects at refine-level shape ---
    a = f32(1, H, W, C)
    b = f32(1, H, W, C)
    flow = f32(1, H, W, 2) * 4
    bench("corr pallas r=4 (81ch) 256x512x256",
          lambda x, y: _correlation_pallas_2d(x[0], y[0], 4, 1), a, b)
    bench("corr xla    r=4 (81ch) 256x512x256",
          lambda x, y: _correlation_xla(x, y, 4, 1), a, b)
    bench("corr pallas bf16 r=4",
          lambda x, y: _correlation_pallas_2d(
              x[0].astype(jnp.bfloat16), y[0].astype(jnp.bfloat16), 4, 1), a, b)
    bench("flow_warp 256x512x256 f32", flow_warp, a, flow)
    bench("flow_warp 256x512x256 bf16",
          lambda x, fl: flow_warp(x.astype(jnp.bfloat16), fl), a, flow)

    # FlowNetC cost volume at half-res input (FlowNetC runs at 1/4 of its
    # input: 512x1024 input -> 128x256 feature, 256ch, md=20 stride 2)
    fc1 = f32(1, 128, 256, 256)
    fc2 = f32(1, 128, 256, 256)
    bench("FlowNetC corr xla md=20 s=2 (441ch)",
          lambda x, y: _correlation_xla(x, y, 20, 2), fc1, fc2)

    # resample2d on images (FlowNet2 internal warps, 512x1024x3)
    im = f32(1, 512, 1024, 3)
    imflow = f32(1, 512, 1024, 2) * 8
    bench("resample2d 512x1024x3", resample2d, im, imflow)

    # --- RoIAlign at detector shapes ---
    feats = [f32(1, 256, 512, 256), f32(1, 128, 256, 256),
             f32(1, 64, 128, 256), f32(1, 32, 64, 256)]
    featsb = [f.astype(jnp.bfloat16) for f in feats]
    rois = jnp.abs(f32(1000, 4)) * 200
    rois = jnp.concatenate([rois[:, :2], rois[:, :2] + 64 + rois[:, 2:]], -1)
    valid = jnp.ones((1000,), bool)
    bench("roi_align 1000x7x7 bf16 (4 lvls)",
          lambda fs, r: multilevel_roi_align(
              [f[0] for f in fs], r, [4, 8, 16, 32], 7, 2, valid=valid),
          featsb, rois)
    rois100 = rois[:100]
    v100 = valid[:100]
    bench("roi_align 100x14x14 bf16",
          lambda fs, r: multilevel_roi_align(
              [f[0] for f in fs], r, [4, 8, 16, 32], 14, 2, valid=v100),
          featsb, rois100)

    # --- NMS at proposal shapes ---
    boxes = jnp.abs(f32(2000, 4)) * 300
    boxes = jnp.concatenate([boxes[:, :2], boxes[:, :2] + 8 + boxes[:, 2:]], -1)
    scores = jnp.abs(f32(2000))
    bench("nms 2000 boxes", lambda b_, s_: nms(b_, s_, 0.7), boxes, scores)
    bench("nms 1000 boxes",
          lambda b_, s_: nms(b_[:1000], s_[:1000], 0.7), boxes, scores)

    # --- deform conv at UPSNet head shapes (stride-4 level: 256x512x256in) ---
    dx = f32(1, 256, 512, 256)
    dw = f32(3, 3, 256, 128)
    off = f32(1, 256, 512, 18)
    bench("deform_conv 256x512 256->128ch",
          lambda x, w_, o: deform_conv(x, w_, o), dx, dw, off)
    dxb = dx.astype(jnp.bfloat16)
    bench("deform_conv bf16 in",
          lambda x, w_, o: deform_conv(x, w_, o.astype(jnp.bfloat16)),
          dxb, dw.astype(jnp.bfloat16), off)

    # --- track_assign + fusion loops at det capacity ---
    from vps_tpu.models.detectors.panoptic_ops import (
        empty_track_state, track_assign, mask_removal_and_fuse,
    )

    comp = f32(100, 257)
    db = jnp.abs(f32(100, 4)) * 500
    db = jnp.concatenate([db[:, :2], db[:, :2] + 16 + db[:, 2:]], -1)
    dl = jnp.zeros((100,), jnp.int32)
    drf = f32(100, 7, 7, 256)
    dv = jnp.ones((100,), bool)
    ts = empty_track_state(cap=256)
    bench("track_assign (100 dets, cap 256)",
          lambda c_, b_, f_: track_assign(c_, b_, dl, f_, dv, ts)[0],
          comp, db, drf)

    ms = f32(100, 28, 28)
    fcn = f32(256, 512, 19)
    probs = jnp.abs(f32(100))
    cls = jnp.ones((100,), jnp.int32)
    oid = jnp.arange(100, dtype=jnp.int32)
    bench("mask_removal_and_fuse (100 dets)",
          lambda b_, p_, m_, f_: mask_removal_and_fuse(
              b_, p_, cls, dv, oid, m_, f_, num_stuff=11).panoptic,
          db, probs, ms, fcn)

    # --- plain convs for reference rooflines ---
    cw = f32(3, 3, 256, 256)
    bench("conv3x3 256x512 256->256ch f32",
          lambda x, w_: jax.lax.conv_general_dilated(
              x, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")),
          a, cw)
    bench("conv3x3 256x512 256->256ch bf16",
          lambda x, w_: jax.lax.conv_general_dilated(
              x.astype(jnp.bfloat16), w_.astype(jnp.bfloat16), (1, 1), "SAME",
              dimension_numbers=("NHWC", "HWIO", "NHWC")), a, cw)


if __name__ == "__main__":
    main()
