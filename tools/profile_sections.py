"""Per-stage timing of the FuseTrack inference graph on real hardware.

Times each pipeline stage as its own jitted function (flownet, backbone,
fuse neck, semantic head, RPN+proposals, bbox stage, track, mask, fusion)
with a scalar host-fetch sync, so the 1/fps budget can be attributed.

Usage: python tools/profile_sections.py [--size 1024x2048] [--iters 5]
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
    ap.add_argument("--size", default="1024x2048")
    ap.add_argument("--iters", type=int, default=5)
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

    from vps_tpu import zoo
    from vps_tpu.models.detectors import PanopticFuseTrack, empty_track_state
    from vps_tpu.models.detectors.panoptic_ops import (
        mask_removal_and_fuse,
        panoptic_dets,
        track_assign,
    )
    from vps_tpu.models.rpn_head import rpn_proposals
    from vps_tpu.models.track_head import compute_comp_scores
    from vps_tpu.ops import bbox_overlaps

    h, w = (int(v) for v in args.size.split("x"))
    cfg = zoo.fusetrack_model_cfg()
    cfg.pop("type")
    det = PanopticFuseTrack(
        train_cfg=zoo.fusetrack_train_cfg(), test_cfg=zoo.fusetrack_test_cfg(), **cfg
    )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    ref_img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    state = empty_track_state(cap=256)

    variables = jax.jit(
        lambda k: det.init({"params": k}, img, ref_img, state, method=det.predict)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print("init done", file=sys.stderr)

    def chk(x):
        leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)

    REPS = args.iters

    def timed(name, fn, *xs):
        """In-graph repetition: REPS sequential executions inside one jit
        (carry-perturbed inputs prevent hoisting), one dispatch + one scalar
        fetch — immune to the tunneled TPU's per-call RTT."""

        @jax.jit
        def run(v, *a):
            def body(i, carry):
                a2 = jax.tree.map(
                    lambda t: t + (carry * 1e-30).astype(t.dtype)
                    if jnp.issubdtype(t.dtype, jnp.floating) else t, a)
                return chk(fn(v, *a2))

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        t0 = time.time()
        float(run(variables, *xs))
        print(f"{name:28s} compile+run {time.time()-t0:7.1f}s", file=sys.stderr)
        t0 = time.time()
        float(run(variables, *xs))
        dt = (time.time() - t0) / REPS * 1000
        print(f"{name:28s} {dt:8.1f} ms")
        out = jax.jit(lambda v, *a: fn(v, *a))(variables, *xs)
        return jax.block_until_ready(out)

    mcall = lambda method: (
        lambda v, *a: det.apply(v, *a, method=method)
    )

    # 1. flow
    flow = timed("flownet2(half-res)", mcall(det.compute_flow), img, ref_img)
    # 2. backbone+fpn one frame
    x = timed("backbone+FPN (1 frame)", mcall(det.extract_feat), img)
    ref_x = det.apply(variables, ref_img, method=det.extract_feat)
    ref_x = jax.block_until_ready(ref_x)
    # 3. fuse neck
    fused = timed(
        "BFPTcea fuse neck",
        lambda v, x_, rx, fl: det.apply(
            v, x_, rx, fl, method=lambda m, a, b, c: m.extra_neck_m(a, b, c)
        ),
        x, ref_x, flow,
    )
    # 4. semantic head
    fcn = timed(
        "UPSNetFPN semantic head",
        lambda v, x_: det.apply(
            v, x_, method=lambda m, a: m.panoptic_m(list(a[: m.panoptic_m.num_levels]))
        ),
        fused,
    )
    fcn_output, fcn_score = fcn

    # 5. rpn + proposals
    def rpn_fn(m, x_):
        cls_outs, reg_outs = m.rpn_head_m(x_)
        anchors = m._anchors_for(cls_outs)
        rcfg = m.test_cfg["rpn"]
        return rpn_proposals(
            [c[0] for c in cls_outs], [r[0] for r in reg_outs], anchors, (h, w),
            nms_pre=rcfg.get("nms_pre", 1000), nms_thr=rcfg.get("nms_thr", 0.7),
            max_num=rcfg.get("max_num", 1000),
        )

    props = timed(
        "RPN + proposals(NMS)",
        lambda v, x_: det.apply(v, x_, method=rpn_fn), fused,
    )
    proposals, _, prop_valid = props

    # 6. bbox stage: roi align + head + panoptic_dets
    def bbox_fn(m, x_, p, pv):
        roi_feats = m._roi_feats(x_, p, 7, valid=pv)
        cls_score, bbox_pred = m.bbox_head_m(roi_feats)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        pano_cfg = m.test_cfg.get("panoptic", {})
        return panoptic_dets(
            p, pv, cls_prob, bbox_pred, (h, w),
            score_thresh=pano_cfg.get("score_thresh", 0.6),
            nms_thresh=pano_cfg.get("nms_thresh", 0.5),
            top_n=pano_cfg.get("max_det", 100),
            reg_weights=tuple(pano_cfg.get("bbox_reg_weights", (10.0, 10.0, 5.0, 5.0))),
        )

    dets = timed(
        "RoI7+bbox head+panoptic_dets",
        lambda v, x_, p, pv: det.apply(v, x_, p, pv, method=bbox_fn),
        fused, proposals, prop_valid,
    )
    det_boxes, det_probs, det_cls, det_valid = dets
    det_labels = jnp.maximum(det_cls - 1, 0)

    # 7. track stage
    def track_fn(m, x_, db, dv, dl, dp, ts):
        det_roi_feats = m._roi_feats(x_, db, 7, valid=dv)
        match_logits = m.track_head_m(det_roi_feats, ts.feats, ts.valid)
        match_logprob = jax.nn.log_softmax(match_logits, axis=-1)
        label_delta = (ts.labels[None, :] == dl[:, None]).astype(jnp.float32)
        ious = bbox_overlaps(db, ts.bboxes) * ts.valid[None, :]
        comp = compute_comp_scores(
            match_logprob, dp[:, None], ious, label_delta, m.match_coeff
        )
        comp = jnp.where(
            jnp.concatenate([jnp.ones((1,), bool), ts.valid])[None, :], comp, -jnp.inf
        )
        return track_assign(comp, db, dl, det_roi_feats, dv, ts)

    timed(
        "RoI7+track head+assign",
        lambda v, *a: det.apply(v, *a, method=track_fn),
        fused, det_boxes, det_valid, det_labels, det_probs, state,
    )

    # 8. mask stage
    def mask_fn(m, x_, db, dv, dc):
        mask_feats = m._roi_feats(x_, db, 14, valid=dv)
        ms = m.mask_head_m(mask_feats)
        return jnp.take_along_axis(ms, dc[:, None, None, None], axis=-1)[..., 0]

    mask_score = timed(
        "RoI14+mask head",
        lambda v, *a: det.apply(v, *a, method=mask_fn),
        fused, det_boxes, det_valid, det_cls,
    )

    # 9. fusion
    det_obj_ids = jnp.where(det_valid, jnp.cumsum(det_valid.astype(jnp.int32)) - 1, -1)
    timed(
        "mask_removal_and_fuse",
        lambda v, *a: mask_removal_and_fuse(*a, num_stuff=11),
        det_boxes, det_probs, det_cls, det_valid, det_obj_ids, mask_score,
        fcn_output[0],
    )


if __name__ == "__main__":
    main()
