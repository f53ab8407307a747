"""Fixed-size masked NMS — one XLA-native implementation replacing all three
of the reference's NMS stacks (mmdet/ops/nms CUDA+CPU, the UPSNet
cython/CUDA stack in mmdet/models/utils/upsnet/nms, and soft-NMS cython;
cf. SURVEY.md §2.3 rows 1, 2, 12).

Everything is static-shape: boxes come in as a fixed-capacity (N, 4) array
with a validity mask, and results come out as a keep-mask (exact greedy NMS
semantics — identical keep set to the sequential reference algorithm).
Suppression is resolved with an O(log N)-iteration fixpoint over the
strictly-upper-triangular IoU>thr matrix instead of a length-N sequential
scan, so the hot path is a handful of (N, N) matmul-shaped ops that XLA maps
well onto the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vps_tpu.ops.box import bbox_overlaps

NEG_INF = -1e10


def _suppression_fixpoint(adj: jnp.ndarray) -> jnp.ndarray:
    """Solve the greedy-NMS recursion.

    adj[i, j] = True iff i < j (score order) and IoU(i, j) > thr.
    A box j is suppressed iff ∃ i < j with adj[i, j] and i not suppressed.
    Iterating ``supp ← any_i(adj[i, j] & ~supp[i])`` from supp=0 converges to
    the unique greedy solution; trip count is data-dependent but ≤ the longest
    suppression chain, so we run a while_loop until fixpoint.
    """
    n = adj.shape[0]
    adj_f = adj.astype(jnp.float32)

    def cond(state):
        supp, prev, it = state
        return jnp.logical_and(jnp.any(supp != prev), it < n)

    def body(state):
        supp, _, it = state
        keep = (1.0 - supp.astype(jnp.float32))[:, None]
        new = (jnp.max(adj_f * keep, axis=0) > 0.0)
        return new, supp, it + 1

    supp0 = jnp.any(adj, axis=0)  # first iteration (supp = 0 → keep all)
    supp, _, _ = jax.lax.while_loop(
        cond, body, (supp0, jnp.zeros_like(supp0), jnp.asarray(0))
    )
    return supp


def nms(boxes, scores, iou_thr, valid=None, offset=1.0):
    """Greedy NMS. boxes (N, 4), scores (N,), valid (N,) bool or None.

    Returns ``keep`` (N,) bool in the original box order. Exact semantics of
    the reference's sequential CUDA NMS (ties broken by index order).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    # Stable argsort on negated scores: ties keep original index order,
    # matching torch.sort(descending=True) on the reference path.
    order = jnp.argsort(-masked_scores, stable=True)
    b = boxes[order]
    v = valid[order]
    ious = bbox_overlaps(b, b, offset=offset)
    idx = jnp.arange(n)
    upper = idx[:, None] < idx[None, :]
    adj = (ious > iou_thr) & upper & v[:, None] & v[None, :]
    supp_sorted = _suppression_fixpoint(adj)
    keep_sorted = v & ~supp_sorted
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def soft_nms(boxes, scores, iou_thr=0.3, sigma=0.5, min_score=1e-3, method="linear",
             valid=None, offset=1.0):
    """Soft-NMS (linear / gaussian decay), sequential greedy over N slots.

    Returns (new_scores, keep) where keep = new_scores > min_score. Static
    shape; invalid slots keep score -inf. (cf. reference
    mmdet/ops/nms/src/soft_nms_cpu.pyx)
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    s = jnp.where(valid, scores, NEG_INF)

    def body(i, state):
        s, picked = state
        # pick the highest-scoring unpicked box
        cand = jnp.where(picked, NEG_INF, s)
        j = jnp.argmax(cand)
        ok = cand[j] > min_score
        iou = bbox_overlaps(boxes[j][None], boxes, offset=offset)[0]
        if method == "linear":
            decay = jnp.where(iou > iou_thr, 1.0 - iou, 1.0)
        else:  # gaussian
            decay = jnp.exp(-(iou * iou) / sigma)
        decay = jnp.where(picked | (jnp.arange(n) == j), 1.0, decay)
        s = jnp.where(ok, s * decay, s)
        picked = picked.at[j].set(picked[j] | ok)
        return s, picked

    s, picked = jax.lax.fori_loop(0, n, body, (s, jnp.zeros((n,), bool)))
    keep = picked & (s > min_score)
    return s, keep


def batched_nms(boxes, scores, idxs, iou_thr, valid=None, offset=1.0):
    """Class-aware NMS via the coordinate-offset trick: boxes of different
    ``idxs`` never overlap, so one single-class NMS suffices."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype)[:, None] * (max_coord + 1.0)
    return nms(boxes + offsets, scores, iou_thr, valid=valid, offset=offset)


def multiclass_nms(
    multi_bboxes,
    multi_scores,
    score_thr,
    iou_thr,
    max_num,
    score_factors=None,
    offset=1.0,
    nms_cfg=None,
):
    """Per-class NMS over softmax scores, fixed-capacity output.

    Args:
      multi_bboxes: (N, 4) or (N, C*4) class-specific boxes.
      multi_scores: (N, C) with class 0 = background (skipped), as in the
        reference (mmdet/core/post_processing/bbox_nms.py:36).
      max_num: output capacity (test_cfg.rcnn.max_per_img).
      nms_cfg: reference-style dispatch dict (ops/nms/nms_wrapper.py:52):
        ``dict(type='nms'|'soft_nms', iou_thr=..., [min_score, sigma,
        method])``. When given it overrides ``iou_thr``; soft_nms rescores
        per class and selection uses the DECAYED scores, matching the
        reference's soft-NMS path.

    Returns (dets (max_num, 5), labels (max_num,), valid (max_num,)):
    dets rows are (x1, y1, x2, y2, score) sorted by score desc; labels are
    0-based thing classes.
    """
    nms_cfg = dict(nms_cfg or {})
    nms_type = nms_cfg.get("type", "nms")
    iou_thr = nms_cfg.get("iou_thr", iou_thr)

    n, num_classes = multi_scores.shape
    nc = num_classes - 1  # foreground classes

    if multi_bboxes.shape[-1] == 4:
        boxes_c = jnp.broadcast_to(multi_bboxes[:, None, :], (n, nc, 4))
    else:
        boxes_c = multi_bboxes.reshape(n, num_classes, 4)[:, 1:, :]
    scores_c = multi_scores[:, 1:]
    if score_factors is not None:
        scores_c = scores_c * score_factors[:, None]
    valid_c = scores_c > score_thr

    if nms_type == "soft_nms":
        def per_class(b, s, v):
            return soft_nms(
                b, s, iou_thr=iou_thr,
                sigma=nms_cfg.get("sigma", 0.5),
                min_score=nms_cfg.get("min_score", 1e-3),
                method=nms_cfg.get("method", "linear"),
                valid=v, offset=offset,
            )

        scores_dec, keep_c = jax.vmap(
            per_class, in_axes=(1, 1, 1), out_axes=1
        )(boxes_c, scores_c, valid_c)
        scores_c = scores_dec
    elif nms_type == "nms":
        def per_class(b, s, v):
            return nms(b, s, iou_thr, valid=v, offset=offset)

        keep_c = jax.vmap(per_class, in_axes=(1, 1, 1), out_axes=1)(
            boxes_c, scores_c, valid_c
        )  # (N, C-1)
    else:
        raise ValueError(f"unknown nms type {nms_type!r}")

    flat_boxes = boxes_c.reshape(-1, 4)
    flat_scores = scores_c.reshape(-1)
    flat_keep = keep_c.reshape(-1)
    flat_labels = jnp.tile(jnp.arange(nc), (n,))

    masked = jnp.where(flat_keep, flat_scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked, max_num)
    dets = jnp.concatenate(
        [flat_boxes[top_idx], jnp.maximum(top_scores, 0.0)[:, None]], axis=-1
    )
    labels = flat_labels[top_idx]
    valid = top_scores > NEG_INF / 2
    dets = jnp.where(valid[:, None], dets, 0.0)
    labels = jnp.where(valid, labels, 0)
    return dets, labels, valid
