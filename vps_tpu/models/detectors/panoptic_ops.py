"""Panoptic fusion primitives — static-shape, on-device versions of the
reference's UPSNet-lineage host loops:

- `delta2bbox_upsnet`: the panoptic path's box decode
  (/root/reference/mmdet/models/utils/upsnet/bbox/bbox_transform.py:290-330 —
  note its ∓1 corner convention differs from mmdet's ∓0.5).
- `panoptic_dets`: MaskROI (mmdet/models/utils/mask_roi.py:24-147) —
  per-class score threshold → class-agnostic NMS → top-N, fixed capacity.
- `mask_removal_and_fuse`: MaskRemoval (mask_removal.py:23-92) + SegTerm /
  MaskTerm (unary_logits.py) + the final channel argmax
  (panoptic_fusetrack.py:566-597) as ONE streaming fori_loop — no
  (N, H, W) energy tensor is ever materialized; the running argmax carries
  (H, W) state only.
- `track_assign`: the greedy cross-frame association
  (panoptic_fusetrack.py:400-469) over a fixed-capacity track memory.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vps_tpu.ops.box import bbox_overlaps
from vps_tpu.ops.nms import nms, NEG_INF


# ---------------------------------------------------------------------------
# Box decode (UPSNet convention)
# ---------------------------------------------------------------------------


def delta2bbox_upsnet(rois, deltas, reg_weights=(10.0, 10.0, 5.0, 5.0),
                      max_shape=None):
    """rois (N, 4), deltas (N, 4K) → (N, K, 4). Corner convention x2 = cx +
    w/2 - 1 (bbox_transform.py:322-328), clipped to [0, size-1]."""
    n = rois.shape[0]
    k = deltas.shape[-1] // 4
    widths = rois[:, 2] - rois[:, 0] + 1.0
    heights = rois[:, 3] - rois[:, 1] + 1.0
    ctr_x = rois[:, 0] + 0.5 * widths
    ctr_y = rois[:, 1] + 0.5 * heights
    d = deltas.reshape(n, k, 4)
    wx, wy, ww, wh = reg_weights
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, jnp.log(1000.0 / 16.0))
    dh = jnp.minimum(d[..., 3] / wh, jnp.log(1000.0 / 16.0))
    px = dx * widths[:, None] + ctr_x[:, None]
    py = dy * heights[:, None] + ctr_y[:, None]
    pw = jnp.exp(dw) * widths[:, None]
    ph = jnp.exp(dh) * heights[:, None]
    x1 = px - 0.5 * pw
    y1 = py - 0.5 * ph
    x2 = px + 0.5 * pw - 1.0
    y2 = py + 0.5 * ph - 1.0
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        h, w = max_shape
        lim = jnp.asarray([w - 1.0, h - 1.0, w - 1.0, h - 1.0])
        out = jnp.clip(out, 0.0, lim)
    return out


# ---------------------------------------------------------------------------
# MaskROI: panoptic detection selection
# ---------------------------------------------------------------------------


def panoptic_dets(
    rois,
    roi_valid,
    cls_prob,
    bbox_pred,
    img_shape,
    score_thresh: float = 0.6,
    nms_thresh: float = 0.5,
    top_n: int = 100,
    pre_nms: int = 256,
    reg_weights=(10.0, 10.0, 5.0, 5.0),
):
    """MaskROI with class_agnostic=True: every (proposal, fg class) pair above
    score_thresh enters ONE pooled NMS; survivors are capped at top_n.

    Returns (det_boxes (top_n, 4), det_probs (top_n,), cls_idx (top_n,)
    1-based, valid (top_n,)).
    """
    boxes_all = delta2bbox_upsnet(rois, bbox_pred, reg_weights, img_shape)
    return panoptic_dets_from_decoded(
        boxes_all, cls_prob, roi_valid,
        score_thresh=score_thresh, nms_thresh=nms_thresh, top_n=top_n,
        pre_nms=pre_nms,
    )


def panoptic_dets_from_decoded(
    boxes_all,
    cls_prob,
    roi_valid,
    score_thresh: float = 0.6,
    nms_thresh: float = 0.5,
    top_n: int = 100,
    pre_nms: int = 256,
):
    """Post-decode stage of MaskROI: takes per-class decoded boxes
    (N, C, 4) + class probs (N, C) directly — the aug-test path feeds
    variant-averaged boxes/probs here (test_mixins.py:102-110
    merge_aug_bboxes → NMS)."""
    n, num_classes = cls_prob.shape
    boxes_fg = boxes_all[:, 1:, :].reshape(-1, 4)  # (N·(C-1), 4)
    probs_fg = cls_prob[:, 1:].reshape(-1)
    cls_fg = jnp.tile(jnp.arange(1, num_classes), (n,))
    cand_valid = (probs_fg > score_thresh) & jnp.repeat(roi_valid, num_classes - 1)

    # reduce to a fixed pre-NMS pool (reference NMSes all candidates; with
    # score_thresh 0.6 the pool is far below pre_nms in practice)
    pre_nms = min(pre_nms, boxes_fg.shape[0])
    masked = jnp.where(cand_valid, probs_fg, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked, pre_nms)
    top_boxes = boxes_fg[top_idx]
    top_valid = top_scores > NEG_INF / 2
    keep = nms(top_boxes, jnp.maximum(top_scores, 0.0), nms_thresh, valid=top_valid)

    kept_scores = jnp.where(keep, top_scores, NEG_INF)
    det_scores, det_idx = jax.lax.top_k(kept_scores, top_n)
    det_valid = det_scores > NEG_INF / 2
    det_boxes = top_boxes[det_idx] * det_valid[:, None]
    det_cls = jnp.where(det_valid, cls_fg[top_idx][det_idx], 0)
    det_probs = jnp.where(det_valid, det_scores, 0.0)
    return det_boxes, det_probs, det_cls.astype(jnp.int32), det_valid


# ---------------------------------------------------------------------------
# Windowed paste helpers (trunc / round conventions of the reference)
# ---------------------------------------------------------------------------


def _paste_logit_window(mask, box, out_hw):
    """MaskTerm/MaskRemoval paste: trunc-int box, resize 28×28 logits to
    (h, w) = trunc sizes (bilinear half-pixel), place in [y0t, y1t)×[x0t, x1t).
    Returns ((H, W) float values, (H, W) bool window)."""
    hh, ww = out_hw
    m = mask.shape[0]
    x0 = jnp.floor(box[0])
    y0 = jnp.floor(box[1])
    x2 = jnp.floor(box[2])
    y2 = jnp.floor(box[3])
    # resize target is clamped to >= 1 (the reference's max(w, 1) passed to
    # cv2.resize) but the PASTE interval is the raw [x0, x2 + 1) crop
    # (mask_removal.py x_0/x_1 slices): a degenerate/inverted box (x2 < x0,
    # possible from delta2bbox at wild regression outputs) has an EMPTY
    # crop, so its mask sum is 0 and MaskRemoval drops the det.
    w_ext = x2 - x0 + 1.0
    h_ext = y2 - y0 + 1.0
    w = jnp.maximum(w_ext, 1.0)
    h = jnp.maximum(h_ext, 1.0)
    ys = jnp.arange(hh, dtype=jnp.float32)
    xs = jnp.arange(ww, dtype=jnp.float32)
    # position within the resized (h, w) patch
    py = ys - y0
    px = xs - x0
    window = (
        (py >= 0)[:, None]
        & (py < h_ext)[:, None]
        & (px >= 0)[None, :]
        & (px < w_ext)[None, :]
        & (ys < hh)[:, None]
    )
    # torch bilinear align_corners=False: src = (dst + 0.5) * (m / size) - 0.5
    sy = jnp.clip((py + 0.5) * (m / h) - 0.5, 0.0, m - 1.0)
    sx = jnp.clip((px + 0.5) * (m / w) - 0.5, 0.0, m - 1.0)
    y0i = jnp.floor(sy).astype(jnp.int32)
    x0i = jnp.floor(sx).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, m - 1)
    x1i = jnp.minimum(x0i + 1, m - 1)
    wy = (sy - y0i)[:, None]
    wx = (sx - x0i)[None, :]
    v00 = mask[y0i][:, x0i]
    v01 = mask[y0i][:, x1i]
    v10 = mask[y1i][:, x0i]
    v11 = mask[y1i][:, x1i]
    vals = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return jnp.where(window, vals, 0.0), window


def _seg_window(box, out_hw):
    """SegTerm window (unary_logits.py:100-106): [trunc(y1), round(y2)+1) ×
    [trunc(x1), round(x2)+1), python-slice clipped."""
    hh, ww = out_hw
    ys = jnp.arange(hh, dtype=jnp.float32)
    xs = jnp.arange(ww, dtype=jnp.float32)
    y0 = jnp.floor(box[1])
    x0 = jnp.floor(box[0])
    y1 = jnp.round(box[3]) + 1.0
    x1 = jnp.round(box[2]) + 1.0
    return (
        (ys >= y0)[:, None] & (ys < y1)[:, None] & (xs >= x0)[None, :] & (xs < x1)[None, :]
    )


# ---------------------------------------------------------------------------
# MaskRemoval + SegTerm/MaskTerm + streaming panoptic argmax
# ---------------------------------------------------------------------------


class PanopticFusion(NamedTuple):
    panoptic: jnp.ndarray  # (H, W) int32 — 0..10 stuff, 11+k instance k
    sseg: jnp.ndarray  # (H, W) int32 semantic argmax
    keep_cls: jnp.ndarray  # (top_n,) 1-based class of kept dets, keep order
    keep_probs: jnp.ndarray  # (top_n,)
    keep_obj_ids: jnp.ndarray  # (top_n,) tracking object ids
    keep_valid: jnp.ndarray  # (top_n,)
    num_keep: jnp.ndarray  # scalar


def mask_removal_and_fuse(
    det_boxes,
    det_probs,
    det_cls,
    det_valid,
    det_obj_ids,
    mask_logits28,
    fcn_output,
    num_stuff: int = 11,
    fraction_threshold: float = 0.3,
):
    """Full-res panoptic fusion for one frame.

    det_*: (N,) fixed-capacity detections (boxes in full-res coords);
    mask_logits28: (N, 28, 28) per-det mask logits (class channel already
    selected); fcn_output: (H, W, num_seg_classes) full-res semantic logits.

    Streaming semantics identical to the reference: process dets by
    descending prob; drop a det whose binarized pasted mask is ≥30% covered
    by earlier kept masks of the SAME class plane; each kept det becomes
    panoptic channel 11+rank with logits = SegTerm window of
    fcn_output[10 + cls] + pasted mask logits (0 outside windows); final map
    = running argmax over [stuff(11), kept instances] with first-max-wins.
    """
    n = det_boxes.shape[0]
    hh, ww = fcn_output.shape[0], fcn_output.shape[1]
    num_things = fcn_output.shape[-1] - num_stuff
    # per-class occupancy is packed into int32 bits; >31 thing classes
    # would overflow the shift silently (fine for Cityscapes' 8)
    if num_things > 31:
        raise ValueError(
            f"mask_removal_and_fuse packs per-class coverage into int32 "
            f"bits; num_things={num_things} > 31 unsupported"
        )

    order = jnp.argsort(-jnp.where(det_valid, det_probs, -jnp.inf), stable=True)

    stuff_logits = fcn_output[..., :num_stuff]
    best_val = jnp.max(stuff_logits, axis=-1)
    best_idx = jnp.argmax(stuff_logits, axis=-1).astype(jnp.int32)
    sseg = jnp.argmax(fcn_output, axis=-1).astype(jnp.int32)

    class Carry(NamedTuple):
        coverage: jnp.ndarray  # (H, W) int32 — bit c set ⇔ class c+1 covered
        best_val: jnp.ndarray
        best_idx: jnp.ndarray
        rank: jnp.ndarray
        keep_cls: jnp.ndarray
        keep_probs: jnp.ndarray
        keep_obj: jnp.ndarray

    init = Carry(
        jnp.zeros((hh, ww), jnp.int32),
        best_val,
        best_idx,
        jnp.asarray(0, jnp.int32),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.int32),
    )

    def body(i, c: Carry):
        d = order[i]
        valid = det_valid[d]
        box = det_boxes[d]
        cls = det_cls[d]  # 1..8
        vals, window = _paste_logit_window(mask_logits28[d], box, (hh, ww))
        mask = (vals > 0.0) & window
        mask_sum = jnp.sum(mask)
        # per-class occupancy rides as one bit of a single (H, W) plane —
        # MaskRemoval only tests coverage, never counts (mask_removal.py:61-86)
        bit = jnp.clip(cls - 1, 0, num_things - 1)
        covered = (c.coverage >> bit) & 1
        overlap = jnp.sum((covered == 1) & mask)
        frac = overlap / jnp.maximum(mask_sum, 1)
        keep = valid & (mask_sum > 0) & (frac <= fraction_threshold)

        coverage = jnp.where(
            keep & mask, c.coverage | (1 << bit), c.coverage
        )

        # instance channel logits: SegTerm window + pasted mask logits
        seg_win = _seg_window(box, (hh, ww))
        mapped = jnp.clip(num_stuff - 1 + cls, 0, fcn_output.shape[-1] - 1)
        inst_logit = (
            jnp.where(seg_win, fcn_output[..., mapped], 0.0)
            + jnp.where(window, vals, 0.0)
        )
        better = keep & (inst_logit > c.best_val)
        best_val2 = jnp.where(better, inst_logit, c.best_val)
        best_idx2 = jnp.where(better, num_stuff + c.rank, c.best_idx)

        keep_cls = jnp.where(keep, c.keep_cls.at[c.rank].set(cls), c.keep_cls)
        keep_probs = jnp.where(
            keep, c.keep_probs.at[c.rank].set(det_probs[d]), c.keep_probs
        )
        keep_obj = jnp.where(
            keep, c.keep_obj.at[c.rank].set(det_obj_ids[d]), c.keep_obj
        )
        rank = c.rank + keep.astype(jnp.int32)
        return Carry(coverage, best_val2, best_idx2, rank, keep_cls, keep_probs,
                     keep_obj)

    # `order` puts valid dets first (invalid sort to the end with -inf), so
    # a while_loop over just the valid count does the same work as the full
    # fori_loop — with ~100 capacity slots but typically ~10-30 real dets
    # this cuts the sequential full-res paste phase proportionally.
    num_valid = jnp.sum(det_valid.astype(jnp.int32))

    def cond(state):
        i, _ = state
        return i < num_valid

    def wbody(state):
        i, c = state
        return i + 1, body(i, c)

    _, out = jax.lax.while_loop(cond, wbody, (jnp.asarray(0, jnp.int32), init))
    keep_valid = jnp.arange(n) < out.rank
    return PanopticFusion(
        out.best_idx, sseg, out.keep_cls, out.keep_probs, out.keep_obj,
        keep_valid, out.rank,
    )


# ---------------------------------------------------------------------------
# Greedy track association
# ---------------------------------------------------------------------------


class TrackState(NamedTuple):
    feats: jnp.ndarray  # (CAP, 7, 7, C) ROI features of tracked objects
    bboxes: jnp.ndarray  # (CAP, 4)
    labels: jnp.ndarray  # (CAP,)
    valid: jnp.ndarray  # (CAP,)
    count: jnp.ndarray  # scalar int32


def empty_track_state(cap: int = 256, feat_hw: int = 7, feat_c: int = 256):
    return TrackState(
        jnp.zeros((cap, feat_hw, feat_hw, feat_c)),
        jnp.zeros((cap, 4)),
        jnp.zeros((cap,), jnp.int32),
        jnp.zeros((cap,), bool),
        jnp.asarray(0, jnp.int32),
    )


def track_assign(
    comp_scores,
    det_boxes,
    det_labels,
    det_feats,
    det_valid,
    state: TrackState,
) -> Tuple[jnp.ndarray, TrackState]:
    """Greedy det↔memory association (panoptic_fusetrack.py:400-469).

    comp_scores: (N, CAP+1) comprehensive scores vs the snapshot memory
    (column 0 = new object; invalid memory columns must be -inf).
    Returns (det_obj_ids (N,), new state). Matches the reference exactly:
    per-det argmax; competition per memory slot keeps the higher score and
    demotes the loser to a new object (second pass, ascending det order).

    The sequential greedy loop carries ONLY O(N+CAP) scalars/vectors; the
    big memory payloads (feats 256·7·7·256, bboxes, labels) are written once
    afterwards with batched scatters keyed on the final det→slot map — the
    per-iteration whole-array updates they replace were ~14 ms/frame.
    """
    n = comp_scores.shape[0]
    cap = state.feats.shape[0]
    match_like = jnp.max(comp_scores, axis=1)
    match_ids = jnp.argmax(comp_scores, axis=1)

    class Carry(NamedTuple):
        valid: jnp.ndarray  # (CAP,)
        count: jnp.ndarray
        obj_ids: jnp.ndarray  # (N,) -1 until assigned
        was_new: jnp.ndarray  # (N,) inserted into a fresh slot
        best_scores: jnp.ndarray  # (CAP,)
        best_ids: jnp.ndarray  # (CAP,)

    def insert_new(c: Carry, i):
        slot = jnp.minimum(c.count, cap - 1)
        return c._replace(
            valid=c.valid.at[slot].set(True),
            count=jnp.minimum(c.count + 1, cap),
            obj_ids=c.obj_ids.at[i].set(slot),
            was_new=c.was_new.at[i].set(True),
        )

    def body(i, c: Carry):
        valid = det_valid[i]
        mid = match_ids[i]

        def if_new(c):
            return insert_new(c, i)

        def if_match(c):
            obj = jnp.clip(mid - 1, 0, cap - 1)
            score = match_like[i]
            win = score > c.best_scores[obj]
            prev_winner = c.best_ids[obj]
            obj_ids = c.obj_ids
            # demote previous winner of this slot
            obj_ids = jnp.where(
                win & (prev_winner >= 0),
                obj_ids.at[jnp.clip(prev_winner, 0, n - 1)].set(-1),
                obj_ids,
            )
            obj_ids = jnp.where(win, obj_ids.at[i].set(obj), obj_ids)
            return c._replace(
                obj_ids=obj_ids,
                best_scores=jnp.where(
                    win, c.best_scores.at[obj].set(score), c.best_scores
                ),
                best_ids=jnp.where(win, c.best_ids.at[obj].set(i), c.best_ids),
            )

        c2 = jax.lax.cond(mid == 0, if_new, if_match, c)
        # no-op for invalid dets
        return jax.tree.map(lambda a, b: jnp.where(valid, a, b), c2, c)

    init = Carry(
        state.valid,
        state.count,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), bool),
        jnp.full((cap,), -100.0),
        jnp.full((cap,), -1, jnp.int32),
    )
    c = jax.lax.fori_loop(0, n, body, init)

    # second pass: unassigned (demoted) dets become new objects
    def body2(i, c: Carry):
        need = det_valid[i] & (c.obj_ids[i] < 0)
        c2 = insert_new(c, i)
        return jax.tree.map(lambda a, b: jnp.where(need, a, b), c2, c)

    c = jax.lax.fori_loop(0, n, body2, c)

    # batched memory payload writes: competition above leaves at most one
    # det per slot EXCEPT at capacity saturation, where insert_new clamps
    # overflow dets onto slot cap-1. Resolve duplicates deterministically
    # (last det wins, matching the sequential writes this scatter replaced)
    # via a scatter-max of det indices; out-of-range rows drop.
    write = det_valid & (c.obj_ids >= 0)
    slots = jnp.where(write, c.obj_ids, cap)
    winner = (
        jnp.full((cap + 1,), -1, jnp.int32)
        .at[slots]
        .max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    write = write & (winner[jnp.clip(slots, 0, cap)] == jnp.arange(n))
    slots = jnp.where(write, c.obj_ids, cap)
    feats = state.feats.at[slots].set(det_feats, mode="drop")
    bboxes = state.bboxes.at[slots].set(det_boxes, mode="drop")
    new_slots = jnp.where(write & c.was_new, c.obj_ids, cap)
    labels = state.labels.at[new_slots].set(det_labels, mode="drop")

    new_state = TrackState(feats, bboxes, labels, c.valid, c.count)
    obj_ids = jnp.where(det_valid, c.obj_ids, -1)
    return obj_ids, new_state
