"""MaxIoU assignment — masked, static-shape, vmappable.

Semantics of the reference MaxIoUAssigner
(/root/reference/mmdet/core/bbox/assigners/max_iou_assigner.py:94-175):
-1 = neutral, 0 = negative, k+1 = assigned to gt k. Includes the
low-quality match step 4 with gt_max_assign_all=True (ties: later gt wins,
matching the reference's ascending-i overwrite loop). Padded gts/boxes are
handled by validity masks (overlaps forced to 0 so they can never reach any
threshold).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from vps_tpu.ops.box import bbox_overlaps


class AssignResult(NamedTuple):
    assigned_gt_inds: jnp.ndarray  # (N,) int32: -1 neutral / 0 neg / k+1 pos
    max_overlaps: jnp.ndarray  # (N,) float
    labels: Optional[jnp.ndarray]  # (N,) gt label of assignment (0 if none)
    pids: Optional[jnp.ndarray]  # (N,) reference-frame pid (0 if none)


def max_iou_assign(
    bboxes,
    gt_bboxes,
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float = 0.0,
    gt_labels=None,
    gt_pids=None,
    bbox_valid=None,
    gt_valid=None,
    gt_max_assign_all: bool = True,
) -> AssignResult:
    n = bboxes.shape[0]
    g = gt_bboxes.shape[0]
    if bbox_valid is None:
        bbox_valid = jnp.ones((n,), bool)
    if gt_valid is None:
        gt_valid = jnp.ones((g,), bool)

    overlaps = bbox_overlaps(bboxes, gt_bboxes)  # (N, G)
    overlaps = jnp.where(bbox_valid[:, None] & gt_valid[None, :], overlaps, 0.0)

    max_overlaps = jnp.max(overlaps, axis=1)
    argmax_overlaps = jnp.argmax(overlaps, axis=1)

    assigned = jnp.full((n,), -1, jnp.int32)
    # step 2: negatives
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned
    )
    # step 3: positives above threshold
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_overlaps.astype(jnp.int32) + 1, assigned
    )
    # step 4: low-quality matches — each gt claims its best-overlap boxes
    gt_max = jnp.max(overlaps, axis=0)  # (G,)
    claim = (
        (overlaps == gt_max[None, :])
        & (gt_max[None, :] >= min_pos_iou)
        & gt_valid[None, :]
        & bbox_valid[:, None]
        & (overlaps > 0)
    )
    if gt_max_assign_all:
        any_claim = jnp.any(claim, axis=1)
        # later gt wins (reference overwrites in ascending-i order)
        last_gt = g - 1 - jnp.argmax(claim[:, ::-1], axis=1)
        assigned = jnp.where(any_claim, last_gt.astype(jnp.int32) + 1, assigned)

    assigned = jnp.where(bbox_valid, assigned, -1)

    pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, g - 1)
    labels = None
    if gt_labels is not None:
        labels = jnp.where(pos, gt_labels[gt_idx], 0)
    pids = None
    if gt_pids is not None:
        pids = jnp.where(pos, gt_pids[gt_idx], 0)
    return AssignResult(assigned, max_overlaps, labels, pids)


def approx_max_iou_assign(
    approxs,
    gt_bboxes,
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float = 0.0,
    approxs_per_octave: int = 1,
    gt_labels=None,
    bbox_valid=None,
    gt_valid=None,
) -> AssignResult:
    """ApproxMaxIoUAssigner (reference
    core/bbox/assigners/approx_max_iou_assigner.py, guided anchoring): each
    anchor location owns `approxs_per_octave` approximate boxes; the location
    is assigned by the MAX overlap across its approxs. approxs: (N·A, 4)
    grouped per-location (location-major)."""
    na, _ = approxs.shape
    n = na // approxs_per_octave
    g = gt_bboxes.shape[0]
    if gt_valid is None:
        gt_valid = jnp.ones((g,), bool)
    all_ov = bbox_overlaps(approxs, gt_bboxes).reshape(
        n, approxs_per_octave, g
    )
    overlaps = jnp.max(all_ov, axis=1)  # (N, G)
    if bbox_valid is None:
        bbox_valid = jnp.ones((n,), bool)
    overlaps = jnp.where(bbox_valid[:, None] & gt_valid[None, :], overlaps, 0.0)

    # Reuse the MaxIoU decision rules on the collapsed overlap matrix by
    # feeding degenerate boxes whose IoU we precomputed: duplicate the core
    # logic instead (cheaper than re-deriving overlaps).
    max_overlaps = jnp.max(overlaps, axis=1)
    argmax_overlaps = jnp.argmax(overlaps, axis=1)
    assigned = jnp.full((n,), -1, jnp.int32)
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned
    )
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_overlaps.astype(jnp.int32) + 1, assigned
    )
    gt_max = jnp.max(overlaps, axis=0)
    claim = (
        (overlaps == gt_max[None, :])
        & (gt_max[None, :] >= min_pos_iou)
        & gt_valid[None, :]
        & bbox_valid[:, None]
        & (overlaps > 0)
    )
    any_claim = jnp.any(claim, axis=1)
    last_gt = g - 1 - jnp.argmax(claim[:, ::-1], axis=1)
    assigned = jnp.where(any_claim, last_gt.astype(jnp.int32) + 1, assigned)
    assigned = jnp.where(bbox_valid, assigned, -1)

    pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, g - 1)
    labels = None
    if gt_labels is not None:
        labels = jnp.where(pos, gt_labels[gt_idx], 0)
    return AssignResult(assigned, max_overlaps, labels, None)


def point_assign(
    points,
    gt_bboxes,
    scale: float = 4.0,
    pos_num: int = 3,
    gt_labels=None,
    gt_valid=None,
) -> AssignResult:
    """PointAssigner (reference core/bbox/assigners/point_assigner.py,
    RepPoints): points (N, 3) = (x, y, stride); each gt selects its `pos_num`
    closest same-level points. Static form: per-gt distance rank ≤ pos_num,
    later gt wins ties (matching the reference's per-gt overwrite loop)."""
    n = points.shape[0]
    g = gt_bboxes.shape[0]
    if gt_valid is None:
        gt_valid = jnp.ones((g,), bool)

    px, py, stride = points[:, 0], points[:, 1], points[:, 2]
    plvl = jnp.log2(jnp.maximum(stride, 1.0))
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    gw = jnp.maximum(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-6)
    gh = jnp.maximum(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-6)
    # gt level: log2 of sqrt(area)/scale, clipped to the point level range
    glvl = jnp.floor(jnp.log2(jnp.sqrt(gw * gh) / scale + 1e-12))
    glvl = jnp.clip(glvl, jnp.min(plvl), jnp.max(plvl))

    same_lvl = jnp.abs(plvl[:, None] - glvl[None, :]) < 0.5  # (N, G)
    gsz = jnp.stack([gw, gh], axis=-1)
    dist = jnp.sqrt(
        ((px[:, None] - cx[None, :]) / gsz[None, :, 0]) ** 2
        + ((py[:, None] - cy[None, :]) / gsz[None, :, 1]) ** 2
    )
    dist = jnp.where(same_lvl & gt_valid[None, :], dist, jnp.inf)
    # per-gt rank of each point by distance
    rank = jnp.sum(dist[None, :, :] < dist[:, None, :], axis=1)  # (N, G)
    claim = (rank < pos_num) & jnp.isfinite(dist)
    any_claim = jnp.any(claim, axis=1)
    last_gt = g - 1 - jnp.argmax(claim[:, ::-1], axis=1)
    assigned = jnp.where(any_claim, last_gt.astype(jnp.int32) + 1, 0)

    pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, g - 1)
    labels = None
    if gt_labels is not None:
        labels = jnp.where(pos, gt_labels[gt_idx], 0)
    min_dist = jnp.min(dist, axis=1)
    return AssignResult(assigned, min_dist, labels, None)
