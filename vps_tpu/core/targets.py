"""Training-target construction — static-shape versions of the reference's
anchor_target (/root/reference/mmdet/core/anchor/anchor_target.py),
bbox_target / bbox_id_target (core/bbox/bbox_target.py:63-125), and
mask_target (core/mask/mask_target.py). Single-image functions; callers vmap
over the batch.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from vps_tpu.core.assigner import approx_max_iou_assign, max_iou_assign
from vps_tpu.core.sampler import (
    combined_sample,
    instance_balanced_sample,
    iou_balanced_neg_sample,
    ohem_sample,
    pseudo_sample,
    random_sample,
)
from vps_tpu.ops.box import bbox2delta
from vps_tpu.ops.mask import crop_and_resize_indexed


def assign_from_cfg(
    cfg,
    bboxes,
    gt_bboxes,
    gt_labels=None,
    gt_pids=None,
    bbox_valid=None,
    gt_valid=None,
):
    """Registry-style ``type=`` dispatch over assigners (reference
    mmdet/core/bbox/assigners/__init__.py via build_assigner). Default =
    MaxIoUAssigner, the only assigner the VPS configs use."""
    typ = cfg.get("type", "MaxIoUAssigner")
    if typ == "MaxIoUAssigner":
        return max_iou_assign(
            bboxes,
            gt_bboxes,
            pos_iou_thr=cfg["pos_iou_thr"],
            neg_iou_thr=cfg["neg_iou_thr"],
            min_pos_iou=cfg.get("min_pos_iou", 0.0),
            gt_labels=gt_labels,
            gt_pids=gt_pids,
            bbox_valid=bbox_valid,
            gt_valid=gt_valid,
            gt_max_assign_all=cfg.get("gt_max_assign_all", True),
        )
    if typ == "ApproxMaxIoUAssigner":
        if gt_pids is not None:
            raise NotImplementedError(
                "ApproxMaxIoUAssigner carries no pid plumbing "
                "(reference approx_max_iou_assigner.py has none)"
            )
        return approx_max_iou_assign(
            bboxes,
            gt_bboxes,
            pos_iou_thr=cfg["pos_iou_thr"],
            neg_iou_thr=cfg["neg_iou_thr"],
            min_pos_iou=cfg.get("min_pos_iou", 0.0),
            approxs_per_octave=cfg.get("approxs_per_octave", 1),
            gt_labels=gt_labels,
            bbox_valid=bbox_valid,
            gt_valid=gt_valid,
        )
    raise KeyError(f"unknown assigner type {typ!r}")


def sample_from_cfg(key, cfg, assign, loss_fn=None):
    """Registry-style ``type=`` dispatch over samplers (reference
    mmdet/core/bbox/samplers/__init__.py via build_sampler). ``loss_fn``:
    per-candidate loss callback required by OHEMSampler (its hard-mining
    forward, reference ohem_sampler.py:20-38); called as
    loss_fn(assign) -> (N,) losses."""
    typ = cfg.get("type", "RandomSampler")
    num = cfg["num"]
    pf = cfg["pos_fraction"]
    gi = assign.assigned_gt_inds
    if typ == "RandomSampler":
        return random_sample(key, gi, num, pf)
    if typ == "PseudoSampler":
        return pseudo_sample(gi, num)
    if typ == "OHEMSampler":
        if loss_fn is None:
            raise ValueError(
                "OHEMSampler needs a hard-mining loss_fn (the detector "
                "passes its preliminary bbox-head forward)"
            )
        return ohem_sample(gi, loss_fn(assign), num, pf)
    if typ == "InstanceBalancedPosSampler":
        return instance_balanced_sample(key, gi, num, pf)
    if typ == "IoUBalancedNegSampler":
        return iou_balanced_neg_sample(
            key,
            gi,
            assign.max_overlaps,
            num,
            pf,
            floor_thr=cfg.get("floor_thr", -1.0),
            floor_fraction=cfg.get("floor_fraction", 0.0),
            num_bins=cfg.get("num_bins", 3),
        )
    if typ == "CombinedSampler":
        return combined_sample(key, gi, assign.max_overlaps, num, pf)
    raise KeyError(f"unknown sampler type {typ!r}")


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray  # (N,) {0,1} for RPN
    label_weights: jnp.ndarray  # (N,)
    bbox_targets: jnp.ndarray  # (N, 4)
    bbox_weights: jnp.ndarray  # (N, 4)
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray


def anchor_target(
    key,
    flat_anchors,
    valid_flags,
    gt_bboxes,
    gt_valid,
    img_shape,
    cfg,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> AnchorTargets:
    """RPN targets for ONE image over all-level flattened anchors.

    cfg: dict with assigner (pos/neg/min_pos iou thresholds), sampler
    (num, pos_fraction), allowed_border. img_shape: static (H, W) of the
    (padded) input actually used for border filtering, matching
    anchor_inside_flags.
    """
    n = flat_anchors.shape[0]
    border = cfg["allowed_border"]
    h, w = img_shape
    inside = (
        valid_flags
        & (flat_anchors[:, 0] >= -border)
        & (flat_anchors[:, 1] >= -border)
        & (flat_anchors[:, 2] < w + border)
        & (flat_anchors[:, 3] < h + border)
    )
    assign = assign_from_cfg(
        cfg["assigner"],
        flat_anchors,
        gt_bboxes,
        bbox_valid=inside,
        gt_valid=gt_valid,
    )
    s = cfg["sampler"]
    sample = sample_from_cfg(key, s, assign)

    inds = sample.inds
    slot_pos = sample.pos_mask
    slot_valid = sample.valid
    gt_idx = jnp.clip(assign.assigned_gt_inds[inds] - 1, 0, gt_bboxes.shape[0] - 1)
    deltas = bbox2delta(flat_anchors[inds], gt_bboxes[gt_idx], target_means, target_stds)

    # scatter sampled slots back to the per-anchor arrays (invalid → dropped)
    scatter_idx = jnp.where(slot_valid, inds, n)
    labels = (
        jnp.zeros((n + 1,), jnp.int32)
        .at[scatter_idx]
        .set(slot_pos.astype(jnp.int32))[:n]
    )
    label_weights = (
        jnp.zeros((n + 1,)).at[scatter_idx].set(slot_valid.astype(jnp.float32))[:n]
    )
    bbox_targets = (
        jnp.zeros((n + 1, 4))
        .at[scatter_idx]
        .set(deltas * slot_pos[:, None])[:n]
    )
    bbox_weights = (
        jnp.zeros((n + 1, 4))
        .at[scatter_idx]
        .set(jnp.broadcast_to(slot_pos[:, None], (s["num"], 4)).astype(jnp.float32))[
            :n
        ]
    )
    return AnchorTargets(
        labels, label_weights, bbox_targets, bbox_weights, sample.num_pos,
        sample.num_neg,
    )


class SampledRois(NamedTuple):
    rois: jnp.ndarray  # (num, 4)
    labels: jnp.ndarray  # (num,) 1-based fg label, 0 for neg
    label_weights: jnp.ndarray  # (num,)
    bbox_targets: jnp.ndarray  # (num, 4)
    bbox_weights: jnp.ndarray  # (num, 4)
    ids: jnp.ndarray  # (num,) tracking target column (0 = new object)
    id_weights: jnp.ndarray  # (num,)
    pos_mask: jnp.ndarray  # (num,) positives-first prefix
    valid: jnp.ndarray  # (num,)
    pos_gt_idx: jnp.ndarray  # (num,) index of matched gt (clipped)
    mask_targets: jnp.ndarray  # (num, mask_size, mask_size) float targets
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray
    # True where the sampled row came from the appended GT candidates
    # (sampler add_gt_as_proposals). Cascade refine_bboxes drops those rows
    # (reference bbox_head.py refine_bboxes "filter gt bboxes").
    from_gt: jnp.ndarray = None


def proposal_target(
    key,
    proposals,
    proposal_valid,
    gt_bboxes,
    gt_labels,
    gt_valid,
    cfg,
    gt_pids=None,
    gt_masks=None,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    loss_fn=None,
) -> SampledRois:
    """RCNN sampling + targets for ONE image (two_stage/panoptic detectors'
    assign→sample→bbox_target pipeline, incl. the pid/id targets of
    bbox_id_target and 28×28 mask targets). gt boxes are appended as
    proposal candidates (sampler add_gt_as_proposals=True). ``loss_fn``
    (OHEMSampler only): loss_fn(cand_boxes, cand_valid, assign) -> (N,)
    per-candidate hard-mining losses."""
    cand = jnp.concatenate([proposals, gt_bboxes], axis=0)
    cand_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)
    assign = assign_from_cfg(
        cfg["assigner"],
        cand,
        gt_bboxes,
        gt_labels=gt_labels,
        gt_pids=gt_pids,
        bbox_valid=cand_valid,
        gt_valid=gt_valid,
    )
    s = cfg["sampler"]
    num = s["num"]
    ohem_loss_fn = None
    if loss_fn is not None:
        ohem_loss_fn = lambda a_: loss_fn(cand, cand_valid, a_)  # noqa: E731
    sample = sample_from_cfg(key, s, assign, loss_fn=ohem_loss_fn)

    inds = sample.inds
    pos = sample.pos_mask
    valid = sample.valid
    rois = cand[inds] * valid[:, None]
    gt_idx = jnp.clip(assign.assigned_gt_inds[inds] - 1, 0, gt_bboxes.shape[0] - 1)
    labels = jnp.where(pos, gt_labels[gt_idx], 0)
    label_weights = valid.astype(jnp.float32)
    deltas = bbox2delta(rois, gt_bboxes[gt_idx], target_means, target_stds)
    bbox_targets = deltas * pos[:, None]
    bbox_weights = jnp.broadcast_to(pos[:, None], (num, 4)).astype(jnp.float32)
    if gt_pids is not None:
        ids = jnp.where(pos, gt_pids[gt_idx], 0)
        id_weights = pos.astype(jnp.float32)
    else:
        ids = jnp.zeros((num,), jnp.int32)
        id_weights = jnp.zeros((num,))

    if gt_masks is not None:
        # targets only for the positive prefix (positives-first slot order)
        mask_size = cfg.get("mask_size", 28)
        n_pos_max = int(num * s["pos_fraction"])
        mask_targets = crop_and_resize_indexed(
            gt_masks, gt_idx[:n_pos_max], rois[:n_pos_max], mask_size
        )
        mask_targets = mask_targets * pos[:n_pos_max, None, None]
    else:
        mask_targets = jnp.zeros((0, 0, 0))

    return SampledRois(
        rois,
        labels.astype(jnp.int32),
        label_weights,
        bbox_targets,
        bbox_weights,
        ids.astype(jnp.int32),
        id_weights,
        pos,
        valid,
        gt_idx,
        mask_targets,
        sample.num_pos,
        sample.num_neg,
        from_gt=(inds >= proposals.shape[0]) & valid,
    )
