"""Guided-anchoring heads: GuidedAnchorHead, GARPNHead, GARetinaHead.

TPU-native re-design of the reference guided-anchoring stack
(/root/reference/mmdet/models/anchor_heads/guided_anchor_head.py:60,
ga_rpn_head.py:13, ga_retina_head.py:14 and
/root/reference/mmdet/core/anchor/guided_anchor_target.py). Key differences
from the CUDA/torch formulation, per the repo's static-shape rules:

- No dynamic boolean filtering: the loc filter is carried as a mask that
  (a) multiplies the masked-conv outputs (ops/masked_conv.py — the
  MaskedConv2d consumer) and (b) gates candidate scores during decode, so
  every shape stays fixed under jit.
- ga_loc_targets is a vectorized region-membership reduction over the padded
  gt set instead of the reference's per-gt python slice-write loop; with
  overlapping gts, center regions take precedence over ignore regions
  deterministically (the reference resolves overlap by annotation order).
- ga_shape_targets reuses approx_max_iou_assign + the static samplers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS
from vps_tpu.models.layers import Conv, ConvModule
from vps_tpu.core.assigner import approx_max_iou_assign, max_iou_assign
from vps_tpu.core.sampler import pseudo_sample, random_sample
from vps_tpu.core.targets import anchor_target
from vps_tpu.ops import bbox2delta, delta2bbox
from vps_tpu.ops.anchors import AnchorGenerator
from vps_tpu.ops.deform_conv import deform_conv2d_grouped
from vps_tpu.ops.masked_conv import masked_conv2d
from vps_tpu.ops.losses import (
    binary_cross_entropy_with_logits,
    bounded_iou_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from vps_tpu.ops.nms import NEG_INF, multiclass_nms, nms


class FeatureAdaption(nn.Module):
    """Feature adaption via anchor-shape-conditioned deformable conv
    (guided_anchor_head.py:18): a 1x1 conv on the (stop-gradient) shape
    prediction produces per-group DCN offsets; grouped deform conv adapts
    the feature map. Deformable groups = channel groups each sampling with
    their own offsets under one shared spatial formulation."""

    features: int
    kernel_size: int = 3
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x, shape_pred):
        k = self.kernel_size
        g = self.deformable_groups
        offs = Conv(
            g * k * k * 2, 1, 1, 0, use_bias=False,
            kernel_init=nn.initializers.normal(0.1), name="conv_offset",
        )(jax.lax.stop_gradient(shape_pred))
        weight = self.param(
            "weight",
            nn.initializers.normal(0.01),
            (k, k, x.shape[-1], self.features),
        )
        out = deform_conv2d_grouped(
            x, offs, weight, g, padding=(k - 1) // 2
        )
        return jax.nn.relu(out)


class _GABase(nn.Module):
    """Shared guided-anchoring tail: 1x1 loc + 1x1 shape heads, feature
    adaption, masked cls/reg convs (inference skips computation at
    loc-filtered positions via ops.masked_conv2d). Modules/params are
    created ONCE (shared across levels, like the reference) and applied
    per level."""

    def _make_tail(self, feat_channels: int, cls_channels: int,
                   deformable_groups: int, cls_kernel: int = 1,
                   prefix: str = "conv"):
        bias_cls = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        conv_loc = nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.normal(0.01),
            bias_init=bias_cls, name="conv_loc",
        )
        conv_shape = Conv(
            2, 1, 1, 0, kernel_init=nn.initializers.normal(0.01),
            name="conv_shape",
        )
        fa = FeatureAdaption(
            feat_channels, deformable_groups=deformable_groups,
            name="feature_adaption",
        )
        heads = self._make_masked_heads(
            feat_channels, cls_channels, cls_kernel, prefix
        )
        return conv_loc, conv_shape, fa, heads

    def _make_masked_heads(self, feat_channels: int, cls_channels: int,
                           kernel: int, prefix: str):
        kw = (kernel, kernel)
        w_cls = self.param(
            f"{prefix}_cls_weight", nn.initializers.normal(0.01),
            (*kw, feat_channels, cls_channels),
        )
        b_cls = self.param(
            f"{prefix}_cls_bias",
            nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
            if prefix == "retina" else nn.initializers.zeros,
            (cls_channels,),
        )
        w_reg = self.param(
            f"{prefix}_reg_weight", nn.initializers.normal(0.01),
            (*kw, feat_channels, 4),
        )
        b_reg = self.param(
            f"{prefix}_reg_bias", nn.initializers.zeros, (4,),
        )
        return w_cls, b_cls, w_reg, b_reg, (kernel - 1) // 2

    @staticmethod
    def _apply_masked_heads(heads, cls_feat, reg_feat, masked, loc_pred,
                            loc_filter_thr):
        w_cls, b_cls, w_reg, b_reg, pad = heads
        if masked:
            mask = jax.nn.sigmoid(loc_pred[..., 0]) >= loc_filter_thr
        else:
            mask = jnp.ones(cls_feat.shape[:3], bool)
        cls_score = masked_conv2d(cls_feat, mask, w_cls, b_cls, padding=pad)
        bbox_pred = masked_conv2d(reg_feat, mask, w_reg, b_reg, padding=pad)
        return cls_score, bbox_pred

    def _apply_tail(self, tail, x, masked: bool, loc_filter_thr: float):
        conv_loc, conv_shape, fa, heads = tail
        loc_pred = conv_loc(x)
        shape_pred = conv_shape(x)
        xa = fa(x, shape_pred)
        cls_score, bbox_pred = self._apply_masked_heads(
            heads, xa, xa, masked, loc_pred, loc_filter_thr
        )
        return cls_score, bbox_pred, shape_pred, loc_pred


@HEADS.register
class GuidedAnchorHead(_GABase):
    """Base guided-anchoring head (guided_anchor_head.py:60): one square
    anchor per location, shape/loc branches + feature adaption + masked
    cls/reg. `num_classes` includes the background slot (mmdet 1.x)."""

    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    octave_base_scale: int = 8
    scales_per_octave: int = 3
    octave_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchoring_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    anchoring_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    deformable_groups: int = 4
    loc_filter_thr: float = 0.01
    use_sigmoid_cls: bool = True

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1 if self.use_sigmoid_cls \
            else self.num_classes

    @nn.compact
    def __call__(self, feats, masked: bool = False):
        tail = self._make_tail(
            self.feat_channels, self.cls_out_channels,
            self.deformable_groups,
        )
        outs = [
            self._apply_tail(tail, f, masked, self.loc_filter_thr)
            for f in feats
        ]
        return tuple(zip(*outs))  # cls_scores, bbox_preds, shape_preds, locs


@HEADS.register
class GARPNHead(_GABase):
    """GA-RPN head (ga_rpn_head.py:13): 3x3 conv stem then the guided
    anchoring tail with 2-class sigmoid objectness."""

    in_channels: int = 256
    feat_channels: int = 256
    octave_base_scale: int = 8
    scales_per_octave: int = 3
    octave_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchoring_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    anchoring_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    deformable_groups: int = 4
    loc_filter_thr: float = 0.01
    num_classes: int = 2
    use_sigmoid_cls: bool = True

    @property
    def cls_out_channels(self) -> int:
        return 1

    @nn.compact
    def __call__(self, feats, masked: bool = False):
        stem = Conv(
            self.feat_channels, 3, 1, 1,
            kernel_init=nn.initializers.normal(0.01), name="rpn_conv",
        )
        tail = self._make_tail(
            self.feat_channels, 1, self.deformable_groups,
        )
        outs = [
            self._apply_tail(
                tail, jax.nn.relu(stem(f)), masked, self.loc_filter_thr
            )
            for f in feats
        ]
        return tuple(zip(*outs))


@HEADS.register
class GARetinaHead(_GABase):
    """GA-RetinaNet head (ga_retina_head.py:14): 4-conv cls/reg towers,
    separate feature adaption per branch, masked 3x3 retina outputs."""

    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    octave_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    anchoring_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    anchoring_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    deformable_groups: int = 4
    loc_filter_thr: float = 0.01
    use_sigmoid_cls: bool = True

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1 if self.use_sigmoid_cls \
            else self.num_classes

    @nn.compact
    def __call__(self, feats, masked: bool = False):
        ninit = nn.initializers.normal(0.01)
        bias_cls = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        cls_convs = [
            Conv(self.feat_channels, 3, 1, 1, kernel_init=ninit,
                 name=f"cls_conv{i}")
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            Conv(self.feat_channels, 3, 1, 1, kernel_init=ninit,
                 name=f"reg_conv{i}")
            for i in range(self.stacked_convs)
        ]
        conv_loc = nn.Conv(1, (1, 1), kernel_init=ninit, bias_init=bias_cls,
                           name="conv_loc")
        conv_shape = Conv(2, 1, 1, 0, kernel_init=ninit, name="conv_shape")
        fa_cls = FeatureAdaption(
            self.feat_channels, deformable_groups=self.deformable_groups,
            name="feature_adaption_cls",
        )
        fa_reg = FeatureAdaption(
            self.feat_channels, deformable_groups=self.deformable_groups,
            name="feature_adaption_reg",
        )
        heads = self._make_masked_heads(
            self.feat_channels, self.cls_out_channels, kernel=3,
            prefix="retina",
        )
        outs = []
        for f in feats:
            c, r = f, f
            for conv in cls_convs:
                c = jax.nn.relu(conv(c))
            for conv in reg_convs:
                r = jax.nn.relu(conv(r))
            loc_pred = conv_loc(c)
            shape_pred = conv_shape(r)
            ca = fa_cls(c, shape_pred)
            ra = fa_reg(r, shape_pred)
            cls_score, bbox_pred = self._apply_masked_heads(
                heads, ca, ra, masked, loc_pred, self.loc_filter_thr,
            )
            outs.append((cls_score, bbox_pred, shape_pred, loc_pred))
        return tuple(zip(*outs))


# ---------------------------------------------------------------------------
# anchors / guided anchors


def ga_generators(head) -> Tuple[List[AnchorGenerator], List[AnchorGenerator]]:
    """(approx, square) anchor generators per level
    (guided_anchor_head.py:141-150)."""
    octave_scales = [
        head.octave_base_scale * 2 ** (i / head.scales_per_octave)
        for i in range(head.scales_per_octave)
    ]
    approx = [
        AnchorGenerator(s, octave_scales, list(head.octave_ratios))
        for s in head.anchor_strides
    ]
    square = [
        AnchorGenerator(s, [head.octave_base_scale], [1.0])
        for s in head.anchor_strides
    ]
    return approx, square


def guided_anchors_single(
    squares,
    shape_pred,
    loc_pred,
    anchoring_means=(0.0, 0.0, 0.0, 0.0),
    anchoring_stds=(1.0, 1.0, 1.0, 1.0),
    loc_filter_thr: float = 0.01,
    use_loc_filter: bool = False,
):
    """One level's guided anchors + loc mask
    (guided_anchor_head.py:318-354 get_guided_anchors_single). Static form:
    anchors for EVERY location are decoded; the mask travels alongside
    instead of boolean-indexing."""
    loc = jax.nn.sigmoid(jax.lax.stop_gradient(loc_pred[..., 0])).reshape(-1)
    mask = loc >= (loc_filter_thr if use_loc_filter else 0.0)
    deltas = jnp.concatenate(
        [
            jnp.zeros_like(shape_pred.reshape(-1, 2)),
            jax.lax.stop_gradient(shape_pred.reshape(-1, 2)),
        ],
        axis=-1,
    )
    guided = delta2bbox(
        squares, deltas, anchoring_means, anchoring_stds,
        wh_ratio_clip=1e-6,
    )
    return guided, mask


# ---------------------------------------------------------------------------
# targets


def _region_mask(gt, ratio, h, w):
    """(G, H, W) membership of each feature cell in the ratio-shrunk gt
    region (guided_anchor_target.py:7 calc_region)."""
    x1 = jnp.clip(jnp.round((1 - ratio) * gt[:, 0] + ratio * gt[:, 2]), 0, w - 1)
    y1 = jnp.clip(jnp.round((1 - ratio) * gt[:, 1] + ratio * gt[:, 3]), 0, h - 1)
    x2 = jnp.clip(jnp.round(ratio * gt[:, 0] + (1 - ratio) * gt[:, 2]), 0, w - 1)
    y2 = jnp.clip(jnp.round(ratio * gt[:, 1] + (1 - ratio) * gt[:, 3]), 0, h - 1)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    in_y = (ys[None, :] >= y1[:, None]) & (ys[None, :] <= y2[:, None])
    in_x = (xs[None, :] >= x1[:, None]) & (xs[None, :] <= x2[:, None])
    return in_y[:, :, None] & in_x[:, None, :]


def ga_loc_targets(
    gt_bboxes,
    gt_valid,
    featmap_sizes: Sequence[Tuple[int, int]],
    anchor_scale: int,
    anchor_strides: Sequence[int],
    center_ratio: float = 0.2,
    ignore_ratio: float = 0.5,
):
    """Location branch targets for ONE image
    (guided_anchor_target.py:32-131 ga_loc_target): each gt paints a center
    (positive, weight 1) and ignore (weight 0) region on its assigned
    pyramid level, plus ignore regions on the two adjacent levels;
    elsewhere weight 0.1. Returns per-level ((H, W) target, (H, W) weight)
    and the loss avg factor.

    Vectorized over the padded gt set; overlapping gts resolve with
    center > ignore precedence (deterministic; the reference's sequential
    writes depend on annotation order)."""
    num_lvls = len(featmap_sizes)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0] + 1)
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1] + 1)
    )
    min_size = float(anchor_scale * anchor_strides[0])
    target_lvls = jnp.floor(jnp.log2(jnp.maximum(scale, 1e-6) / min_size) + 0.5)
    target_lvls = jnp.clip(target_lvls, 0, num_lvls - 1).astype(jnp.int32)

    out = []
    for lvl in range(num_lvls):
        h, w = featmap_sizes[lvl]
        stride = anchor_strides[lvl]
        gl = gt_bboxes / stride
        own = gt_valid & (target_lvls == lvl)
        adj = gt_valid & (
            (target_lvls == lvl - 1) | (target_lvls == lvl + 1)
        )
        ctr = jnp.any(_region_mask(gl, r1, h, w) & own[:, None, None], axis=0)
        ign = jnp.any(_region_mask(gl, r2, h, w) & own[:, None, None], axis=0)
        ign_adj = jnp.any(
            _region_mask(gl, r2, h, w) & adj[:, None, None], axis=0
        )
        target = ctr.astype(jnp.float32)
        weight = jnp.where(
            ctr, 1.0, jnp.where(ign | ign_adj, 0.0, 0.1)
        )
        out.append((target, weight))
    avg_factor = sum(h * w for h, w in featmap_sizes) / 200.0
    return out, avg_factor


def ga_shape_targets(
    key,
    approxs,
    squares,
    gt_bboxes,
    gt_valid,
    ga_assigner: Dict[str, Any],
    approxs_per_octave: int,
    inside=None,
    sampler: Optional[Dict[str, Any]] = None,
):
    """Shape branch targets for ONE image over the flat (all-level) square
    set (guided_anchor_target.py:133-203 ga_shape_target /
    ga_shape_target_single): assign approxs (max IoU across each location's
    octave) to gts, sample, and return the matched gt box per positive
    square. Returns (bbox_gts (N, 4), weights (N,), num_pos scalar)."""
    assign = approx_max_iou_assign(
        approxs,
        gt_bboxes,
        pos_iou_thr=ga_assigner["pos_iou_thr"],
        neg_iou_thr=ga_assigner["neg_iou_thr"],
        min_pos_iou=ga_assigner.get("min_pos_iou", 0.0),
        approxs_per_octave=approxs_per_octave,
        bbox_valid=inside,
        gt_valid=gt_valid,
    )
    if sampler is None:
        sample = pseudo_sample(assign.assigned_gt_inds, squares.shape[0])
    else:
        sample = random_sample(
            key, assign.assigned_gt_inds, sampler["num"],
            sampler["pos_fraction"],
        )
    n = squares.shape[0]
    pos_slot = sample.pos_mask & sample.valid
    weights = (
        jnp.zeros((n,), jnp.float32)
        .at[sample.inds]
        .add(jnp.where(pos_slot, 1.0, 0.0), mode="drop")
    )
    weights = jnp.minimum(weights, 1.0)
    gt_idx = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_bboxes.shape[0] - 1)
    bbox_gts = jnp.where(
        (assign.assigned_gt_inds > 0)[:, None], gt_bboxes[gt_idx], 0.0
    )
    num_pos = jnp.maximum(jnp.sum(weights), 1.0)
    return bbox_gts, weights, num_pos


# ---------------------------------------------------------------------------
# losses


def _ga_guided_flat(head, square_gen, shape_preds, loc_preds, featmap_sizes):
    guided = []
    for sq_g, sp, lp, (h, w), st in zip(
        square_gen, shape_preds, loc_preds, featmap_sizes,
        head.anchor_strides,
    ):
        ga, _ = guided_anchors_single(
            sq_g.grid_anchors((h, w), st), sp[0], lp[0],
            head.anchoring_means, head.anchoring_stds,
        )
        guided.append(ga)
    return jnp.concatenate(guided, axis=0)


def ga_loc_shape_losses(
    key,
    head,
    shape_preds,
    loc_preds,
    featmap_sizes,
    gt_bboxes,
    gt_valid,
    cfg: Dict[str, Any],
):
    """The anchoring losses shared by every GA head: focal location loss +
    bounded-IoU shape loss (guided_anchor_head.py:356-390 + 476-496)."""
    approx_gen, square_gen = ga_generators(head)

    # location loss
    loc_list, loc_avg = ga_loc_targets(
        gt_bboxes, gt_valid, featmap_sizes, head.octave_base_scale,
        list(head.anchor_strides),
        center_ratio=cfg.get("center_ratio", 0.2),
        ignore_ratio=cfg.get("ignore_ratio", 0.5),
    )
    loss_loc = 0.0
    for (t, w), loc in zip(loc_list, loc_preds):
        loss_loc = loss_loc + sigmoid_focal_loss(
            loc[0].reshape(-1, 1),
            t.reshape(-1).astype(jnp.int32),
            weight=w.reshape(-1),
            avg_factor=loc_avg,
        )

    # shape loss over the flat square set
    # grid_anchors is location-major with the octave's A approxs contiguous
    # — exactly approx_max_iou_assign's expected grouping
    approxs = jnp.concatenate(
        [
            g.grid_anchors(s, st)
            for g, s, st in zip(approx_gen, featmap_sizes, head.anchor_strides)
        ],
        axis=0,
    )
    squares = jnp.concatenate(
        [
            g.grid_anchors(s, st)
            for g, s, st in zip(square_gen, featmap_sizes, head.anchor_strides)
        ],
        axis=0,
    )
    apo = head.scales_per_octave * len(head.octave_ratios)
    bbox_gts, shape_w, shape_pos = ga_shape_targets(
        key, approxs, squares, gt_bboxes, gt_valid,
        cfg["ga_assigner"], apo,
        sampler=cfg.get("ga_sampler"),
    )
    shape_flat = jnp.concatenate(
        [s[0].reshape(-1, 2) for s in shape_preds], axis=0
    )
    deltas = jnp.concatenate(
        [jnp.zeros_like(shape_flat), shape_flat], axis=-1
    )
    pred_anchors = delta2bbox(
        squares, deltas, head.anchoring_means, head.anchoring_stds,
        wh_ratio_clip=1e-6,
    )
    loss_shape = bounded_iou_loss(
        pred_anchors, bbox_gts, beta=0.2, weight=shape_w,
        avg_factor=shape_pos,
    )
    return loss_loc, loss_shape


def ga_loss(
    key,
    head,
    cls_scores,
    bbox_preds,
    shape_preds,
    loc_preds,
    gt_bboxes,
    gt_labels,
    gt_valid,
    img_shape: Tuple[int, int],
    cfg: Dict[str, Any],
    loc_weight: float = 1.0,
    shape_weight: float = 1.0,
):
    """Full guided-anchoring loss for ONE image
    (guided_anchor_head.py:394-502 GuidedAnchorHead.loss): the shared
    anchoring losses + focal cls / smooth-L1 bbox losses over guided
    anchors. Focal-loss convention = no sampling; every non-ignored anchor
    contributes (guided_anchor_head.py:441-474, cls_focal_loss →
    sampling=False)."""
    featmap_sizes = [c.shape[1:3] for c in cls_scores]
    _, square_gen = ga_generators(head)
    loss_loc, loss_shape = ga_loc_shape_losses(
        key, head, shape_preds, loc_preds, featmap_sizes, gt_bboxes,
        gt_valid, cfg,
    )
    guided_flat = _ga_guided_flat(
        head, square_gen, shape_preds, loc_preds, featmap_sizes
    )
    a = cfg["assigner"]
    assign = max_iou_assign(
        guided_flat,
        gt_bboxes,
        pos_iou_thr=a["pos_iou_thr"],
        neg_iou_thr=a["neg_iou_thr"],
        min_pos_iou=a.get("min_pos_iou", 0.0),
        gt_labels=gt_labels,
        gt_valid=gt_valid,
    )
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    labels = jnp.where(pos, assign.labels, 0)
    npos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
    fg = head.cls_out_channels
    cls_flat = jnp.concatenate(
        [c[0].reshape(-1, fg) for c in cls_scores], axis=0
    )
    reg_flat = jnp.concatenate(
        [r[0].reshape(-1, 4) for r in bbox_preds], axis=0
    )
    loss_cls = sigmoid_focal_loss(
        cls_flat, labels, weight=(pos | neg).astype(jnp.float32),
        avg_factor=npos,
    )
    gt_idx = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_bboxes.shape[0] - 1)
    tdeltas = bbox2delta(
        guided_flat, gt_bboxes[gt_idx], head.target_means, head.target_stds
    )
    loss_bbox = smooth_l1_loss(
        reg_flat, tdeltas, beta=1.0 / 9.0,
        weight=pos.astype(jnp.float32)[:, None], avg_factor=npos,
    )
    return dict(
        loss_cls=loss_cls,
        loss_bbox=loss_bbox,
        loss_shape=loss_shape * shape_weight,
        loss_loc=loss_loc * loc_weight,
    )


def ga_rpn_loss(
    key,
    head,
    cls_scores,
    bbox_preds,
    shape_preds,
    loc_preds,
    gt_bboxes,
    gt_valid,
    img_shape: Tuple[int, int],
    cfg: Dict[str, Any],
):
    """GA-RPN loss for ONE image (ga_rpn_head.py:35-58): the GA loc+shape
    losses plus binary sampled objectness/bbox losses over guided anchors
    via the standard anchor_target pipeline."""
    featmap_sizes = [c.shape[1:3] for c in cls_scores]
    _, square_gen = ga_generators(head)
    loss_loc, loss_shape = ga_loc_shape_losses(
        key, head, shape_preds, loc_preds, featmap_sizes, gt_bboxes,
        gt_valid, cfg,
    )
    guided_flat = _ga_guided_flat(
        head, square_gen, shape_preds, loc_preds, featmap_sizes
    )
    tgt = anchor_target(
        key,
        guided_flat,
        jnp.ones((guided_flat.shape[0],), bool),
        gt_bboxes,
        gt_valid,
        img_shape,
        cfg,
        target_means=head.target_means,
        target_stds=head.target_stds,
    )
    cls_flat = jnp.concatenate(
        [c[0].reshape(-1) for c in cls_scores], axis=0
    )
    reg_flat = jnp.concatenate(
        [r[0].reshape(-1, 4) for r in bbox_preds], axis=0
    )
    num = jnp.maximum(tgt.num_pos + tgt.num_neg, 1).astype(jnp.float32)
    loss_rpn_cls = binary_cross_entropy_with_logits(
        cls_flat, tgt.labels.astype(jnp.float32),
        weight=tgt.label_weights, avg_factor=num,
    )
    loss_rpn_bbox = smooth_l1_loss(
        reg_flat, tgt.bbox_targets, beta=1.0 / 9.0,
        weight=tgt.bbox_weights, avg_factor=num,
    )
    return dict(
        loss_rpn_cls=loss_rpn_cls,
        loss_rpn_bbox=loss_rpn_bbox,
        loss_anchor_shape=loss_shape,
        loss_anchor_loc=loss_loc,
    )


# ---------------------------------------------------------------------------
# decode


def ga_bboxes(
    head,
    cls_scores,
    bbox_preds,
    shape_preds,
    loc_preds,
    img_shape: Tuple[int, int],
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_thr: float = 0.5,
    max_per_img: int = 100,
    use_loc_filter: bool = True,
    nms_cfg=None,
):
    """Guided-anchor detection decode for ONE image
    (guided_anchor_head.py:548-609 get_bboxes_single): per-level loc-masked
    scores -> top-k -> delta decode on guided anchors -> multiclass NMS.
    Inputs are per-level batch-1 (1, H, W, C) maps."""
    featmap_sizes = [c.shape[1:3] for c in cls_scores]
    _, square_gen = ga_generators(head)
    lvl_boxes, lvl_scores = [], []
    fg = head.cls_out_channels
    for sq_g, cls, reg, sp, lp, (h, w), st in zip(
        square_gen, cls_scores, bbox_preds, shape_preds, loc_preds,
        featmap_sizes, head.anchor_strides,
    ):
        anchors, mask = guided_anchors_single(
            sq_g.grid_anchors((h, w), st), sp[0], lp[0],
            head.anchoring_means, head.anchoring_stds,
            head.loc_filter_thr, use_loc_filter,
        )
        if head.use_sigmoid_cls:
            scores = jax.nn.sigmoid(cls[0].reshape(-1, fg))
        else:
            scores = jax.nn.softmax(cls[0].reshape(-1, fg), axis=-1)[:, 1:]
        scores = jnp.where(mask[:, None], scores, 0.0)
        deltas = reg[0].reshape(-1, 4)
        k = min(nms_pre, scores.shape[0])
        _, idx = jax.lax.top_k(jnp.max(scores, axis=-1), k)
        boxes = delta2bbox(
            anchors[idx], deltas[idx], head.target_means, head.target_stds,
            max_shape=img_shape,
        )
        lvl_boxes.append(boxes)
        lvl_scores.append(scores[idx])
    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    padded = jnp.concatenate([jnp.zeros_like(scores[:, :1]), scores], axis=-1)
    return multiclass_nms(
        boxes, padded, score_thr=score_thr, iou_thr=nms_thr,
        max_num=max_per_img, nms_cfg=nms_cfg,
    )


def ga_rpn_proposals(
    head,
    cls_scores,
    bbox_preds,
    shape_preds,
    loc_preds,
    img_shape: Tuple[int, int],
    nms_pre: int = 2000,
    nms_thr: float = 0.7,
    max_num: int = 2000,
    min_bbox_size: float = 0.0,
    use_loc_filter: bool = True,
):
    """GA-RPN proposal decode for ONE image (ga_rpn_head.py:60-126
    get_bboxes_single): loc-masked objectness -> per-level top-k + NMS ->
    cross-level top max_num. Fixed-capacity output like rpn_proposals."""
    featmap_sizes = [c.shape[1:3] for c in cls_scores]
    _, square_gen = ga_generators(head)
    all_boxes, all_scores = [], []
    for sq_g, cls, reg, sp, lp, (h, w), st in zip(
        square_gen, cls_scores, bbox_preds, shape_preds, loc_preds,
        featmap_sizes, head.anchor_strides,
    ):
        anchors, mask = guided_anchors_single(
            sq_g.grid_anchors((h, w), st), sp[0], lp[0],
            head.anchoring_means, head.anchoring_stds,
            head.loc_filter_thr, use_loc_filter,
        )
        scores = jax.nn.sigmoid(cls[0].reshape(-1))
        scores = jnp.where(mask, scores, 0.0)
        deltas = reg[0].reshape(-1, 4)
        k = min(nms_pre, scores.shape[0])
        top_scores, idx = jax.lax.top_k(scores, k)
        boxes = delta2bbox(
            anchors[idx], deltas[idx], head.target_means, head.target_stds,
            max_shape=img_shape,
        )
        if min_bbox_size > 0:
            bw = boxes[:, 2] - boxes[:, 0] + 1
            bh = boxes[:, 3] - boxes[:, 1] + 1
            top_scores = jnp.where(
                (bw >= min_bbox_size) & (bh >= min_bbox_size),
                top_scores, 0.0,
            )
        keep = nms(boxes, top_scores, nms_thr)
        all_boxes.append(boxes)
        all_scores.append(jnp.where(keep, top_scores, NEG_INF))
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    k = min(max_num, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    proposals = boxes[idx]
    valid = top_scores > NEG_INF / 2
    if k < max_num:
        pad = max_num - k
        proposals = jnp.pad(proposals, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=NEG_INF)
        valid = jnp.pad(valid, (0, pad))
    proposals = jnp.where(valid[:, None], proposals, 0.0)
    return proposals, jnp.maximum(top_scores, 0.0), valid
