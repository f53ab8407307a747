"""Single-stage detection heads: RetinaHead, SSDHead, FCOSHead.

TPU-native equivalents of the reference's anchor-head zoo
(/root/reference/mmdet/models/anchor_heads/{retina_head,ssd_head,
fcos_head}.py — "available, unused by VPS configs" per SURVEY §2.2).
Static-shape decode mirrors rpn_head.rpn_proposals: per-level top-k →
delta/point decode → masked NMS → fixed-capacity detections.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS
from vps_tpu.models.layers import Conv
from vps_tpu.ops import delta2bbox
from vps_tpu.ops.nms import multiclass_nms


@HEADS.register
class RetinaHead(nn.Module):
    """RetinaNet head (anchor_heads/retina_head.py): 4 conv stacks for cls
    and reg, shared across levels; sigmoid focal-loss classification."""

    num_classes: int = 81  # includes background slot, mmdet 1.x convention
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9

    @nn.compact
    def __call__(self, feats) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        ninit = nn.initializers.normal(0.01)
        # bias init so initial foreground prob ≈ 0.01 (focal loss trick)
        import math

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
        fg = self.num_classes - 1
        cls_out = nn.Conv(self.num_anchors * fg, (3, 3), padding=1,
                          kernel_init=ninit, bias_init=bias_cls,
                          name="retina_cls")
        reg_out = Conv(self.num_anchors * 4, 3, 1, 1, kernel_init=ninit,
                       name="retina_reg")
        cls_scores, bbox_preds = [], []
        for f in feats:
            c, r = f, f
            for conv in cls_convs:
                c = jax.nn.relu(conv(c))
            for conv in reg_convs:
                r = jax.nn.relu(conv(r))
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r))
        return cls_scores, bbox_preds


@HEADS.register
class SSDHead(nn.Module):
    """SSD head (anchor_heads/ssd_head.py): one 3×3 cls + one 3×3 reg conv
    per input level (varying channels/anchors)."""

    num_classes: int = 81
    anchors_per_level: Sequence[int] = (4, 6, 6, 6, 4, 4)

    @nn.compact
    def __call__(self, feats):
        xavier = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        cls_scores, bbox_preds = [], []
        for i, f in enumerate(feats):
            a = self.anchors_per_level[i]
            cls_scores.append(
                Conv(a * self.num_classes, 3, 1, 1, kernel_init=xavier,
                     name=f"cls{i}")(f)
            )
            bbox_preds.append(
                Conv(a * 4, 3, 1, 1, kernel_init=xavier, name=f"reg{i}")(f)
            )
        return cls_scores, bbox_preds


class Scale(nn.Module):
    """Learnable scalar multiplier (FCOS per-level reg scale)."""

    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", lambda k: jnp.asarray(self.init, jnp.float32))
        return x * s


@HEADS.register
class FCOSHead(nn.Module):
    """FCOS head (anchor_heads/fcos_head.py): anchor-free per-pixel
    classification + l/t/r/b distance regression + centerness, GN towers,
    per-level learnable reg scales."""

    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats):
        import math

        ninit = nn.initializers.normal(0.01)
        bias_cls = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        fg = self.num_classes - 1
        cls_convs, reg_convs = [], []
        for i in range(self.stacked_convs):
            cls_convs.append((
                Conv(self.feat_channels, 3, 1, 1, use_bias=False,
                     kernel_init=ninit, name=f"cls_conv{i}"),
                nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"cls_gn{i}"),
            ))
            reg_convs.append((
                Conv(self.feat_channels, 3, 1, 1, use_bias=False,
                     kernel_init=ninit, name=f"reg_conv{i}"),
                nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"reg_gn{i}"),
            ))
        cls_out = nn.Conv(fg, (3, 3), padding=1, kernel_init=ninit,
                          bias_init=bias_cls, name="fcos_cls")
        reg_out = Conv(4, 3, 1, 1, kernel_init=ninit, name="fcos_reg")
        ctr_out = Conv(1, 3, 1, 1, kernel_init=ninit, name="fcos_centerness")
        scales = [Scale(name=f"scale{i}") for i in range(self.num_levels)]

        cls_scores, bbox_preds, centernesses = [], [], []
        for li, f in enumerate(feats):
            c, r = f, f
            for conv, gn in cls_convs:
                c = jax.nn.relu(gn(conv(c)))
            for conv, gn in reg_convs:
                r = jax.nn.relu(gn(conv(r)))
            cls_scores.append(cls_out(c))
            centernesses.append(ctr_out(c))
            bbox_preds.append(jnp.exp(scales[li](reg_out(r))))
        return cls_scores, bbox_preds, centernesses


def anchor_head_bboxes(
    cls_scores,
    bbox_preds,
    anchors_per_level,
    img_shape,
    num_classes: int,
    use_sigmoid: bool = True,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_thr: float = 0.5,
    max_per_img: int = 100,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
    nms_cfg=None,
):
    """Decode single-stage anchor head outputs of ONE image into
    fixed-capacity detections (AnchorHead.get_bboxes semantics).

    cls_scores/bbox_preds: per-level (H, W, A·C') / (H, W, A·4); returns
    (dets (max, 5), labels (max,), valid (max,)) from multiclass_nms."""
    fg = num_classes - 1
    lvl_boxes, lvl_scores = [], []
    for cls, reg, anchors in zip(cls_scores, bbox_preds, anchors_per_level):
        if use_sigmoid:
            scores = jax.nn.sigmoid(cls.reshape(-1, fg))
        else:
            scores = jax.nn.softmax(cls.reshape(-1, num_classes), axis=-1)[
                :, 1:
            ]
        deltas = reg.reshape(-1, 4)
        k = min(nms_pre, scores.shape[0])
        max_scores = jnp.max(scores, axis=-1)
        _, top_idx = jax.lax.top_k(max_scores, k)
        boxes = delta2bbox(
            anchors[top_idx], deltas[top_idx], target_means, target_stds,
            max_shape=img_shape,
        )
        lvl_boxes.append(boxes)
        lvl_scores.append(scores[top_idx])
    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    # pad a background column so multiclass_nms's 1-based convention holds
    padded = jnp.concatenate([jnp.zeros_like(scores[:, :1]), scores], axis=-1)
    return multiclass_nms(
        boxes, padded, score_thr=score_thr, iou_thr=nms_thr,
        max_num=max_per_img, nms_cfg=nms_cfg,
    )


def ssd_anchor_generators(
    input_size: int = 300,
    num_levels: int = 6,
    strides: Sequence[int] = (8, 16, 32, 64, 100, 300),
    anchor_ratios: Sequence[Sequence[int]] = ([2], [2, 3], [2, 3], [2, 3],
                                              [2], [2]),
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9),
):
    """The SSD anchor plan (reference anchor_heads/ssd_head.py:50-90):
    per-level min/max sizes from the base-size ratio range (with the
    SSD300/512 head-level insertions), scale_major=False generators centered
    at (stride-1)/2, and the base-anchor reorder that puts the
    sqrt(max/min)-scale square second."""
    import numpy as np

    from vps_tpu.ops.anchors import AnchorGenerator

    min_ratio = int(basesize_ratio_range[0] * 100)
    max_ratio = int(basesize_ratio_range[1] * 100)
    step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
    min_sizes, max_sizes = [], []
    for r in range(min_ratio, max_ratio + 1, step):
        min_sizes.append(int(input_size * r / 100))
        max_sizes.append(int(input_size * (r + step) / 100))
    if input_size == 300:
        if basesize_ratio_range[0] == 0.15:  # COCO
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
        elif basesize_ratio_range[0] == 0.2:  # VOC
            min_sizes.insert(0, int(input_size * 10 / 100))
            max_sizes.insert(0, int(input_size * 20 / 100))
    elif input_size == 512:
        if basesize_ratio_range[0] == 0.1:  # COCO
            min_sizes.insert(0, int(input_size * 4 / 100))
            max_sizes.insert(0, int(input_size * 10 / 100))
        elif basesize_ratio_range[0] == 0.15:  # VOC
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
    gens = []
    for k in range(num_levels):
        stride = strides[k]
        ctr = ((stride - 1) / 2.0, (stride - 1) / 2.0)
        scales = [1.0, float(np.sqrt(max_sizes[k] / min_sizes[k]))]
        ratios = [1.0]
        for r in anchor_ratios[k]:
            ratios += [1.0 / r, r]
        gen = AnchorGenerator(min_sizes[k], scales, ratios,
                              scale_major=False, ctr=ctr)
        indices = list(range(len(ratios)))
        indices.insert(1, len(indices))  # big square second
        gen.base_anchors = gen.base_anchors[indices]
        gens.append(gen)
    return gens


def ssd_loss(
    cls_scores,
    bbox_preds,
    anchors_per_level,
    gt_bboxes,
    gt_labels,
    gt_valid,
    num_classes: int,
    neg_pos_ratio: int = 3,
    smoothl1_beta: float = 1.0,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.5,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
):
    """SSD MultiBox loss for ONE image (reference ssd_head.py:112-134
    loss_single + anchor_target sampling=False): softmax CE over all
    anchors, online hard-negative mining keeping the `neg_pos_ratio`·P
    highest-loss negatives (static formulation: sort-rank mask instead of
    a dynamic topk), smooth-L1 on positives; both normalized by num_pos."""
    from vps_tpu.core.assigner import max_iou_assign
    from vps_tpu.ops import bbox2delta
    from vps_tpu.ops.losses import smooth_l1_loss

    anchors = jnp.concatenate(anchors_per_level, axis=0)
    cls_flat = jnp.concatenate(
        [c.reshape(-1, num_classes) for c in cls_scores], axis=0)
    reg_flat = jnp.concatenate([r.reshape(-1, 4) for r in bbox_preds], axis=0)
    assign = max_iou_assign(
        anchors,
        gt_bboxes,
        pos_iou_thr=pos_iou_thr,
        neg_iou_thr=neg_iou_thr,
        min_pos_iou=0.0,
        gt_labels=gt_labels,
        gt_valid=gt_valid,
        gt_max_assign_all=False,
    )
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    labels = jnp.where(pos, assign.labels, 0)
    num_pos = jnp.sum(pos.astype(jnp.float32))

    logp = jax.nn.log_softmax(cls_flat, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    # hard negative mining: a negative is kept iff its CE ranks in the top
    # neg_pos_ratio·num_pos among negatives (ssd_head.py:118-126)
    neg_ce = jnp.where(neg, ce, -jnp.inf)
    order = jnp.argsort(-neg_ce)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    keep_neg = neg & (rank < neg_pos_ratio * num_pos)
    den = jnp.maximum(num_pos, 1.0)
    loss_cls = (jnp.sum(jnp.where(pos | keep_neg, ce, 0.0))) / den

    gt_idx = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_bboxes.shape[0] - 1)
    targets = bbox2delta(anchors, gt_bboxes[gt_idx], target_means,
                         target_stds)
    loss_bbox = smooth_l1_loss(
        reg_flat, targets, beta=smoothl1_beta,
        weight=pos.astype(jnp.float32)[:, None], avg_factor=den,
    )
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}


# FCOS per-level regression ranges (fcos_head.py:30)
FCOS_INF = 1e8
FCOS_REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512),
                       (512, FCOS_INF))


def fcos_target(points, regress_ranges, gt_bboxes, gt_labels, gt_valid):
    """FCOS point targets for ONE image (fcos_head.py:339-384,
    fcos_target_single): min-area gt among those containing the point whose
    max regression distance falls in the level's range. Invalid gt rows are
    masked to INF area. Returns (labels (N,), ltrb targets (N, 4))."""
    xs = points[:, 0][:, None]
    ys = points[:, 1][:, None]
    left = xs - gt_bboxes[None, :, 0]
    right = gt_bboxes[None, :, 2] - xs
    top = ys - gt_bboxes[None, :, 1]
    bottom = gt_bboxes[None, :, 3] - ys
    ltrb = jnp.stack([left, top, right, bottom], axis=-1)  # (N, G, 4)

    areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0] + 1)
             * (gt_bboxes[:, 3] - gt_bboxes[:, 1] + 1))[None, :]
    inside = jnp.min(ltrb, axis=-1) > 0
    max_dist = jnp.max(ltrb, axis=-1)
    in_range = ((max_dist >= regress_ranges[:, None, 0])
                & (max_dist <= regress_ranges[:, None, 1]))
    areas = jnp.where(inside & in_range & gt_valid[None, :], areas, FCOS_INF)
    min_area = jnp.min(areas, axis=1)
    min_idx = jnp.argmin(areas, axis=1)
    labels = jnp.where(min_area < FCOS_INF, gt_labels[min_idx], 0)
    targets = jnp.take_along_axis(
        ltrb, min_idx[:, None, None].repeat(4, -1), axis=1)[:, 0, :]
    return labels.astype(jnp.int32), targets


def fcos_loss(
    cls_scores,
    bbox_preds,
    centernesses,
    strides,
    gt_bboxes,
    gt_labels,
    gt_valid,
    num_classes: int,
    regress_ranges=FCOS_REGRESS_RANGES,
):
    """FCOS losses for ONE image (fcos_head.py:116-187): focal
    classification over all points (avg num_pos+1), centerness-weighted IoU
    loss on decoded positive boxes, BCE centerness."""
    from vps_tpu.ops.losses import (
        binary_cross_entropy_with_logits,
        iou_loss,
        sigmoid_focal_loss,
    )

    fg = num_classes - 1
    sizes = [c.shape[:2] for c in cls_scores]
    points = fcos_points(sizes, strides)
    rr = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(r, jnp.float32)[None], (p.shape[0], 2))
        for r, p in zip(regress_ranges, points)
    ])
    pts = jnp.concatenate(points, axis=0)
    labels, bbox_targets = fcos_target(pts, rr, gt_bboxes, gt_labels,
                                       gt_valid)

    cls_flat = jnp.concatenate([c.reshape(-1, fg) for c in cls_scores])
    reg_flat = jnp.concatenate([r.reshape(-1, 4) for r in bbox_preds])
    ctr_flat = jnp.concatenate([c.reshape(-1) for c in centernesses])

    pos = labels > 0
    num_pos = jnp.sum(pos.astype(jnp.float32))
    loss_cls = sigmoid_focal_loss(
        cls_flat, labels, weight=jnp.ones_like(labels, jnp.float32),
        avg_factor=num_pos + 1.0,
    )

    # centerness targets (fcos_head.py:386-393), guarded against 0/0 on
    # non-positive rows
    lr = bbox_targets[:, jnp.asarray([0, 2])]
    tb = bbox_targets[:, jnp.asarray([1, 3])]
    ctr_t = jnp.sqrt(jnp.clip(
        (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6))
        * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)),
        0.0, 1.0,
    ))
    ctr_t = jnp.where(pos, ctr_t, 0.0)

    def decode(d):
        return jnp.stack([
            pts[:, 0] - d[:, 0], pts[:, 1] - d[:, 1],
            pts[:, 0] + d[:, 2], pts[:, 1] + d[:, 3],
        ], axis=-1)

    loss_bbox = iou_loss(
        decode(reg_flat), decode(bbox_targets),
        weight=ctr_t, avg_factor=jnp.maximum(jnp.sum(ctr_t), 1e-6),
    )
    loss_ctr = binary_cross_entropy_with_logits(
        ctr_flat, ctr_t, weight=pos.astype(jnp.float32),
        avg_factor=jnp.maximum(num_pos, 1.0),
    )
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_centerness": loss_ctr}


def fcos_points(featmap_sizes, strides):
    """Per-level (H·W, 2) center points (fcos_head.py get_points)."""
    points = []
    for (h, w), s in zip(featmap_sizes, strides):
        ys = (jnp.arange(h, dtype=jnp.float32) * s) + s // 2
        xs = (jnp.arange(w, dtype=jnp.float32) * s) + s // 2
        yy = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
        xx = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
        points.append(jnp.stack([xx, yy], axis=-1))
    return points


def fcos_bboxes(
    cls_scores,
    bbox_preds,
    centernesses,
    strides,
    img_shape,
    num_classes: int,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_thr: float = 0.5,
    max_per_img: int = 100,
    nms_cfg=None,
):
    """FCOS decode: boxes from l/t/r/b distances at grid points, scores
    modulated by centerness (fcos_head.py get_bboxes)."""
    fg = num_classes - 1
    sizes = [c.shape[:2] for c in cls_scores]
    points = fcos_points(sizes, strides)
    lvl_boxes, lvl_scores = [], []
    for cls, reg, ctr, pts in zip(cls_scores, bbox_preds, centernesses, points):
        scores = jax.nn.sigmoid(cls.reshape(-1, fg))
        ctr_s = jax.nn.sigmoid(ctr.reshape(-1))
        dist = reg.reshape(-1, 4)
        k = min(nms_pre, scores.shape[0])
        max_scores = jnp.max(scores, axis=-1) * ctr_s
        _, idx = jax.lax.top_k(max_scores, k)
        p, d = pts[idx], dist[idx]
        x1 = jnp.clip(p[:, 0] - d[:, 0], 0, img_shape[1])
        y1 = jnp.clip(p[:, 1] - d[:, 1], 0, img_shape[0])
        x2 = jnp.clip(p[:, 0] + d[:, 2], 0, img_shape[1])
        y2 = jnp.clip(p[:, 1] + d[:, 3], 0, img_shape[0])
        lvl_boxes.append(jnp.stack([x1, y1, x2, y2], axis=-1))
        lvl_scores.append(scores[idx] * ctr_s[idx][:, None])
    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    padded = jnp.concatenate([jnp.zeros_like(scores[:, :1]), scores], axis=-1)
    return multiclass_nms(
        boxes, padded, score_thr=score_thr, iou_thr=nms_thr,
        max_num=max_per_img, nms_cfg=nms_cfg,
    )
