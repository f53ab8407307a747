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
