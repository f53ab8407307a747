"""Box heads (reference SharedFCBBoxHead,
/root/reference/mmdet/models/bbox_heads/convfc_bbox_head.py:172 w/ base
bbox_head.py, and DoubleConvFCBBoxHead, double_bbox_head.py:72): flatten
ROI feats → shared FCs → cls (C+1) and class-specific reg (4·(C+1)); plus
the pure cascade-refinement function regress_by_class
(bbox_head.py regress_by_class/refine_bboxes)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS
from vps_tpu.ops import delta2bbox
from vps_tpu.ops.nms import multiclass_nms


@HEADS.register
class SharedFCBBoxHead(nn.Module):
    num_fcs: int = 2
    in_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    num_classes: int = 9  # including background at index 0
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = False
    # base bbox_head.py with_avg_pool: global-average the ROI window before
    # the FCs (the C4/shared-ResLayer detector family)
    with_avg_pool: bool = False

    @nn.compact
    def __call__(self, roi_feats) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """roi_feats: (R, 7, 7, C) → (cls_logits (R, num_classes),
        bbox_deltas (R, 4·num_classes))."""
        if self.with_avg_pool:
            roi_feats = jnp.mean(roi_feats, axis=(1, 2))
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
                name=f"shared_fc{i}",
            )(x)
            x = jax.nn.relu(x)
        cls = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.normal(0.01), name="fc_cls"
        )(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(
            reg_dim, kernel_init=nn.initializers.normal(0.001), name="fc_reg"
        )(x)
        return cls, reg


@HEADS.register
class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN box head (reference
    bbox_heads/double_bbox_head.py:72): the reg branch is a BasicResBlock +
    `num_convs` Bottlenecks + global avg pool → fc_reg; the cls branch is
    `num_fcs` FCs on the flattened ROI window → fc_cls. Called with the two
    ROI feature tensors the detector extracts (cls at 1.0, reg at
    reg_roi_scale_factor)."""

    num_convs: int = 1
    num_fcs: int = 1
    in_channels: int = 256
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    num_classes: int = 9
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (0.1, 0.1, 0.2, 0.2)
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, x_cls, x_reg) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from vps_tpu.models.layers import Conv, FrozenBatchNorm
        from vps_tpu.models.resnet import Bottleneck

        # conv branch (reg): BasicResBlock (double_bbox_head.py:11-69) —
        # 3×3 conv + 1×1 conv vs a 1×1 identity projection, then Bottlenecks
        h = Conv(self.in_channels, 3, 1, 1, use_bias=False, name="res_conv1")(x_reg)
        h = FrozenBatchNorm(self.in_channels, name="res_bn1")(h)
        h = jax.nn.relu(h)
        h = Conv(self.conv_out_channels, 1, 1, 0, use_bias=False,
                 name="res_conv2")(h)
        h = FrozenBatchNorm(self.conv_out_channels, name="res_bn2")(h)
        iden = Conv(self.conv_out_channels, 1, 1, 0, name="res_identity")(x_reg)
        iden = FrozenBatchNorm(self.conv_out_channels, name="res_id_bn")(iden)
        h = jax.nn.relu(h + iden)
        for i in range(self.num_convs):
            h = Bottleneck(planes=self.conv_out_channels // 4,
                           name=f"conv_branch{i}")(h)
        h = jnp.mean(h, axis=(1, 2))  # with_avg_pool
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(h)

        # fc branch (cls)
        f = x_cls.reshape(x_cls.shape[0], -1)
        for i in range(self.num_fcs):
            f = nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.variance_scaling(
                    1.0, "fan_avg", "uniform"),
                name=f"fc_branch{i}",
            )(f)
            f = jax.nn.relu(f)
        cls = nn.Dense(self.num_classes,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(f)
        return cls, reg


def regress_by_class(
    rois,
    labels,
    bbox_pred,
    img_shape,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    reg_class_agnostic: bool = False,
):
    """Cascade refinement (reference bbox_head.py regress_by_class): pick
    each ROI's 4 deltas by its (1-based fg) label and decode, clipped to the
    image. Pure static-shape function; labels 0 (background rows) just pick
    the background deltas — callers keep those rows masked invalid."""
    if not reg_class_agnostic:
        nc = bbox_pred.shape[-1] // 4
        bbox_pred = jnp.take_along_axis(
            bbox_pred.reshape(-1, nc, 4),
            labels[:, None, None].astype(jnp.int32).repeat(4, -1),
            axis=1,
        )[:, 0, :]
    return delta2bbox(rois, bbox_pred, target_means, target_stds,
                      max_shape=img_shape)


def get_det_bboxes(
    rois,
    cls_logits,
    bbox_deltas,
    img_shape,
    score_thr: float,
    nms_iou_thr: float,
    max_per_img: int,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    valid=None,
    nms_cfg=None,
):
    """BBoxHead.get_det_bboxes equivalent (bbox_head.py mmdet 1.x): softmax
    scores → class-specific delta decode (clipped to img) → multiclass NMS.
    Returns (dets (max_per_img, 5), labels, valid)."""
    scores = jax.nn.softmax(cls_logits, axis=-1)
    if valid is not None:
        scores = scores * valid[:, None]
    boxes = delta2bbox(rois, bbox_deltas, target_means, target_stds, max_shape=img_shape)
    return multiclass_nms(
        boxes, scores, score_thr, nms_iou_thr, max_per_img, nms_cfg=nms_cfg
    )
