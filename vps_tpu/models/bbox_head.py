"""Box head (reference SharedFCBBoxHead,
/root/reference/mmdet/models/bbox_heads/convfc_bbox_head.py:172 w/ base
bbox_head.py): flatten 7×7×256 ROI feats → 2 shared FCs (1024) → cls (C+1)
and class-specific reg (4·(C+1))."""

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

    @nn.compact
    def __call__(self, roi_feats) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """roi_feats: (R, 7, 7, C) → (cls_logits (R, num_classes),
        bbox_deltas (R, 4·num_classes))."""
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
