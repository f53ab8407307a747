"""RPN head (reference /root/reference/mmdet/models/anchor_heads/rpn_head.py:13
+ anchor_head.py): 3×3 conv + ReLU, 1×1 sigmoid cls (A channels) and 1×1 reg
(4A channels). Proposal decoding (`get_bboxes`) is a pure static-shape
function: per-level top-k → delta decode → clip → fixed-size NMS → cross-level
top-k, replacing the dynamic-shape reference path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS
from vps_tpu.models.layers import Conv
from vps_tpu.ops import delta2bbox, clip_boxes
from vps_tpu.ops.nms import nms, NEG_INF


@HEADS.register
class RPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3
    target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, feats) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """feats: list of (B, H, W, C). Returns per-level (cls, reg):
        cls (B, H, W, A) logits; reg (B, H, W, 4A)."""
        normal_init = nn.initializers.normal(0.01)
        conv = Conv(self.feat_channels, 3, 1, 1, kernel_init=normal_init,
                    name="rpn_conv")
        cls_conv = Conv(self.num_anchors, 1, 1, 0, kernel_init=normal_init,
                        name="rpn_cls")
        reg_conv = Conv(self.num_anchors * 4, 1, 1, 0, kernel_init=normal_init,
                        name="rpn_reg")
        cls_outs, reg_outs = [], []
        for f in feats:
            h = jax.nn.relu(conv(f))
            cls_outs.append(cls_conv(h))
            reg_outs.append(reg_conv(h))
        return cls_outs, reg_outs


def rpn_proposals(
    cls_outs,
    reg_outs,
    anchors_per_level,
    img_shape,
    nms_pre: int = 2000,
    nms_thr: float = 0.7,
    max_num: int = 2000,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
):
    """Decode RPN outputs of ONE image into fixed-capacity proposals.

    cls_outs/reg_outs: per-level (H, W, A) / (H, W, 4A); anchors_per_level:
    per-level (H*W*A, 4). Returns (proposals (max_num, 4), scores (max_num,),
    valid (max_num,)). Matches mmdet 1.x AnchorHead.get_bboxes semantics:
    per-level top nms_pre → decode → clip → NMS(0.7) → concat → top max_num
    by score (test_cfg `nms_across_levels=False`).
    """
    all_boxes, all_scores = [], []
    for cls, reg, anchors in zip(cls_outs, reg_outs, anchors_per_level):
        scores = jax.nn.sigmoid(cls.reshape(-1))
        deltas = reg.reshape(-1, 4)
        k = min(nms_pre, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        top_deltas = deltas[top_idx]
        top_anchors = anchors[top_idx]
        boxes = delta2bbox(
            top_anchors, top_deltas, target_means, target_stds, max_shape=img_shape
        )
        keep = nms(boxes, top_scores, nms_thr)
        masked_scores = jnp.where(keep, top_scores, NEG_INF)
        all_boxes.append(boxes)
        all_scores.append(masked_scores)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    k = min(max_num, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    proposals = boxes[top_idx]
    valid = top_scores > NEG_INF / 2
    if k < max_num:
        pad = max_num - k
        proposals = jnp.pad(proposals, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=NEG_INF)
        valid = jnp.pad(valid, (0, pad))
    proposals = jnp.where(valid[:, None], proposals, 0.0)
    return proposals, jnp.maximum(top_scores, 0.0), valid
