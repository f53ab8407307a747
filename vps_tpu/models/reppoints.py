"""RepPoints head — anchor-free point-set detection.

TPU-native re-design of the reference RepPointsHead
(/root/reference/mmdet/models/anchor_heads/reppoints_head.py:17): per-level
conv towers predict an initial 9-point set; a deformable conv conditioned on
those points (gradient-mul blended, base-grid-subtracted offsets) extracts
point-aligned features for classification and point refinement. Point sets
convert to boxes via the minmax / partial_minmax / moment transforms.

Static-shape conventions: the init-stage PointAssigner and refine-stage
MaxIoUAssigner run over fixed-capacity padded point/gt sets with validity
masks (reference core/bbox/assigners/point_assigner.py + point_target.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS
from vps_tpu.models.layers import Conv
from vps_tpu.core.assigner import max_iou_assign, point_assign
from vps_tpu.ops.deform_conv import deform_conv2d
from vps_tpu.ops.losses import sigmoid_focal_loss, smooth_l1_loss
from vps_tpu.ops.nms import multiclass_nms


def _dcn_base_offset(kernel: int) -> np.ndarray:
    """(1, 1, 1, 2K) y-first base grid the reference subtracts from the
    predicted points to form DCN offsets (reppoints_head.py:100-106)."""
    pad = (kernel - 1) // 2
    base = np.arange(-pad, pad + 1, dtype=np.float32)
    dy = np.repeat(base, kernel)
    dx = np.tile(base, kernel)
    return np.stack([dy, dx], axis=1).reshape(1, 1, 1, -1)


@HEADS.register
class RepPointsHead(nn.Module):
    """reppoints_head.py:17. Returns per-level (cls_score (B,H,W,fg),
    pts_init (B,H,W,2K y-first), pts_refine (B,H,W,2K))."""

    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = "moment"
    moment_mul: float = 0.01
    use_grid_points: bool = False
    center_init: bool = True

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1

    @property
    def dcn_kernel(self) -> int:
        k = int(math.sqrt(self.num_points))
        assert k * k == self.num_points and k % 2 == 1, self.num_points
        return k

    @nn.compact
    def __call__(self, feats):
        ninit = nn.initializers.normal(0.01)
        bias_cls = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        k = self.dcn_kernel
        pad = (k - 1) // 2
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
        pts_out_dim = 2 * self.num_points
        init_conv = Conv(self.point_feat_channels, 3, 1, 1,
                         kernel_init=ninit, name="pts_init_conv")
        init_out = Conv(pts_out_dim, 1, 1, 0, kernel_init=ninit,
                        name="pts_init_out")
        cls_dcn_w = self.param(
            "cls_dcn_weight", ninit,
            (k, k, self.feat_channels, self.point_feat_channels),
        )
        cls_out = nn.Conv(self.cls_out_channels, (1, 1), kernel_init=ninit,
                          bias_init=bias_cls, name="cls_out")
        refine_dcn_w = self.param(
            "refine_dcn_weight", ninit,
            (k, k, self.feat_channels, self.point_feat_channels),
        )
        refine_out = Conv(pts_out_dim, 1, 1, 0, kernel_init=ninit,
                          name="pts_refine_out")
        if self.transform_method == "moment":
            # learned log-scale of the moment transform; lives in params so
            # the pure points2bbox/loss functions can read it from variables
            self.param("moment_transfer", nn.initializers.zeros, (2,))
        base_off = jnp.asarray(_dcn_base_offset(k))

        cls_scores, pts_inits, pts_refines = [], [], []
        for f in feats:
            c, r = f, f
            for conv in cls_convs:
                c = jax.nn.relu(conv(c))
            for conv in reg_convs:
                r = jax.nn.relu(conv(r))
            pts_init = init_out(jax.nn.relu(init_conv(r)))
            # blended-gradient offsets (reppoints_head.py:276-278): ranking
            # features move with the points but only 10% of the refine
            # gradient flows back into the init branch
            pts_gm = (
                (1 - self.gradient_mul) * jax.lax.stop_gradient(pts_init)
                + self.gradient_mul * pts_init
            )
            dcn_off = pts_gm - base_off
            cls_feat = jax.nn.relu(
                deform_conv2d(c, dcn_off, cls_dcn_w, padding=pad)
            )
            cls_scores.append(cls_out(cls_feat))
            ref_feat = jax.nn.relu(
                deform_conv2d(r, dcn_off, refine_dcn_w, padding=pad)
            )
            pts_refine = refine_out(ref_feat) + jax.lax.stop_gradient(
                pts_init
            )
            pts_inits.append(pts_init)
            pts_refines.append(pts_refine)
        return cls_scores, pts_inits, pts_refines


def points2bbox(head, pts, moment_transfer=None, y_first: bool = True):
    """Point set → box (reppoints_head.py:164-213). pts: (..., 2K).
    moment_transfer: the learned (2,) log-scale for the moment transform
    (passed in because this is a pure function)."""
    shape = pts.shape[:-1]
    p = pts.reshape(*shape, -1, 2)
    py = p[..., 0] if y_first else p[..., 1]
    px = p[..., 1] if y_first else p[..., 0]
    if head.transform_method == "minmax":
        x1 = jnp.min(px, axis=-1)
        x2 = jnp.max(px, axis=-1)
        y1 = jnp.min(py, axis=-1)
        y2 = jnp.max(py, axis=-1)
    elif head.transform_method == "partial_minmax":
        x1 = jnp.min(px[..., :4], axis=-1)
        x2 = jnp.max(px[..., :4], axis=-1)
        y1 = jnp.min(py[..., :4], axis=-1)
        y2 = jnp.max(py[..., :4], axis=-1)
    elif head.transform_method == "moment":
        mx = jnp.mean(px, axis=-1)
        my = jnp.mean(py, axis=-1)
        n = px.shape[-1]
        # torch.std default: Bessel-corrected (n-1 divisor)
        sx = jnp.sqrt(
            jnp.sum((px - mx[..., None]) ** 2, axis=-1) / max(n - 1, 1)
        )
        sy = jnp.sqrt(
            jnp.sum((py - my[..., None]) ** 2, axis=-1) / max(n - 1, 1)
        )
        mt = moment_transfer
        if mt is None:
            mt = jnp.zeros((2,), jnp.float32)
        mt = mt * head.moment_mul + jax.lax.stop_gradient(mt) * (
            1 - head.moment_mul
        )
        hw = sx * jnp.exp(mt[0])
        hh = sy * jnp.exp(mt[1])
        x1, x2 = mx - hw, mx + hw
        y1, y2 = my - hh, my + hh
    else:
        raise NotImplementedError(head.transform_method)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def reppoints_centers(featmap_sizes, strides):
    """Per-level (H·W, 3) = (x, y, stride) grid centers
    (core/anchor/point_generator.py grid_points)."""
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        xs = jnp.arange(w, dtype=jnp.float32) * s
        ys = jnp.arange(h, dtype=jnp.float32) * s
        xx = jnp.tile(xs, h)
        yy = jnp.repeat(ys, w)
        out.append(jnp.stack([xx, yy, jnp.full_like(xx, s)], axis=-1))
    return out


def offsets_to_pts(head, centers, pts_preds):
    """Per-level predicted point coordinates in image space
    (reppoints_head.py:349-369 offset_to_pts): xy = yx_shift·stride +
    center. Returns per-level (H·W, 2K) x-first pairs."""
    out = []
    for ctr, pred, stride in zip(centers, pts_preds, head.point_strides):
        p = pred[0].reshape(-1, head.num_points, 2)  # (N, K, (y,x))
        xy = jnp.stack([p[..., 1], p[..., 0]], axis=-1) * stride
        pts = xy + ctr[:, None, :2]
        out.append(pts.reshape(-1, 2 * head.num_points))
    return out


def reppoints_loss(
    head,
    variables,
    cls_scores,
    pts_preds_init,
    pts_preds_refine,
    gt_bboxes,
    gt_labels,
    gt_valid,
    cfg: Dict[str, Any],
):
    """Two-stage RepPoints loss for ONE image (reppoints_head.py:408-504):
    init stage assigned by PointAssigner, refine stage by MaxIoUAssigner
    over the decoded init boxes; focal cls + normalized smooth-L1 point
    losses. `variables`: the head's params dict (for moment_transfer)."""
    params = variables["params"] if "params" in variables else variables
    mt = params.get("moment_transfer")
    featmap_sizes = [c.shape[1:3] for c in cls_scores]
    centers = reppoints_centers(featmap_sizes, head.point_strides)
    pts_xy_init = offsets_to_pts(head, centers, pts_preds_init)
    pts_xy_refine = offsets_to_pts(head, centers, pts_preds_refine)
    all_centers = jnp.concatenate(centers, axis=0)

    init_cfg = cfg.get("init", {})
    assign_init = point_assign(
        all_centers,
        gt_bboxes,
        scale=init_cfg.get("scale", head.point_base_scale),
        pos_num=init_cfg.get("pos_num", 1),
        gt_labels=gt_labels,
        gt_valid=gt_valid,
    )
    pos_init = assign_init.assigned_gt_inds > 0
    gt_idx_i = jnp.clip(
        assign_init.assigned_gt_inds - 1, 0, gt_bboxes.shape[0] - 1
    )
    bbox_gt_init = gt_bboxes[gt_idx_i]
    npos_init = jnp.maximum(jnp.sum(pos_init.astype(jnp.float32)), 1.0)

    # refine candidates: init boxes decoded around each center
    # (reppoints_head.py:455-466)
    bbox_shift = []
    for lvl, (pred, stride) in enumerate(
        zip(pts_preds_init, head.point_strides)
    ):
        b = points2bbox(
            head, jax.lax.stop_gradient(pred[0].reshape(-1, 2 * head.num_points)),
            moment_transfer=jax.lax.stop_gradient(mt) if mt is not None else None,
        )
        ctr = centers[lvl]
        bbox_shift.append(
            b * stride
            + jnp.concatenate([ctr[:, :2], ctr[:, :2]], axis=-1)
        )
    refine_cands = jnp.concatenate(bbox_shift, axis=0)
    ref_cfg = cfg.get("refine", {})
    a = ref_cfg.get("assigner", {})
    assign_ref = max_iou_assign(
        refine_cands,
        gt_bboxes,
        pos_iou_thr=a.get("pos_iou_thr", 0.5),
        neg_iou_thr=a.get("neg_iou_thr", 0.4),
        min_pos_iou=a.get("min_pos_iou", 0.0),
        gt_labels=gt_labels,
        gt_valid=gt_valid,
    )
    pos_ref = assign_ref.assigned_gt_inds > 0
    neg_ref = assign_ref.assigned_gt_inds == 0
    gt_idx_r = jnp.clip(
        assign_ref.assigned_gt_inds - 1, 0, gt_bboxes.shape[0] - 1
    )
    bbox_gt_refine = gt_bboxes[gt_idx_r]
    labels_ref = jnp.where(pos_ref, assign_ref.labels, 0)
    npos_ref = jnp.maximum(jnp.sum(pos_ref.astype(jnp.float32)), 1.0)

    fg = head.cls_out_channels
    cls_flat = jnp.concatenate(
        [c[0].reshape(-1, fg) for c in cls_scores], axis=0
    )
    loss_cls = sigmoid_focal_loss(
        cls_flat, labels_ref,
        weight=(pos_ref | neg_ref).astype(jnp.float32),
        avg_factor=npos_ref,
    )

    # per-level normalization (point_base_scale · stride)
    norms = jnp.concatenate(
        [
            jnp.full((c.shape[1] * c.shape[2],),
                     float(head.point_base_scale * s))
            for c, s in zip(cls_scores, head.point_strides)
        ]
    )[:, None]
    bbox_pred_init = points2bbox(
        head, jnp.concatenate(pts_xy_init, axis=0), moment_transfer=mt,
        y_first=False,
    )
    bbox_pred_refine = points2bbox(
        head, jnp.concatenate(pts_xy_refine, axis=0), moment_transfer=mt,
        y_first=False,
    )
    loss_pts_init = smooth_l1_loss(
        bbox_pred_init / norms, bbox_gt_init / norms, beta=1.0 / 9.0,
        weight=pos_init.astype(jnp.float32)[:, None],
        avg_factor=npos_init,
    ) * cfg.get("init_loss_weight", 0.5)
    loss_pts_refine = smooth_l1_loss(
        bbox_pred_refine / norms, bbox_gt_refine / norms, beta=1.0 / 9.0,
        weight=pos_ref.astype(jnp.float32)[:, None],
        avg_factor=npos_ref,
    )
    return dict(
        loss_cls=loss_cls,
        loss_pts_init=loss_pts_init,
        loss_pts_refine=loss_pts_refine,
    )


def reppoints_bboxes(
    head,
    variables,
    cls_scores,
    pts_preds_refine,
    img_shape: Tuple[int, int],
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_thr: float = 0.5,
    max_per_img: int = 100,
    nms_cfg=None,
):
    """Detection decode for ONE image (reppoints_head.py:506-596): refined
    point sets → boxes (·stride + center), clip, multiclass NMS."""
    params = variables["params"] if "params" in variables else variables
    mt = params.get("moment_transfer")
    featmap_sizes = [c.shape[1:3] for c in cls_scores]
    centers = reppoints_centers(featmap_sizes, head.point_strides)
    fg = head.cls_out_channels
    lvl_boxes, lvl_scores = [], []
    for cls, pred, ctr, stride in zip(
        cls_scores, pts_preds_refine, centers, head.point_strides
    ):
        scores = jax.nn.sigmoid(cls[0].reshape(-1, fg))
        b = points2bbox(
            head, pred[0].reshape(-1, 2 * head.num_points),
            moment_transfer=mt,
        )
        boxes = b * stride + jnp.concatenate(
            [ctr[:, :2], ctr[:, :2]], axis=-1
        )
        x1 = jnp.clip(boxes[:, 0], 0, img_shape[1])
        y1 = jnp.clip(boxes[:, 1], 0, img_shape[0])
        x2 = jnp.clip(boxes[:, 2], 0, img_shape[1])
        y2 = jnp.clip(boxes[:, 3], 0, img_shape[0])
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
        k = min(nms_pre, scores.shape[0])
        _, idx = jax.lax.top_k(jnp.max(scores, axis=-1), k)
        lvl_boxes.append(boxes[idx])
        lvl_scores.append(scores[idx])
    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    padded = jnp.concatenate([jnp.zeros_like(scores[:, :1]), scores], axis=-1)
    return multiclass_nms(
        boxes, padded, score_thr=score_thr, iou_thr=nms_thr,
        max_num=max_per_img, nms_cfg=nms_cfg,
    )
