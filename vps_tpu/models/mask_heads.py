"""Auxiliary mask-branch heads of the generic mmdet detector zoo, rebuilt
TPU-first (static shapes, validity masks, vectorized target rendering):

- FusedSemanticHead (reference
  /root/reference/mmdet/models/mask_heads/fused_semantic_head.py:12): the
  HTC multi-level fused semantic branch (lateral 1×1s → fuse at one level →
  4×3×3 convs → logits + embedding).
- HTCMaskHead (mask_heads/htc_mask_head.py:8): FCNMaskHead with a 1×1
  `conv_res` residual input for HTC's mask information flow.
- MaskIoUHead (mask_heads/maskiou_head.py:13): Mask Scoring R-CNN's mask-IoU
  regressor; its target function is re-derived with integral-image box sums
  instead of the reference's per-ROI numpy crops.
- GridHead (mask_heads/grid_head.py:13): Grid R-CNN Plus grid-point heatmap
  head with first/second-order neighbor fusion; target rendering and the
  boundary-voting decode are vectorized over ROIs (the reference loops in
  python per ROI per point, grid_head.py:222-289).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS
from vps_tpu.models.layers import Conv, ConvModule, resize_bilinear
from vps_tpu.models.flow.flownet2 import TorchConvTranspose
from vps_tpu.ops.losses import (
    binary_cross_entropy_with_logits,
    softmax_cross_entropy,
)


@HEADS.register
class FusedSemanticHead(nn.Module):
    """in_i → 1×1 conv, fused (bilinear-resized sum) at `fusion_level`,
    then num_convs 3×3 convs → (1×1 logits, 1×1 embedding)."""

    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    ignore_label: int = 255
    loss_weight: float = 0.2

    @nn.compact
    def __call__(self, feats) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """feats: num_ins tensors (B, H_l, W_l, C). Returns
        (mask_pred (B, h, w, num_classes), embedding (B, h, w, C)) at the
        fusion level's resolution."""
        lat = [
            ConvModule(self.in_channels, 1, 1, 0, name=f"lateral{i}")
            for i in range(self.num_ins)
        ]
        x = lat[self.fusion_level](feats[self.fusion_level])
        h, w = x.shape[1:3]
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            # reference uses align_corners=True bilinear; resize_bilinear
            # implements the half-pixel convention — the embedding is
            # trained from scratch either way (documented approximation)
            x = x + lat[i](resize_bilinear(f, (h, w)))
        for i in range(self.num_convs):
            x = ConvModule(self.conv_out_channels, 3, 1, 1,
                           name=f"conv{i}")(x)
        logits = Conv(self.num_classes, 1, 1, 0,
                      kernel_init=nn.initializers.he_normal(),
                      name="conv_logits")(x)
        embedding = ConvModule(self.conv_out_channels, 1, 1, 0,
                               name="conv_embedding")(x)
        return logits, embedding

    def loss(self, mask_pred, labels):
        """CE(ignore_label) × loss_weight (fused_semantic_head.py:100-105).
        labels: (B, h, w) int at the prediction's resolution."""
        return self.loss_weight * softmax_cross_entropy(
            mask_pred, labels, ignore_index=self.ignore_label
        )


@HEADS.register
class HTCMaskHead(nn.Module):
    """FCNMaskHead + conv_res residual feed (htc_mask_head.py:8): stage i's
    pre-upsample features flow into stage i+1 through a 1×1 conv."""

    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 9

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits: bool = True,
                 return_feat: bool = True):
        he = nn.initializers.he_normal()
        if res_feat is not None:
            x = x + ConvModule(self.conv_out_channels, 1, 1, 0,
                               name="conv_res")(res_feat)
        for i in range(self.num_convs):
            x = Conv(self.conv_out_channels, 3, 1, 1, kernel_init=he,
                     name=f"conv{i}")(x)
            x = jax.nn.relu(x)
        feat = x
        outs = []
        if return_logits:
            y = TorchConvTranspose(self.conv_out_channels, 2, 2, 0,
                                   name="upsample")(x)
            y = jax.nn.relu(y)
            y = Conv(self.num_classes, 1, 1, 0, kernel_init=he,
                     name="conv_logits")(y)
            outs.append(y)
        if return_feat:
            outs.append(feat)
        return tuple(outs) if len(outs) > 1 else outs[0]


@HEADS.register
class MaskIoUHead(nn.Module):
    """Mask-IoU regressor (maskiou_head.py:13): concat(mask feats 14×14,
    max-pooled sigmoid mask pred) → 4 convs (last stride 2) → 2 FCs →
    per-class IoU."""

    num_convs: int = 4
    num_fcs: int = 2
    roi_feat_size: int = 14
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 9
    loss_weight: float = 0.5  # loss_iou MSELoss weight

    @nn.compact
    def __call__(self, mask_feat, mask_pred) -> jnp.ndarray:
        """mask_feat (R, S, S, C); mask_pred (R, 2S, 2S) logits of the
        target class. Returns (R, num_classes) IoU predictions."""
        from vps_tpu.models.layers import max_pool

        prob = jax.nn.sigmoid(mask_pred)[..., None]
        prob = max_pool(prob, 2, 2, 0)
        x = jnp.concatenate([mask_feat, prob], axis=-1)
        he = nn.initializers.he_normal()
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = Conv(self.conv_out_channels, 3, stride, 1, kernel_init=he,
                     name=f"conv{i}")(x)
            x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.Dense(self.fc_out_channels, kernel_init=he,
                         name=f"fc{i}")(x)
            x = jax.nn.relu(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name="fc_mask_iou")(x)

    def loss(self, pos_iou_pred, iou_targets, pos_valid):
        """MSE over positives with a defined target (maskiou_head.py:92-99:
        only targets > 0)."""
        w = (pos_valid & (iou_targets > 0)).astype(jnp.float32)
        den = jnp.maximum(jnp.sum(w), 1.0)
        return self.loss_weight * jnp.sum(
            w * (pos_iou_pred - iou_targets) ** 2) / den


def _box_sums(integral, boxes):
    """Sum of a map inside each box via its integral image.

    integral: (H+1, W+1) cumulative sum (integral[i, j] = sum of map[:i, :j]);
    boxes (R, 4) x1,y1,x2,y2 inclusive pixel coords.
    """
    h = integral.shape[0] - 1
    w = integral.shape[1] - 1
    x1 = jnp.clip(boxes[:, 0].astype(jnp.int32), 0, w)
    y1 = jnp.clip(boxes[:, 1].astype(jnp.int32), 0, h)
    x2 = jnp.clip(boxes[:, 2].astype(jnp.int32) + 1, 0, w)
    y2 = jnp.clip(boxes[:, 3].astype(jnp.int32) + 1, 0, h)
    return (integral[y2, x2] - integral[y1, x2]
            - integral[y2, x1] + integral[y1, x1])


def mask_iou_target(pos_rois, pos_gt_idx, pos_valid, gt_masks, mask_pred,
                    mask_targets, thr: float = 0.5):
    """MaskIoU targets (maskiou_head.py:101-147), static-shape.

    The predicted mask only exists inside the ROI, so the IoU with the FULL
    gt instance needs the gt area outside the box: gt_full = target_area /
    area_ratio where area_ratio = gt-area-in-box / gt-total-area. The
    reference crops each gt mask per ROI in numpy; here box sums come from
    ONE integral image per gt stack (all-ROI gather, no host loop).

    pos_rois (P, 4); pos_gt_idx (P,); gt_masks (G, H, W) {0,1};
    mask_pred (P, 28, 28) logits; mask_targets (P, 28, 28) {0,1}.
    """
    ii = jnp.pad(
        jnp.cumsum(jnp.cumsum(gt_masks.astype(jnp.float32), axis=1), axis=2),
        ((0, 0), (1, 0), (1, 0)),
    )  # (G, H+1, W+1)
    in_box = jax.vmap(_box_sums)(ii[pos_gt_idx], pos_rois[:, None, :])[:, 0]
    full = jnp.sum(gt_masks.astype(jnp.float32), axis=(1, 2))[pos_gt_idx]
    area_ratio = in_box / jnp.maximum(full, 1e-7)

    pred_bin = (jax.nn.sigmoid(mask_pred) > thr).astype(jnp.float32)
    pred_area = jnp.sum(pred_bin, axis=(1, 2))
    overlap = jnp.sum(pred_bin * mask_targets, axis=(1, 2))
    target_area = jnp.sum(mask_targets, axis=(1, 2))
    gt_full = target_area / jnp.maximum(area_ratio, 1e-7)
    iou = overlap / jnp.maximum(pred_area + gt_full - overlap, 1e-7)
    return jnp.where(pos_valid, iou, 0.0)


# ---------------------------------------------------------------------------
# Grid R-CNN head
# ---------------------------------------------------------------------------


def _grid_geometry(grid_points: int, roi_feat_size: int):
    """Static sub-region corners + interpolation factors per grid point
    (grid_head.py calc_sub_regions/get_target factors)."""
    grid_size = int(np.sqrt(grid_points))
    whole = roi_feat_size * 4
    half = whole // 4 * 2
    subs, factors = [], []
    for j in range(grid_points):
        x_idx, y_idx = j // grid_size, j % grid_size
        if x_idx == 0:
            sx = 0
        elif x_idx == grid_size - 1:
            sx = half
        else:
            sx = max(int((x_idx / (grid_size - 1) - 0.25) * whole), 0)
        if y_idx == 0:
            sy = 0
        elif y_idx == grid_size - 1:
            sy = half
        else:
            sy = max(int((y_idx / (grid_size - 1) - 0.25) * whole), 0)
        subs.append((sx, sy))
        factors.append((1 - x_idx / (grid_size - 1),
                        1 - y_idx / (grid_size - 1)))
    return grid_size, whole, half, subs, factors


class _GroupedDeconv(nn.Module):
    """Grouped ConvTranspose2d(k=4, s=2, p=1) — NHWC lhs-dilated conv."""

    features: int
    groups: int
    kernel_size: int = 4
    bias_init_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel", nn.initializers.normal(0.001),
            (k, k, x.shape[-1] // self.groups, self.features),
        )
        pad = k - 1 - ((k - 2) // 2)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(2, 2), feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = self.param(
            "bias",
            nn.initializers.constant(self.bias_init_value),
            (self.features,),
        )
        return y + b


@HEADS.register
class GridHead(nn.Module):
    """Grid-point heatmap head (grid_head.py:13): 8 convs (first stride-2,
    GN(36)) over point-grouped channels, first/second-order neighbor fusion
    (depthwise 5×5 + 1×1 per edge), two grouped deconvs to a 9-channel
    half-sized heatmap. Returns (fused, unfused) logits NHWC."""

    grid_points: int = 9
    num_convs: int = 8
    roi_feat_size: int = 14
    in_channels: int = 256
    conv_kernel_size: int = 3
    point_feat_channels: int = 64
    norm_groups: int = 36

    @nn.compact
    def __call__(self, x, train: bool = False):
        gsz = int(np.sqrt(self.grid_points))
        assert gsz * gsz == self.grid_points
        c = self.point_feat_channels
        out_ch = c * self.grid_points
        pad = (self.conv_kernel_size - 1) // 2
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = Conv(out_ch, self.conv_kernel_size, stride, pad,
                     kernel_init=nn.initializers.he_normal(),
                     name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                             name=f"gn{i}")(x)
            x = jax.nn.relu(x)

        # 4-neighborhood of each point in the grid (grid_head.py:94-106)
        neighbors = []
        for i in range(gsz):
            for j in range(gsz):
                n = []
                if i > 0:
                    n.append((i - 1) * gsz + j)
                if j > 0:
                    n.append(i * gsz + j - 1)
                if j < gsz - 1:
                    n.append(i * gsz + j + 1)
                if i < gsz - 1:
                    n.append((i + 1) * gsz + j)
                neighbors.append(n)

        def trans(tag, i, j, inp):
            h = Conv(c, 5, 1, 2, groups=c,
                     kernel_init=nn.initializers.he_normal(),
                     name=f"{tag}_trans{i}_{j}_dw")(inp)
            return Conv(c, 1, 1, 0,
                        kernel_init=nn.initializers.he_normal(),
                        name=f"{tag}_trans{i}_{j}_pw")(h)

        pts = [x[..., i * c:(i + 1) * c] for i in range(self.grid_points)]
        x_fo = []
        for i, nbrs in enumerate(neighbors):
            acc = pts[i]
            for j, p in enumerate(nbrs):
                acc = acc + trans("fo", i, j, pts[p])
            x_fo.append(acc)
        x_so = []
        for i, nbrs in enumerate(neighbors):
            acc = pts[i]
            for j, p in enumerate(nbrs):
                acc = acc + trans("so", i, j, x_fo[p])
            x_so.append(acc)

        deconv1 = _GroupedDeconv(out_ch, self.grid_points, name="deconv1")
        gn1 = nn.GroupNorm(num_groups=self.grid_points, epsilon=1e-5,
                           name="norm1")
        deconv2 = _GroupedDeconv(
            self.grid_points, self.grid_points,
            bias_init_value=-float(np.log(0.99 / 0.01)), name="deconv2")

        x2 = jnp.concatenate(x_so, axis=-1)
        fused = deconv2(jax.nn.relu(gn1(deconv1(x2))))
        if train:
            unfused = deconv2(jax.nn.relu(gn1(deconv1(x))))
        else:
            unfused = fused
        return fused, unfused

    def loss(self, fused, unfused, targets, valid, loss_weight: float = 15.0):
        """Sigmoid CE on both heatmaps (grid_head.py:291-296), mean over
        valid ROIs' elements. targets/preds NHWC (R, h, h, P)."""
        w = valid.astype(jnp.float32)[:, None, None, None]
        den = jnp.maximum(jnp.sum(w), 1.0) * np.prod(targets.shape[1:])
        lf = binary_cross_entropy_with_logits(
            fused, targets, weight=w, avg_factor=den)
        lu = binary_cross_entropy_with_logits(
            unfused, targets, weight=w, avg_factor=den)
        return loss_weight * (lf + lu)


def grid_target(pos_rois, pos_gt_bboxes, pos_valid, grid_points: int = 9,
                roi_feat_size: int = 14, pos_radius: int = 1):
    """Grid-point heatmap targets, fully vectorized (the reference renders
    each circle with nested python loops per ROI, grid_head.py:222-289).

    Returns (P, half, half, grid_points) NHWC {0,1} targets in each point's
    static sub-region window.
    """
    gsz, whole, half, subs, factors = _grid_geometry(grid_points,
                                                     roi_feat_size)
    x1 = pos_rois[:, 0] - (pos_rois[:, 2] - pos_rois[:, 0]) / 2
    y1 = pos_rois[:, 1] - (pos_rois[:, 3] - pos_rois[:, 1]) / 2
    ws = (pos_rois[:, 2] - pos_rois[:, 0]) * 2
    hs = (pos_rois[:, 3] - pos_rois[:, 1]) * 2
    ok = pos_valid & (ws > gsz) & (hs > gsz)

    yy, xx = jnp.meshgrid(jnp.arange(half), jnp.arange(half), indexing="ij")
    chans = []
    for j in range(grid_points):
        fx, fy = factors[j]
        gx = fx * pos_gt_bboxes[:, 0] + (1 - fx) * pos_gt_bboxes[:, 2]
        gy = fy * pos_gt_bboxes[:, 1] + (1 - fy) * pos_gt_bboxes[:, 3]
        cx = ((gx - x1) / jnp.maximum(ws, 1e-6) * whole).astype(jnp.int32)
        cy = ((gy - y1) / jnp.maximum(hs, 1e-6) * whole).astype(jnp.int32)
        # shift into this point's sub-region window
        dx = xx[None] + subs[j][0] - cx[:, None, None]
        dy = yy[None] + subs[j][1] - cy[:, None, None]
        hit = (dx * dx + dy * dy) <= pos_radius * pos_radius
        chans.append(hit & ok[:, None, None])
    return jnp.stack(chans, axis=-1).astype(jnp.float32)


def grid_bboxes(det_bboxes, det_scores, heatmaps, img_shape,
                grid_points: int = 9, roi_feat_size: int = 14):
    """Boundary-voting box refinement (grid_head.py get_bboxes:298-361),
    vectorized. heatmaps (R, half, half, P) fused logits NHWC. Returns
    refined (R, 4) boxes clipped to img_shape."""
    gsz, whole, half, subs, _ = _grid_geometry(grid_points, roi_feat_size)
    r = det_bboxes.shape[0]
    prob = jax.nn.sigmoid(heatmaps)
    flat = jnp.moveaxis(prob, -1, 1).reshape(r, grid_points, half * half)
    pos = jnp.argmax(flat, axis=-1)
    score = jnp.max(flat, axis=-1)  # (R, P)
    xs = (pos % half) + np.asarray([s[0] for s in subs], np.int32)[None]
    ys = (pos // half) + np.asarray([s[1] for s in subs], np.int32)[None]

    widths = (det_bboxes[:, 2] - det_bboxes[:, 0])[:, None]
    heights = (det_bboxes[:, 3] - det_bboxes[:, 1])[:, None]
    x1 = det_bboxes[:, 0][:, None] - widths / 2
    y1 = det_bboxes[:, 1][:, None] - heights / 2
    abs_xs = (xs.astype(jnp.float32) + 0.5) / whole * (widths * 2) + x1
    abs_ys = (ys.astype(jnp.float32) + 0.5) / whole * (heights * 2) + y1

    x1_i = np.arange(gsz)
    y1_i = np.arange(gsz) * gsz
    x2_i = grid_points - gsz + np.arange(gsz)
    y2_i = (np.arange(gsz) + 1) * gsz - 1

    def vote(vals, sc, idx):
        s = sc[:, idx]
        return jnp.sum(vals[:, idx] * s, axis=1) / jnp.maximum(
            jnp.sum(s, axis=1), 1e-6)

    h, w = img_shape
    bx1 = jnp.clip(vote(abs_xs, score, x1_i), 0, w - 1)
    by1 = jnp.clip(vote(abs_ys, score, y1_i), 0, h - 1)
    bx2 = jnp.clip(vote(abs_xs, score, x2_i), 0, w - 1)
    by2 = jnp.clip(vote(abs_ys, score, y2_i), 0, h - 1)
    del det_scores  # scores pass through unchanged (reference concat)
    return jnp.stack([bx1, by1, bx2, by2], axis=-1)
