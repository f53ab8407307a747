"""Box coding and geometry, XLA-native.

Semantics match the reference's legacy mmdet conventions (the released
checkpoints were trained against them): widths/heights carry the ``+1``
offset, and decoded corners get the ∓0.5 shift
(cf. /root/reference/mmdet/core/bbox/transforms.py:6-69 and
mmdet/core/bbox/geometry.py). All functions are pure jnp, broadcast over
leading batch dims, and jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox2delta(proposals, gt, means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0)):
    """Encode gt boxes relative to proposals. Shapes (..., 4) → (..., 4)."""
    proposals = proposals.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    return (deltas - means) / stds


def delta2bbox(
    rois,
    deltas,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    max_shape=None,
    wh_ratio_clip=16 / 1000,
):
    """Decode deltas on top of rois.

    rois: (..., N, 4); deltas: (..., N, 4*K) for K classes (class-specific
    regression) or (..., N, 4). Returns boxes shaped like ``deltas``.
    """
    k = deltas.shape[-1] // 4
    means = jnp.tile(jnp.asarray(means, jnp.float32), k)
    stds = jnp.tile(jnp.asarray(stds, jnp.float32), k)
    denorm = deltas * stds + means
    dx = denorm[..., 0::4]
    dy = denorm[..., 1::4]
    dw = denorm[..., 2::4]
    dh = denorm[..., 3::4]
    import math

    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5 + 0.5
    y1 = gy - gh * 0.5 + 0.5
    x2 = gx + gw * 0.5 - 0.5
    y2 = gy + gh * 0.5 - 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., N, K, 4)
    return boxes.reshape(deltas.shape)


def bbox_overlaps(boxes1, boxes2, mode="iou", offset=1.0):
    """Pairwise IoU / IoF. boxes1 (..., M, 4), boxes2 (..., N, 4) → (..., M, N).

    ``offset=1.0`` reproduces the legacy +1 width convention
    (mmdet/core/bbox/geometry.py); pass 0.0 for the modern convention.
    """
    assert mode in ("iou", "iof")
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + offset, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    area1 = bbox_area(boxes1, offset)[..., :, None]
    if mode == "iou":
        area2 = bbox_area(boxes2, offset)[..., None, :]
        union = area1 + area2 - overlap
    else:
        union = area1
    return overlap / jnp.maximum(union, 1e-6)


def bbox_area(boxes, offset=1.0):
    return (boxes[..., 2] - boxes[..., 0] + offset) * (
        boxes[..., 3] - boxes[..., 1] + offset
    )


def bbox_flip(boxes, img_shape):
    """Horizontal flip (legacy -1), img_shape=(H, W)."""
    w = img_shape[1]
    x1 = w - boxes[..., 2] - 1
    x2 = w - boxes[..., 0] - 1
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def clip_boxes(boxes, img_shape):
    """Clip boxes to [0, W-1] x [0, H-1]; img_shape=(H, W)."""
    h, w = img_shape[0], img_shape[1]
    x1 = jnp.clip(boxes[..., 0], 0, w - 1)
    y1 = jnp.clip(boxes[..., 1], 0, h - 1)
    x2 = jnp.clip(boxes[..., 2], 0, w - 1)
    y2 = jnp.clip(boxes[..., 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
