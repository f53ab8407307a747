"""Mask cropping (training targets) and mask pasting (inference / panoptic
fusion), batched and on-device.

Replaces (a) the reference's per-ROI numpy crop+imresize in
/root/reference/mmdet/core/mask/mask_target.py and (b) the per-instance
python paste loops in mmdet/models/utils/unary_logits.py:26-67 (MaskTerm)
and mask_heads/fcn_mask_head.py:184-238 (get_seg_masks) — the reference's
biggest host↔device ping-pong (SURVEY.md §3 hot-loop 3). Here both are one
vmapped bilinear resample, jit-compatible and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_and_resize_masks(gt_masks, boxes, out_size: int):
    """Crop each box out of its mask and resize to (out_size, out_size).

    gt_masks: (N, H, W) {0,1}; boxes: (N, 4) image coords. Bilinear sampling
    at the centers of an out_size grid spanning the box (matching
    mmcv.imresize of the cropped integer window closely enough for training
    targets; the reference binarizes at the end anyway).
    Returns float (N, out_size, out_size).
    """
    n, h, w = gt_masks.shape

    def one(mask, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x2 - x1 + 1.0, 1.0)
        bh = jnp.maximum(y2 - y1 + 1.0, 1.0)
        ys = y1 + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size * bh - 0.5
        xs = x1 + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size * bw - 0.5
        yy = jnp.broadcast_to(ys[:, None], (out_size, out_size))
        xx = jnp.broadcast_to(xs[None, :], (out_size, out_size))
        return _bilinear_2d(mask.astype(jnp.float32), yy, xx)

    return jax.vmap(one)(gt_masks, boxes)


def crop_and_resize_indexed(mask_stack, mask_idx, boxes, out_size: int):
    """Like crop_and_resize_masks, but each ROI crops ``mask_stack[mask_idx]``
    via a single flat gather — never materializing the gathered (R, H, W)
    stack (important when R≫G, e.g. 512 sampled ROIs over ≤100 gt masks).

    mask_stack: (G, H, W); mask_idx: (R,) int; boxes: (R, 4).
    Returns (R, out_size, out_size) float.
    """
    g, h, w = mask_stack.shape
    r = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1 + 1.0, 1.0)
    bh = jnp.maximum(y2 - y1 + 1.0, 1.0)
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    ys = y1[:, None] + grid[None, :] * bh[:, None] - 0.5  # (R, o)
    xs = x1[:, None] + grid[None, :] * bw[:, None] - 0.5
    yy = jnp.broadcast_to(ys[:, :, None], (r, out_size, out_size))
    xx = jnp.broadcast_to(xs[:, None, :], (r, out_size, out_size))

    x0 = jnp.clip(jnp.floor(xx), 0, w - 1)
    y0 = jnp.clip(jnp.floor(yy), 0, h - 1)
    x1i = jnp.clip(x0 + 1, 0, w - 1)
    y1i = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(xx - x0, 0.0, 1.0)
    wy = jnp.clip(yy - y0, 0.0, 1.0)
    base = (mask_idx * (h * w))[:, None, None]
    flat = mask_stack.reshape(-1).astype(jnp.float32)

    def g4(yi, xi):
        return flat[(base + yi.astype(jnp.int32) * w + xi.astype(jnp.int32))]

    v00, v01 = g4(y0, x0), g4(y0, x1i)
    v10, v11 = g4(y1i, x0), g4(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _bilinear_2d(img, y, x):
    """Bilinear sample single-channel (H, W) at float coords, border clamp."""
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, x1i, y0i, y1i = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    flat = img.reshape(-1)
    v00 = flat[y0i * w + x0i]
    v01 = flat[y0i * w + x1i]
    v10 = flat[y1i * w + x0i]
    v11 = flat[y1i * w + x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def paste_masks(masks, boxes, out_hw, binarize=None):
    """Paste per-instance mask patches into full-resolution planes.

    masks: (N, m, m) logits or probabilities; boxes: (N, 4) in output coords;
    out_hw: (H, W). For each output pixel inside box i, bilinearly samples
    mask i at the corresponding patch coordinate (align, as the reference's
    cv2/np paste does with integer box rounding — we use the same rounded
    integer box: w = max(x2-x1+1, 1)). Outside the box the value is 0.

    Returns (N, H, W) float. If ``binarize`` is a float, thresholds instead.
    """
    h, w = out_hw
    n, m, _ = masks.shape

    x1 = jnp.round(boxes[:, 0])
    y1 = jnp.round(boxes[:, 1])
    bw = jnp.maximum(jnp.round(boxes[:, 2]) - x1 + 1.0, 1.0)
    bh = jnp.maximum(jnp.round(boxes[:, 3]) - y1 + 1.0, 1.0)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    def one(mask, bx1, by1, bbw, bbh):
        # map image pixel centers into the m×m patch frame
        my = (ys - by1 + 0.5) * (m / bbh) - 0.5
        mx = (xs - bx1 + 0.5) * (m / bbw) - 0.5
        yy = jnp.broadcast_to(my[:, None], (h, w))
        xx = jnp.broadcast_to(mx[None, :], (h, w))
        vals = _bilinear_2d(mask, yy, xx)
        inside = (
            (yy > -1.0) & (yy < m) & (xx > -1.0) & (xx < m)
        )
        return jnp.where(inside, vals, 0.0)

    out = jax.vmap(one)(masks, x1, y1, bw, bh)
    if binarize is not None:
        out = (out > binarize).astype(jnp.float32)
    return out
