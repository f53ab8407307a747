"""RoIPool and deformable RoI pooling — TPU-native formulations.

Replaces the reference CUDA ops /root/reference/mmdet/ops/roi_pool/src/
roi_pool_kernel.cu (max pooling over ROI bins) and
mmdet/ops/dcn/src/deform_pool_cuda_kernel.cu (position-sensitive deformable
pooling, "available but unused by VPS configs" per SURVEY §2.3 #4/#6 —
provided for capability parity).

Design: like roi_align, every bin is realized as a fixed grid of bilinear /
nearest taps (static shapes) with a max / mean reduction — one gather plus
one reduction, autodiff gives the scatter backward that the reference
implements by hand with atomics.
"""

from __future__ import annotations

import jax.numpy as jnp

from vps_tpu.ops.warp import _gather_bilinear


def roi_pool(feat, rois, spatial_scale, out_size, samples_per_bin=4, valid=None):
    """Max-pool each ROI bin. feat (H, W, C); rois (R, 4) image coords.

    The CUDA kernel maxes over every integer cell in the bin; with static
    shapes we max over a fixed `samples_per_bin`² grid of nearest-cell taps,
    which covers every cell for bins up to samples_per_bin px — the RCNN
    regime (7×7 bins over ≤224 px ROIs at 1/16 scale ⇒ ≤2 px bins).
    Returns (R, out, out, C)."""
    h, w, c = feat.shape
    r = rois.shape[0]
    sn = samples_per_bin

    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale)
    y2 = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    p = jnp.arange(out_size, dtype=jnp.float32)
    i = (jnp.arange(sn, dtype=jnp.float32) + 0.5) / sn
    off = (p[:, None] + i[None, :]).reshape(-1)  # (out*sn,)
    ys = jnp.floor(y1[:, None] + bin_h[:, None] * off[None, :])
    xs = jnp.floor(x1[:, None] + bin_w[:, None] * off[None, :])
    ys = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
    xs = jnp.clip(xs, 0, w - 1).astype(jnp.int32)

    yy = jnp.broadcast_to(ys[:, :, None], (r, off.size, off.size))
    xx = jnp.broadcast_to(xs[:, None, :], (r, off.size, off.size))
    idx = (yy * w + xx).reshape(r, -1)
    vals = jnp.take(feat.reshape(-1, c), idx.reshape(-1), axis=0).reshape(
        r, off.size, off.size, c
    )
    out = vals.reshape(r, out_size, sn, out_size, sn, c).max(axis=(2, 4))
    if valid is not None:
        out = out * valid[:, None, None, None]
    return out


def deform_roi_pool(
    feat,
    rois,
    offsets,
    spatial_scale,
    out_size,
    sample_num=2,
    gamma=0.1,
    valid=None,
):
    """Modulated deformable RoI pooling (deform_pool_cuda_kernel.cu):
    average-pool bilinear taps at bin positions shifted by learned per-bin
    offsets (scaled by gamma·roi size). feat (H, W, C); rois (R, 4);
    offsets (R, out, out, 2) as (dy, dx) in normalized roi units or None.
    Returns (R, out, out, C)."""
    h, w, c = feat.shape
    r = rois.shape[0]
    sn = sample_num

    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = (rois[:, 2] + 1.0) * spatial_scale - 0.5
    y2 = (rois[:, 3] + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    p = jnp.arange(out_size, dtype=jnp.float32)
    i = (jnp.arange(sn, dtype=jnp.float32) + 0.5) / sn
    off = (p[:, None] + i[None, :]).reshape(-1)
    ys = y1[:, None] + bin_h[:, None] * off[None, :]
    xs = x1[:, None] + bin_w[:, None] * off[None, :]
    y = jnp.broadcast_to(ys[:, :, None], (r, off.size, off.size))
    x = jnp.broadcast_to(xs[:, None, :], (r, off.size, off.size))

    if offsets is not None:
        dy = jnp.repeat(jnp.repeat(offsets[..., 0], sn, 1), sn, 2)
        dx = jnp.repeat(jnp.repeat(offsets[..., 1], sn, 1), sn, 2)
        y = y + gamma * roi_h[:, None, None] * dy
        x = x + gamma * roi_w[:, None, None] * dx

    sampled = _gather_bilinear(feat[None], x[None], y[None])[0]  # (R,S,S,C)
    out = sampled.reshape(r, out_size, sn, out_size, sn, c).mean(axis=(2, 4))
    if valid is not None:
        out = out * valid[:, None, None, None]
    return out
