"""Dense warping ops: grid_sample, flow warping (Resample2d), channel norm.

TPU-native replacements for the reference's CUDA packages
(/root/reference/mmdet/models/flow_modules/{resample2d,channelnorm}_package
and the `WarpingLayer` in flow_modules.py:131-152). All pure jnp: bilinear
sampling lowers to gathers over the flattened spatial axis, which XLA fuses
with the surrounding elementwise work; autodiff gives the backward passes.

Layout is NHWC (TPU-native). Flow tensors are (B, H, W, 2) with flow[..., 0]
= horizontal (x) displacement in pixels, flow[..., 1] = vertical (y), same
as the reference's channel order.
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this channel count, bilinear sampling is descriptor-bound on TPU
# (measured ~7 ns/gather-row regardless of row width up to ~16ch), so the
# packed-corner formulation — ONE gather from a 4C-wide shifted-copies pack —
# is ~3.5× faster (13.6 → ~4 ms for a 512×1024×3 warp on v5e). At ≥128ch
# gathers are bandwidth-bound (~75 GB/s effective) and packing only adds the
# pack-build traffic, so the plain 4-gather form wins there.
_PACK_MAX_CHANNELS = 16


def _gather_bilinear_packed(img, x, y, padding_mode="zeros"):
    """Packed-corner bilinear sampling for few-channel images: all four
    corners ride in one gather row from a (H+2, W+2, 4C) shifted pack."""
    b, h, w, c = img.shape
    out_shape = x.shape

    if padding_mode == "border":
        x = jnp.clip(x, 0, w - 1)
        y = jnp.clip(y, 0, h - 1)
        mode = "edge"
    else:
        mode = "constant"
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    if padding_mode != "border":
        # per-corner in-bounds masks on the UNCLIPPED corners
        m00 = ((x0 >= 0) & (x0 <= w - 1) & (y0 >= 0) & (y0 <= h - 1))[..., None]
        m01 = ((x0 >= -1) & (x0 <= w - 2) & (y0 >= 0) & (y0 <= h - 1))[..., None]
        m10 = ((x0 >= 0) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 2))[..., None]
        m11 = ((x0 >= -1) & (x0 <= w - 2) & (y0 >= -1) & (y0 <= h - 2))[..., None]

    # pack: index (y0+1, x0+1) into a both-sides-padded copy so corner i+1
    # lands in the next channel slot; clip base corners to [-1, size-1]
    xp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    pack = jnp.concatenate(
        [
            xp[:, 0 : h + 1, 0 : w + 1],
            xp[:, 0 : h + 1, 1 : w + 2],
            xp[:, 1 : h + 2, 0 : w + 1],
            xp[:, 1 : h + 2, 1 : w + 2],
        ],
        axis=-1,
    )  # (B, H+1, W+1, 4C); pack[y+1... indexed at (y0+1, x0+1)]
    x0i = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    y0i = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    flat = pack.reshape(b, (h + 1) * (w + 1), 4 * c)
    idx = (y0i * (w + 1) + x0i).reshape(b, -1)
    v = jnp.take_along_axis(flat, idx[..., None], axis=1)
    v = v.reshape(*out_shape, 4 * c)
    v00, v01, v10, v11 = v[..., :c], v[..., c:2 * c], v[..., 2 * c:3 * c], v[..., 3 * c:]
    if padding_mode != "border":
        z = jnp.zeros((), v.dtype)
        v00 = jnp.where(m00, v00, z)
        v01 = jnp.where(m01, v01, z)
        v10 = jnp.where(m10, v10, z)
        v11 = jnp.where(m11, v11, z)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _gather_nearest(img, x, y, padding_mode="zeros"):
    """Nearest-pixel sampling: ONE gather instead of four. TPU gathers are
    index-bound (PERF.md), so this quarters a warp's cost — the fast-preset
    approximation; bilinear is the reference's exact semantics."""
    b, h, w, c = img.shape
    out_shape = x.shape
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    if padding_mode == "border":
        mask = None
    else:
        mask = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    flat = img.reshape(b, h * w, c)
    idx = (yi * w + xi).reshape(b, -1)
    vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
    vals = vals.reshape(*out_shape, c)
    if mask is not None:
        vals = vals * mask[..., None].astype(vals.dtype)
    return vals


def _gather_bilinear(img, x, y, padding_mode="zeros"):
    """Sample img (B, H, W, C) at float pixel coords x, y (B, ...)."""
    b, h, w, c = img.shape
    if c <= _PACK_MAX_CHANNELS:
        return _gather_bilinear_packed(img, x, y, padding_mode)
    out_shape = x.shape  # (B, ...)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def sample(yi, xi):
        if padding_mode == "border":
            xi_c = jnp.clip(xi, 0, w - 1)
            yi_c = jnp.clip(yi, 0, h - 1)
            mask = None
        else:  # zeros
            mask = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            xi_c = jnp.clip(xi, 0, w - 1)
            yi_c = jnp.clip(yi, 0, h - 1)
        flat = img.reshape(b, h * w, c)
        idx = (yi_c * w + xi_c).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*out_shape, c)
        if mask is not None:
            vals = vals * mask[..., None].astype(vals.dtype)
        return vals

    v00 = sample(y0, x0)
    v01 = sample(y0, x1)
    v10 = sample(y1, x0)
    v11 = sample(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample(img, grid, align_corners=False, padding_mode="zeros",
                sampling="bilinear"):
    """torch.nn.functional.grid_sample equivalent (bilinear).

    img: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized coords in [-1, 1],
    grid[..., 0] = x, grid[..., 1] = y.
    """
    h, w = img.shape[1], img.shape[2]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    if sampling == "nearest":
        return _gather_nearest(img, x, y, padding_mode=padding_mode)
    return _gather_bilinear(img, x, y, padding_mode=padding_mode)


def flow_warp(x, flow, align_corners=False, sampling="bilinear"):
    """Warp ``x`` by ``flow`` exactly as the reference's `WarpingLayer`
    (flow_modules.py:131-152): a linspace(-1, 1) base grid plus flow
    normalized by (size-1)/2, passed through grid_sample with torch-1.4
    defaults (bilinear, zeros padding, align_corners=False)."""
    b, h, w, _ = x.shape
    base_x = jnp.linspace(-1.0, 1.0, w)[None, None, :]
    base_y = jnp.linspace(-1.0, 1.0, h)[None, :, None]
    gx = base_x + flow[..., 0] / ((w - 1.0) / 2.0)
    gy = base_y + flow[..., 1] / ((h - 1.0) / 2.0)
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(x, grid, align_corners=align_corners,
                       padding_mode="zeros", sampling=sampling)


def resample2d(x, flow):
    """FlowNet2's Resample2d CUDA op (resample2d_kernel.cu): sample ``x`` at
    unnormalized (pix + flow) with bilinear interpolation and border clamp."""
    b, h, w, _ = x.shape
    xs = jnp.arange(w, dtype=flow.dtype)[None, None, :] + flow[..., 0]
    ys = jnp.arange(h, dtype=flow.dtype)[None, :, None] + flow[..., 1]
    return _gather_bilinear(x, xs, ys, padding_mode="border")


def channel_norm(x, p=2.0):
    """L_p norm across channels → (B, H, W, 1); the reference's ChannelNorm
    CUDA op (channelnorm_kernel.cu, norm_deg=2)."""
    if p == 2.0:
        return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return jnp.sum(jnp.abs(x) ** p, axis=-1, keepdims=True) ** (1.0 / p)
