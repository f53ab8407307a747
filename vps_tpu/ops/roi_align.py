"""RoIAlign — XLA-native, exact semantics of the reference CUDA kernel
(/root/reference/mmdet/ops/roi_align/src/roi_align_kernel.cu:17-123):
legacy +1 roi end offset, (i+0.5)/n in-bin sample grid, the kernel's
particular boundary clamping, zero outside [-1, size].

TPU-first design: instead of the reference's per-level dynamic partition
(mmdet/models/roi_extractors/single_level.py:95-107 — boolean masks +
scatter, shape-dynamic), all FPN levels are flattened into one (ΣHW, C)
buffer and every ROI's 4·S² sample taps become rows of ONE static gather.
Level assignment (floor(log2(√area/56)), single_level.py:54-73) just shifts
each ROI's flat base offset. Autodiff of the gather yields the scatter-add
backward, matching the reference's atomicAdd backward kernel.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _sample_coords(rois, spatial_scale, out_size, sample_num):
    """Per-ROI sample grid. rois (R, 4) → x, y each (R, out*out*sn*sn)."""
    sn = sample_num
    start_w = rois[:, 0] * spatial_scale
    start_h = rois[:, 1] * spatial_scale
    end_w = (rois[:, 2] + 1.0) * spatial_scale
    end_h = (rois[:, 3] + 1.0) * spatial_scale
    roi_w = jnp.maximum(end_w - start_w, 0.0)
    roi_h = jnp.maximum(end_h - start_h, 0.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    p = jnp.arange(out_size, dtype=jnp.float32)
    i = (jnp.arange(sn, dtype=jnp.float32) + 0.5) / sn
    # offsets within the roi, in bin units: (out, sn)
    off = p[:, None] + i[None, :]
    off = off.reshape(-1)  # (out*sn,)
    ys = start_h[:, None] + bin_h[:, None] * off[None, :]  # (R, out*sn)
    xs = start_w[:, None] + bin_w[:, None] * off[None, :]
    # full grid: y outer, x inner → (R, out*sn, out*sn)
    y = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], off.size, off.size))
    x = jnp.broadcast_to(xs[:, None, :], (rois.shape[0], off.size, off.size))
    return x.reshape(rois.shape[0], -1), y.reshape(rois.shape[0], -1)


def _bilinear_weights_and_indices(x, y, height, width):
    """The reference kernel's bilinear_interpolate boundary rules.

    height/width may be scalars or arrays broadcastable to x/y (per-ROI level
    dims). Returns (idx00, idx01, idx10, idx11 flat offsets y*W+x, weights
    w00..w11, in-bounds mask)."""
    inb = (y >= -1.0) & (y <= height) & (x >= -1.0) & (x <= width)
    y = jnp.maximum(y, 0.0)
    x = jnp.maximum(x, 0.0)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    h1 = (height - 1).astype(jnp.int32) if hasattr(height, "astype") else int(height) - 1
    w1 = (width - 1).astype(jnp.int32) if hasattr(width, "astype") else int(width) - 1
    at_bottom = y_low >= h1
    at_right = x_low >= w1
    y_low = jnp.where(at_bottom, h1, y_low)
    x_low = jnp.where(at_right, w1, x_low)
    y_high = jnp.where(at_bottom, h1, y_low + 1)
    x_high = jnp.where(at_right, w1, x_low + 1)
    y_eff = jnp.where(at_bottom, y_low.astype(y.dtype), y)
    x_eff = jnp.where(at_right, x_low.astype(x.dtype), x)
    ly = y_eff - y_low
    lx = x_eff - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    wint = width.astype(jnp.int32) if hasattr(width, "astype") else int(width)
    idx00 = y_low * wint + x_low
    idx01 = y_low * wint + x_high
    idx10 = y_high * wint + x_low
    idx11 = y_high * wint + x_high
    return (idx00, idx01, idx10, idx11), (hy * hx, hy * lx, ly * hx, ly * lx), inb


def _nearest_weights_and_indices(x, y, height, width):
    """Nearest-pixel sampling (fast preset): one gather per sample tap
    instead of four. Same out-of-bounds rule as the bilinear kernel."""
    inb = (y >= -1.0) & (y <= height) & (x >= -1.0) & (x <= width)
    h1 = (height - 1) if hasattr(height, "astype") else float(height) - 1
    w1 = (width - 1) if hasattr(width, "astype") else float(width) - 1
    yn = jnp.clip(jnp.round(y), 0.0, h1).astype(jnp.int32)
    xn = jnp.clip(jnp.round(x), 0.0, w1).astype(jnp.int32)
    wint = width.astype(jnp.int32) if hasattr(width, "astype") else int(width)
    return (yn * wint + xn,), (jnp.ones_like(x),), inb


def roi_align(feat, rois, spatial_scale, out_size, sample_num=2, valid=None,
              sampling="bilinear"):
    """Single-level RoIAlign. feat (H, W, C); rois (R, 4) image coords.

    Returns (R, out, out, C)."""
    h, w, c = feat.shape
    r = rois.shape[0]
    x, y = _sample_coords(rois, spatial_scale, out_size, sample_num)
    if sampling == "nearest":
        idxs, ws, inb = _nearest_weights_and_indices(
            x, y, jnp.float32(h), jnp.float32(w))
    else:
        idxs, ws, inb = _bilinear_weights_and_indices(
            x, y, jnp.float32(h), jnp.float32(w))
    flat = feat.reshape(h * w, c)
    out = 0.0
    for idx, wgt in zip(idxs, ws):
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(r, -1, c)
        out = out + vals * wgt[..., None]
    out = out * inb[..., None]
    # point layout: ((ph, iy), (pw, ix)) → average over the sample axes
    out = out.reshape(r, out_size, sample_num, out_size, sample_num, c).mean(
        axis=(2, 4)
    )
    if valid is not None:
        out = out * valid[:, None, None, None]
    return out


def _multilevel_taps(rois, shapes, strides, out_size, sample_num,
                     finest_scale, sampling):
    """Shared fwd/bwd tap computation: per-ROI level assignment + flat
    gather indices, bilinear weights and in-bounds mask. Pure index math —
    no feature dependence, so the custom backward can recompute it instead
    of saving residuals."""
    num_levels = len(shapes)
    r = rois.shape[0]

    # Level assignment (single_level.py:69-73).
    scale = jnp.sqrt(
        (rois[:, 2] - rois[:, 0] + 1.0) * (rois[:, 3] - rois[:, 1] + 1.0)
    )
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)

    hs = jnp.asarray([s[0] for s in shapes], jnp.float32)
    ws = jnp.asarray([s[1] for s in shapes], jnp.float32)
    sizes = [s[0] * s[1] for s in shapes]
    offsets = jnp.asarray(
        [0] + list(jnp.cumsum(jnp.asarray(sizes))[:-1]), jnp.int32
    )
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    roi_scale = scales[lvl]  # (R,)
    roi_h = hs[lvl]
    roi_w = ws[lvl]
    roi_off = offsets[lvl]

    # Sample coordinates in the assigned level's frame.
    sn = sample_num
    start_w = rois[:, 0] * roi_scale
    start_h = rois[:, 1] * roi_scale
    end_w = (rois[:, 2] + 1.0) * roi_scale
    end_h = (rois[:, 3] + 1.0) * roi_scale
    bin_w = jnp.maximum(end_w - start_w, 0.0) / out_size
    bin_h = jnp.maximum(end_h - start_h, 0.0) / out_size
    p = jnp.arange(out_size, dtype=jnp.float32)
    i = (jnp.arange(sn, dtype=jnp.float32) + 0.5) / sn
    off = (p[:, None] + i[None, :]).reshape(-1)
    ys = start_h[:, None] + bin_h[:, None] * off[None, :]
    xs = start_w[:, None] + bin_w[:, None] * off[None, :]
    y = jnp.broadcast_to(ys[:, :, None], (r, off.size, off.size)).reshape(r, -1)
    x = jnp.broadcast_to(xs[:, None, :], (r, off.size, off.size)).reshape(r, -1)

    if sampling == "nearest":
        idxs, wgts, inb = _nearest_weights_and_indices(
            x, y, roi_h[:, None], roi_w[:, None]
        )
    else:
        idxs, wgts, inb = _bilinear_weights_and_indices(
            x, y, roi_h[:, None], roi_w[:, None]
        )
    gidxs = tuple((idx + roi_off[:, None]).reshape(-1) for idx in idxs)
    return gidxs, wgts, inb


def _mra_forward(feats, rois, valid, strides, out_size, sample_num,
                 finest_scale, sampling):
    c = feats[0].shape[-1]
    r = rois.shape[0]
    sn = sample_num
    shapes = tuple((f.shape[0], f.shape[1]) for f in feats)
    gidxs, wgts, inb = _multilevel_taps(
        rois, shapes, strides, out_size, sample_num, finest_scale, sampling)
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    out = 0.0
    for gidx, wgt in zip(gidxs, wgts):
        vals = jnp.take(flat, gidx, axis=0).reshape(r, -1, c)
        out = out + vals * wgt[..., None]
    out = out * inb[..., None]
    out = out.reshape(r, out_size, sn, out_size, sn, c).mean(axis=(2, 4))
    if valid is not None:
        out = out * valid[:, None, None, None]
    return out


from functools import partial as _partial

import jax


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _mra_cvjp(feats, rois, valid, strides, out_size, sample_num,
              finest_scale, sampling, meta):
    return _mra_forward(feats, rois, valid, strides, out_size, sample_num,
                        finest_scale, sampling)


def _mra_cvjp_fwd(feats, rois, valid, strides, out_size, sample_num,
                  finest_scale, sampling, meta):
    out = _mra_forward(feats, rois, valid, strides, out_size, sample_num,
                       finest_scale, sampling)
    return out, (rois, valid)


def _mra_cvjp_bwd(strides, out_size, sample_num, finest_scale, sampling,
                  meta, res, ct):
    """Features-only gradient, written out as the explicit scatter-add the
    reference's backward kernel performs (roi_align_kernel.cu:126-208
    atomicAdd of the four bilinear corner weights). ROI coordinates and the
    validity mask are non-differentiable — exactly the reference semantics,
    where the backward never differentiates w.r.t. the box coordinates.
    Accumulates in f32 regardless of the (possibly bf16) feature dtype.
    ``meta`` statically carries the per-level (shape, dtype-name)."""
    rois, valid = res
    shapes = tuple(s for s, _ in meta)
    dtypes = tuple(dt for _, dt in meta)
    r = rois.shape[0]
    c = ct.shape[-1]
    sn = sample_num
    gidxs, wgts, inb = _multilevel_taps(
        rois, shapes, strides, out_size, sample_num, finest_scale, sampling)
    ct = ct.astype(jnp.float32)
    if valid is not None:
        ct = ct * valid[:, None, None, None].astype(jnp.float32)
    # undo the bin mean: every (sn, sn) sample in a bin receives ct/sn².
    ct_s = jnp.broadcast_to(
        ct[:, :, None, :, None, :] / float(sn * sn),
        (r, out_size, sn, out_size, sn, c),
    ).reshape(r, -1, c)
    ct_s = ct_s * inb[..., None]
    total = sum(s[0] * s[1] for s in shapes)
    flat_ct = jnp.zeros((total, c), jnp.float32)
    for gidx, wgt in zip(gidxs, wgts):
        contrib = (ct_s * wgt[..., None].astype(jnp.float32)).reshape(-1, c)
        flat_ct = flat_ct.at[gidx].add(contrib)
    grads = []
    start = 0
    for (h, w), dt in zip(shapes, dtypes):
        grads.append(flat_ct[start:start + h * w].reshape(h, w, c).astype(dt))
        start += h * w
    return grads, jnp.zeros_like(rois), (
        None if valid is None else jnp.zeros_like(valid))


_mra_cvjp.defvjp(_mra_cvjp_fwd, _mra_cvjp_bwd)


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    out_size: int,
    sample_num: int = 2,
    finest_scale: int = 56,
    valid=None,
    sampling: str = "bilinear",
):
    """FPN RoIAlign with level mapping, one fused gather.

    feats: list of (H_l, W_l, C) for strides[l]; rois (R, 4) image coords.
    Returns (R, out, out, C).

    The backward is a hand-written custom_vjp (features-only scatter-add,
    reference roi_align_kernel.cu backward semantics) rather than autodiff:
    it keeps the training backward graph free of the dead coordinate/weight
    gradient chains autodiff builds, accumulates in f32 under bf16 feature
    compute, and pins the op's backward schedule independent of how XLA
    fuses the surrounding graph."""
    meta = tuple(((f.shape[0], f.shape[1]), jnp.dtype(f.dtype).name)
                 for f in feats)
    return _mra_cvjp(list(feats), rois, valid, tuple(strides), int(out_size),
                     int(sample_num), int(finest_scale), sampling, meta)


def multilevel_roi_align_autodiff(
    feats, rois, strides, out_size, sample_num=2, finest_scale=56,
    valid=None, sampling="bilinear",
):
    """Plain-autodiff variant (no custom_vjp) kept for backward-parity
    tests against the hand-written scatter."""
    return _mra_forward(list(feats), rois, valid, tuple(strides),
                        int(out_size), int(sample_num), int(finest_scale),
                        sampling)
