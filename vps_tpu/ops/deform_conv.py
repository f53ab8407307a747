"""Deformable convolution v1/v2 — TPU-native formulation.

Replaces the reference's 1.6k-line CUDA implementation
(/root/reference/mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu), which sits on
the hot path through the UPSNet semantic head
(mmdet/models/utils/deform_conv_with_offset.py, upsnetFPN.py:15-81).

Design: deformable conv = bilinear-sample the input at every (output
location × kernel tap) position, then contract taps×channels with the weight
— i.e. a gather followed by one big matmul that lands on the MXU:

    sampled[b, y, x, k, ci] = bilinear(x_in, p0(y, x, k) + Δp[b, y, x, k])
    out[b, y, x, co] = Σ_{k, ci} sampled · W[k, ci, co]

Offset layout matches the CUDA kernel: 2·K channels, pairs (Δy, Δx) per tap
k = i·kw + j (row-major taps). Autodiff through the gather+matmul gives the
exact backward (input, offset, and weight grads), replacing the reference's
three hand-written backward kernels. ``mask`` enables modulated (v2) conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# v5e gathers are INDEX-bound with a flat per-index cost for slices up to
# ~512 B (PERF.md gather table). Pairing each pixel with its right neighbour
# on the channel axis halves the bilinear corner gathers (4 -> 2 per tap)
# at unchanged per-index cost — but only while the paired slice stays under
# the 512 B cliff (beyond it the per-index cost jumps ~4x, which is exactly
# why the round-2 256-ch pairing experiment lost: 23.6 -> 28.6 ms).
#
# Round-3 A/B at bench.py level (the only decision level, per PERF.md):
# even scoped to the 128-ch bf16 semantic tower (paired slice exactly 512 B)
# xpair measured 4.93 fps vs 5.02 off — the pair-table build (a full 2x HBM
# copy of every level per conv) plus sitting ON the slice-width cliff eat
# the halved index count. Default is therefore OFF; VPS_TPU_XPAIR=1 opts in
# for future A/B on other geometries.
_XPAIR_MAX_SLICE_BYTES = 512


# Snapshotted ONCE at import: the flag is read at TRACE time, so mutating
# the env var after a function is jitted/cached would silently have no
# effect anyway. Import-time snapshot makes that explicit — bench A/B runs
# must set VPS_TPU_XPAIR in the child process env, never mid-process.
_XPAIR_ENV_OPTIN = __import__("os").environ.get("VPS_TPU_XPAIR", "0") == "1"


def _xpair_profitable(cin: int, dtype) -> bool:
    if not _XPAIR_ENV_OPTIN:  # opt-in: rejected by A/B (see PERF.md)
        return False
    return 2 * cin * jnp.dtype(dtype).itemsize <= _XPAIR_MAX_SLICE_BYTES


def _xpair_table(x):
    """(B, H, W, C) -> (B, H, W+1, 2C) pair table over x0 in [-1, W-1]:
    table[:, :, x0 + 1] = [X[x0] (zero at x0 = -1), X[x0 + 1] (clamped at
    the right edge — that corner's weight is zeroed by the caller)]."""
    left = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))
    right = jnp.concatenate([x, x[:, :, -1:]], axis=2)
    return jnp.concatenate([left, right], axis=-1)


def deform_conv2d(
    x,
    offset,
    weight,
    bias=None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask=None,
    sampling: str = "bilinear",
    xpair: bool | None = None,
):
    """x: (B, H, W, Cin); offset: (B, Ho, Wo, 2K); weight: (kh, kw, Cin, Cout);
    mask (modulation, v2): (B, Ho, Wo, K) or None. Returns (B, Ho, Wo, Cout).

    sampling="nearest" rounds each sample position to the nearest pixel —
    ONE gather per tap instead of four. A documented approximation for
    inference-speed presets (TPU gathers are index-bound, see PERF.md);
    "bilinear" is the reference's exact semantics.

    xpair: gather both x-corners of a bilinear sample in ONE gather from a
    right-neighbour pair table (2 gathers/tap instead of 4, identical math
    up to f32 addition order). None = auto: OFF unless VPS_TPU_XPAIR=1 —
    rejected at bench level (see _xpair_profitable / PERF.md), kept as a
    measured formulation for future A/B on other geometries.
    """
    if xpair and sampling != "bilinear":
        raise ValueError(
            f"xpair=True requires sampling='bilinear' (got {sampling!r}): "
            "the pair table halves bilinear corner gathers and has no "
            "nearest-sampling meaning"
        )
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weight.shape
    k = kh * kw
    ho, wo = offset.shape[1], offset.shape[2]

    off = offset.reshape(b, ho, wo, k, 2)

    # Per-tap accumulation: for each kernel tap, one bilinear gather of the
    # full map followed by a (HW, Cin)·(Cin, Cout) matmul-accumulate. Never
    # materializes the (B, Ho, Wo, K, Cin) sample tensor (1.2 GB at VPS
    # shapes) — measured 1.5× faster than the fused-gather formulation on
    # TPU, with the matmuls riding the MXU.
    # (A gather-from-Y variant — sampling Y_k = X @ W_k when Cout < Cin to
    # move fewer bytes per gathered pixel — measured 7% faster in isolation
    # but a net 4% FPS regression composed into the full FuseTrack frame:
    # the 9 materialized tap maps blow the working set. Gathers here are
    # index-bound on v5e (~0.6 ms / 131k indices), not byte-bound.)
    use_xpair = (
        sampling == "bilinear"
        and (xpair if xpair is not None else _xpair_profitable(cin, x.dtype))
    )
    if use_xpair:
        pair = _xpair_table(x).reshape(b, h * (w + 1), 2 * cin)
    else:
        flat = x.reshape(b, h * w, cin)
    # grids in f32 ALWAYS: a bf16 grid quantizes integer positions > 256
    # (8 mantissa bits), shifting sample points by up to 2 px on wide maps
    ys_grid = jnp.arange(ho, dtype=jnp.float32)[None, :, None] * stride - padding
    xs_grid = jnp.arange(wo, dtype=jnp.float32)[None, None, :] * stride - padding
    out = jnp.zeros((b, ho, wo, cout), jnp.float32)
    for ki in range(k):
        dy = (ki // kw) * dilation
        dx = (ki % kw) * dilation
        ys = ys_grid + dy + off[..., ki, 0]
        xs = xs_grid + dx + off[..., ki, 1]
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        wy = ys - y0
        wx = xs - x0
        if use_xpair:
            # one gather per y-corner fetches BOTH x-corners (2C slice)
            inb_l = (x0 >= 0) & (x0 <= w - 1)
            inb_r = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
            ix = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
            acc = 0.0
            for yy, wgt_y in ((y0, 1 - wy), (y0 + 1, wy)):
                inb_y = (yy >= 0) & (yy <= h - 1)
                idx = (
                    jnp.clip(yy, 0, h - 1).astype(jnp.int32) * (w + 1) + ix
                ).reshape(b, -1)
                g = jnp.take_along_axis(pair, idx[..., None], axis=1).reshape(
                    b, ho, wo, 2 * cin
                )
                wl = wgt_y * (1 - wx) * (inb_y & inb_l)
                wr = wgt_y * wx * (inb_y & inb_r)
                acc = acc + (
                    g[..., :cin] * wl[..., None] + g[..., cin:] * wr[..., None]
                )
            if mask is not None:
                acc = acc * mask[..., ki, None]
            out = out + jnp.einsum(
                "bhwi,io->bhwo",
                acc.astype(x.dtype),
                weight[ki // kw, ki % kw],
                preferred_element_type=jnp.float32,
            )
            continue
        if sampling == "nearest":
            corners = ((jnp.round(ys), jnp.round(xs), jnp.ones_like(wy)),)
        else:
            corners = (
                (y0, x0, (1 - wy) * (1 - wx)),
                (y0, x0 + 1, (1 - wy) * wx),
                (y0 + 1, x0, wy * (1 - wx)),
                (y0 + 1, x0 + 1, wy * wx),
            )
        acc = 0.0
        for yy, xx, wgt in corners:
            inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            idx = (
                jnp.clip(yy, 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            ).reshape(b, -1)
            vals = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(
                b, ho, wo, cin
            )
            acc = acc + vals * (wgt * inb)[..., None]
        if mask is not None:
            acc = acc * mask[..., ki, None]
        # keep the matmul operands in the input dtype (bf16 path rides the
        # MXU at full rate); accumulation stays f32 via preferred_element_type
        out = out + jnp.einsum(
            "bhwi,io->bhwo",
            acc.astype(x.dtype),
            weight[ki // kw, ki % kw],
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias
    return out


def deform_conv2d_grouped(
    x,
    offset,
    weight,
    groups: int,
    bias=None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask=None,
    sampling: str = "bilinear",
    xpair: bool | None = None,
):
    """Deformable-GROUP conv (reference DeformConv/ModulatedDeformConv with
    deformable_groups=G, mmdet/ops/dcn/): input channels split into G
    groups, group g sampling with offset slice g (and mask slice g for the
    modulated variant); the conv weight stays full. Implemented as a sum of
    per-group deform_conv2d partials — G is a small static constant.

    offset: (B, Ho, Wo, G*2K); mask: (B, Ho, Wo, G*K) or None;
    weight: (kh, kw, Cin, Cout)."""
    if groups == 1:
        return deform_conv2d(
            x, offset, weight, bias=bias, stride=stride, padding=padding,
            dilation=dilation, mask=mask, sampling=sampling, xpair=xpair,
        )
    cin = x.shape[-1]
    kh, kw = weight.shape[:2]
    k = kh * kw
    assert cin % groups == 0, (cin, groups)
    gc = cin // groups
    out = None
    for g in range(groups):
        o = deform_conv2d(
            x[..., g * gc:(g + 1) * gc],
            offset[..., g * 2 * k:(g + 1) * 2 * k],
            weight[:, :, g * gc:(g + 1) * gc, :],
            stride=stride, padding=padding, dilation=dilation,
            mask=None if mask is None else mask[..., g * k:(g + 1) * k],
            sampling=sampling, xpair=xpair,
        )
        out = o if out is None else out + o
    if bias is not None:
        out = out + bias
    return out


def deform_conv2d_multilevel(
    xs,
    offsets,
    weight,
    padding: int = 1,
    sampling: str = "bilinear",
    xpair: bool | None = None,
):
    """Shared-weight deformable conv over MULTIPLE feature levels with ONE
    gather stream (the UPSNet semantic head's shared tower, upsnetFPN.py:24-36
    applied per FPN level).

    TPU gathers are INDEX-bound (~4.6 ns/index regardless of slice width,
    PERF.md): running the tower per level issues K·4 gathers *per level*
    (144/stage at 4 levels), each paying fixed dispatch + ramp cost — the
    small levels (2-32k indices) are overhead-dominated. Flattening the 4
    levels into one concatenated (Σ H_l·W_l, Cin) table turns that into K·4
    total gathers on one long index stream and K (instead of 4K) MXU
    matmuls, with bitwise-identical per-element math (same corner order,
    same f32 accumulation).

    xs: list of (B, H_l, W_l, Cin); offsets: list of (B, H_l, W_l, 2K);
    weight: (kh, kw, Cin, Cout) SHARED across levels. Returns a list of
    (B, H_l, W_l, Cout)."""
    b, _, _, cin = xs[0].shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    shapes = [x.shape[1:3] for x in xs]
    sizes = [h * w for h, w in shapes]
    bases = []
    base = 0
    for s in sizes:
        bases.append(base)
        base += s
    use_xpair = (
        sampling == "bilinear"
        and (xpair if xpair is not None
             else _xpair_profitable(cin, xs[0].dtype))
    )
    if use_xpair:
        # pair table per level (row stride w+1), concatenated like `flat`
        psizes = [h * (w + 1) for h, w in shapes]
        pbases = []
        pb = 0
        for s in psizes:
            pbases.append(pb)
            pb += s
        pair = jnp.concatenate(
            [_xpair_table(x).reshape(b, s, 2 * cin)
             for x, s in zip(xs, psizes)],
            axis=1,
        )
    else:
        flat = jnp.concatenate(
            [x.reshape(b, s, cin) for x, s in zip(xs, sizes)], axis=1)
    offs = [o.reshape(b, *hw, k, 2) for o, hw in zip(offsets, shapes)]

    grids = []
    for (h, w) in shapes:
        ys_g = jnp.arange(h, dtype=jnp.float32)[None, :, None] - padding
        xs_g = jnp.arange(w, dtype=jnp.float32)[None, None, :] - padding
        grids.append((ys_g, xs_g))

    out = jnp.zeros((b, base, cout), jnp.float32)
    for ki in range(k):
        dy = ki // kw
        dx = ki % kw
        if use_xpair:
            # one gather per y-corner fetches BOTH x-corners (2C slice):
            # 2K gathers/stage on the concatenated level stream vs 4K
            per_y_idx = [[], []]
            per_y_wl = [[], []]
            per_y_wr = [[], []]
            for (h, w), (ys_g, xs_g), off_l, pbase_l in zip(
                shapes, grids, offs, pbases
            ):
                ys = ys_g + dy + off_l[..., ki, 0]
                xq = xs_g + dx + off_l[..., ki, 1]
                y0 = jnp.floor(ys)
                x0 = jnp.floor(xq)
                wy = ys - y0
                wx = xq - x0
                inb_l = (x0 >= 0) & (x0 <= w - 1)
                inb_r = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
                ix = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
                for ci, (yy, wgt_y) in enumerate(((y0, 1 - wy), (y0 + 1, wy))):
                    inb_y = (yy >= 0) & (yy <= h - 1)
                    idx = (
                        jnp.clip(yy, 0, h - 1).astype(jnp.int32) * (w + 1)
                        + ix + pbase_l
                    ).reshape(b, -1)
                    per_y_idx[ci].append(idx)
                    per_y_wl[ci].append(
                        (wgt_y * (1 - wx) * (inb_y & inb_l)).reshape(b, -1))
                    per_y_wr[ci].append(
                        (wgt_y * wx * (inb_y & inb_r)).reshape(b, -1))
            acc = 0.0
            for ci in range(2):
                idx = jnp.concatenate(per_y_idx[ci], axis=1)
                wl = jnp.concatenate(per_y_wl[ci], axis=1)
                wr = jnp.concatenate(per_y_wr[ci], axis=1)
                vals = jnp.take_along_axis(pair, idx[..., None], axis=1)
                acc = acc + (
                    vals[..., :cin] * wl[..., None]
                    + vals[..., cin:] * wr[..., None]
                )
            out = out + jnp.einsum(
                "bni,io->bno",
                acc.astype(xs[0].dtype),
                weight[dy, dx],
                preferred_element_type=jnp.float32,
            )
            continue
        idx_parts, wgt_parts = [], []
        n_corners = 1 if sampling == "nearest" else 4
        per_corner_idx = [[] for _ in range(n_corners)]
        per_corner_wgt = [[] for _ in range(n_corners)]
        for lvl, ((h, w), (ys_g, xs_g), off_l, base_l) in enumerate(
            zip(shapes, grids, offs, bases)
        ):
            ys = ys_g + dy + off_l[..., ki, 0]
            xq = xs_g + dx + off_l[..., ki, 1]
            y0 = jnp.floor(ys)
            x0 = jnp.floor(xq)
            wy = ys - y0
            wx = xq - x0
            if sampling == "nearest":
                corners = ((jnp.round(ys), jnp.round(xq), jnp.ones_like(wy)),)
            else:
                corners = (
                    (y0, x0, (1 - wy) * (1 - wx)),
                    (y0, x0 + 1, (1 - wy) * wx),
                    (y0 + 1, x0, wy * (1 - wx)),
                    (y0 + 1, x0 + 1, wy * wx),
                )
            for ci, (yy, xx, wgt) in enumerate(corners):
                inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
                idx = (
                    jnp.clip(yy, 0, h - 1).astype(jnp.int32) * w
                    + jnp.clip(xx, 0, w - 1).astype(jnp.int32)
                    + base_l
                ).reshape(b, -1)
                per_corner_idx[ci].append(idx)
                per_corner_wgt[ci].append((wgt * inb).reshape(b, -1))
        acc = 0.0
        for ci in range(n_corners):
            idx = jnp.concatenate(per_corner_idx[ci], axis=1)
            wgt = jnp.concatenate(per_corner_wgt[ci], axis=1)
            vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
            acc = acc + vals * wgt[..., None]
        out = out + jnp.einsum(
            "bni,io->bno",
            acc.astype(xs[0].dtype),
            weight[dy, dx],
            preferred_element_type=jnp.float32,
        )
    return [
        out[:, base_l:base_l + s].reshape(b, h, w, cout)
        for base_l, s, (h, w) in zip(bases, sizes, shapes)
    ]


# ---------------------------------------------------------------------------
# Windowed (offset-clamped) deformable conv — Pallas TPU kernel.
#
# The exact gather formulation above is HBM-gather-bound: K·4 = 36 full-map
# gathers per conv ≈ byte-limited at ~75 GB/s effective (measured v5e), which
# makes the UPSNet semantic head (12 deform convs, SURVEY §2.3 row 5) the
# most expensive block of the whole frame. With per-tap offsets clamped to a
# static window ±R, the bilinear sample becomes a DENSE sum over the
# (2R+2)² integer displacements with per-pixel hat weights
#     samp_k(p) = Σ_{dy,dx} max(0,1-|Δy_k-dy|)·max(0,1-|Δx_k-dx|)·Y_k(p+k+d)
# where Y_k = X @ W_k rides the MXU once, and every slice is STATIC — no
# gathers at all. Each Pallas tile holds one haloed window of all 9 Y_k maps
# in VMEM; displacement passes whose hat weights vanish on the whole tile
# are skipped at runtime (offsets are usually ≪ R, so most passes skip).
#
# Numerics inside the window are EXACT w.r.t. the reference CUDA kernel
# (bilinear with zeros outside the feature map); offsets are clip()ed to
# [-R, R] first — the one (documented) divergence. window=None keeps the
# exact unclamped gather path.
# ---------------------------------------------------------------------------


def _windowed_ref(x, offset, weight, bias=None, padding=1, window=4,
                  mask=None):
    """XLA reference for the windowed kernel: clamp offsets, then the exact
    gather formulation. Also the backward path (autodiff through this is
    the true gradient of the clamped forward)."""
    b, h, w_, cin = x.shape
    kh, kw, _, _ = weight.shape
    k = kh * kw
    off = offset.reshape(*offset.shape[:-1], k, 2)
    off = jnp.clip(off, -float(window), float(window))
    return deform_conv2d(
        x, off.reshape(offset.shape), weight, bias=bias, padding=padding,
        mask=mask,
    )


def _dcw_kernel(off_ref, y_hbm, out_ref, win_ref, acc_ref, sems, *,
                R, th, tw, rh, cb, kh, kw, pad, kk, nwb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    c = pl.program_id(2)
    pl_lo = R + pad
    nbk = pl.num_programs(2) * kk

    # Per-(tap, col-block) haloed row strip (rh, twp, cb), double-buffered.
    # The HBM source is pre-tiled by XLA into overlapping column blocks so
    # the DMA slices ONE leading index + a row range with the trailing two
    # dims (cols, channels) FULL — the only multi-dim HBM->VMEM copy shape
    # Mosaic executes correctly here (two sliced/strided outer dims fault
    # the DMA engine; verified empirically on v5e).
    def cp(k, slot):
        return pltpu.make_async_copy(
            y_hbm.at[j * nbk + c * kk + k, pl.ds(i * th, rh)],
            win_ref.at[slot],
            sems.at[slot],
        )

    cp(0, 0).start()
    off = off_ref[...].astype(jnp.float32)  # (2K, th, tw)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    for ki in range(kk):
        ky = ki // kw
        kx = ki % kw
        slot = ki % 2
        if ki + 1 < kk:
            cp(ki + 1, 1 - slot).start()
        cp(ki, slot).wait()
        dy_off = jnp.clip(off[2 * ki], -float(R), float(R))
        dx_off = jnp.clip(off[2 * ki + 1], -float(R), float(R))
        # scalar activity intervals: pass (dy, dx) can only contribute when
        # dy in (min dy_off - 1, max dy_off + 1), same for dx, over THIS
        # (th, tw) tile. Keeping the skip conditions scalar (and ALL
        # per-pass vector work inside the pl.when) keeps register pressure
        # bounded — materializing the (2R+2)^2 hat-weight maps up front
        # spills hundreds of MB.
        mn_y = jnp.min(dy_off)
        mx_y = jnp.max(dy_off)
        mn_x = jnp.min(dx_off)
        mx_x = jnp.max(dx_off)
        for dy in range(-R, R + 2):
            row0 = pl_lo + dy + ky - pad
            cy = (mn_y - 1.0 < dy) & (dy < mx_y + 1.0)
            for dx in range(-R, R + 2):
                col0 = pl_lo + dx + kx - pad
                cx = (mn_x - 1.0 < dx) & (dx < mx_x + 1.0)

                @pl.when(cy & cx)
                def _(slot=slot, row0=row0, col0=col0, dy=dy, dx=dx,
                      dy_off=dy_off, dx_off=dx_off):
                    hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy_off - dy))
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx_off - dx))
                    wmap = hy * hx
                    blk = win_ref[slot, row0:row0 + th, col0:col0 + tw, :]
                    acc_ref[...] += wmap[..., None] * blk.astype(jnp.float32)

    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _deform_conv_windowed_pallas(x, offset, weight, padding, window,
                                 th=32, tw=128):
    """x (1, H, W, Cin) any float dtype; offset (1, H, W, 2K) f32;
    weight (kh, kw, Cin, Cout). Returns (1, H, W, Cout) in x.dtype.

    Per tap k and column block j the kernel DMAs one haloed (th+span, tw+span)
    window of Y_k = X @ W_k from an XLA-pre-tiled HBM copy (double-buffered)
    and accumulates the (2R+2)^2 integer-displacement passes into a f32 VMEM
    accumulator, skipping every pass whose hat weights vanish on the whole
    tile (offsets are locally smooth, so narrow tiles skip most passes)."""
    import functools as _ft

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, h, w_, cin = x.shape
    kh, kw, _, cout = weight.shape
    kk = kh * kw
    R = int(window)
    plo = R + padding
    span = 2 * R + 2 * padding + 1

    # tap transforms on the MXU: Y[k] = X @ W_k  (zero-padding Y ≡ padding X)
    y = jnp.einsum(
        "hwi,kio->khwo",
        x[0].astype(x.dtype),
        weight.reshape(kk, cin, cout).astype(x.dtype),
        preferred_element_type=x.dtype,
    )

    cb = 128 if cout % 128 == 0 else cout
    ncb = cout // cb
    tw = min(tw, w_)
    nwb = -(-w_ // tw)
    th = min(th, h)
    rh = th + span
    # window cols padded to the HBM sublane tiling (16 covers bf16 packing)
    twp = -(-(tw + span) // 16) * 16
    ph = (-h) % th
    hp = h + ph

    # (kk,h,w,cout) -> (ncb*kk, rows, cols, cb) so the per-(tap, channel
    # block) map is selected by the leading dim alone, then pre-tile the
    # columns into nwb OVERLAPPING blocks of twp cols stacked on the leading
    # dim (index j*ncb*kk + c*kk + k) — XLA does the halo duplication once
    # (~(tw+span)/tw extra bytes), the kernel then only ever slices rows.
    y = y.reshape(kk, h, w_, ncb, cb).transpose(3, 0, 1, 2, 4)
    y = y.reshape(ncb * kk, h, w_, cb)
    yp = jnp.pad(
        y,
        ((0, 0), (plo, span - plo + ph),
         (plo, max(0, (nwb - 1) * tw + twp - plo - w_)), (0, 0)),
    )
    yb = jnp.concatenate(
        [yp[:, :, j * tw:j * tw + twp] for j in range(nwb)], axis=0
    )
    # offsets with the 2K axis LEADING so the small axis is not a (padded)
    # lane dim: (2K, hp, nwb*tw)
    offp = jnp.pad(
        offset[0].transpose(2, 0, 1),
        ((0, 0), (0, ph), (0, nwb * tw - w_)),
    )

    kernel = _ft.partial(
        _dcw_kernel, R=R, th=th, tw=tw, rh=rh, cb=cb, kh=kh, kw=kw,
        pad=padding, kk=kk, nwb=nwb,
    )
    out = pl.pallas_call(
        kernel,
        grid=(hp // th, nwb, ncb),
        in_specs=[
            pl.BlockSpec((2 * kk, th, tw), lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # pre-tiled Y stays in HBM
        ],
        out_specs=pl.BlockSpec((th, tw, cb), lambda i, j, c: (i, j, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, nwb * tw, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rh, twp, cb), y.dtype),
            pltpu.VMEM((th, tw, cb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(offp, yb)
    return out[None, :h, :w_]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deform_conv2d_windowed(x, offset, weight, padding: int = 1,
                           window: int = 4):
    """Offset-clamped deformable conv (no bias/mask): offsets clipped to
    [-window, window], then exact DCN v1 math. Pallas kernel on TPU for
    batch-1 NHWC; XLA clamped-gather formulation elsewhere (and for the
    backward)."""
    if (
        jax.devices()[0].platform == "tpu"
        and x.ndim == 4
        and x.shape[0] == 1
        and x.shape[2] % 8 == 0
        and weight.shape[-1] % 128 == 0
    ):
        return _deform_conv_windowed_pallas(x, offset, weight, padding, window)
    return _windowed_ref(x, offset, weight, padding=padding, window=window)


def _dcw_fwd(x, offset, weight, padding, window):
    return deform_conv2d_windowed(x, offset, weight, padding, window), (
        x, offset, weight,
    )


def _dcw_bwd(padding, window, res, g):
    x, offset, weight = res
    _, vjp = jax.vjp(
        lambda a, o, w_: _windowed_ref(a, o, w_, padding=padding,
                                       window=window),
        x, offset, weight,
    )
    return vjp(g)


deform_conv2d_windowed.defvjp(_dcw_fwd, _dcw_bwd)
