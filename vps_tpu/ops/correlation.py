"""Correlation / cost-volume op.

Replaces the reference's correlation CUDA package
(/root/reference/mmdet/models/flow_modules/correlation_package/
correlation_cuda_kernel.cu), used by FlowNetC (max_disp 20, stride2 2) and
LiteFlowNetCorr in the Fuse neck (search_range 4, stride 1;
flow_modules.py:54-56).

Formulated as shift-and-reduce: for each displacement d the product
f1 · shift(f2, d) reduced over channels — D elementwise multiply+reduce ops
that XLA fuses into a few VPU passes; no gathers. Channel order is row-major
over the displacement grid (dy outer, dx inner), matching the CUDA kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Pallas TPU kernel: each (TH, TW) output tile DMAs one haloed f2 window into
# VMEM and produces ALL D² displacement channels from it — the XLA fallback
# re-reads f1/f2 from HBM once per displacement (D² full-map passes), so the
# kernel's HBM traffic is ~D² times lower on the cost-volume hot path
# (FlowNetC: 441 channels; the Fuse neck's LiteFlowNetCorr: 81).
# ---------------------------------------------------------------------------


def _corr_kernel(f1_ref, f2_hbm, out_ref, win_ref, sem, *, th, tw, md,
                 stride2, steps, c):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        f2_hbm.at[pl.ds(i * th, th + 2 * md), pl.ds(j * tw, tw + 2 * md), :],
        win_ref,
        sem,
    )
    dma.start()
    f1 = f1_ref[...].astype(jnp.float32)
    dma.wait()
    inv_c = 1.0 / c

    # Mosaic alignment: dynamic ref slicing only on dim 0 (untiled rows);
    # column displacements are STATIC slices of the loaded row band, and the
    # displacement axis is dim 0 of the output so its dynamic store is
    # untiled too.
    def body(iy, _):
        band = win_ref[pl.ds(iy * stride2, th), :, :].astype(jnp.float32)
        for ix in range(steps):
            win = band[:, ix * stride2 : ix * stride2 + tw, :]
            out_ref[pl.ds(iy * steps + ix, 1), :, :] = (
                jnp.sum(f1 * win, axis=-1) * inv_c
            )[None]
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


def _correlation_pallas_2d(f1, f2, md: int, stride2: int):
    """Single-image correlation via the pallas kernel. f1, f2: (H, W, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = f1.shape
    steps = 2 * (md // stride2) + 1
    d2 = steps * steps
    # tile sizes: rows chosen so the haloed window fits VMEM comfortably
    tw = min(w, 128)
    th = 8 if md > 8 else 16
    ph = (-h) % th
    pw = (-w) % tw
    f1p = jnp.pad(f1, ((0, ph), (0, pw), (0, 0)))
    f2p = jnp.pad(f2, ((md, md + ph), (md, md + pw), (0, 0)))
    hp, wp = f1p.shape[0], f1p.shape[1]

    kernel = functools.partial(
        _corr_kernel, th=th, tw=tw, md=md, stride2=stride2, steps=steps, c=c
    )
    out = pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((th, tw, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # f2 padded, stays in HBM
        ],
        out_specs=pl.BlockSpec((d2, th, tw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * md, tw + 2 * md, c), f2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(f1p, f2p)
    return jnp.transpose(out, (1, 2, 0))[:h, :w]


def _correlation_xla(f1, f2, max_displacement: int, stride2: int = 1):
    """XLA fallback (and autodiff reference): shift-multiply-reduce.

    Small displacement counts unroll into fused slice-multiply-reduce ops;
    large ones (FlowNetC's 441) run as a lax.scan over displacements to keep
    the HLO compact.
    """
    b, h, w, c = f1.shape
    md = max_displacement
    steps = 2 * (md // stride2) + 1
    pad = md
    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    if steps * steps <= 128:
        outs = []
        for iy in range(steps):
            dy = -md + iy * stride2
            for ix in range(steps):
                dx = -md + ix * stride2
                shifted = f2p[:, pad + dy : pad + dy + h, pad + dx : pad + dx + w, :]
                # accumulate in f32 even for bf16 inputs
                outs.append(jnp.mean(f1 * shifted, axis=-1, dtype=jnp.float32))
        return jnp.stack(outs, axis=-1).astype(f1.dtype)

    offs = []
    for iy in range(steps):
        for ix in range(steps):
            offs.append((pad - md + iy * stride2, pad - md + ix * stride2))
    offs = jnp.asarray(offs, jnp.int32)  # (D², 2)

    def body(carry, off):
        shifted = jax.lax.dynamic_slice(
            f2p, (0, off[0], off[1], 0), (b, h, w, c)
        )
        return carry, jnp.mean(f1 * shifted, axis=-1, dtype=jnp.float32)

    _, out = jax.lax.scan(body, None, offs)  # (D², B, H, W)
    return jnp.transpose(out, (1, 2, 3, 0)).astype(f1.dtype)


def _correlation_dispatch(f1, f2, max_displacement: int, stride2: int = 1):
    """Forward dispatch (pallas for small-batch dense search on TPU, XLA
    otherwise), wrapped in a custom_vmap that collapses any vmapped leading
    axis into the batch dim — pallas_call has no automatic batching rule."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def run(a, b):
        if (
            jax.devices()[0].platform == "tpu"
            and stride2 == 1
            and a.ndim == 4
            and a.shape[0] <= 8
            and a.shape[-1] % 128 == 0
        ):
            out = jnp.stack([
                _correlation_pallas_2d(a[i], b[i], max_displacement, stride2)
                for i in range(a.shape[0])
            ])
            return out.astype(a.dtype)
        return _correlation_xla(a, b, max_displacement, stride2)

    @run.def_vmap
    def _rule(axis_size, in_batched, a, b):  # noqa: ANN001
        if not in_batched[0]:
            a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        if not in_batched[1]:
            b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
        s = a.shape[0]
        flat = _correlation_dispatch(
            a.reshape((-1,) + a.shape[2:]),
            b.reshape((-1,) + b.shape[2:]),
            max_displacement, stride2,
        )
        return flat.reshape((s, -1) + flat.shape[1:]), True

    return run(f1, f2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation(f1, f2, max_displacement: int, stride2: int = 1):
    """f1, f2: (B, H, W, C) → (B, H, W, D²) with D = 2*(md//stride2)+1.

    out[..., k] = mean_c f1[y, x, c] * f2[y+dy, x+dx, c] for the k-th
    displacement (dy, dx) ∈ {-md..md step stride2}²; out-of-bounds reads of
    f2 are zero (the CUDA kernel zero-pads by pad_size = max_displacement).

    On TPU the forward runs as a Pallas kernel (one haloed VMEM window per
    tile produces all displacement channels); elsewhere, or for unsupported
    shapes, the XLA shift-reduce fallback. Backward always differentiates the
    (numerically identical) XLA formulation.

    Measured on v5e at VPS shapes: pallas wins for dense search (stride2=1,
    the Fuse neck's 81-channel cost volume: 45→32 ms at 256×512×256); the
    strided FlowNetC case (441 ch) is faster via XLA, so it dispatches there.

    vmap-safe: Pallas kernels have no automatic batching rule, so a
    custom_vmap inside the dispatch collapses any vmapped leading axis into
    the batch dim (the batched-streams bench and batched training paths
    vmap over this op); custom_vjp sits OUTERMOST so autodiff never sees
    the custom_vmap (which has no reverse-mode rule).
    """
    return _correlation_dispatch(f1, f2, max_displacement, stride2)


def _correlation_fwd(f1, f2, max_displacement, stride2):
    return correlation(f1, f2, max_displacement, stride2), (f1, f2)


def _correlation_bwd(max_displacement, stride2, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(
        lambda a, b: _correlation_xla(a, b, max_displacement, stride2), f1, f2
    )
    return vjp(g)


correlation.defvjp(_correlation_fwd, _correlation_bwd)
