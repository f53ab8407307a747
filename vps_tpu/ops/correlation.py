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

import jax.numpy as jnp


def correlation(f1, f2, max_displacement: int, stride2: int = 1):
    """f1, f2: (B, H, W, C) → (B, H, W, D²) with D = 2*(md//stride2)+1.

    out[..., k] = mean_c f1[y, x, c] * f2[y+dy, x+dx, c] for the k-th
    displacement (dy, dx) ∈ {-md..md step stride2}²; out-of-bounds reads of
    f2 are zero (the CUDA kernel zero-pads by pad_size = max_displacement).

    Small displacement counts unroll into fused slice-multiply-reduce ops;
    large ones (FlowNetC's 441) run as a lax.scan over displacements to keep
    the HLO compact.
    """
    import jax

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
