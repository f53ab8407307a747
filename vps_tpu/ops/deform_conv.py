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

import jax.numpy as jnp

from vps_tpu.ops.warp import _gather_bilinear


def deform_conv2d(
    x,
    offset,
    weight,
    bias=None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask=None,
):
    """x: (B, H, W, Cin); offset: (B, Ho, Wo, 2K); weight: (kh, kw, Cin, Cout);
    mask (modulation, v2): (B, Ho, Wo, K) or None. Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weight.shape
    k = kh * kw
    ho, wo = offset.shape[1], offset.shape[2]

    off = offset.reshape(b, ho, wo, k, 2)
    off_y = off[..., 0]
    off_x = off[..., 1]

    ys_base = (
        jnp.arange(ho, dtype=x.dtype)[:, None] * stride
        - padding
        + jnp.repeat(jnp.arange(kh, dtype=x.dtype) * dilation, kw)[None, :]
    )  # (Ho, K)
    xs_base = (
        jnp.arange(wo, dtype=x.dtype)[:, None] * stride
        - padding
        + jnp.tile(jnp.arange(kw, dtype=x.dtype) * dilation, kh)[None, :]
    )  # (Wo, K)
    ys = ys_base[None, :, None, :] + off_y  # (B, Ho, Wo, K)
    xs = xs_base[None, None, :, :] + off_x

    sampled = _gather_bilinear(x, xs, ys, padding_mode="zeros")  # (B,Ho,Wo,K,Cin)
    if mask is not None:
        sampled = sampled * mask[..., None]
    wmat = weight.reshape(k * cin, cout)
    out = jnp.einsum(
        "bhwi,io->bhwo",
        sampled.reshape(b, ho, wo, k * cin),
        wmat,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out
