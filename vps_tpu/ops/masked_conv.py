"""Masked conv2d — equivalent of /root/reference/mmdet/ops/masked_conv/
(guided-anchor heads only, SURVEY §2.3 #7).

The CUDA op im2cols only the masked output positions to skip computation.
On TPU, sparsity of this kind defeats the MXU: a dense conv is faster than
any gather-based sparse formulation at the densities guided anchoring
produces, so the idiomatic implementation is dense conv + mask of the
output, which is numerically identical (the reference writes zeros at
unmasked positions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_conv2d(x, mask, weight, bias=None, padding: int = 1):
    """x (B, H, W, Cin); mask (B, H, W) bool/float; weight (kh, kw, Cin, Cout).

    Returns conv(x) * mask — zero at masked-out positions, like the CUDA op.
    """
    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out * mask[..., None].astype(out.dtype)
