"""LiteFlowNetCorr — cheap feature-level residual-flow refiner (reference
/root/reference/mmdet/models/flow_modules/flow_modules.py:37-75): cost
volume (search_range=4 → 81 channels) + 4-conv estimator on
feat ⊕ corr ⊕ init_flow. The cost volume is the shift-and-reduce XLA op in
vps_tpu.ops.correlation instead of the CUDA correlation package."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.models.layers import Conv
from vps_tpu.ops import correlation


class OpticalFlowEstimatorCorr(nn.Module):
    """conv(64)+lrelu ×2 → conv(32)+lrelu → conv(2)
    (flow_modules.py:37-48)."""

    compute_dtype: object = None

    @nn.compact
    def __call__(self, x):
        xavier = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        cd = self.compute_dtype
        C = lambda *a, **kw: Conv(*a, dtype=cd, **kw)
        x = jax.nn.leaky_relu(C(64, 3, 1, 1, kernel_init=xavier, name="c0")(x), 0.1)
        x = jax.nn.leaky_relu(C(64, 3, 1, 1, kernel_init=xavier, name="c1")(x), 0.1)
        x = jax.nn.leaky_relu(C(32, 3, 1, 1, kernel_init=xavier, name="c2")(x), 0.1)
        # flow output stays f32 (CLAUDE.md: regression outputs f32)
        return Conv(2, 3, 1, 1, kernel_init=xavier, name="c3")(
            x.astype(jnp.float32)
        )


class LiteFlowNetCorr(nn.Module):
    search_range: int = 4
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x1, x2, flow_init=None):
        """x1, x2: (B, H, W, C); flow_init: (B, H, W, 2) or None.
        Returns residual flow (B, H, W, 2)."""
        corr = correlation(x1, x2, self.search_range, 1)
        parts = [x1, corr.astype(x1.dtype)]
        if flow_init is not None:
            parts.append(flow_init.astype(x1.dtype))
        return OpticalFlowEstimatorCorr(
            compute_dtype=self.compute_dtype, name="flow_estimator"
        )(jnp.concatenate(parts, axis=-1))
