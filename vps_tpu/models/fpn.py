"""FPN neck (reference /root/reference/mmdet/models/necks/fpn.py:11, config:
in_channels [256,512,1024,2048], out 256, num_outs=5 → extra P6 by stride-2
max pool on P5, mmdet 1.x behavior when add_extra_convs=False)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import NECKS
from vps_tpu.models.layers import Conv, max_pool, resize_nearest


@NECKS.register
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    dtype: object = None  # compute dtype; heads receive f32 outputs

    @nn.compact
    def __call__(self, inputs) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == len(self.in_channels)
        n = len(inputs)
        xavier = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        laterals = [
            Conv(self.out_channels, 1, 1, 0, kernel_init=xavier,
                 name=f"lateral{i}", dtype=self.dtype)(inputs[i])
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_nearest(laterals[i], (h, w))
        outs = [
            Conv(self.out_channels, 3, 1, 1, kernel_init=xavier,
                 name=f"fpn{i}", dtype=self.dtype)(laterals[i]).astype(jnp.float32)
            for i in range(n)
        ]
        # extra levels: stride-2 max pool (kernel 1) on the last output
        for _ in range(self.num_outs - n):
            outs.append(max_pool(outs[-1], 1, 2, 0))
        return tuple(outs)


@NECKS.register
class HRFPN(nn.Module):
    """HRFPN neck (reference necks/hrfpn.py): concat all HRNet branches at
    the highest resolution → 1×1 reduce → avg-pool pyramid → per-level 3×3."""

    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    pooling: str = "avg"

    @nn.compact
    def __call__(self, inputs) -> Tuple[jnp.ndarray, ...]:
        from vps_tpu.models.layers import avg_pool, resize_bilinear

        assert len(inputs) == len(self.in_channels)
        xavier = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        h, w = inputs[0].shape[1:3]
        ups = [inputs[0]] + [
            resize_bilinear(x, (h, w)) for x in inputs[1:]
        ]
        feat = jnp.concatenate(ups, axis=-1)
        feat = Conv(self.out_channels, 1, 1, 0, kernel_init=xavier,
                    name="reduction")(feat)
        pool = avg_pool if self.pooling == "avg" else max_pool
        pyramid = [feat]
        for i in range(1, self.num_outs):
            k = 2 ** i
            pyramid.append(pool(feat, k, k, 0))
        outs = [
            Conv(self.out_channels, 3, 1, 1, kernel_init=xavier,
                 name=f"fpn_conv{i}")(p)
            for i, p in enumerate(pyramid)
        ]
        return tuple(outs)
