"""SSD-VGG backbone — VGG-16 with SSD extra feature layers and L2Norm.

Equivalent of the reference /root/reference/mmdet/models/backbones/ssd_vgg.py
(SSDVGG: VGG16 through conv5_3 + fc6/fc7 as dilated convs + extra stride-2
blocks; L2 normalization on conv4_3). NHWC, static shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import BACKBONES
from vps_tpu.models.layers import Conv, max_pool

# VGG16 conv plan: (num convs, channels) per block
VGG16_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

# SSD extra layers: (channels, kernel, stride, padding)
EXTRA_SETTING = {
    300: ((256, 1, 1, 0), (512, 3, 2, 1), (128, 1, 1, 0), (256, 3, 2, 1),
          (128, 1, 1, 0), (256, 3, 1, 0), (128, 1, 1, 0), (256, 3, 1, 0)),
    512: ((256, 1, 1, 0), (512, 3, 2, 1), (128, 1, 1, 0), (256, 3, 2, 1),
          (128, 1, 1, 0), (256, 3, 2, 1), (128, 1, 1, 0), (256, 3, 2, 1),
          (128, 1, 1, 0), (256, 4, 1, 1)),
}


class L2Norm(nn.Module):
    """Per-channel learnable-scale L2 normalization (ssd_vgg.py L2Norm)."""

    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "weight", lambda k, s: jnp.full(s, self.scale), (x.shape[-1],)
        )
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
        return x / norm * gamma


@BACKBONES.register
class SSDVGG(nn.Module):
    input_size: int = 300
    out_feature_indices: Sequence[int] = (22, 34)  # conv4_3, fc7 (torch idx)
    l2_norm_scale: float = 20.0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        outs = []
        # VGG16 trunk; record conv4_3 (end of block 4 pre-pool) and fc7
        for bi, (ncv, ch) in enumerate(VGG16_BLOCKS):
            for ci in range(ncv):
                x = Conv(ch, 3, 1, 1, name=f"conv{bi + 1}_{ci + 1}")(x)
                x = jax.nn.relu(x)
            if bi == 3:  # conv4_3 output, L2-normalized
                outs.append(L2Norm(self.l2_norm_scale, name="l2_norm")(x))
            if bi < 4:
                x = max_pool(x, 2, 2, 0)
            else:  # pool5: 3×3 stride 1 (SSD modification)
                x = max_pool(x, 3, 1, 1)
        # fc6/fc7 as convs (dilated, SSD)
        x = Conv(1024, 3, 1, 6, dilation=6, name="fc6")(x)
        x = jax.nn.relu(x)
        x = Conv(1024, 1, 1, 0, name="fc7")(x)
        x = jax.nn.relu(x)
        outs.append(x)
        # extra layers, every second output is a feature map
        for i, (ch, k, s, p) in enumerate(EXTRA_SETTING[self.input_size]):
            x = Conv(ch, k, s, p, name=f"extra{i}")(x)
            x = jax.nn.relu(x)
            if i % 2 == 1:
                outs.append(x)
        return tuple(outs)
