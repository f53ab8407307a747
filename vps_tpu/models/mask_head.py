"""Mask head (reference FCNMaskHead,
/root/reference/mmdet/models/mask_heads/fcn_mask_head.py:15): 4 × (3×3 conv
256 + ReLU) → 2× deconv + ReLU → 1×1 conv to num_classes channels (channel 0
= background, unused; per-ROI channel picked by its 1-based label).
`get_seg_masks` becomes an on-device batched paste (vps_tpu.ops.mask)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS
from vps_tpu.models.layers import Conv
from vps_tpu.models.flow.flownet2 import TorchConvTranspose


@HEADS.register
class FCNMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 9

    @nn.compact
    def __call__(self, roi_feats) -> jnp.ndarray:
        """roi_feats (R, 14, 14, C) → mask logits (R, 28, 28, num_classes)."""
        x = roi_feats
        he = nn.initializers.he_normal()
        for i in range(self.num_convs):
            x = Conv(self.conv_out_channels, 3, 1, 1, kernel_init=he,
                     name=f"conv{i}")(x)
            x = jax.nn.relu(x)
        x = TorchConvTranspose(self.conv_out_channels, 2, 2, 0, name="upsample")(x)
        x = jax.nn.relu(x)
        x = Conv(self.num_classes, 1, 1, 0, kernel_init=he, name="conv_logits")(x)
        return x


def select_mask_channel(mask_logits, labels):
    """Pick each ROI's channel by 1-based label (mmdet convention: fg class i
    → channel i+1 ... labels passed here are already 1-based)."""
    return jnp.take_along_axis(
        mask_logits, labels[:, None, None, None], axis=-1
    )[..., 0]
