"""TCEA temporal/spatial attention fusion (reference
/root/reference/mmdet/models/utils/tcea_modules.py:17-78, EDVR-style):
per-pixel frame↔center correlation → sigmoid temporal weights → 1×1 fusion
conv → pyramid spatial attention."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.models.layers import Conv, max_pool, avg_pool, resize_bilinear


class TCEAFusion(nn.Module):
    nf: int = 256
    nframes: int = 2
    center: int = 0

    @nn.compact
    def __call__(self, aligned_fea):
        """aligned_fea: (B, N, H, W, C) → fused (B, H, W, C)."""
        b, n, h, w, c = aligned_fea.shape
        lrelu = lambda x: jax.nn.leaky_relu(x, 0.1)
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

        tatt1 = Conv(self.nf, 3, 1, 1, kernel_init=kaiming, name="tAtt_1")
        tatt2 = Conv(self.nf, 3, 1, 1, kernel_init=kaiming, name="tAtt_2")

        emb_ref = tatt2(aligned_fea[:, self.center])
        emb = tatt1(aligned_fea.reshape(b * n, h, w, c)).reshape(b, n, h, w, -1)
        cor = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (B, N, H, W)
        cor_prob = jax.nn.sigmoid(cor)[..., None]  # (B, N, H, W, 1)
        fea_w = (aligned_fea * cor_prob).transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)

        fea = lrelu(Conv(self.nf, 1, 1, 0, kernel_init=kaiming, name="fea_fusion")(fea_w))

        att = lrelu(Conv(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_1")(fea_w))
        att_max = max_pool(att, 3, 2, 1)
        att_avg = avg_pool(att, 3, 2, 1)
        att = lrelu(
            Conv(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_2")(
                jnp.concatenate([att_max, att_avg], axis=-1)
            )
        )
        att = lrelu(Conv(self.nf, 3, 1, 1, kernel_init=kaiming, name="sAtt_3")(att))
        att = resize_bilinear(att, (h, w))
        att = Conv(self.nf, 3, 1, 1, kernel_init=kaiming, name="sAtt_4")(att)
        att_add = Conv(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_add_2")(
            lrelu(Conv(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_add_1")(att))
        )
        att = jax.nn.sigmoid(att)
        return fea * att * 2.0 + att_add
