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
    compute_dtype: object = None  # conv compute dtype (e.g. bf16); params f32

    @nn.compact
    def __call__(self, aligned_fea):
        """aligned_fea: (B, N, H, W, C) → fused (B, H, W, C)."""
        b, n, h, w, c = aligned_fea.shape
        lrelu = lambda x: jax.nn.leaky_relu(x, 0.1)
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
        cd = self.compute_dtype
        Conv_ = lambda *a, **kw: Conv(*a, dtype=cd, **kw)

        tatt1 = Conv_(self.nf, 3, 1, 1, kernel_init=kaiming, name="tAtt_1")
        tatt2 = Conv_(self.nf, 3, 1, 1, kernel_init=kaiming, name="tAtt_2")

        emb_ref = tatt2(aligned_fea[:, self.center])
        emb = tatt1(aligned_fea.reshape(b * n, h, w, c)).reshape(b, n, h, w, -1)
        # frame↔center correlation accumulates in f32 (bf16 dot over 256ch
        # loses too much for a sigmoid input)
        cor = jnp.sum(
            emb.astype(jnp.float32) * emb_ref[:, None].astype(jnp.float32),
            axis=-1,
        )  # (B, N, H, W)
        cor_prob = jax.nn.sigmoid(cor)[..., None].astype(aligned_fea.dtype)
        fea_w = (aligned_fea * cor_prob).transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)

        fea = lrelu(Conv_(self.nf, 1, 1, 0, kernel_init=kaiming, name="fea_fusion")(fea_w))

        att = lrelu(Conv_(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_1")(fea_w))
        att_max = max_pool(att, 3, 2, 1)
        att_avg = avg_pool(att, 3, 2, 1)
        att = lrelu(
            Conv_(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_2")(
                jnp.concatenate([att_max, att_avg], axis=-1)
            )
        )
        att = lrelu(Conv_(self.nf, 3, 1, 1, kernel_init=kaiming, name="sAtt_3")(att))
        att = resize_bilinear(att, (h, w))
        att = Conv_(self.nf, 3, 1, 1, kernel_init=kaiming, name="sAtt_4")(att)
        att_add = Conv_(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_add_2")(
            lrelu(Conv_(self.nf, 1, 1, 0, kernel_init=kaiming, name="sAtt_add_1")(att))
        )
        att = jax.nn.sigmoid(att.astype(jnp.float32)).astype(fea.dtype)
        return fea * att * 2.0 + att_add
