"""Backbone plugins: ContextBlock (GCNet) and GeneralizedAttention.

TPU-native equivalents of the reference plugin blocks the ResNet stages can
mount (/root/reference/mmdet/ops/context_block.py:13,
/root/reference/mmdet/models/plugins/generalized_attention.py:9). NHWC
einsum formulations: the attention energies are head-batched matmuls that
ride the MXU; no (N, heads, HW, HkWk) tensor is ever laid out in a
data-dependent shape.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.models.layers import Conv


class ContextBlock(nn.Module):
    """GCNet context block (context_block.py:13): softmax-attention (or avg)
    global pooling -> bottleneck transform (1x1 -> LayerNorm -> relu -> 1x1)
    -> channel-wise add and/or sigmoid-mul fusion. The transform's last conv
    is zero-init so a fresh block is an identity (last_zero_init)."""

    ratio: float = 1.0 / 16.0
    pooling_type: str = "att"
    fusion_types: Sequence[str] = ("channel_add",)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            logits = Conv(1, 1, 1, 0, name="conv_mask")(x).reshape(b, h * w)
            attn = jax.nn.softmax(logits, axis=-1)
            context = jnp.einsum("bn,bnc->bc", attn, x.reshape(b, h * w, c))
        else:
            context = jnp.mean(x, axis=(1, 2))
        context = context[:, None, None, :]  # (B, 1, 1, C)

        def transform(name):
            t = Conv(planes, 1, 1, 0, name=f"{name}_0")(context)
            t = nn.LayerNorm(name=f"{name}_ln")(t)
            t = jax.nn.relu(t)
            return Conv(c, 1, 1, 0, kernel_init=nn.initializers.zeros,
                        name=f"{name}_1")(t)

        out = x
        if "channel_mul" in self.fusion_types:
            out = out * jax.nn.sigmoid(transform("channel_mul_conv"))
        if "channel_add" in self.fusion_types:
            out = out + transform("channel_add_conv")
        return out


def _position_embedding(h, w, h_kv, w_kv, q_stride, kv_stride, feat_dim,
                        magnitude, wave_length=1000.0):
    """Sinusoidal embeddings of x/y coordinate differences
    (generalized_attention.py:153-195 get_position_embedding). Returns
    ((w, w_kv, feat_dim/2), (h, h_kv, feat_dim/2))."""
    h_idx = np.arange(h, dtype=np.float32)[:, None] * q_stride
    w_idx = np.arange(w, dtype=np.float32)[:, None] * q_stride
    hk_idx = np.arange(h_kv, dtype=np.float32)[:, None] * kv_stride
    wk_idx = np.arange(w_kv, dtype=np.float32)[:, None] * kv_stride
    h_diff = (h_idx[:, None, :] - hk_idx[None, :, :]) * magnitude
    w_diff = (w_idx[:, None, :] - wk_idx[None, :, :]) * magnitude
    feat_range = np.arange(feat_dim // 4, dtype=np.float32)
    dim_mat = wave_length ** ((4.0 / feat_dim) * feat_range)
    ex = np.concatenate(
        [np.sin(w_diff / dim_mat), np.cos(w_diff / dim_mat)], axis=2
    )
    ey = np.concatenate(
        [np.sin(h_diff / dim_mat), np.cos(h_diff / dim_mat)], axis=2
    )
    return jnp.asarray(ex), jnp.asarray(ey)


class GeneralizedAttention(nn.Module):
    """Empirical attention (generalized_attention.py:9, "An Empirical Study
    of Spatial Attention Mechanisms"): 4 energy terms controlled by
    `attention_type` bits — appr-appr (query.key content), appr-position,
    bias-appr (key content only), bias-position — softmaxed over the
    (strided) key/value map, gamma-gated residual output."""

    in_dim: int
    spatial_range: int = -1
    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: float = 1.0
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = "1111"

    @nn.compact
    def __call__(self, x):
        at = [bool(int(b)) for b in self.attention_type]
        nh = self.num_heads
        qk_dim = self.in_dim // nh
        v_dim = self.in_dim // nh
        pe_dim = (self.position_embedding_dim
                  if self.position_embedding_dim > 0 else self.in_dim)
        b, H, W, C = x.shape

        def pool(y, s):
            return y[:, ::s, ::s, :] if s > 1 else y

        x_q = pool(x, self.q_stride)
        x_kv = pool(x, self.kv_stride)
        h, w = x_q.shape[1:3]
        h_kv, w_kv = x_kv.shape[1:3]
        ninit = nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"
        )

        q = k = None
        if at[0] or at[1]:
            q = Conv(nh * qk_dim, 1, 1, 0, use_bias=False, kernel_init=ninit,
                     name="query_conv")(x_q)
            q = q.reshape(b, h * w, nh, qk_dim)
        if at[0] or at[2]:
            k = Conv(nh * qk_dim, 1, 1, 0, use_bias=False, kernel_init=ninit,
                     name="key_conv")(x_kv)
            k = k.reshape(b, h_kv * w_kv, nh, qk_dim)

        pf_x = pf_y = None
        if at[1] or at[3]:
            ex, ey = _position_embedding(
                h, w, h_kv, w_kv, self.q_stride, self.kv_stride, pe_dim,
                self.position_magnitude,
            )
            fc_x = nn.Dense(nh * qk_dim, use_bias=False, kernel_init=ninit,
                            name="appr_geom_fc_x")
            fc_y = nn.Dense(nh * qk_dim, use_bias=False, kernel_init=ninit,
                            name="appr_geom_fc_y")
            # (w, w_kv, nh, qk) / (h, h_kv, nh, qk); /sqrt(2) mirrors the
            # reference's two-term energy normalization
            pf_x = fc_x(ex).reshape(w, w_kv, nh, qk_dim) / math.sqrt(2)
            pf_y = fc_y(ey).reshape(h, h_kv, nh, qk_dim) / math.sqrt(2)

        stdv = 1.0 / math.sqrt(qk_dim * 2)

        def uinit(key, shape):
            return jax.random.uniform(
                key, shape, minval=-stdv, maxval=stdv
            )

        appr_bias = (
            self.param("appr_bias", uinit, (nh * qk_dim,)) if at[2] else None
        )
        geom_bias = (
            self.param("geom_bias", uinit, (nh * qk_dim,)) if at[3] else None
        )

        # energy: (B, nh, h*w, h_kv*w_kv)
        energy = jnp.zeros((b, nh, h * w, h_kv * w_kv), x.dtype)
        if at[0]:
            qq = q + appr_bias.reshape(1, 1, nh, qk_dim) if at[2] else q
            energy = energy + jnp.einsum("bqnd,bknd->bnqk", qq, k)
        elif at[2]:
            eb = jnp.einsum(
                "nd,bknd->bnk", appr_bias.reshape(nh, qk_dim), k
            )
            energy = energy + eb[:, :, None, :]
        if at[1] or at[3]:
            if at[1]:
                qg = (q + geom_bias.reshape(1, 1, nh, qk_dim)
                      if at[3] else q)
                qg = qg.reshape(b, h, w, nh, qk_dim)
                e_x = jnp.einsum("bhwnd,wvnd->bnhwv", qg, pf_x)
                e_y = jnp.einsum("bhwnd,hund->bnhwu", qg, pf_y)
                energy = energy + (
                    e_x[:, :, :, :, None, :] + e_y[:, :, :, :, :, None]
                ).reshape(b, nh, h * w, h_kv * w_kv)
            else:  # bias-position only
                gb = geom_bias.reshape(nh, qk_dim)
                e_x = jnp.einsum("wvnd,nd->nwv", pf_x, gb)
                e_y = jnp.einsum("hund,nd->nhu", pf_y, gb)
                energy = energy + (
                    e_x[None, :, None, :, None, :]
                    + e_y[None, :, :, None, :, None]
                ).reshape(1, nh, h * w, h_kv * w_kv)

        if self.spatial_range >= 0:
            # local constraint: query (iy, ix) only attends to kv cells
            # within spatial_range (generalized_attention.py:112-137),
            # computed for the actual static shape instead of a max_len
            # precompute
            iy = np.arange(h)[:, None, None, None]
            ix = np.arange(w)[None, :, None, None]
            ky = np.arange(h_kv)[None, None, :, None]
            kx = np.arange(w_kv)[None, None, None, :]
            ok_y = (ky >= (iy - self.spatial_range) // self.kv_stride) & (
                ky <= (iy + self.spatial_range + 1) // self.kv_stride
            )
            ok_x = (kx >= (ix - self.spatial_range) // self.kv_stride) & (
                kx <= (ix + self.spatial_range + 1) // self.kv_stride
            )
            allowed = jnp.asarray(
                (ok_y & ok_x).reshape(1, 1, h * w, h_kv * w_kv)
            )
            energy = jnp.where(allowed, energy, -jnp.inf)

        attn = jax.nn.softmax(energy, axis=-1)
        v = Conv(nh * v_dim, 1, 1, 0, use_bias=False, kernel_init=ninit,
                 name="value_conv")(x_kv).reshape(b, h_kv * w_kv, nh, v_dim)
        out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(
            b, h, w, nh * v_dim
        )
        out = Conv(self.in_dim, 1, 1, 0, kernel_init=ninit,
                   name="proj_conv")(out)
        if self.q_stride > 1:
            # broadcast strided-query output back to the full grid
            out = jnp.repeat(
                jnp.repeat(out, self.q_stride, axis=1), self.q_stride, axis=2
            )[:, :H, :W, :]
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x
