"""BFPTcea "Fuse" extra neck (reference
/root/reference/mmdet/models/extra_necks/bfp_tcea.py): gather all FPN levels
to the refine level (balanced feature pyramid), warp the reference frame's
gathered feature by the FlowNet2 initial flow, refine the residual flow with
LiteFlowNetCorr, re-warp, fuse with TCEA attention, optionally refine with a
3×3 conv (or conv+CBAM), and scatter the result back residually to every
level. Config: refine_level=0, refine_type='conv', nframes=2, center=0.

`BFPTceaMulti` is the 3-frame (prev/cur/next) variant (bfp_tcea_multi.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import EXTRA_NECKS
from vps_tpu.models.layers import (
    Conv,
    ConvModule,
    adaptive_max_pool,
    resize_nearest,
    global_avg_pool,
)
from vps_tpu.models.flow.liteflow import LiteFlowNetCorr
from vps_tpu.models.flow.tcea import TCEAFusion
from vps_tpu.ops import flow_warp


class CBAM(nn.Module):
    """Channel+spatial attention (reference mmdet/models/utils/attention.py),
    used when refine_type='att'."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        # channel attention: shared MLP over global avg+max pooled stats
        mlp = [
            nn.Dense(self.features // self.reduction, name="mlp0"),
            nn.Dense(self.features, name="mlp1"),
        ]

        def chan(v):
            v = v.reshape(v.shape[0], -1)
            v = mlp[1](jax.nn.relu(mlp[0](v)))
            return v[:, None, None, :]

        avg = chan(global_avg_pool(x))
        mx = chan(jnp.max(x, axis=(1, 2), keepdims=True))
        x = x * jax.nn.sigmoid(avg + mx)
        # spatial attention on [mean_c, max_c]
        stats = jnp.concatenate(
            [jnp.mean(x, -1, keepdims=True), jnp.max(x, -1, keepdims=True)], axis=-1
        )
        sa = Conv(1, 7, 1, 3, name="spatial")(stats)
        return x * jax.nn.sigmoid(sa)


@EXTRA_NECKS.register
class BFPTcea(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 0
    refine_type: Optional[str] = "conv"
    nframes: int = 2
    center: int = 0
    # bf16 compute across the neck (warp gathers, cost volume, TCEA convs)
    # halves the HBM traffic of this gather-heavy block; params stay f32 and
    # flow estimates/residual outputs return f32. None → all f32.
    compute_dtype: Optional[object] = jnp.bfloat16
    # "nearest" quarters the two feature-warp gathers (fast preset); the
    # reference's exact semantics is bilinear grid_sample.
    warp_sampling: str = "bilinear"

    def gather(self, inputs):
        """Resize-and-average all levels to the refine level's size
        (bfp_tcea.py:96-109)."""
        gh, gw = inputs[self.refine_level].shape[1:3]
        feats = []
        for i, f in enumerate(inputs):
            if i < self.refine_level:
                feats.append(adaptive_max_pool(f, (gh, gw)))
            else:
                feats.append(resize_nearest(f, (gh, gw)))
        return sum(feats) / len(feats)

    @nn.compact
    def __call__(self, inputs, ref_inputs, flow_init,
                 next_inputs=None, next_flow_init=None):
        """inputs/ref_inputs: tuples of (B, H_l, W_l, C); flow_init:
        (B, H0, W0, 2) image flow at the refine level's scale. Returns fused
        per-level tuple."""
        assert len(inputs) == self.num_levels
        cd = self.compute_dtype
        bsf = self.gather(inputs)
        ref_bsf = self.gather(ref_inputs)
        if cd is not None:
            bsf = bsf.astype(cd)
            ref_bsf = ref_bsf.astype(cd)

        liteflow = LiteFlowNetCorr(
            search_range=4, compute_dtype=cd, name="liteflownet"
        )
        tcea = TCEAFusion(
            nf=self.in_channels, nframes=self.nframes, center=self.center,
            compute_dtype=cd, name="tcea_fusion",
        )

        ws = self.warp_sampling
        warp_bsf = flow_warp(ref_bsf, flow_init,
                             sampling=ws).astype(ref_bsf.dtype)
        flow_fine = liteflow(bsf, warp_bsf, flow_init)
        warp_bsf = flow_warp(warp_bsf, flow_fine,
                             sampling=ws).astype(ref_bsf.dtype)

        if next_inputs is not None:
            next_bsf = self.gather(next_inputs)
            if cd is not None:
                next_bsf = next_bsf.astype(cd)
            next_warp = flow_warp(next_bsf, next_flow_init,
                                  sampling=ws).astype(next_bsf.dtype)
            next_fine = liteflow(bsf, next_warp, next_flow_init)
            next_warp = flow_warp(next_warp, next_fine,
                                  sampling=ws).astype(next_bsf.dtype)
            stack = jnp.stack([warp_bsf, bsf, next_warp], axis=1)
        else:
            stack = jnp.stack([bsf, warp_bsf], axis=1)
        bsf = tcea(stack)

        if self.refine_type == "conv":
            bsf = ConvModule(self.in_channels, 3, 1, 1, dtype=cd, name="refine")(bsf)
        elif self.refine_type == "att":
            bsf = ConvModule(self.in_channels, 3, 1, 1, dtype=cd, name="refine_conv")(bsf)
            bsf = CBAM(self.in_channels, name="refine_att")(bsf)
        bsf = bsf.astype(jnp.float32)

        outs = []
        for i, f in enumerate(inputs):
            oh, ow = f.shape[1:3]
            if i < self.refine_level:
                residual = resize_nearest(bsf, (oh, ow))
            else:
                residual = adaptive_max_pool(bsf, (oh, ow))
            outs.append(residual + f)
        return tuple(outs)


@EXTRA_NECKS.register
class BFPTceaMulti(BFPTcea):
    """3-frame variant (reference bfp_tcea_multi.py): same wiring, prev/next
    both fused; callers pass next_inputs/next_flow_init."""

    nframes: int = 3
    center: int = 1
