"""FlowNet2 — the frozen image-flow module (reference
/root/reference/mmdet/models/flow_modules/{flownet2,FlowNetC,FlowNetS,
FlowNetSD,FlowNetFusion,submodules}.py, 162.5M params): cascade
FlowNetC → (warp) → FlowNetS1 → (warp) → FlowNetS2, in parallel FlowNetSD,
fused by FlowNetFusion. Weights come from the released
FlowNet2_checkpoint.pth.tar via the torch→jax converter
(vps_tpu/utils/convert.py); this module is always run frozen
(panoptic_fusetrack.py:100-108 loads it with requires_grad=False).

All convs: LeakyReLU(0.1), pad (k-1)//2 (submodules.py conv/deconv/i_conv,
batchNorm=False variant). Deconvs reproduce torch ConvTranspose2d(4, 2, 1)
exactly (TorchConvTranspose below). The correlation / Resample2d /
ChannelNorm CUDA ops are the XLA formulations in vps_tpu.ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.models.layers import Conv, resize_bilinear, resize_nearest
from vps_tpu.ops import correlation, resample2d, channel_norm


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


# Compute dtype for the (frozen, inference-only) conv stack: bf16 halves HBM
# traffic and doubles MXU rate. Params stay f32 in the checkpoint; flow
# *prediction* convs (2-channel outputs) stay f32 — see conv_block — so the
# regressed displacements keep full precision. FlowNet2.compute_dtype=None
# recovers reference-exact f32 compute (the `exact` preset): the attribute is
# published here at trace time (tracing is single-threaded and the subnets
# are invoked synchronously inside FlowNet2.__call__), which avoids threading
# a dtype argument through every one of the cascade's ~50 conv_block sites.
COMPUTE_DTYPE = jnp.bfloat16
_ACTIVE_DTYPE = COMPUTE_DTYPE


class TorchConvTranspose(nn.Module):
    """torch nn.ConvTranspose2d(k, stride, padding) parity in NHWC.

    Kernel stored as (kh, kw, in, out) with spatial taps already in
    gradient-of-conv orientation (the converter flips torch's kernel).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (k, k, x.shape[-1], self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def conv_block(features, kernel=3, stride=1, name=None):
    dtype = None if features <= 2 else _ACTIVE_DTYPE
    return Conv(features, kernel, stride, (kernel - 1) // 2, name=name,
                dtype=dtype)


class _Deconv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return _lrelu(TorchConvTranspose(self.features, 4, 2, 1, name="deconv",
                                         dtype=_ACTIVE_DTYPE)(x))


class _FlowUp(nn.Module):
    """ConvTranspose2d(2, 2, 4, 2, 1) upsampling a flow field (bias per net)."""

    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return TorchConvTranspose(2, 4, 2, 1, use_bias=self.use_bias, name="up")(x)


class FlowNetC(nn.Module):
    """FlowNetC.py:13-129 — two-stream encoder + 441-ch cost volume."""

    @nn.compact
    def __call__(self, x1, x2):
        conv1 = conv_block(64, 7, 2, "conv1")
        conv2 = conv_block(128, 5, 2, "conv2")
        conv3 = conv_block(256, 5, 2, "conv3")
        c1a = _lrelu(conv1(x1))
        c2a = _lrelu(conv2(c1a))
        c3a = _lrelu(conv3(c2a))
        c1b = _lrelu(conv1(x2))
        c2b = _lrelu(conv2(c1b))
        c3b = _lrelu(conv3(c2b))

        corr = _lrelu(correlation(c3a, c3b, 20, 2))  # (B, H/8, W/8, 441)
        redir = _lrelu(conv_block(32, 1, 1, "conv_redir")(c3a))
        x = jnp.concatenate([redir, corr], axis=-1)  # 473

        c3_1 = _lrelu(conv_block(256, 3, 1, "conv3_1")(x))
        c4 = _lrelu(conv_block(512, 3, 2, "conv4")(c3_1))
        c4 = _lrelu(conv_block(512, 3, 1, "conv4_1")(c4))
        c5 = _lrelu(conv_block(512, 3, 2, "conv5")(c4))
        c5 = _lrelu(conv_block(512, 3, 1, "conv5_1")(c5))
        c6 = _lrelu(conv_block(1024, 3, 2, "conv6")(c5))
        c6 = _lrelu(conv_block(1024, 3, 1, "conv6_1")(c6))

        flow6 = conv_block(2, 3, 1, "predict_flow6")(c6)
        flow6_up = _FlowUp(name="upsampled_flow6_to_5")(flow6)
        d5 = _Deconv(512, name="deconv5")(c6)
        cat5 = jnp.concatenate([c5, d5, flow6_up], axis=-1)  # 1026
        flow5 = conv_block(2, 3, 1, "predict_flow5")(cat5)
        flow5_up = _FlowUp(name="upsampled_flow5_to_4")(flow5)
        d4 = _Deconv(256, name="deconv4")(cat5)
        cat4 = jnp.concatenate([c4, d4, flow5_up], axis=-1)  # 770
        flow4 = conv_block(2, 3, 1, "predict_flow4")(cat4)
        flow4_up = _FlowUp(name="upsampled_flow4_to_3")(flow4)
        d3 = _Deconv(128, name="deconv3")(cat4)
        cat3 = jnp.concatenate([c3_1, d3, flow4_up], axis=-1)  # 386
        flow3 = conv_block(2, 3, 1, "predict_flow3")(cat3)
        flow3_up = _FlowUp(name="upsampled_flow3_to_2")(flow3)
        d2 = _Deconv(64, name="deconv2")(cat3)
        cat2 = jnp.concatenate([c2a, d2, flow3_up], axis=-1)  # 194
        flow2 = conv_block(2, 3, 1, "predict_flow2")(cat2)
        return flow2


class FlowNetS(nn.Module):
    """FlowNetS.py — plain encoder-decoder; input 12 channels; flow upsamplers
    have NO bias (FlowNetS.py: ConvTranspose2d(..., bias=False))."""

    input_channels: int = 12

    @nn.compact
    def __call__(self, x):
        c1 = _lrelu(conv_block(64, 7, 2, "conv1")(x))
        c2 = _lrelu(conv_block(128, 5, 2, "conv2")(c1))
        c3 = _lrelu(conv_block(256, 5, 2, "conv3")(c2))
        c3 = _lrelu(conv_block(256, 3, 1, "conv3_1")(c3))
        c4 = _lrelu(conv_block(512, 3, 2, "conv4")(c3))
        c4 = _lrelu(conv_block(512, 3, 1, "conv4_1")(c4))
        c5 = _lrelu(conv_block(512, 3, 2, "conv5")(c4))
        c5 = _lrelu(conv_block(512, 3, 1, "conv5_1")(c5))
        c6 = _lrelu(conv_block(1024, 3, 2, "conv6")(c5))
        c6 = _lrelu(conv_block(1024, 3, 1, "conv6_1")(c6))

        flow6 = conv_block(2, 3, 1, "predict_flow6")(c6)
        flow6_up = _FlowUp(use_bias=False, name="upsampled_flow6_to_5")(flow6)
        d5 = _Deconv(512, name="deconv5")(c6)
        cat5 = jnp.concatenate([c5, d5, flow6_up], axis=-1)
        flow5 = conv_block(2, 3, 1, "predict_flow5")(cat5)
        flow5_up = _FlowUp(use_bias=False, name="upsampled_flow5_to_4")(flow5)
        d4 = _Deconv(256, name="deconv4")(cat5)
        cat4 = jnp.concatenate([c4, d4, flow5_up], axis=-1)
        flow4 = conv_block(2, 3, 1, "predict_flow4")(cat4)
        flow4_up = _FlowUp(use_bias=False, name="upsampled_flow4_to_3")(flow4)
        d3 = _Deconv(128, name="deconv3")(cat4)
        cat3 = jnp.concatenate([c3, d3, flow4_up], axis=-1)
        flow3 = conv_block(2, 3, 1, "predict_flow3")(cat3)
        flow3_up = _FlowUp(use_bias=False, name="upsampled_flow3_to_2")(flow3)
        d2 = _Deconv(64, name="deconv2")(cat3)
        cat2 = jnp.concatenate([c2, d2, flow3_up], axis=-1)
        flow2 = conv_block(2, 3, 1, "predict_flow2")(cat2)
        return flow2


class FlowNetSD(nn.Module):
    """FlowNetSD.py — small-displacement net with inter_convs."""

    @nn.compact
    def __call__(self, x):
        c0 = _lrelu(conv_block(64, 3, 1, "conv0")(x))
        c1 = _lrelu(conv_block(64, 3, 2, "conv1")(c0))
        c1 = _lrelu(conv_block(128, 3, 1, "conv1_1")(c1))
        c2 = _lrelu(conv_block(128, 3, 2, "conv2")(c1))
        c2 = _lrelu(conv_block(128, 3, 1, "conv2_1")(c2))
        c3 = _lrelu(conv_block(256, 3, 2, "conv3")(c2))
        c3 = _lrelu(conv_block(256, 3, 1, "conv3_1")(c3))
        c4 = _lrelu(conv_block(512, 3, 2, "conv4")(c3))
        c4 = _lrelu(conv_block(512, 3, 1, "conv4_1")(c4))
        c5 = _lrelu(conv_block(512, 3, 2, "conv5")(c4))
        c5 = _lrelu(conv_block(512, 3, 1, "conv5_1")(c5))
        c6 = _lrelu(conv_block(1024, 3, 2, "conv6")(c5))
        c6 = _lrelu(conv_block(1024, 3, 1, "conv6_1")(c6))

        flow6 = conv_block(2, 3, 1, "predict_flow6")(c6)
        flow6_up = _FlowUp(name="upsampled_flow6_to_5")(flow6)
        d5 = _Deconv(512, name="deconv5")(c6)
        cat5 = jnp.concatenate([c5, d5, flow6_up], axis=-1)
        i5 = conv_block(512, 3, 1, "inter_conv5")(cat5)  # i_conv: no activation
        flow5 = conv_block(2, 3, 1, "predict_flow5")(i5)
        flow5_up = _FlowUp(name="upsampled_flow5_to_4")(flow5)
        d4 = _Deconv(256, name="deconv4")(cat5)
        cat4 = jnp.concatenate([c4, d4, flow5_up], axis=-1)
        i4 = conv_block(256, 3, 1, "inter_conv4")(cat4)
        flow4 = conv_block(2, 3, 1, "predict_flow4")(i4)
        flow4_up = _FlowUp(name="upsampled_flow4_to_3")(flow4)
        d3 = _Deconv(128, name="deconv3")(cat4)
        cat3 = jnp.concatenate([c3, d3, flow4_up], axis=-1)
        i3 = conv_block(128, 3, 1, "inter_conv3")(cat3)
        flow3 = conv_block(2, 3, 1, "predict_flow3")(i3)
        flow3_up = _FlowUp(name="upsampled_flow3_to_2")(flow3)
        d2 = _Deconv(64, name="deconv2")(cat3)
        cat2 = jnp.concatenate([c2, d2, flow3_up], axis=-1)
        i2 = conv_block(64, 3, 1, "inter_conv2")(cat2)
        flow2 = conv_block(2, 3, 1, "predict_flow2")(i2)
        return flow2


class FlowNetFusion(nn.Module):
    """FlowNetFusion.py — shallow fusion net, input 11 channels."""

    @nn.compact
    def __call__(self, x):
        c0 = _lrelu(conv_block(64, 3, 1, "conv0")(x))
        c1 = _lrelu(conv_block(64, 3, 2, "conv1")(c0))
        c1 = _lrelu(conv_block(128, 3, 1, "conv1_1")(c1))
        c2 = _lrelu(conv_block(128, 3, 2, "conv2")(c1))
        c2 = _lrelu(conv_block(128, 3, 1, "conv2_1")(c2))

        flow2 = conv_block(2, 3, 1, "predict_flow2")(c2)
        flow2_up = _FlowUp(name="upsampled_flow2_to_1")(flow2)
        d1 = _Deconv(32, name="deconv1")(c2)
        cat1 = jnp.concatenate([c1, d1, flow2_up], axis=-1)  # 162
        i1 = conv_block(32, 3, 1, "inter_conv1")(cat1)
        flow1 = conv_block(2, 3, 1, "predict_flow1")(i1)
        flow1_up = _FlowUp(name="upsampled_flow1_to_0")(flow1)
        d0 = _Deconv(16, name="deconv0")(cat1)
        cat0 = jnp.concatenate([c0, d0, flow1_up], axis=-1)  # 82
        i0 = conv_block(16, 3, 1, "inter_conv0")(cat0)
        return conv_block(2, 3, 1, "predict_flow0")(i0)


class FlowNet2(nn.Module):
    """Full cascade (flownet2.py:32-199). Input: img1, img2 (B, H, W, 3) RGB
    in [0, 255], H and W divisible by 64. Output: flow (B, H, W, 2) pixels."""

    rgb_max: float = 255.0
    div_flow: float = 20.0
    # None → f32 everywhere (reference-exact); default bf16 conv stack.
    compute_dtype: object = COMPUTE_DTYPE

    @nn.compact
    def __call__(self, img1, img2):
        global _ACTIVE_DTYPE
        _ACTIVE_DTYPE = self.compute_dtype
        try:
            return self._cascade(img1, img2)
        finally:
            _ACTIVE_DTYPE = COMPUTE_DTYPE

    def _cascade(self, img1, img2):
        # joint per-channel mean over both frames (flownet2.py:135-138)
        stacked = jnp.stack([img1, img2], axis=1)  # (B, 2, H, W, 3)
        rgb_mean = jnp.mean(stacked, axis=(1, 2, 3), keepdims=True)
        x1 = (img1 - rgb_mean[:, 0]) / self.rgb_max
        x2 = (img2 - rgb_mean[:, 0]) / self.rgb_max
        h, w = x1.shape[1:3]

        flownetc_flow2 = FlowNetC(name="flownetc")(x1, x2)
        flownetc_flow = resize_bilinear(flownetc_flow2 * self.div_flow, (h, w))

        res_img1 = resample2d(x2, flownetc_flow)
        norm_diff = channel_norm(x1 - res_img1)
        concat1 = jnp.concatenate(
            [x1, x2, res_img1, flownetc_flow / self.div_flow, norm_diff], axis=-1
        )  # 12 ch

        flownets1_flow2 = FlowNetS(name="flownets_1")(concat1)
        flownets1_flow = resize_bilinear(flownets1_flow2 * self.div_flow, (h, w))

        res_img1 = resample2d(x2, flownets1_flow)
        norm_diff = channel_norm(x1 - res_img1)
        concat2 = jnp.concatenate(
            [x1, x2, res_img1, flownets1_flow / self.div_flow, norm_diff], axis=-1
        )

        flownets2_flow2 = FlowNetS(name="flownets_2")(concat2)
        flownets2_flow = resize_nearest(flownets2_flow2 * self.div_flow, (h, w))
        norm_flownets2 = channel_norm(flownets2_flow)
        diff2 = resample2d(x2, flownets2_flow)
        diff2_img1 = channel_norm(x1 - diff2)

        x_cat = jnp.concatenate([x1, x2], axis=-1)
        flownetsd_flow2 = FlowNetSD(name="flownets_d")(x_cat)
        flownetsd_flow = resize_nearest(flownetsd_flow2 / self.div_flow, (h, w))
        norm_flownetsd = channel_norm(flownetsd_flow)
        diffsd = resample2d(x2, flownetsd_flow)
        diffsd_img1 = channel_norm(x1 - diffsd)

        concat3 = jnp.concatenate(
            [
                x1,
                flownetsd_flow,
                flownets2_flow,
                norm_flownetsd,
                norm_flownets2,
                diffsd_img1,
                diff2_img1,
            ],
            axis=-1,
        )  # 11 ch
        return FlowNetFusion(name="flownetfusion")(concat3)
