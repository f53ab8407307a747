"""UPSNet-style semantic head (reference
/root/reference/mmdet/models/panoptic/upsnetFPN.py:15-81): a SHARED tower of
3 × (DeformConvWithOffset → GroupNorm(32) → ReLU) applied to each of 4 FPN
levels, all upsampled bilinearly to 1/4 scale, concatenated, 1×1 conv to
num_classes logits; returns (4× upsampled logits, 1/4-scale logits).

The deformable convs (the reference's CUDA DCN, SURVEY.md §2.3 row 5) run
through vps_tpu.ops.deform_conv2d (gather + MXU matmul). Offset convs are
zero-initialized exactly like DeformConvWithOffset
(mmdet/models/utils/deform_conv_with_offset.py:25-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import PANOPTIC
from vps_tpu.models.layers import Conv, resize_bilinear
from vps_tpu.ops import deform_conv2d
from vps_tpu.ops.deform_conv import (
    deform_conv2d_multilevel,
    deform_conv2d_windowed,
)
from vps_tpu.ops.losses import softmax_cross_entropy


class DeformConvWithOffset(nn.Module):
    features: int
    kernel_size: int = 3
    padding: int = 1
    # bf16 gathers+matmuls halve HBM traffic of the sampling (the head's
    # dominant cost); offsets and the GroupNorm that follows stay f32.
    compute_dtype: object = jnp.bfloat16
    # When set, offsets are clamped to [-dcn_window, dcn_window] and the
    # sampling runs through the gather-free Pallas strip kernel
    # (ops.deform_conv2d_windowed) on TPU. None keeps the exact unclamped
    # gather formulation.
    dcn_window: int | None = None
    # "nearest" rounds sample positions (1 gather/tap instead of 4) — the
    # fast-preset approximation; "bilinear" = exact reference semantics.
    dcn_sampling: str = "bilinear"

    @nn.compact
    def __call__(self, x):
        """x: one (B, H, W, C) map or a LIST of them (the shared-tower
        multi-level case). A list runs all levels through ONE concatenated
        gather stream (deform_conv2d_multilevel) — gathers are index-bound
        on TPU, so K·4 gathers total beats K·4 per level — with identical
        per-element math; params are shared either way."""
        multilevel = isinstance(x, (list, tuple))
        xs = list(x) if multilevel else [x]
        k = self.kernel_size
        offset_conv = Conv(
            k * k * 2, 3, 1, 1,
            kernel_init=nn.initializers.zeros,
            name="conv_offset",
        )
        offsets = [offset_conv(xi) for xi in xs]
        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (k, k, xs[0].shape[-1], self.features),
        )
        cd = self.compute_dtype
        xcs = xs if cd is None else [xi.astype(cd) for xi in xs]
        wc = weight if cd is None else weight.astype(cd)
        if self.dcn_window is not None:
            outs = [
                deform_conv2d_windowed(
                    xc, off, wc, self.padding, int(self.dcn_window)
                )
                for xc, off in zip(xcs, offsets)
            ]
        elif multilevel:
            outs = deform_conv2d_multilevel(
                xcs, offsets, wc, padding=self.padding,
                sampling=self.dcn_sampling,
            )
        else:
            outs = [
                deform_conv2d(
                    xcs[0], offsets[0], wc, padding=self.padding,
                    sampling=self.dcn_sampling,
                )
            ]
        if cd is not None:
            outs = [o.astype(jnp.float32) for o in outs]
        return outs if multilevel else outs[0]


@PANOPTIC.register
class UPSNetFPN(nn.Module):
    in_channels: int = 256
    out_channels: int = 128
    num_levels: int = 4
    num_things_classes: int = 8
    num_classes: int = 19
    ignore_label: int = 255
    loss_weight: float = 1.0
    dcn_window: int | None = None
    dcn_sampling: str = "bilinear"
    # bf16 halves the HBM traffic of the DCN sampling (this head's dominant
    # cost); None recovers reference-exact f32 compute (the `exact` preset).
    compute_dtype: object = jnp.bfloat16
    # 4 = reference semantics (tower base at FPN level 0, stride 4).
    # 8 = the lowres-sem preset: level 0 is avg-pooled 2x before the DCN
    # tower, which quarters the dominant stride-4 gather stream (~18M
    # indices/frame at 1024x2048, PERF.md); fcn_score is bilinearly
    # restored to stride 4 so every downstream contract (SegTerm windows,
    # semantic loss at Nx=4) is unchanged. Param-free, so reference-trained
    # weights remain loadable. Accuracy cost measured by
    # tools/preset_accuracy.py.
    head_stride: int = 4

    @property
    def num_stuff_classes(self):
        return self.num_classes - self.num_things_classes

    @nn.compact
    def __call__(self, inputs):
        """inputs: 4 FPN levels (B, H/4·2^l, W/4·2^l, 256). Returns
        (fcn_output (B, H, W, K) full-res logits, fcn_score (B, H/4, W/4, K))."""
        assert len(inputs) == self.num_levels
        assert self.head_stride in (4, 8), self.head_stride
        if self.head_stride == 8:
            from vps_tpu.models.layers import avg_pool

            inputs = [avg_pool(inputs[0], 2, 2, 0)] + list(inputs[1:])
        tower = [
            (DeformConvWithOffset(self.in_channels, dcn_window=self.dcn_window,
                                  dcn_sampling=self.dcn_sampling,
                                  compute_dtype=self.compute_dtype,
                                  name="dc0"), "gn0"),
            (DeformConvWithOffset(self.out_channels, dcn_window=self.dcn_window,
                                  dcn_sampling=self.dcn_sampling,
                                  compute_dtype=self.compute_dtype,
                                  name="dc1"), "gn1"),
            (DeformConvWithOffset(self.out_channels, dcn_window=self.dcn_window,
                                  dcn_sampling=self.dcn_sampling,
                                  compute_dtype=self.compute_dtype,
                                  name="dc2"), "gn2"),
        ]
        norms = [
            # epsilon 1e-5 = torch nn.GroupNorm default (flax default 1e-6)
            nn.GroupNorm(num_groups=32, epsilon=1e-5, name=n)
            for _, n in tower
        ]
        # shared tower over all levels at once: each stage issues ONE
        # concatenated gather stream instead of one per level (index-bound,
        # PERF.md); GroupNorm stays per-level (reference per-level stats)
        outs = list(inputs)
        for (dc, _), gn in zip(tower, norms):
            outs = [jax.nn.relu(gn(x)) for x in dc(outs)]
        h, w = outs[0].shape[1:3]
        feat = jnp.concatenate(
            [outs[0]]
            + [resize_bilinear(o, (h, w)) for o in outs[1:]],
            axis=-1,
        )
        fcn_score = Conv(
            self.num_classes, 1, 1, 0,
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            name="conv_pred",
        )(feat)
        if self.head_stride == 8:
            # restore the stride-4 contract (SegTerm windows, Nx=4 loss)
            fcn_score = resize_bilinear(fcn_score, (h * 2, w * 2))
            h, w = fcn_score.shape[1:3]
        fcn_output = resize_bilinear(fcn_score, (h * 4, w * 4))
        return fcn_output, fcn_score

    def loss(self, segm_pred, segm_label):
        """CE with ignore_index (upsnetFPN.py:84-88). segm_pred (B, H, W, K)
        channel-last; segm_label (B, H, W) int."""
        l = softmax_cross_entropy(
            segm_pred, segm_label, ignore_index=self.ignore_label
        )
        return {"loss_segm": self.loss_weight * l}
