"""ResNet backbone (50/101), torch-parity, NHWC.

Mirrors the reference's mmdet ResNet
(/root/reference/mmdet/models/backbones/resnet.py:333, config
`depth=50, num_stages=4, out_indices=(0,1,2,3), frozen_stages=1,
style='pytorch'`): 7×7/2 stem + 3×3/2 maxpool, Bottleneck stages
[3, 4, 6, 3], pytorch-style stride (stride 2 on the 3×3 conv), BatchNorm in
eval mode (FrozenBatchNorm), and ``frozen_stages`` implemented with
``stop_gradient`` (parameter-freezing semantics of requires_grad=False).

Plugin hooks (resnet.py:148-206 + 243-250): per-stage DCN (v1/modulated)
replacing conv2, GCNet ContextBlock after norm3, GeneralizedAttention after
the conv2 stage — `dcn=`/`stage_with_dcn=`, `gcb=`/`stage_with_gcb=`,
`gen_attention=`/`stage_with_gen_attention=` config surface.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import BACKBONES
from vps_tpu.models.layers import Conv, FrozenBatchNorm, max_pool
from vps_tpu.models.plugins import ContextBlock, GeneralizedAttention
from vps_tpu.ops.deform_conv import deform_conv2d_grouped

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; out channels = planes * 4
    stride: int = 1
    dilation: int = 1
    style: str = "pytorch"
    downsample: bool = False
    groups: int = 1  # >1 + base_width → ResNeXt (backbones/resnext.py)
    base_width: int = 4
    dcn: Optional[Dict[str, Any]] = None  # {modulated, deformable_groups, fallback_on_stride}
    gcb: Optional[Dict[str, Any]] = None  # ContextBlock kwargs (ratio, ...)
    gen_attention: Optional[Dict[str, Any]] = None  # GeneralizedAttention kwargs
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        conv1_stride = 1 if self.style == "pytorch" else self.stride
        conv2_stride = self.stride if self.style == "pytorch" else 1
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = Conv(width, 1, conv1_stride, 0, use_bias=False, name="conv1",
                   dtype=self.dtype)(x)
        out = FrozenBatchNorm(width, name="bn1")(out)
        out = jax.nn.relu(out)
        dcn = self.dcn
        if dcn is not None and dcn.get("fallback_on_stride", False) \
                and conv2_stride > 1:
            dcn = None
        if dcn is None:
            out = Conv(
                width, 3, conv2_stride, self.dilation, self.dilation,
                use_bias=False, groups=self.groups, name="conv2",
                dtype=self.dtype,
            )(out)
        else:
            # DCN conv2 (resnet.py:148-186 + 229-239): a plain 3x3 conv
            # (zero-init, like constant_init(conv2_offset, 0)) predicts
            # per-group offsets (+ sigmoid masks when modulated)
            dg = dcn.get("deformable_groups", 1)
            modulated = dcn.get("modulated", False)
            off_ch = dg * (27 if modulated else 18)
            off = Conv(
                off_ch, 3, conv2_stride, self.dilation, self.dilation,
                kernel_init=nn.initializers.zeros, name="conv2_offset",
            )(out)
            w2 = self.param(
                "conv2_weight", nn.initializers.he_normal(),
                (3, 3, width, width),
            )
            if modulated:
                offset = off[..., : dg * 18]
                mask = jax.nn.sigmoid(off[..., dg * 18:])
            else:
                offset, mask = off, None
            xc = out if self.dtype is None else out.astype(self.dtype)
            wc = w2 if self.dtype is None else w2.astype(self.dtype)
            out = deform_conv2d_grouped(
                xc, offset, wc, dg, stride=conv2_stride,
                padding=self.dilation, dilation=self.dilation, mask=mask,
            ).astype(jnp.float32)
        out = FrozenBatchNorm(width, name="bn2")(out)
        out = jax.nn.relu(out)
        if self.gen_attention is not None:
            out = GeneralizedAttention(
                in_dim=width, name="gen_attention_block",
                **self.gen_attention,
            )(out)
        out = Conv(self.planes * 4, 1, 1, 0, use_bias=False, name="conv3",
                   dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.gcb is not None:
            out = ContextBlock(name="context_block", **self.gcb)(out)
        if self.downsample:
            identity = Conv(self.planes * 4, 1, self.stride, 0, use_bias=False,
                            name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    style: str = "pytorch"
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv(self.planes, 3, self.stride, self.dilation, self.dilation,
                   use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.planes, 3, 1, 1, use_bias=False, name="conv2",
                   dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        if self.downsample:
            identity = Conv(self.planes, 1, self.stride, 0, use_bias=False,
                            name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenBatchNorm(self.planes, name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


@BACKBONES.register
class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    style: str = "pytorch"
    groups: int = 1
    base_width: int = 4
    dcn: Optional[Dict[str, Any]] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    gcb: Optional[Dict[str, Any]] = None
    stage_with_gcb: Sequence[bool] = (False, False, False, False)
    gen_attention: Optional[Dict[str, Any]] = None
    # per-stage tuples of block indices that mount GeneralizedAttention
    stage_with_gen_attention: Sequence[Sequence[int]] = ((), (), (), ())
    dtype: object = None  # compute dtype (e.g. bf16 inference); params f32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_kind == "bottleneck" else BasicBlock

        x = Conv(64, 7, 2, 3, use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        x = max_pool(x, 3, 2, 1)

        outs = []
        planes = 64
        # inplanes tracking: block 0 of a stage projects the identity ONLY
        # when the shape actually changes (torch resnet.py _make_layer:
        # stride != 1 or inplanes != planes * expansion). For Bottleneck
        # that is every stage; for BasicBlock (ResNet-18/34) layer1.0 has
        # NO downsample — an unconditional projection there would leave a
        # never-converted random branch in torch-weight parity.
        expansion = 4 if block_kind == "bottleneck" else 1
        inplanes = 64
        for i in range(self.num_stages):
            nblocks = stage_blocks[i]
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(nblocks):
                kwargs = {"dtype": self.dtype}
                if block_kind == "bottleneck":
                    kwargs.update(
                        groups=self.groups,
                        base_width=self.base_width,
                        dcn=self.dcn if self.stage_with_dcn[i] else None,
                        gcb=self.gcb if self.stage_with_gcb[i] else None,
                        gen_attention=(
                            self.gen_attention
                            if j in self.stage_with_gen_attention[i]
                            else None
                        ),
                    )
                blk_stride = stride if j == 0 else 1
                x = block_cls(
                    planes=planes,
                    stride=blk_stride,
                    dilation=dilation,
                    style=self.style,
                    downsample=(j == 0 and (blk_stride != 1
                                            or inplanes != planes * expansion)),
                    name=f"layer{i + 1}_{j}",
                    **kwargs,
                )(x)
                inplanes = planes * expansion
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


from vps_tpu.registry import SHARED_HEADS  # noqa: E402


@SHARED_HEADS.register
class ResLayer(nn.Module):
    """Shared ResNet stage applied to pooled ROI windows (reference
    /root/reference/mmdet/models/shared_heads/res_layer.py:14): the C4
    detector family pools 14×14 windows from the stage-3 map and runs the
    res5 blocks (stride 2) per ROI before the box head. norm_eval semantics
    come for free from FrozenBatchNorm."""

    depth: int = 50
    stage: int = 3
    stride: int = 2
    dilation: int = 1
    style: str = "pytorch"

    @nn.compact
    def __call__(self, x):
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_kind == "bottleneck" else BasicBlock
        expansion = 4 if block_kind == "bottleneck" else 1
        planes = 64 * 2 ** self.stage
        inplanes = 64 * 2 ** (self.stage - 1) * expansion
        for j in range(stage_blocks[self.stage]):
            blk_stride = self.stride if j == 0 else 1
            x = block_cls(
                planes=planes,
                stride=blk_stride,
                dilation=self.dilation,
                style=self.style,
                downsample=(j == 0 and (blk_stride != 1
                                        or inplanes != planes * expansion)),
                name=f"layer{self.stage + 1}_{j}",
            )(x)
            inplanes = planes * expansion
        return x


@BACKBONES.register
class ResNeXt(ResNet):
    """ResNeXt (reference backbones/resnext.py): grouped-conv Bottleneck.
    Config-parity alias — `ResNet` with groups/base_width set; registered
    separately so `type='ResNeXt'` configs resolve."""

    groups: int = 32
    base_width: int = 4
