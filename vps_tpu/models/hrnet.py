"""HRNet backbone — parallel multi-resolution streams with repeated fusion.

Equivalent of the reference /root/reference/mmdet/models/backbones/hrnet.py
(HRModule + HRNet, ~500 LoC torch): stem (2× conv/2) → layer1 (4 Bottleneck)
→ 3 stages of parallel branches at strides {4, 8, 16, 32} with full
cross-resolution fusion after every module. NHWC, FrozenBatchNorm, static
shapes. Configured by the standard `extra` dict (num_modules/num_branches/
num_blocks/num_channels per stage), e.g. HRNetV2p-W32.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import BACKBONES
from vps_tpu.models.layers import Conv, FrozenBatchNorm, resize_bilinear
from vps_tpu.models.resnet import BasicBlock, Bottleneck

HRNET_W32 = {
    "stage1": dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                   num_blocks=(4,), num_channels=(64,)),
    "stage2": dict(num_modules=1, num_branches=2, block="BASIC",
                   num_blocks=(4, 4), num_channels=(32, 64)),
    "stage3": dict(num_modules=4, num_branches=3, block="BASIC",
                   num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
    "stage4": dict(num_modules=3, num_branches=4, block="BASIC",
                   num_blocks=(4, 4, 4, 4), num_channels=(32, 64, 128, 256)),
}


class HRModule(nn.Module):
    """One high-resolution module: per-branch blocks + full fusion
    (hrnet.py HRModule)."""

    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    block: str = "BASIC"

    @nn.compact
    def __call__(self, xs):
        block_cls = BasicBlock if self.block == "BASIC" else Bottleneck
        mult = 1 if self.block == "BASIC" else 4
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            for j in range(self.num_blocks[b]):
                need_ds = j == 0 and x.shape[-1] != self.num_channels[b] * mult
                x = block_cls(
                    planes=self.num_channels[b],
                    stride=1,
                    downsample=need_ds,
                    name=f"branch{b}_block{j}",
                )(x)
            outs.append(x)

        # full cross-resolution fusion: out_i = Σ_j f_ij(x_j)
        fused = []
        for i in range(self.num_branches):
            ci = self.num_channels[i] * mult
            acc = outs[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                y = outs[j]
                if j > i:  # lower res → upsample: 1×1 conv + bilinear
                    y = Conv(ci, 1, 1, 0, use_bias=False,
                             name=f"fuse{i}_{j}_conv")(y)
                    y = FrozenBatchNorm(ci, name=f"fuse{i}_{j}_bn")(y)
                    y = resize_bilinear(y, acc.shape[-3:-1])
                else:  # higher res → downsample with stride-2 3×3 convs
                    for s in range(i - j):
                        last = s == i - j - 1
                        cs = ci if last else y.shape[-1]
                        y = Conv(cs, 3, 2, 1, use_bias=False,
                                 name=f"fuse{i}_{j}_ds{s}_conv")(y)
                        y = FrozenBatchNorm(cs, name=f"fuse{i}_{j}_ds{s}_bn")(y)
                        if not last:
                            y = jax.nn.relu(y)
                acc = acc + y
            fused.append(jax.nn.relu(acc))
        return fused


@BACKBONES.register
class HRNet(nn.Module):
    extra: Any = None  # stage config dict; defaults to HRNetV2p-W32
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        cfg: Dict[str, Dict] = dict(self.extra) if self.extra else HRNET_W32

        # stem: two stride-2 3×3 convs → 1/4 resolution
        x = Conv(64, 3, 2, 1, use_bias=False, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = Conv(64, 3, 2, 1, use_bias=False, name="conv2")(x)
        x = FrozenBatchNorm(64, name="bn2")(x)
        x = jax.nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        # stage 1: 4 Bottlenecks at full branch resolution
        s1 = cfg["stage1"]
        for j in range(s1["num_blocks"][0]):
            x = Bottleneck(
                planes=s1["num_channels"][0],
                stride=1,
                downsample=(j == 0),
                name=f"layer1_{j}",
            )(x)
        xs = [x]

        for si, key in enumerate(["stage2", "stage3", "stage4"]):
            sc = cfg[key]
            nb = sc["num_branches"]
            mult = 1 if sc["block"] == "BASIC" else 4
            chans = [c * mult for c in sc["num_channels"]]
            # transition: match channels; new branch = stride-2 conv of last
            new_xs = []
            for b in range(nb):
                if b < len(xs):
                    y = xs[b]
                    if y.shape[-1] != chans[b]:
                        y = Conv(chans[b], 3, 1, 1, use_bias=False,
                                 name=f"t{si}_b{b}_conv")(y)
                        y = FrozenBatchNorm(chans[b], name=f"t{si}_b{b}_bn")(y)
                        y = jax.nn.relu(y)
                else:
                    y = Conv(chans[b], 3, 2, 1, use_bias=False,
                             name=f"t{si}_b{b}_conv")(xs[-1])
                    y = FrozenBatchNorm(chans[b], name=f"t{si}_b{b}_bn")(y)
                    y = jax.nn.relu(y)
                new_xs.append(y)
            xs = new_xs
            for m in range(sc["num_modules"]):
                xs = HRModule(
                    num_branches=nb,
                    num_blocks=sc["num_blocks"],
                    num_channels=sc["num_channels"],
                    block=sc["block"],
                    name=f"{key}_m{m}",
                )(xs)
            if self.frozen_stages >= si + 1:
                xs = [jax.lax.stop_gradient(y) for y in xs]
        return tuple(xs)
