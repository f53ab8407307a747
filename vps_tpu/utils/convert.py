"""torch → JAX weight conversion for the reference's released checkpoints
(mmdet FuseTrack/Fuse/Track detector .pth and FlowNet2_checkpoint.pth.tar).

Layout transforms:
  conv    (O, I, kh, kw)       → (kh, kw, I, O)
  deconv  (I, O, kh, kw)       → (kh, kw, I, O), spatially flipped
            (gradient-of-conv orientation used by TorchConvTranspose)
  linear  (O, I)               → (I, O)
  linear over ROI features: torch flattens (C, H, W); we flatten (H, W, C) —
            the input axis is permuted accordingly.

Run: python -m vps_tpu.utils.convert --src latest.pth --dst params/ \
         [--flownet FlowNet2_checkpoint.pth.tar] [--depth 50]
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Tuple

import numpy as np

from vps_tpu.models.resnet import ARCH_SETTINGS


def conv_w(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def deconv_w(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def linear_w(w):
    return np.ascontiguousarray(w.T)


def linear_chw_w(w, c, h, wid):
    o = w.shape[0]
    return np.ascontiguousarray(
        w.reshape(o, c, h, wid).transpose(2, 3, 1, 0).reshape(h * wid * c, o)
    )


def _set(tree: Dict, path: Tuple[str, ...], value):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = np.asarray(value, np.float32)


class Mapper:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.used = set()

    def conv(self, sd, tkey, *path, bias=True):
        if tkey + ".weight" not in sd:
            return False
        _set(self.params, path + ("kernel",), conv_w(sd[tkey + ".weight"]))
        self.used.add(tkey + ".weight")
        if bias and tkey + ".bias" in sd:
            _set(self.params, path + ("bias",), sd[tkey + ".bias"])
            self.used.add(tkey + ".bias")
        return True

    def deconv(self, sd, tkey, *path, bias=True):
        if tkey + ".weight" not in sd:
            return False
        _set(self.params, path + ("kernel",), deconv_w(sd[tkey + ".weight"]))
        self.used.add(tkey + ".weight")
        if bias and tkey + ".bias" in sd:
            _set(self.params, path + ("bias",), sd[tkey + ".bias"])
            self.used.add(tkey + ".bias")
        return True

    def bn(self, sd, tkey, *path):
        if tkey + ".weight" not in sd:
            return False
        _set(self.params, path + ("scale",), sd[tkey + ".weight"])
        _set(self.params, path + ("bias",), sd[tkey + ".bias"])
        _set(self.batch_stats, path + ("mean",), sd[tkey + ".running_mean"])
        _set(self.batch_stats, path + ("var",), sd[tkey + ".running_var"])
        for s in (".weight", ".bias", ".running_mean", ".running_var"):
            self.used.add(tkey + s)
        return True

    def gn(self, sd, tkey, *path):
        if tkey + ".weight" not in sd:
            return False
        _set(self.params, path + ("scale",), sd[tkey + ".weight"])
        _set(self.params, path + ("bias",), sd[tkey + ".bias"])
        self.used.add(tkey + ".weight")
        self.used.add(tkey + ".bias")
        return True

    def linear(self, sd, tkey, *path, chw=None):
        if tkey + ".weight" not in sd:
            return False
        w = sd[tkey + ".weight"]
        w = linear_chw_w(w, *chw) if chw else linear_w(w)
        _set(self.params, path + ("kernel",), w)
        _set(self.params, path + ("bias",), sd[tkey + ".bias"])
        self.used.add(tkey + ".weight")
        self.used.add(tkey + ".bias")
        return True


def convert_detector(sd: Dict[str, np.ndarray], depth: int = 50):
    """mmdet detector state_dict → (params, batch_stats) trees."""
    m = Mapper()
    _, stage_blocks = ARCH_SETTINGS[depth]

    # backbone
    m.conv(sd, "backbone.conv1", "backbone", "conv1", "Conv_0", bias=False)
    m.bn(sd, "backbone.bn1", "backbone", "bn1")
    for s, nblocks in enumerate(stage_blocks, start=1):
        for j in range(nblocks):
            blk = f"backbone.layer{s}.{j}"
            ours = ("backbone", f"layer{s}_{j}")
            for k in (1, 2, 3):
                m.conv(sd, f"{blk}.conv{k}", *ours, f"conv{k}", "Conv_0",
                       bias=False)
                m.bn(sd, f"{blk}.bn{k}", *ours, f"bn{k}")
            m.conv(sd, f"{blk}.downsample.0", *ours, "downsample_conv",
                   "Conv_0", bias=False)
            m.bn(sd, f"{blk}.downsample.1", *ours, "downsample_bn")

    # FPN
    for i in range(4):
        m.conv(sd, f"neck.lateral_convs.{i}.conv", "neck", f"lateral{i}", "Conv_0")
        m.conv(sd, f"neck.fpn_convs.{i}.conv", "neck", f"fpn{i}", "Conv_0")

    # RPN
    m.conv(sd, "rpn_head.rpn_conv", "rpn_head", "rpn_conv", "Conv_0")
    m.conv(sd, "rpn_head.rpn_cls", "rpn_head", "rpn_cls", "Conv_0")
    m.conv(sd, "rpn_head.rpn_reg", "rpn_head", "rpn_reg", "Conv_0")

    # bbox head (first FC consumes flattened 256×7×7 ROI features)
    m.linear(sd, "bbox_head.shared_fcs.0", "bbox_head", "shared_fc0",
             chw=(256, 7, 7))
    m.linear(sd, "bbox_head.shared_fcs.1", "bbox_head", "shared_fc1")
    m.linear(sd, "bbox_head.fc_cls", "bbox_head", "fc_cls")
    m.linear(sd, "bbox_head.fc_reg", "bbox_head", "fc_reg")

    # track head
    m.linear(sd, "track_head.fcs.0", "track_head", "fc0", chw=(256, 7, 7))
    m.linear(sd, "track_head.fcs.1", "track_head", "fc1")

    # mask head
    for i in range(4):
        m.conv(sd, f"mask_head.convs.{i}.conv", "mask_head", f"conv{i}", "Conv_0")
    m.deconv(sd, "mask_head.upsample", "mask_head", "upsample")
    m.conv(sd, "mask_head.conv_logits", "mask_head", "conv_logits", "Conv_0")

    # UPSNet panoptic head: shared tower deform_convs.0.{0,3,6} + GN {1,4,7}
    for i, seq in enumerate((0, 3, 6)):
        base = f"panopticFPN.deform_convs.0.{seq}"
        m.conv(sd, f"{base}.conv_offset", "panopticFPN", f"dc{i}", "conv_offset",
               "Conv_0")
        if f"{base}.conv.weight" in sd:
            _set(m.params, ("panopticFPN", f"dc{i}", "weight"),
                 conv_w(sd[f"{base}.conv.weight"]))
            m.used.add(f"{base}.conv.weight")
    for i, seq in enumerate((1, 4, 7)):
        m.gn(sd, f"panopticFPN.deform_convs.0.{seq}", "panopticFPN", f"gn{i}")
    m.conv(sd, "panopticFPN.conv_pred.conv", "panopticFPN", "conv_pred", "Conv_0")

    # Fuse neck (BFPTcea)
    for i in range(3):
        m.conv(sd, f"extra_neck.liteflownet.flow_estimator.convs.{i}.0",
               "extra_neck", "liteflownet", "flow_estimator", f"c{i}", "Conv_0")
    m.conv(sd, "extra_neck.liteflownet.flow_estimator.convs.3",
           "extra_neck", "liteflownet", "flow_estimator", "c3", "Conv_0")
    for t in ("tAtt_1", "tAtt_2", "fea_fusion", "sAtt_1", "sAtt_2", "sAtt_3",
              "sAtt_4", "sAtt_add_1", "sAtt_add_2"):
        m.conv(sd, f"extra_neck.tcea_fusion.{t}", "extra_neck", "tcea_fusion",
               t, "Conv_0")
    # ConvModule nests Conv inside: refine/Conv_0/Conv_0
    m.conv(sd, "extra_neck.refine.conv", "extra_neck", "refine", "Conv_0",
           "Conv_0")

    # embedded FlowNet2 (if stored in the same checkpoint)
    fnet = {k[len("flownet2."):]: v for k, v in sd.items()
            if k.startswith("flownet2.")}
    if fnet:
        fp, _ = convert_flownet2(fnet)
        m.params["flownet2"] = fp["flownet2"]
        m.used.update("flownet2." + k for k in fnet)

    return m.params, m.batch_stats, m.used


def convert_flownet2(sd: Dict[str, np.ndarray]):
    """FlowNet2 state_dict → params subtree under 'flownet2'."""
    m = Mapper()

    def net(prefix, ours, convs, deconvs, flow_ups, inter_convs=()):
        for c in convs:
            # submodules.conv → Sequential(Conv2d, LeakyReLU): key '.0'
            m.conv(sd, f"{prefix}.{c}.0", "flownet2", ours, c, "Conv_0")
        for c in inter_convs:
            m.conv(sd, f"{prefix}.{c}.0", "flownet2", ours, c, "Conv_0")
        for i in range(2, 7):
            m.conv(sd, f"{prefix}.predict_flow{i}", "flownet2", ours,
                   f"predict_flow{i}", "Conv_0")
        for d in deconvs:
            m.deconv(sd, f"{prefix}.{d}.0", "flownet2", ours, d, "deconv")
        for u in flow_ups:
            m.deconv(sd, f"{prefix}.{u}", "flownet2", ours, u, "up")

    enc = ["conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1", "conv5",
           "conv5_1", "conv6", "conv6_1"]
    deconvs = ["deconv5", "deconv4", "deconv3", "deconv2"]
    ups = ["upsampled_flow6_to_5", "upsampled_flow5_to_4",
           "upsampled_flow4_to_3", "upsampled_flow3_to_2"]

    net("flownetc", "flownetc", enc + ["conv_redir"], deconvs, ups)
    net("flownets_1", "flownets_1", enc, deconvs, ups)
    net("flownets_2", "flownets_2", enc, deconvs, ups)
    net("flownets_d", "flownets_d",
        ["conv0", "conv1", "conv1_1", "conv2", "conv2_1", "conv3", "conv3_1",
         "conv4", "conv4_1", "conv5", "conv5_1", "conv6", "conv6_1"],
        deconvs, ups,
        inter_convs=["inter_conv5", "inter_conv4", "inter_conv3", "inter_conv2"])
    # fusion net
    for c in ["conv0", "conv1", "conv1_1", "conv2", "conv2_1"]:
        m.conv(sd, f"flownetfusion.{c}.0", "flownet2", "flownetfusion", c, "Conv_0")
    for c in ["inter_conv1", "inter_conv0"]:
        m.conv(sd, f"flownetfusion.{c}.0", "flownet2", "flownetfusion", c, "Conv_0")
    for i in (0, 1, 2):
        m.conv(sd, f"flownetfusion.predict_flow{i}", "flownet2", "flownetfusion",
               f"predict_flow{i}", "Conv_0")
    for d in ("deconv1", "deconv0"):
        m.deconv(sd, f"flownetfusion.{d}.0", "flownet2", "flownetfusion", d,
                 "deconv")
    for u in ("upsampled_flow2_to_1", "upsampled_flow1_to_0"):
        m.deconv(sd, f"flownetfusion.{u}", "flownet2", "flownetfusion", u, "up")
    return m.params, m.used


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="detector .pth")
    ap.add_argument("--flownet", default=None, help="FlowNet2 .pth.tar")
    ap.add_argument("--dst", required=True, help="output orbax checkpoint dir")
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()

    sd = load_torch_state_dict(args.src)
    params, batch_stats, used = convert_detector(sd, args.depth)
    missed = [k for k in sd if k not in used and "num_batches_tracked" not in k]
    if missed:
        print(f"WARNING: {len(missed)} torch keys unconverted, e.g. {missed[:8]}")
    if args.flownet:
        fsd = load_torch_state_dict(args.flownet)
        fparams, fused = convert_flownet2(fsd)
        params["flownet2"] = fparams["flownet2"]
        fmissed = [k for k in fsd if k not in fused
                   and "num_batches_tracked" not in k]
        if fmissed:
            print(f"WARNING: flownet keys unconverted: {fmissed[:8]}")

    from vps_tpu.utils.checkpoint import save_checkpoint

    path = save_checkpoint(args.dst, 0, params, batch_stats=batch_stats,
                           meta=dict(source=args.src))
    print(f"saved converted checkpoint to {path}")


if __name__ == "__main__":
    main()
