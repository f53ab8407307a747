"""FULL-inference-graph parity vs an independent torch-CPU composition of the
reference `simple_test` chain (round-3 VERDICT item 3).

The reference's actual inference contract is the whole chain
(/root/reference/mmdet/models/detectors/panoptic_fusetrack.py:502-606):

  compute_flow -> extract_feat (ResNet+FPN) x2 -> BFPTcea fuse neck
  (gather/warp/LiteFlowNetCorr/TCEA/refine/scatter) -> UPSNetFPN semantic
  head -> RPN proposals -> RoIAlign -> bbox head -> MaskROI panoptic dets ->
  track matching (frame 2) -> mask head -> MaskRemoval -> SegTerm ->
  panoptic argmax

ONE set of random torch weights (reference state_dict names, ResNet-18
trunk) is converted through vps_tpu.utils.convert.convert_detector and
driven through BOTH stacks end to end on a 2-frame clip at 64x128, under the
`exact` preset (f32 everywhere, full-res flow input). FlowNet2 itself is
validated separately (structure + 162,518,834-param test); here the flow
net is the shared TinyFlow stand-in so the test exercises the compute_flow
CONVENTIONS (denormalize, pad-to-/64, x0.25 resize with flow rescale,
panoptic_fusetrack.py:117-143) without 162M dead weights.

Asserts per frame: identical det sets (boxes/classes/scores/obj ids),
identical keep sets after MaskRemoval, semantic argmax equal, panoptic
argmax equal up to <=0.1% near-tie pixels.

Torch mirror sources (independent ports, not imports of our code):
  resnet.py:382-426, fpn.py:11-124, bfp_tcea.py:96-149,
  flow_modules.py:37-75+131-152, tcea_modules.py:16-78, upsnetFPN.py:15-81,
  rpn_head.py:55-108, anchor_generator.py:18-72, transforms.py delta2bbox,
  panoptic_fusetrack.py:117-143+358-471+502-606, track_head.py:73-117.
Tail mirrors (RoIAlign/bbox/mask heads, MaskROI, MaskRemoval, SegTerm) are
reused from test_composed_tail / test_torch_parity (already verified there).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vps_tpu import zoo
from vps_tpu.models.detectors import PanopticFuseTrack, empty_track_state
from vps_tpu.utils.convert import convert_detector

from test_composed_tail import (
    np_multilevel_roi_align,
    torch_bbox_head,
    torch_mask_head,
    ref_mask_removal,
    ref_seg_term,
)
from test_torch_parity import torch_mask_roi, torch_deform_conv_v1

H, W = 64, 128
C_DET = 9  # 8 things + background
NUM_SEG = 19
NUM_STUFF = 11
STRIDES = [4, 8, 16, 32]
ANCHOR_STRIDES = [4, 8, 16, 32, 64]
IMG_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.asarray([58.395, 57.12, 57.375], np.float32)

# shared det-stage thresholds (passed identically to both stacks)
SCORE_THRESH = 0.20
NMS_THRESH = 0.5
TOP_N = 12
RPN_CFG = dict(nms_pre=128, nms_post=128, max_num=64, nms_thr=0.7)


# ---------------------------------------------------------------------------
# torch-side primitives (eval mode)
# ---------------------------------------------------------------------------

def _t(sd, k):
    v = sd[k]
    return v if isinstance(v, torch.Tensor) else torch.from_numpy(v)


def conv2d(x, sd, key, stride=1, pad=0):
    b = _t(sd, key + ".bias") if key + ".bias" in sd else None
    return F.conv2d(x, _t(sd, key + ".weight"), b, stride=stride, padding=pad)


def bn_eval(x, sd, key):
    return F.batch_norm(
        x, _t(sd, key + ".running_mean"), _t(sd, key + ".running_var"),
        _t(sd, key + ".weight"), _t(sd, key + ".bias"),
        training=False, eps=1e-5,
    )


def torch_resnet18(sd, x):
    """mmdet ResNet-18, pytorch style, BN eval (resnet.py:382-426)."""
    x = conv2d(x, sd, "backbone.conv1", stride=2, pad=3)
    x = F.relu(bn_eval(x, sd, "backbone.bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    outs = []
    for s, stride in zip((1, 2, 3, 4), (1, 2, 2, 2)):
        for j in range(2):
            p = f"backbone.layer{s}.{j}"
            st = stride if j == 0 else 1
            idt = x
            out = F.relu(bn_eval(conv2d(x, sd, p + ".conv1", stride=st, pad=1),
                                 sd, p + ".bn1"))
            out = bn_eval(conv2d(out, sd, p + ".conv2", pad=1), sd, p + ".bn2")
            if p + ".downsample.0.weight" in sd:
                idt = bn_eval(conv2d(x, sd, p + ".downsample.0", stride=st),
                              sd, p + ".downsample.1")
            x = F.relu(out + idt)
        outs.append(x)
    return outs  # c2..c5


def torch_fpn(sd, feats, num_outs=5):
    """mmdet FPN, add_extra_convs=False -> extra maxpool (fpn.py:96-124)."""
    lats = [conv2d(f, sd, f"neck.lateral_convs.{i}.conv")
            for i, f in enumerate(feats)]
    for i in range(len(lats) - 1, 0, -1):
        lats[i - 1] = lats[i - 1] + F.interpolate(
            lats[i], size=lats[i - 1].shape[-2:], mode="nearest")
    outs = [conv2d(l, sd, f"neck.fpn_convs.{i}.conv", pad=1)
            for i, l in enumerate(lats)]
    for _ in range(num_outs - len(feats)):
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
    return outs


def torch_tiny_flow(fp, img1, img2):
    """Mirror of vps_tpu TinyFlowNet (weights shared FROM our init);
    interface identical to FlowNet2's: [0,255] RGB pair -> (B,2,H,W)."""
    def cw(name):  # flax Conv wrapper path: <name>/Conv_0/{kernel,bias}
        p = fp[name]["Conv_0"]
        k = torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy())
        return k, torch.from_numpy(np.asarray(p["bias"]))

    x = torch.cat([img1, img2], dim=1) / 255.0
    h, w = x.shape[-2:]
    k1, b1 = cw("c1")
    k2, b2 = cw("c2")
    kp, bp = cw("pred")
    x = F.relu(F.conv2d(x, k1, b1, stride=2, padding=1))
    x = F.relu(F.conv2d(x, k2, b2, stride=2, padding=1))
    flow = F.conv2d(x, kp, bp, padding=1)
    return F.interpolate(flow, size=(h, w), mode="bilinear",
                         align_corners=False)


def torch_compute_flow(fp, img, ref_img, scale_factor=0.25):
    """panoptic_fusetrack.py:117-143: denormalize, pad to /64, flow net,
    trim, resize by scale_factor with flow-value rescale."""
    mean = torch.from_numpy(IMG_MEAN).view(1, 3, 1, 1)
    std = torch.from_numpy(IMG_STD).view(1, 3, 1, 1)
    rgb = img * std + mean
    ref = ref_img * std + mean
    h, w = rgb.shape[-2:]
    ph, pw = (-h) % 64, (-w) % 64
    rgb = F.pad(rgb, (0, pw, 0, ph))
    ref = F.pad(ref, (0, pw, 0, ph))
    flow = torch_tiny_flow(fp, rgb, ref)[:, :, :h, :w]
    if scale_factor != 1:
        flow = F.interpolate(flow, scale_factor=scale_factor, mode="bilinear",
                             align_corners=False) * scale_factor
    return flow


def torch_warp(x, flow):
    """WarpingLayer (flow_modules.py:131-152): linspace(-1,1) grid + flow
    normalized by (size-1)/2, grid_sample zeros/align_corners=False."""
    b, c, h, w = x.shape
    gx = torch.linspace(-1.0, 1.0, w).view(1, 1, w).expand(1, h, w)
    gy = torch.linspace(-1.0, 1.0, h).view(1, h, 1).expand(1, h, w)
    vx = gx + flow[:, 0] / ((w - 1.0) / 2.0)
    vy = gy + flow[:, 1] / ((h - 1.0) / 2.0)
    grid = torch.stack([vx, vy], dim=-1)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)


def torch_correlation(x1, x2, md=4):
    """Correlation package semantics: mean over channels, zero pad,
    (dy, dx) row-major channels."""
    b, c, h, w = x1.shape
    x2p = F.pad(x2, (md, md, md, md))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            sh = x2p[:, :, md + dy: md + dy + h, md + dx: md + dx + w]
            outs.append((x1 * sh).mean(dim=1, keepdim=True))
    return torch.cat(outs, dim=1)


def torch_liteflow(sd, x1, x2, flow_init):
    """LiteFlowNetCorr (flow_modules.py:50-75)."""
    p = "extra_neck.liteflownet.flow_estimator.convs"
    x = torch.cat([x1, torch_correlation(x1, x2), flow_init], dim=1)
    x = F.leaky_relu(conv2d(x, sd, p + ".0.0", pad=1), 0.1)
    x = F.leaky_relu(conv2d(x, sd, p + ".1.0", pad=1), 0.1)
    x = F.leaky_relu(conv2d(x, sd, p + ".2.0", pad=1), 0.1)
    return conv2d(x, sd, p + ".3", pad=1)


def torch_tcea(sd, stack, center=0):
    """TCEA_Fusion (tcea_modules.py:49-78); stack (B, N, C, H, W)."""
    p = "extra_neck.tcea_fusion."
    b, n, c, h, w = stack.shape
    emb_ref = conv2d(stack[:, center], sd, p + "tAtt_2", pad=1)
    emb = conv2d(stack.reshape(b * n, c, h, w), sd, p + "tAtt_1",
                 pad=1).view(b, n, -1, h, w)
    cor = torch.stack([(emb[:, i] * emb_ref).sum(1) for i in range(n)], dim=1)
    cor_prob = torch.sigmoid(cor)  # (B, N, H, W)
    cor_prob = cor_prob.unsqueeze(2).repeat(1, 1, c, 1, 1).view(b, -1, h, w)
    fea_w = stack.view(b, -1, h, w) * cor_prob
    fea = F.leaky_relu(conv2d(fea_w, sd, p + "fea_fusion"), 0.1)
    att = F.leaky_relu(conv2d(fea_w, sd, p + "sAtt_1"), 0.1)
    att_max = F.max_pool2d(att, 3, stride=2, padding=1)
    att_avg = F.avg_pool2d(att, 3, stride=2, padding=1)
    att = F.leaky_relu(
        conv2d(torch.cat([att_max, att_avg], dim=1), sd, p + "sAtt_2"), 0.1)
    att = F.leaky_relu(conv2d(att, sd, p + "sAtt_3", pad=1), 0.1)
    att = F.interpolate(att, scale_factor=2, mode="bilinear",
                        align_corners=False)
    att = conv2d(att, sd, p + "sAtt_4", pad=1)
    att_add = conv2d(
        F.leaky_relu(conv2d(att, sd, p + "sAtt_add_1"), 0.1),
        sd, p + "sAtt_add_2")
    att = torch.sigmoid(att)
    return fea * att * 2 + att_add


def torch_bfp_tcea(sd, inputs, ref_inputs, flow_init, refine_level=0):
    """BFPTcea.forward (bfp_tcea.py:96-149)."""
    def gather(feats):
        gsize = feats[refine_level].shape[-2:]
        out = []
        for i, f in enumerate(feats):
            if i < refine_level:
                out.append(F.adaptive_max_pool2d(f, gsize))
            else:
                out.append(F.interpolate(f, size=gsize, mode="nearest"))
        return sum(out) / len(out)

    bsf = gather(inputs)
    ref_bsf = gather(ref_inputs)
    warp_bsf = torch_warp(ref_bsf, flow_init)
    flow_fine = torch_liteflow(sd, bsf, warp_bsf, flow_init)
    warp_bsf = torch_warp(warp_bsf, flow_fine)
    stack = torch.stack([bsf, warp_bsf], dim=1)
    bsf = torch_tcea(sd, stack, center=0)
    bsf = F.relu(conv2d(bsf, sd, "extra_neck.refine.conv", pad=1))
    outs = []
    for i, f in enumerate(inputs):
        osize = f.shape[-2:]
        if i < refine_level:
            res = F.interpolate(bsf, size=osize, mode="nearest")
        else:
            res = F.adaptive_max_pool2d(bsf, osize)
        outs.append(res + f)
    return outs


def torch_upsnet_fpn(sd, inputs):
    """UPSNetFPN.forward (upsnetFPN.py:64-79): shared 3-DCN tower per level,
    GN32+relu, upsample to level0, concat, 1x1 pred, 4x bilinear output."""
    towers = []
    for x in inputs:
        for i, seq in enumerate((0, 3, 6)):
            base = f"panopticFPN.deform_convs.0.{seq}"
            off = conv2d(x, sd, base + ".conv_offset", pad=1)
            x = torch_deform_conv_v1(
                x.double(), off.double(),
                _t(sd, base + ".conv.weight").double(), padding=1).float()
            gw = _t(sd, f"panopticFPN.deform_convs.0.{seq + 1}.weight")
            gb = _t(sd, f"panopticFPN.deform_convs.0.{seq + 1}.bias")
            x = F.relu(F.group_norm(x, 32, gw, gb))
        towers.append(x)
    size0 = towers[0].shape[-2:]
    ups = [towers[0]] + [
        F.interpolate(t, size=size0, mode="bilinear", align_corners=False)
        for t in towers[1:]
    ]
    feat = torch.cat(ups, dim=1)
    fcn_score = conv2d(feat, sd, "panopticFPN.conv_pred.conv")
    fcn_output = F.interpolate(fcn_score, scale_factor=4, mode="bilinear",
                               align_corners=False)
    return fcn_output, fcn_score


# ---------------------------------------------------------------------------
# RPN proposal mirror (rpn_head.py:55-108 + anchor_generator.py:18-72)
# ---------------------------------------------------------------------------

def np_base_anchors(base_size, scales=(8,), ratios=(0.5, 1.0, 2.0)):
    w = h = float(base_size)
    x_ctr, y_ctr = 0.5 * (w - 1), 0.5 * (h - 1)
    hr = np.sqrt(np.asarray(ratios))
    wr = 1.0 / hr
    ws = (w * wr[:, None] * np.asarray(scales)[None, :]).reshape(-1)
    hs = (h * hr[:, None] * np.asarray(scales)[None, :]).reshape(-1)
    return np.round(np.stack([
        x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
        x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)], axis=-1))


def np_grid_anchors(base, fh, fw, stride):
    sx = np.tile(np.arange(fw) * stride, fh)
    sy = np.repeat(np.arange(fh) * stride, fw)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).astype(np.float32)
    return (base[None] + shifts[:, None]).reshape(-1, 4)


def np_delta2bbox(anchors, deltas, img_shape, means=(0.0,) * 4,
                  stds=(1.0,) * 4, wh_ratio_clip=16 / 1000):
    means = np.asarray(means)
    stds = np.asarray(stds)
    d = deltas * stds + means
    max_ratio = abs(np.log(wh_ratio_clip))
    dw = np.clip(d[:, 2], -max_ratio, max_ratio)
    dh = np.clip(d[:, 3], -max_ratio, max_ratio)
    w = anchors[:, 2] - anchors[:, 0] + 1.0
    h = anchors[:, 3] - anchors[:, 1] + 1.0
    cx = anchors[:, 0] + 0.5 * (w - 1)
    cy = anchors[:, 1] + 0.5 * (h - 1)
    gw = w * np.exp(dw)
    gh = h * np.exp(dh)
    gx = cx + w * d[:, 0]
    gy = cy + h * d[:, 1]
    x1 = np.clip(gx - 0.5 * (gw - 1), 0, img_shape[1] - 1)
    y1 = np.clip(gy - 0.5 * (gh - 1), 0, img_shape[0] - 1)
    x2 = np.clip(gx + 0.5 * (gw - 1), 0, img_shape[1] - 1)
    y2 = np.clip(gy + 0.5 * (gh - 1), 0, img_shape[0] - 1)
    return np.stack([x1, y1, x2, y2], axis=-1)


def np_nms(boxes, scores, thr):
    """mmdet 1.x NMS (+1 area convention). Returns kept indices, score-desc."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        iw = np.maximum(xx2 - xx1 + 1, 0)
        ih = np.maximum(yy2 - yy1 + 1, 0)
        inter = iw * ih
        a1 = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
        a2 = (boxes[order[1:], 2] - boxes[order[1:], 0] + 1) * \
             (boxes[order[1:], 3] - boxes[order[1:], 1] + 1)
        iou = inter / (a1 + a2 - inter)
        order = order[1:][iou <= thr]
    return np.asarray(keep, np.int64)


def ref_rpn_proposals(cls_outs, reg_outs, img_shape, cfg):
    """get_bboxes_single (rpn_head.py:55-108), sigmoid cls, per-level NMS,
    cross-level topk (nms_across_levels=False)."""
    all_props = []
    for lvl, (cls, reg) in enumerate(zip(cls_outs, reg_outs)):
        a, fh, fw = cls.shape[-3], cls.shape[-2], cls.shape[-1]
        scores = torch.sigmoid(cls[0]).permute(1, 2, 0).reshape(-1).numpy()
        deltas = reg[0].permute(1, 2, 0).reshape(-1, 4).numpy()
        anchors = np_grid_anchors(
            np_base_anchors(ANCHOR_STRIDES[lvl]), fh, fw, ANCHOR_STRIDES[lvl])
        if cfg["nms_pre"] > 0 and scores.shape[0] > cfg["nms_pre"]:
            top = np.argsort(-scores, kind="stable")[: cfg["nms_pre"]]
            scores, deltas, anchors = scores[top], deltas[top], anchors[top]
        boxes = np_delta2bbox(anchors, deltas, img_shape)
        keep = np_nms(boxes, scores, cfg["nms_thr"])[: cfg["nms_post"]]
        all_props.append(np.concatenate(
            [boxes[keep], scores[keep, None]], axis=1))
    props = np.concatenate(all_props, axis=0)
    num = min(cfg["max_num"], props.shape[0])
    top = np.argsort(-props[:, 4], kind="stable")[:num]
    return props[top]


# ---------------------------------------------------------------------------
# track matching mirror (panoptic_fusetrack.py:396-471 + track_head.py:92-117)
# ---------------------------------------------------------------------------

def torch_track_embed(sd, roi_feats_nhwc):
    x = torch.from_numpy(roi_feats_nhwc.transpose(0, 3, 1, 2).copy()).float()
    x = x.reshape(x.shape[0], -1)
    x = F.linear(x, _t(sd, "track_head.fcs.0.weight"),
                 _t(sd, "track_head.fcs.0.bias"))
    x = F.relu(x)
    return F.linear(x, _t(sd, "track_head.fcs.1.weight"),
                    _t(sd, "track_head.fcs.1.bias"))


def np_bbox_overlaps(b1, b2):
    """bbox_overlaps (+1 convention, geometry.py)."""
    ious = np.zeros((len(b1), len(b2)), np.float64)
    for i in range(len(b1)):
        xx1 = np.maximum(b1[i, 0], b2[:, 0])
        yy1 = np.maximum(b1[i, 1], b2[:, 1])
        xx2 = np.minimum(b1[i, 2], b2[:, 2])
        yy2 = np.minimum(b1[i, 3], b2[:, 3])
        iw = np.maximum(xx2 - xx1 + 1, 0)
        ih = np.maximum(yy2 - yy1 + 1, 0)
        inter = iw * ih
        a1 = (b1[i, 2] - b1[i, 0] + 1) * (b1[i, 3] - b1[i, 1] + 1)
        a2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
        ious[i] = inter / (a1 + a2 - inter)
    return ious


def ref_track_match(sd, det_roi_feats, det_boxes, det_labels, det_probs,
                    prev, match_coeff=(1.0, 2.0, 10.0)):
    """Reference tracking (simple_test_bboxes second-frame branch). `prev`
    is dict(feats=[...], boxes=[...], labels=[...]) mutated in place."""
    n = len(det_boxes)
    if prev["feats"] is None:
        prev["feats"] = list(det_roi_feats)
        prev["boxes"] = list(det_boxes)
        prev["labels"] = list(det_labels)
        return np.arange(n, dtype=np.int64)
    cur_emb = torch_track_embed(sd, det_roi_feats)
    prev_emb = torch_track_embed(sd, np.stack(prev["feats"]))
    prod = (cur_emb @ prev_emb.T)
    dummy = torch.zeros((n, 1))
    match_score = torch.cat([dummy, prod], dim=1)
    match_ll = F.log_softmax(match_score, dim=1).numpy()
    label_delta = (np.asarray(prev["labels"])[None, :] ==
                   np.asarray(det_labels)[:, None]).astype(np.float64)
    ious = np_bbox_overlaps(np.asarray(det_boxes), np.asarray(prev["boxes"]))
    m = len(prev["boxes"])
    comp = (match_ll
            + match_coeff[0] * np.log(
                np.concatenate([det_probs[:, None]] * (m + 1), axis=1))
            + match_coeff[1] * np.concatenate(
                [np.zeros((n, 1)), ious], axis=1)
            + match_coeff[2] * np.concatenate(
                [np.ones((n, 1)), label_delta], axis=1))
    match_likelihood = comp.max(axis=1)
    match_ids = comp.argmax(axis=1).astype(np.int32)
    det_obj_ids = np.full((n,), -1, np.int64)
    best_scores = np.full((m,), -100.0)
    best_ids = np.full((m,), -1, np.int32)
    for idx, mid in enumerate(match_ids):
        if mid == 0:
            det_obj_ids[idx] = len(prev["feats"])
            prev["feats"].append(det_roi_feats[idx])
            prev["boxes"].append(det_boxes[idx])
            prev["labels"].append(det_labels[idx])
        else:
            obj = mid - 1
            score = match_likelihood[idx]
            if score > best_scores[obj]:
                det_obj_ids[idx] = obj
                if best_ids[obj] >= 0:
                    det_obj_ids[best_ids[obj]] = -1
                best_scores[obj] = score
                best_ids[obj] = idx
                prev["feats"][obj] = det_roi_feats[idx]
                prev["boxes"][obj] = det_boxes[idx]
    for idx in range(n):
        if det_obj_ids[idx] < 0:
            det_obj_ids[idx] = len(prev["feats"])
            prev["feats"].append(det_roi_feats[idx])
            prev["boxes"].append(det_boxes[idx])
            prev["labels"].append(det_labels[idx])
    return det_obj_ids


# ---------------------------------------------------------------------------
# full torch simple_test chain
# ---------------------------------------------------------------------------

def torch_simple_test(sd, flow_params, img, ref_img, prev):
    """panoptic_fusetrack.py:502-606 at tiny scale. img/ref_img: normalized
    (1, 3, H, W) torch tensors. Returns dict of results."""
    flow = torch_compute_flow(flow_params, img, ref_img, scale_factor=0.25)
    x = torch_fpn(sd, torch_resnet18(sd, img))
    ref_x = torch_fpn(sd, torch_resnet18(sd, ref_img))
    x = torch_bfp_tcea(sd, x, ref_x, flow)

    fcn_output, fcn_score = torch_upsnet_fpn(sd, x[:4])

    props = ref_rpn_proposals(
        [conv2d(F.relu(conv2d(f, sd, "rpn_head.rpn_conv", pad=1)),
                sd, "rpn_head.rpn_cls") for f in x],
        [conv2d(F.relu(conv2d(f, sd, "rpn_head.rpn_conv", pad=1)),
                sd, "rpn_head.rpn_reg") for f in x],
        (H, W), RPN_CFG)

    feats_np = [f[0].permute(1, 2, 0).numpy().astype(np.float32)
                for f in x[:4]]
    roi7 = np_multilevel_roi_align(feats_np, props[:, :4], 7, 2)
    cls, reg = torch_bbox_head(sd, roi7)
    cls_prob = F.softmax(cls, dim=-1).numpy()
    kept = torch_mask_roi(props[:, :4].astype(np.float64),
                          cls_prob.astype(np.float64),
                          reg.numpy().astype(np.float64), (H, W),
                          score_thresh=SCORE_THRESH, nms_thresh=NMS_THRESH,
                          top_n=TOP_N)
    det_boxes = np.stack([k[1].numpy() for k in kept]).astype(np.float32)
    det_probs = np.array([k[0] for k in kept], np.float64)
    det_cls = np.array([k[2] for k in kept], np.int64)
    det_labels = det_cls - 1

    det_roi_feats = np_multilevel_roi_align(feats_np, det_boxes, 7, 2)
    det_obj_ids = ref_track_match(sd, det_roi_feats, det_boxes, det_labels,
                                  det_probs, prev)

    mask14 = np_multilevel_roi_align(feats_np, det_boxes, 14, 2)
    mask_score = torch_mask_head(sd, mask14).numpy()
    mask_cls = np.stack([mask_score[i, det_cls[i]]
                         for i in range(len(kept))])

    keep_inds, mask_energy = ref_mask_removal(
        det_boxes, det_probs.astype(np.float32), mask_cls, det_cls, (H, W))
    fcn_chw = fcn_output[0].numpy().astype(np.float32)
    stuff, inst = ref_seg_term(det_cls[keep_inds], fcn_chw,
                               det_boxes[keep_inds])
    channels = [stuff]
    for i in range(len(keep_inds)):
        channels.append((inst[i] + mask_energy[i])[None])
    logits = np.concatenate(channels, axis=0)
    return dict(
        panoptic=logits.argmax(0),
        panoptic_logits=logits,
        sseg=fcn_chw.argmax(0),
        det_boxes=det_boxes, det_probs=det_probs, det_cls=det_cls,
        det_obj_ids=det_obj_ids,
        keep_inds=keep_inds,
    )


# ---------------------------------------------------------------------------
# shared weights
# ---------------------------------------------------------------------------

def build_sd(rng):
    """Random ResNet-18 FuseTrack state_dict (reference key names), fan-in
    normalized (gain/sqrt(fan_in)) so activations stay O(1) through the
    40-layer chain and the det heads produce a usable population."""
    sd = {}

    def w(o, i, k, gain):
        s = gain / np.sqrt(i * k * k)
        return (rng.randn(o, i, k, k) * s).astype(np.float32)

    def add_conv(key, o, i, k, gain=1.4, bias_scale=0.02):
        sd[key + ".weight"] = w(o, i, k, gain)
        sd[key + ".bias"] = (rng.randn(o) * bias_scale).astype(np.float32)

    def add_conv_nb(key, o, i, k, gain=1.4):
        sd[key + ".weight"] = w(o, i, k, gain)

    def add_bn(key, c):
        r = lambda s: (rng.randn(c) * s).astype(np.float32)
        sd[key + ".weight"] = 1.0 + r(0.1)
        sd[key + ".bias"] = r(0.1)
        sd[key + ".running_mean"] = r(0.1)
        sd[key + ".running_var"] = 1.0 + np.abs(r(0.1))

    def add_linear(key, o, i, gain=1.0, bias_scale=0.02):
        s = gain / np.sqrt(i)
        sd[key + ".weight"] = (rng.randn(o, i) * s).astype(np.float32)
        sd[key + ".bias"] = (rng.randn(o) * bias_scale).astype(np.float32)

    add_conv_nb("backbone.conv1", 64, 3, 7)
    add_bn("backbone.bn1", 64)
    planes, inp = 64, 64
    for s, nb in enumerate((2, 2, 2, 2), start=1):
        for j in range(2):
            p = f"backbone.layer{s}.{j}"
            add_conv_nb(p + ".conv1", planes, inp if j == 0 else planes, 3)
            add_bn(p + ".bn1", planes)
            add_conv_nb(p + ".conv2", planes, planes, 3)
            add_bn(p + ".bn2", planes)
            if s > 1 and j == 0:
                add_conv_nb(p + ".downsample.0", planes, inp, 1)
                add_bn(p + ".downsample.1", planes)
        inp = planes
        planes *= 2
    for i, c in enumerate((64, 128, 256, 512)):
        add_conv(f"neck.lateral_convs.{i}.conv", 256, c, 1)
        add_conv(f"neck.fpn_convs.{i}.conv", 256, 256, 3, gain=1.0)
    add_conv("rpn_head.rpn_conv", 256, 256, 3)
    add_conv("rpn_head.rpn_cls", 3, 256, 1, gain=3.0, bias_scale=0.5)
    add_conv("rpn_head.rpn_reg", 12, 256, 1, gain=0.5, bias_scale=0.05)
    add_linear("bbox_head.shared_fcs.0", 1024, 256 * 49, gain=1.4)
    add_linear("bbox_head.shared_fcs.1", 1024, 1024, gain=1.4)
    add_linear("bbox_head.fc_cls", C_DET, 1024, gain=4.0, bias_scale=1.0)
    add_linear("bbox_head.fc_reg", C_DET * 4, 1024, gain=0.4,
               bias_scale=0.05)
    add_linear("track_head.fcs.0", 1024, 256 * 49, gain=1.4)
    add_linear("track_head.fcs.1", 1024, 1024)
    for i in range(4):
        add_conv(f"mask_head.convs.{i}.conv", 256, 256, 3)
    sd["mask_head.upsample.weight"] = (
        rng.randn(256, 256, 2, 2) * (1.0 / np.sqrt(256 * 4))
    ).astype(np.float32)
    sd["mask_head.upsample.bias"] = (rng.randn(256) * 0.02).astype(np.float32)
    add_conv("mask_head.conv_logits", C_DET, 256, 1, gain=4.0,
             bias_scale=0.3)
    chans = [(256, 256), (128, 256), (128, 128)]
    for i, seq in enumerate((0, 3, 6)):
        o, ci = chans[i]
        add_conv(f"panopticFPN.deform_convs.0.{seq}.conv_offset", 18, ci, 3,
                 gain=0.3, bias_scale=0.01)
        sd[f"panopticFPN.deform_convs.0.{seq}.conv.weight"] = w(o, ci, 3, 1.4)
    for i, seq in enumerate((1, 4, 7)):
        o = chans[i][0]
        r = lambda s: (rng.randn(o) * s).astype(np.float32)
        sd[f"panopticFPN.deform_convs.0.{seq}.weight"] = 1.0 + r(0.1)
        sd[f"panopticFPN.deform_convs.0.{seq}.bias"] = r(0.1)
    add_conv("panopticFPN.conv_pred.conv", NUM_SEG, 512, 1, gain=4.0,
             bias_scale=0.5)
    add_conv("extra_neck.liteflownet.flow_estimator.convs.0.0", 64,
             256 + 81 + 2, 3)
    add_conv("extra_neck.liteflownet.flow_estimator.convs.1.0", 64, 64, 3)
    add_conv("extra_neck.liteflownet.flow_estimator.convs.2.0", 32, 64, 3)
    add_conv("extra_neck.liteflownet.flow_estimator.convs.3", 2, 32, 3,
             gain=0.5)
    for tname, (o, i) in dict(
        tAtt_1=(256, 256), tAtt_2=(256, 256), fea_fusion=(256, 512),
        sAtt_1=(256, 512), sAtt_2=(256, 512), sAtt_3=(256, 256),
        sAtt_4=(256, 256), sAtt_add_1=(256, 256), sAtt_add_2=(256, 256),
    ).items():
        k = 3 if tname in ("tAtt_1", "tAtt_2", "sAtt_3", "sAtt_4") else 1
        add_conv(f"extra_neck.tcea_fusion.{tname}", o, i, k, gain=1.0)
    add_conv("extra_neck.refine.conv", 256, 256, 3, gain=1.0)
    return sd


def _merge(dst, src):
    """Recursively overwrite dst leaves with src where present."""
    for k, v in src.items():
        if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
            _merge(dst[k], v)
        else:
            dst[k] = jnp.asarray(v)
    return dst


@pytest.mark.slow
def test_full_graph_parity():
    rng = np.random.RandomState(3)
    sd = build_sd(rng)
    params_conv, stats_conv, used = convert_detector(sd, depth=18)
    assert len(used) == len(sd), sorted(set(sd) - used)[:10]
    # torch-tensor view of the same weights for the mirror chain
    tsd = {k: torch.from_numpy(v) for k, v in sd.items()}

    cfg = zoo.exact_overrides(zoo.tiny_overrides(zoo.fusetrack_model_cfg()))
    cfg.pop("type")
    tcfg = zoo.fusetrack_test_cfg()
    tcfg["rpn"].update(RPN_CFG)
    tcfg["panoptic"].update(score_thresh=SCORE_THRESH, nms_thresh=NMS_THRESH,
                            max_det=TOP_N)
    det = PanopticFuseTrack(train_cfg=zoo.fusetrack_train_cfg(),
                            test_cfg=tcfg, **cfg)

    img0 = rng.randn(1, H, W, 3).astype(np.float32)
    img1 = (0.7 * img0 + 0.3 * rng.randn(1, H, W, 3)).astype(np.float32)
    img2 = (0.7 * img1 + 0.3 * rng.randn(1, H, W, 3)).astype(np.float32)

    state = empty_track_state(cap=64)
    variables = det.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(img1), jnp.asarray(img0), state,
                         method=det.predict)
    params = jax.device_get(variables["params"])
    flow_params = params["flownet2"]  # TinyFlow weights: ours -> torch
    _merge(params, params_conv)
    stats = jax.device_get(variables.get("batch_stats", {}))
    _merge(stats, stats_conv)
    variables = {"params": params, "batch_stats": stats}

    predict = jax.jit(
        lambda v, im, ref, st: det.apply(v, im, ref, st, method=det.predict)
    )

    # torch side state
    def to_torch(a):
        return torch.from_numpy(a.transpose(0, 3, 1, 2).copy())

    prev = dict(feats=None, boxes=None, labels=None)

    frames = [(img1, img0), (img2, img1)]
    for fi, (im, ref) in enumerate(frames):
        ours, state = predict(variables, jnp.asarray(im), jnp.asarray(ref),
                              state)
        ours = jax.device_get(ours)
        theirs = torch_simple_test(tsd, flow_params, to_torch(im),
                                   to_torch(ref), prev)

        nvalid = int(ours["det_valid"].sum())
        assert nvalid >= 3, f"frame {fi}: too few detections ({nvalid})"
        assert nvalid == len(theirs["det_cls"]), (
            f"frame {fi}: det count {nvalid} vs {len(theirs['det_cls'])}")
        np.testing.assert_array_equal(
            (ours["det_labels"][:nvalid] + 1), theirs["det_cls"],
            err_msg=f"frame {fi} det classes")
        np.testing.assert_allclose(
            ours["det_probs"][:nvalid], theirs["det_probs"], atol=1e-3,
            err_msg=f"frame {fi} det scores")
        np.testing.assert_allclose(
            ours["det_bboxes"][:nvalid], theirs["det_boxes"], atol=2e-2,
            err_msg=f"frame {fi} det boxes")
        np.testing.assert_array_equal(
            ours["panoptic_det_obj_ids"][:int(ours["num_keep"])],
            theirs["det_obj_ids"][theirs["keep_inds"]],
            err_msg=f"frame {fi} track ids")

        nk = int(ours["num_keep"])
        assert nk == len(theirs["keep_inds"]), f"frame {fi} keep count"
        np.testing.assert_array_equal(
            ours["panoptic_cls_inds"][:nk],
            theirs["det_cls"][theirs["keep_inds"]],
            err_msg=f"frame {fi} keep classes")

        sseg_agree = float(np.mean(ours["fcn_outputs"] == theirs["sseg"]))
        pan_agree = float(np.mean(ours["panoptic_outputs"] ==
                                  theirs["panoptic"]))
        assert sseg_agree >= 0.999, f"frame {fi} sseg agreement {sseg_agree}"
        assert pan_agree >= 0.999, f"frame {fi} panoptic agreement {pan_agree}"
