"""Composed detection-tail parity with ONE set of shared weights (round-2
VERDICT item 4): the strongest VPQ-parity proxy available with no trained
checkpoints and zero egress.

One random set of torch weights (reference state_dict names) is converted
through vps_tpu.utils.convert.convert_detector and driven through BOTH
stacks' full inference tails:

  RoIAlign(7) -> SharedFCBBoxHead -> softmax -> MaskROI (UPSNet decode +
  class-agnostic NMS + top-N) -> RoIAlign(14) -> FCNMaskHead -> class
  channel gather -> MaskRemoval greedy suppression -> SegTerm windows ->
  panoptic channel argmax

vps side: ops.multilevel_roi_align + flax heads + panoptic_dets +
mask_removal_and_fuse (the exact predict() tail, panoptic.py:631-654).
Reference side: an independent numpy/torch port of mask_roi.py:24-147,
unary_logits.py SegTerm:82-108, mask_removal.py:23-92 and
panoptic_fusetrack.py:566-597 (cv2.resize paste, trunc/round windows),
with roi features from the CUDA kernel's numpy port (test_roi_align).
Asserts: identical keep sets (class/score/order), matching det boxes, and
panoptic/semantic argmax maps equal up to <=0.1% near-tie pixels.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vps_tpu.models.bbox_head import SharedFCBBoxHead
from vps_tpu.models.mask_head import FCNMaskHead
from vps_tpu.models.detectors.panoptic_ops import (
    mask_removal_and_fuse,
    panoptic_dets,
)
from vps_tpu.ops import multilevel_roi_align
from vps_tpu.utils.convert import convert_detector

from test_torch_parity import torch_mask_roi

H, W = 64, 128          # full-res frame
C = 9                   # 8 things + background
NUM_SEG = 19
NUM_STUFF = 11
STRIDES = [4, 8, 16, 32]
CLASS_MAPPING = {i: NUM_STUFF - 1 + i for i in range(1, C)}  # {1:11..8:18}


# ---------------------------------------------------------------------------
# reference-side numpy RoIAlign (vectorized over channels) + level routing
# ---------------------------------------------------------------------------

def _np_bilinear_c(data, y, x):
    h, w = data.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(data.shape[2], data.dtype)
    y, x = max(y, 0.0), max(x, 0.0)
    y0, x0 = int(y), int(x)
    if y0 >= h - 1:
        y1 = y0 = h - 1
        y = float(y0)
    else:
        y1 = y0 + 1
    if x0 >= w - 1:
        x1 = x0 = w - 1
        x = float(x0)
    else:
        x1 = x0 + 1
    ly, lx = y - y0, x - x0
    return ((1 - ly) * (1 - lx) * data[y0, x0] + (1 - ly) * lx * data[y0, x1]
            + ly * (1 - lx) * data[y1, x0] + ly * lx * data[y1, x1])


def np_multilevel_roi_align(feats, rois, out_size, sn=2, finest_scale=56):
    """SingleRoIExtractor semantics (single_level.py:69-73 level map +
    roi_align_kernel.cu sampling), channels vectorized."""
    c = feats[0].shape[-1]
    out = np.zeros((len(rois), out_size, out_size, c), np.float32)
    for n, roi in enumerate(rois):
        scale = np.sqrt((roi[2] - roi[0] + 1.0) * (roi[3] - roi[1] + 1.0))
        lvl = int(np.clip(np.floor(np.log2(scale / finest_scale + 1e-6)),
                          0, len(feats) - 1))
        f = feats[lvl]
        s = 1.0 / STRIDES[lvl]
        sw, sh = roi[0] * s, roi[1] * s
        rw = max((roi[2] + 1) * s - sw, 0.0)
        rh = max((roi[3] + 1) * s - sh, 0.0)
        bh, bw = rh / out_size, rw / out_size
        for ph in range(out_size):
            for pw in range(out_size):
                val = np.zeros(c, np.float32)
                for iy in range(sn):
                    y = sh + ph * bh + (iy + 0.5) * bh / sn
                    for ix in range(sn):
                        x = sw + pw * bw + (ix + 0.5) * bw / sn
                        val += _np_bilinear_c(f, y, x)
                out[n, ph, pw] = val / (sn * sn)
    return out


# ---------------------------------------------------------------------------
# reference-side tail: torch heads + numpy MaskRemoval/SegTerm/argmax
# ---------------------------------------------------------------------------

def torch_bbox_head(sd, roi_feats_nhwc):
    x = torch.from_numpy(
        roi_feats_nhwc.transpose(0, 3, 1, 2).copy()).float()
    x = x.reshape(x.shape[0], -1)
    x = F.relu(F.linear(x, sd["bbox_head.shared_fcs.0.weight"],
                        sd["bbox_head.shared_fcs.0.bias"]))
    x = F.relu(F.linear(x, sd["bbox_head.shared_fcs.1.weight"],
                        sd["bbox_head.shared_fcs.1.bias"]))
    cls = F.linear(x, sd["bbox_head.fc_cls.weight"],
                   sd["bbox_head.fc_cls.bias"])
    reg = F.linear(x, sd["bbox_head.fc_reg.weight"],
                   sd["bbox_head.fc_reg.bias"])
    return cls, reg


def torch_mask_head(sd, mask_feats_nhwc):
    x = torch.from_numpy(
        mask_feats_nhwc.transpose(0, 3, 1, 2).copy()).float()
    for i in range(4):
        x = F.relu(F.conv2d(x, sd[f"mask_head.convs.{i}.conv.weight"],
                            sd[f"mask_head.convs.{i}.conv.bias"], padding=1))
    x = F.relu(F.conv_transpose2d(x, sd["mask_head.upsample.weight"],
                                  sd["mask_head.upsample.bias"], stride=2))
    x = F.conv2d(x, sd["mask_head.conv_logits.weight"],
                 sd["mask_head.conv_logits.bias"])
    return x  # (N, C, 28, 28)


def ref_mask_removal(mask_rois, cls_prob, mask_logit, cls_idx, im_shape,
                     fraction_threshold=0.3):
    """numpy port of MaskRemoval.forward (mask_removal.py:23-92)."""
    hh, ww = im_shape
    sorted_inds = np.argsort(-cls_prob, kind="stable")
    mask_rois = mask_rois[sorted_inds]
    mask_logit = mask_logit[sorted_inds]
    cls_idx_s = cls_idx[sorted_inds] - 1
    mask_image = np.zeros((max(int(cls_idx.max()), 1), hh, ww), np.uint8)
    keep_inds = []
    mask_energy = []
    ref_boxes = mask_rois.astype(np.int32)
    for i in range(len(sorted_inds)):
        rb = ref_boxes[i]
        w = max(rb[2] - rb[0] + 1, 1)
        h = max(rb[3] - rb[1] + 1, 1)
        logit = cv2.resize(mask_logit[i], (w, h))
        mask = (logit > 0).astype(np.uint8)
        x_0, x_1 = max(rb[0], 0), min(rb[2] + 1, ww)
        y_0, y_1 = max(rb[1], 0), min(rb[3] + 1, hh)
        crop = mask[(y_0 - rb[1]):(y_1 - rb[1]), (x_0 - rb[0]):(x_1 - rb[0])]
        ms = crop.sum()
        plane = mask_image[cls_idx_s[i]][y_0:y_1, x_0:x_1]
        if ms == 0 or np.logical_and(plane >= 1, crop == 1).sum() / ms \
                > fraction_threshold:
            continue
        keep_inds.append(sorted_inds[i])
        mask_image[cls_idx_s[i]][y_0:y_1, x_0:x_1] += crop
        e = np.zeros((hh, ww), np.float32)
        e[y_0:y_1, x_0:x_1] = logit[(y_0 - rb[1]):(y_1 - rb[1]),
                                    (x_0 - rb[0]):(x_1 - rb[0])]
        mask_energy.append(e)
    return np.array(keep_inds, np.int64), mask_energy


def ref_seg_term(cls_indices, fcn_output, boxes):
    """numpy port of SegTerm.forward (unary_logits.py:82-108);
    fcn_output channel-FIRST (num_seg, H, W), boxes full-res (box_scale
    already folded in like panoptic_fusetrack.py:586 seg_term(..., rois*4))."""
    stuff = fcn_output[:NUM_STUFF]
    inst = np.zeros((len(cls_indices),) + fcn_output.shape[1:], np.float32)
    for i, ci in enumerate(cls_indices):
        if ci == 0:
            continue
        y0 = int(boxes[i][1])
        y1 = int(round(float(boxes[i][3])) + 1)
        x0 = int(boxes[i][0])
        x1 = int(round(float(boxes[i][2])) + 1)
        inst[i, y0:y1, x0:x1] = fcn_output[CLASS_MAPPING[int(ci)], y0:y1,
                                           x0:x1]
    return stuff, inst


def build_torch_state_dict(rng):
    def t(*shape, scale=0.1):
        return torch.from_numpy(
            (rng.randn(*shape) * scale).astype(np.float32))

    sd = {}
    sd["bbox_head.shared_fcs.0.weight"] = t(1024, 256 * 7 * 7, scale=0.02)
    sd["bbox_head.shared_fcs.0.bias"] = t(1024)
    sd["bbox_head.shared_fcs.1.weight"] = t(1024, 1024, scale=0.03)
    sd["bbox_head.shared_fcs.1.bias"] = t(1024)
    sd["bbox_head.fc_cls.weight"] = t(C, 1024, scale=0.3)
    sd["bbox_head.fc_cls.bias"] = t(C, scale=1.0)
    sd["bbox_head.fc_reg.weight"] = t(C * 4, 1024, scale=0.02)
    sd["bbox_head.fc_reg.bias"] = t(C * 4, scale=0.1)
    for i in range(4):
        sd[f"mask_head.convs.{i}.conv.weight"] = t(256, 256, 3, 3,
                                                   scale=0.03)
        sd[f"mask_head.convs.{i}.conv.bias"] = t(256)
    sd["mask_head.upsample.weight"] = t(256, 256, 2, 2, scale=0.05)
    sd["mask_head.upsample.bias"] = t(256)
    sd["mask_head.conv_logits.weight"] = t(C, 256, 1, 1, scale=0.3)
    sd["mask_head.conv_logits.bias"] = t(C, scale=0.5)
    return sd


@pytest.mark.slow
def test_composed_tail_matches_reference():
    rng = np.random.RandomState(11)
    sd = build_torch_state_dict(rng)
    params, _, used = convert_detector(
        {k: v.numpy() for k, v in sd.items()})
    assert set(params) == {"bbox_head", "mask_head"}

    # shared inputs
    feats = [rng.randn(H // s, W // s, 256).astype(np.float32) * 0.5
             for s in STRIDES]
    n_prop = 24
    props = np.zeros((n_prop, 4), np.float32)
    props[:, 0] = rng.uniform(0, W - 24, n_prop)
    props[:, 1] = rng.uniform(0, H - 24, n_prop)
    props[:, 2] = props[:, 0] + rng.uniform(8, 60, n_prop)
    props[:, 3] = props[:, 1] + rng.uniform(8, 40, n_prop)
    props[:, 2] = np.minimum(props[:, 2], W - 1)
    props[:, 3] = np.minimum(props[:, 3], H - 1)
    fcn_full = (rng.randn(H, W, NUM_SEG) * 2).astype(np.float32)

    score_thr, nms_thr, top_n = 0.25, 0.5, 12

    # ---------------- vps_tpu stack ----------------
    jfeats = [jnp.asarray(f) for f in feats]
    roi7 = multilevel_roi_align(jfeats, jnp.asarray(props), STRIDES, 7, 2)
    bbox_head = SharedFCBBoxHead(num_classes=C)
    cls, reg = bbox_head.apply({"params": params["bbox_head"]}, roi7)
    cls_prob = jax.nn.softmax(cls, axis=-1)
    det_boxes, det_probs, det_cls, det_valid = panoptic_dets(
        jnp.asarray(props), jnp.ones((n_prop,), bool), cls_prob, reg,
        (H, W), score_thresh=score_thr, nms_thresh=nms_thr, top_n=top_n,
    )
    mask14 = multilevel_roi_align(jfeats, det_boxes, STRIDES, 14, 2,
                                  valid=det_valid)
    mask_head = FCNMaskHead(num_classes=C)
    mask_score = mask_head.apply({"params": params["mask_head"]}, mask14)
    mask_score = jnp.take_along_axis(
        mask_score, det_cls[:, None, None, None], axis=-1)[..., 0]
    fusion = mask_removal_and_fuse(
        det_boxes, det_probs, det_cls, det_valid,
        jnp.arange(top_n, dtype=jnp.int32), mask_score,
        jnp.asarray(fcn_full), num_stuff=NUM_STUFF,
    )

    # ---------------- reference stack ----------------
    roi7_ref = np_multilevel_roi_align(feats, props, 7, 2)
    tcls, treg = torch_bbox_head(sd, roi7_ref)
    tprob = F.softmax(tcls, dim=-1).numpy()
    kept = torch_mask_roi(props, tprob.astype(np.float64),
                          treg.numpy().astype(np.float64), (H, W),
                          score_thresh=score_thr, nms_thresh=nms_thr,
                          top_n=top_n)
    assert len(kept) >= 3, "fixture produced too few detections"
    ref_boxes = np.stack([k[1].numpy() for k in kept]).astype(np.float32)
    ref_probs = np.array([k[0] for k in kept], np.float32)
    ref_cls = np.array([k[2] for k in kept], np.int64)

    # det-stage agreement (boxes/classes/scores, score-desc order both sides)
    nvalid = int(np.asarray(det_valid).sum())
    assert nvalid == len(kept)
    np.testing.assert_array_equal(np.asarray(det_cls)[:nvalid], ref_cls)
    np.testing.assert_allclose(np.asarray(det_probs)[:nvalid], ref_probs,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(det_boxes)[:nvalid], ref_boxes,
                               atol=5e-3)

    mask14_ref = np_multilevel_roi_align(feats, ref_boxes, 14, 2)
    tmask = torch_mask_head(sd, mask14_ref).numpy()  # (k, C, 28, 28)
    tmask_cls = np.stack([tmask[i, ref_cls[i]] for i in range(len(kept))])

    keep_inds, mask_energy = ref_mask_removal(
        ref_boxes, ref_probs, tmask_cls, ref_cls, (H, W))
    fcn_chw = fcn_full.transpose(2, 0, 1)
    stuff, inst = ref_seg_term(ref_cls[keep_inds], fcn_chw,
                               ref_boxes[keep_inds])
    channels = [stuff]
    for i in range(len(keep_inds)):
        channels.append((inst[i] + mask_energy[i])[None])
    logits = np.concatenate(channels, axis=0)
    ref_pan = logits.argmax(0)
    ref_sseg = fcn_chw.argmax(0)

    # keep-stage agreement
    nk = int(fusion.num_keep)
    assert nk == len(keep_inds)
    np.testing.assert_array_equal(np.asarray(fusion.keep_cls)[:nk],
                                  ref_cls[keep_inds])
    np.testing.assert_allclose(np.asarray(fusion.keep_probs)[:nk],
                               ref_probs[keep_inds], atol=1e-4)

    # panoptic / semantic argmax maps: tiny float deltas can flip near-tie
    # pixels; require >= 99.9% agreement
    pan = np.asarray(fusion.panoptic)
    agree = float(np.mean(pan == ref_pan))
    assert agree >= 0.999, f"panoptic agreement {agree}"
    np.testing.assert_array_equal(np.asarray(fusion.sseg), ref_sseg)
