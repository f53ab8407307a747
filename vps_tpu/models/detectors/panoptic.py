"""Panoptic video detectors — PanopticFuseTrack (full VPSNet), PanopticFuse
(no tracking) and PanopticTrack (no flow fusion), rebuilt TPU-first.

Reference: /root/reference/mmdet/models/detectors/panoptic_fusetrack.py,
panoptic_fuse.py, panoptic_track.py, two_stage.py. The forward math follows
the reference exactly (cited per method); the orchestration is redesigned
static-shape: fixed-capacity proposals/detections with validity masks, one
jittable train-loss function, one jittable per-frame inference step with an
explicit functional TrackState instead of detector-held mutable state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from vps_tpu.registry import DETECTORS
from vps_tpu.models.resnet import ResNet
from vps_tpu.models.fpn import FPN
from vps_tpu.models.rpn_head import RPNHead, rpn_proposals
from vps_tpu.models.bbox_head import SharedFCBBoxHead
from vps_tpu.models.mask_head import FCNMaskHead
from vps_tpu.models.panoptic_fpn import UPSNetFPN
from vps_tpu.models.track_head import TrackHead, compute_comp_scores, track_match_loss
from vps_tpu.models.bfp_tcea import BFPTcea, BFPTceaMulti
from vps_tpu.models.flow.flownet2 import FlowNet2
from vps_tpu.models.layers import resize_bilinear
from vps_tpu.models.detectors.panoptic_ops import (
    TrackState,
    delta2bbox_upsnet,
    empty_track_state,
    mask_removal_and_fuse,
    panoptic_dets,
    panoptic_dets_from_decoded,
    track_assign,
    _paste_logit_window,
    _seg_window,
)
from vps_tpu.ops.nms import NEG_INF, nms as nms_op
from vps_tpu.ops import multilevel_roi_align, bbox_overlaps
from vps_tpu.ops.anchors import AnchorGenerator, valid_flags as anchor_valid_flags
from vps_tpu.ops.losses import (
    accuracy,
    binary_cross_entropy_with_logits,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from vps_tpu.core.targets import anchor_target, proposal_target

# numpy (NOT jnp): module-level device arrays become MLIR constants whose
# lowering forces a device→host fetch — pathologically slow over a tunneled
# TPU (104s of a 208s lowering measured at 256×512).
import numpy as _np

IMG_MEAN = _np.asarray([123.675, 116.28, 103.53], _np.float32)
IMG_STD = _np.asarray([58.395, 57.12, 57.375], _np.float32)


class TinyFlowNet(nn.Module):
    """Drop-in FlowNet2 stand-in for tests and multi-chip dry runs: same
    (img1, img2 in [0,255]) → (B, H, W, 2) interface, ~1000× cheaper."""

    @nn.compact
    def __call__(self, img1, img2):
        from vps_tpu.models.layers import Conv, resize_bilinear

        x = jnp.concatenate([img1, img2], axis=-1) / 255.0
        h, w = x.shape[1:3]
        x = jax.nn.relu(Conv(16, 3, 2, 1, name="c1")(x))
        x = jax.nn.relu(Conv(16, 3, 2, 1, name="c2")(x))
        flow = Conv(2, 3, 1, 1, name="pred")(x)
        return resize_bilinear(flow, (h, w))


def _cfgget(cfg, key, default=None):
    if cfg is None:
        return default
    return cfg.get(key, default)


@DETECTORS.register
class PanopticFuseTrack(nn.Module):
    """Flow-fused, tracking panoptic detector (the flagship FuseTrack)."""

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    rpn_head: Dict[str, Any]
    bbox_head: Dict[str, Any]
    mask_head: Dict[str, Any]
    panoptic: Optional[Dict[str, Any]] = None
    extra_neck: Optional[Dict[str, Any]] = None
    track_head: Optional[Dict[str, Any]] = None
    bbox_roi_extractor: Optional[Dict[str, Any]] = None
    mask_roi_extractor: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None
    pretrained: Optional[str] = None
    with_flow: bool = True
    flow: Optional[Dict[str, Any]] = None  # None → full FlowNet2
    # Input scale for FlowNet2. The fuse neck consumes flow at 1/4 scale, so
    # computing it from half-res frames loses almost nothing while cutting
    # FlowNet2's cost 4× (and its LiteFlowNetCorr residual refinement in the
    # neck corrects small flow errors anyway). 1.0 = the reference's exact
    # full-res behavior (panoptic_fusetrack.py:117-143).
    flow_input_scale: float = 0.5

    def setup(self):
        b = dict(self.backbone)
        b.pop("type", None)
        import jax.numpy as _jnp

        _dt = {None: None, "float32": None,
               "bfloat16": _jnp.bfloat16}[b.get("compute_dtype", None)]
        self.backbone_m = ResNet(
            depth=b.get("depth", 50),
            num_stages=b.get("num_stages", 4),
            out_indices=tuple(b.get("out_indices", (0, 1, 2, 3))),
            frozen_stages=b.get("frozen_stages", -1),
            style=b.get("style", "pytorch"),
            dtype=_dt,
            name="backbone",
        )
        n = dict(self.neck)
        self.neck_m = FPN(
            in_channels=tuple(n.get("in_channels", (256, 512, 1024, 2048))),
            out_channels=n.get("out_channels", 256),
            num_outs=n.get("num_outs", 5),
            dtype=_dt,
            name="neck",
        )
        if self.extra_neck is not None:
            e = dict(self.extra_neck)
            cls = BFPTceaMulti if e.get("type") == "BFPTceaMulti" else BFPTcea
            # plumbed like the backbone knob; bf16 stays the default but
            # configs can recover reference-exact f32 via compute_dtype
            _ecd = {None: _jnp.bfloat16, "bfloat16": _jnp.bfloat16,
                    "float32": None}[e.get("compute_dtype", None)]
            self.extra_neck_m = cls(
                compute_dtype=_ecd,
                in_channels=e.get("in_channels", 256),
                num_levels=e.get("num_levels", 5),
                refine_level=e.get("refine_level", 0),
                refine_type=e.get("refine_type", "conv"),
                nframes=e.get("nframes", 2),
                center=e.get("center", 0),
                warp_sampling=e.get("warp_sampling", "bilinear"),
                name="extra_neck",
            )
        else:
            self.extra_neck_m = None
        r = dict(self.rpn_head)
        self.anchor_scales = list(r.get("anchor_scales", [8]))
        self.anchor_ratios = list(r.get("anchor_ratios", [0.5, 1.0, 2.0]))
        self.anchor_strides = list(r.get("anchor_strides", [4, 8, 16, 32, 64]))
        self.rpn_head_m = RPNHead(
            in_channels=r.get("in_channels", 256),
            feat_channels=r.get("feat_channels", 256),
            num_anchors=len(self.anchor_scales) * len(self.anchor_ratios),
            target_means=tuple(r.get("target_means", (0.0,) * 4)),
            target_stds=tuple(r.get("target_stds", (1.0,) * 4)),
            name="rpn_head",
        )
        bb = dict(self.bbox_head)
        self.bbox_head_m = SharedFCBBoxHead(
            num_fcs=bb.get("num_fcs", 2),
            in_channels=bb.get("in_channels", 256),
            fc_out_channels=bb.get("fc_out_channels", 1024),
            roi_feat_size=bb.get("roi_feat_size", 7),
            num_classes=bb.get("num_classes", 9),
            target_means=tuple(bb.get("target_means", (0.0,) * 4)),
            target_stds=tuple(bb.get("target_stds", (0.1, 0.1, 0.2, 0.2))),
            reg_class_agnostic=bb.get("reg_class_agnostic", False),
            name="bbox_head",
        )
        m = dict(self.mask_head)
        self.mask_head_m = FCNMaskHead(
            num_convs=m.get("num_convs", 4),
            in_channels=m.get("in_channels", 256),
            conv_out_channels=m.get("conv_out_channels", 256),
            num_classes=m.get("num_classes", 9),
            name="mask_head",
        )
        if self.panoptic is not None:
            p = dict(self.panoptic)
            _pcd = {None: _jnp.bfloat16, "bfloat16": _jnp.bfloat16,
                    "float32": None}[p.get("compute_dtype", None)]
            self.panoptic_m = UPSNetFPN(
                in_channels=p.get("in_channels", 256),
                out_channels=p.get("out_channels", 128),
                num_levels=p.get("num_levels", 4),
                num_things_classes=p.get("num_things_classes", 8),
                num_classes=p.get("num_classes", 19),
                ignore_label=p.get("ignore_label", 255),
                loss_weight=p.get("loss_weight", 1.0),
                dcn_window=p.get("dcn_window", None),
                dcn_sampling=p.get("dcn_sampling", "bilinear"),
                head_stride=p.get("head_stride", 4),
                compute_dtype=_pcd,
                name="panopticFPN",
            )
        else:
            self.panoptic_m = None
        if self.track_head is not None:
            t = dict(self.track_head)
            self.track_head_m = TrackHead(
                num_fcs=t.get("num_fcs", 2),
                in_channels=t.get("in_channels", 256),
                roi_feat_size=t.get("roi_feat_size", 7),
                fc_out_channels=t.get("fc_out_channels", 1024),
                match_coeff=tuple(t.get("match_coeff", (1.0, 2.0, 10.0))),
                name="track_head",
            )
            self.match_coeff = tuple(t.get("match_coeff", (1.0, 2.0, 10.0)))
            self.loss_match_weight = float(
                t.get("loss_match", {}).get("loss_weight", 1.0)
            )
        else:
            self.track_head_m = None
        if self.with_flow:
            if self.flow is not None and self.flow.get("type") == "TinyFlow":
                self.flownet2_m = TinyFlowNet(name="flownet2")
            else:
                from vps_tpu.models.flow import flownet2 as _fn2
                _fcd = {None: _fn2.COMPUTE_DTYPE,
                        "bfloat16": _fn2.COMPUTE_DTYPE,
                        "float32": None}[
                    (self.flow or {}).get("compute_dtype", None)]
                self.flownet2_m = FlowNet2(compute_dtype=_fcd, name="flownet2")
        else:
            self.flownet2_m = None
        self.bbox_roi_cfg = dict(self.bbox_roi_extractor or {})
        self.mask_roi_cfg = dict(self.mask_roi_extractor or {})

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def compute_flow(self, img, ref_img, scale_factor=0.25):
        """panoptic_fusetrack.py:117-143: denormalize → (optional input
        downscale, see flow_input_scale) → pad to ÷64 → FlowNet2 → trim →
        bilinear resize to h·scale_factor (flow values rescaled)."""
        rgb = img * IMG_STD + IMG_MEAN
        ref_rgb = ref_img * IMG_STD + IMG_MEAN
        h, w = img.shape[1:3]
        fis = self.flow_input_scale
        if fis != 1.0:
            fh = int(round(h * fis))
            fw = int(round(w * fis))
            rgb = resize_bilinear(rgb, (fh, fw))
            ref_rgb = resize_bilinear(ref_rgb, (fh, fw))
        else:
            fh, fw = h, w
        ph = (-fh) % 64
        pw = (-fw) % 64
        rgb_p = jnp.pad(rgb, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ref_p = jnp.pad(ref_rgb, ((0, 0), (0, ph), (0, pw), (0, 0)))
        flow = jax.lax.stop_gradient(self.flownet2_m(rgb_p, ref_p))
        flow = flow[:, :fh, :fw, :]
        if scale_factor != fis:
            oh = int(round(h * scale_factor))
            ow = int(round(w * scale_factor))
            # flow values are in input-scale pixels → rescale to output scale
            flow = resize_bilinear(flow, (oh, ow)) * (scale_factor / fis)
        return flow

    def _roi_feats(self, feats, rois, out_size, valid=None):
        strides = self.bbox_roi_cfg.get("featmap_strides", [4, 8, 16, 32])
        roi_layer = self.bbox_roi_cfg.get("roi_layer", {})
        sample_num = roi_layer.get("sample_num", 2)
        # bf16 gathers halve the HBM traffic of the tap lookups; the 4-tap
        # bilinear mix and downstream heads accumulate in f32. The `exact`
        # preset sets compute_dtype='float32' here too — the reference's
        # RoIAlign samples f32 maps (roi_align_kernel.cu).
        roi_dt = {None: jnp.bfloat16, "bfloat16": jnp.bfloat16,
                  "float32": jnp.float32}[self.bbox_roi_cfg.get("compute_dtype")]
        out = multilevel_roi_align(
            [f[0].astype(roi_dt) for f in feats[: len(strides)]],
            rois,
            strides,
            out_size,
            sample_num,
            valid=valid,
            sampling=roi_layer.get("sampling", "bilinear"),
        )
        return out.astype(jnp.float32)

    def _anchors_for(self, cls_outs):
        anchors = []
        for lvl, stride in enumerate(self.anchor_strides):
            gen = AnchorGenerator(stride, self.anchor_scales, self.anchor_ratios)
            h, w = cls_outs[lvl].shape[1:3]
            anchors.append(gen.grid_anchors((h, w), stride))
        return anchors

    def _fused_feats(self, img, ref_img, ref_feats=None):
        """Flow + backbone (×2 at video starts, ×1 steady-state) + extra-neck
        fusion. Returns (fused feats, ref feats, PLAIN current feats).

        `ref_feats` is the steady-state video-scan optimization the
        reference's per-frame loop cannot do (panoptic_fusetrack.py:516-518
        recomputes extract_feat(ref_img) every frame): the previous frame's
        plain FPN pyramid was already computed when that frame was the
        current one, so the scan carries it and saves a full ResNet+FPN
        pass per frame. Passing None reproduces the reference behavior."""
        x = self.extract_feat(img)
        plain_x = x
        if self.extra_neck_m is not None and ref_img is not None:
            flow = self.compute_flow(img, ref_img, 0.25)
            ref_x = ref_feats if ref_feats is not None \
                else self.extract_feat(ref_img)
            x = self.extra_neck_m(x, ref_x, flow)
        elif ref_img is not None:
            ref_x = ref_feats if ref_feats is not None \
                else self.extract_feat(ref_img)
        else:
            ref_x = None
        return x, ref_x, plain_x

    # ------------------------------------------------------------------
    # training (panoptic_fusetrack.py:147-353) — batch size 1 per device
    # ------------------------------------------------------------------

    def loss(
        self,
        img,
        ref_img,
        gt_bboxes,
        gt_labels,
        gt_valid,
        gt_masks,
        gt_semantic_seg,
        gt_semantic_seg_Nx,
        gt_pids,
        ref_bboxes,
        ref_valid,
    ):
        losses = {}
        tc = self.train_cfg
        x, ref_x, _ = self._fused_feats(img, ref_img)

        # semantic head
        if self.panoptic_m is not None:
            fcn_output, fcn_score = self.panoptic_m(
                list(x[: self.panoptic_m.num_levels])
            )
            losses["loss_segm"] = softmax_cross_entropy(
                fcn_output, gt_semantic_seg, ignore_index=255
            )

        # RPN
        cls_outs, reg_outs = self.rpn_head_m(x)
        anchors = self._anchors_for(cls_outs)
        flat_anchors = jnp.concatenate(anchors, axis=0)
        h, w = img.shape[1:3]
        rpn_cfg = tc["rpn"]
        at = anchor_target(
            self.make_rng("sampler"),
            flat_anchors,
            jnp.ones((flat_anchors.shape[0],), bool),
            gt_bboxes,
            gt_valid,
            (h, w),
            rpn_cfg,
        )
        flat_cls = jnp.concatenate([c[0].reshape(-1) for c in cls_outs])
        flat_reg = jnp.concatenate([r[0].reshape(-1, 4) for r in reg_outs])
        num_total = jnp.maximum(at.num_pos + at.num_neg, 1).astype(jnp.float32)
        losses["loss_rpn_cls"] = binary_cross_entropy_with_logits(
            flat_cls, at.labels.astype(jnp.float32), weight=at.label_weights,
            avg_factor=num_total,
        )
        losses["loss_rpn_bbox"] = smooth_l1_loss(
            flat_reg, at.bbox_targets, beta=1.0 / 9.0, weight=at.bbox_weights,
            avg_factor=num_total,
        )

        # proposals (treated as data — no grad through proposal generation,
        # as in the reference where get_bboxes output feeds the sampler)
        pcfg = tc.get("rpn_proposal", {})
        proposals, prop_scores, prop_valid = jax.lax.stop_gradient(
            rpn_proposals(
                [c[0] for c in cls_outs],
                [r[0] for r in reg_outs],
                anchors,
                (h, w),
                nms_pre=pcfg.get("nms_pre", 2000),
                nms_thr=pcfg.get("nms_thr", 0.7),
                max_num=pcfg.get("max_num", 2000),
            )
        )

        # sample rois + targets
        rc = tc["rcnn"]
        ohem_loss_fn = None
        if rc.get("sampler", {}).get("type") == "OHEMSampler":
            # OHEM hard-mining forward (reference ohem_sampler.py:20-38):
            # run the bbox head over ALL candidates with current weights and
            # rank by per-candidate CE loss; no grads flow through ranking.
            def ohem_loss_fn(cand, cand_valid, assign):
                feats = self._roi_feats(x, cand, 7, valid=cand_valid)
                scores, _ = self.bbox_head_m(feats)
                lbl = jnp.where(
                    assign.assigned_gt_inds > 0,
                    assign.labels if assign.labels is not None else 0,
                    0,
                )
                logp = jax.nn.log_softmax(scores, axis=-1)
                ce = -jnp.take_along_axis(logp, lbl[:, None], axis=-1)[:, 0]
                return jax.lax.stop_gradient(ce)

        st = proposal_target(
            self.make_rng("sampler"),
            proposals,
            prop_valid,
            gt_bboxes,
            gt_labels,
            gt_valid,
            rc,
            gt_pids=gt_pids,
            gt_masks=gt_masks,
            target_means=self.bbox_head_m.target_means,
            target_stds=self.bbox_head_m.target_stds,
            loss_fn=ohem_loss_fn,
        )

        # bbox head
        bbox_feats = self._roi_feats(x, st.rois, 7, valid=st.valid)
        cls_score, bbox_pred = self.bbox_head_m(bbox_feats)
        avg_cls = jnp.maximum(jnp.sum(st.label_weights), 1.0)
        losses["loss_cls"] = softmax_cross_entropy(
            cls_score, st.labels, weight=st.label_weights, avg_factor=avg_cls
        )
        losses["acc"] = accuracy(cls_score, st.labels, valid=st.valid)
        nc = self.bbox_head_m.num_classes
        num = st.rois.shape[0]
        pred_by_label = jnp.take_along_axis(
            bbox_pred.reshape(num, nc, 4), st.labels[:, None, None].repeat(4, -1),
            axis=1,
        )[:, 0, :]
        losses["loss_bbox"] = smooth_l1_loss(
            pred_by_label, st.bbox_targets, beta=1.0, weight=st.bbox_weights,
            avg_factor=float(num),
        )

        # track head
        if self.track_head_m is not None:
            ref_roi_feats = self._roi_feats(
                ref_x, ref_bboxes, 7, valid=ref_valid
            )
            match_logits = self.track_head_m(
                bbox_feats, ref_roi_feats, ref_valid
            )
            # invalid current rows get weight 0
            id_w = st.id_weights * st.valid
            loss_match, match_acc = track_match_loss(
                match_logits, st.ids, id_w
            )
            # reference normalization: weighted-CE mean over ALL rows
            loss_match = loss_match * jnp.sum(id_w) / float(num)
            losses["loss_match"] = self.loss_match_weight * loss_match
            losses["match_acc"] = match_acc

        # mask head on the positive prefix
        n_pos_max = st.mask_targets.shape[0]
        pos_rois = st.rois[:n_pos_max]
        pos_mask = st.pos_mask[:n_pos_max]
        mask_feats = self._roi_feats(x, pos_rois, 14, valid=pos_mask)
        mask_pred = self.mask_head_m(mask_feats)  # (P, 28, 28, C)
        pos_labels = st.labels[:n_pos_max]
        pred_slice = jnp.take_along_axis(
            mask_pred, pos_labels[:, None, None, None], axis=-1
        )[..., 0]
        num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
        losses["loss_mask"] = binary_cross_entropy_with_logits(
            pred_slice,
            st.mask_targets,
            weight=pos_mask[:, None, None].astype(jnp.float32),
            avg_factor=num_pos * 28.0 * 28.0,
        )

        # panoptic head (batch 1; panoptic_fusetrack.py:315-351)
        if self.panoptic_m is not None and _cfgget(tc, "loss_pano_weight") is not None:
            losses["loss_pano"] = (
                self._panoptic_train_loss(
                    x, fcn_score, gt_bboxes, gt_labels, gt_valid, gt_masks,
                    gt_semantic_seg_Nx,
                )
                * tc["loss_pano_weight"]
            )
        return losses

    def _panoptic_train_loss(
        self, x, fcn_score, gt_bboxes, gt_labels, gt_valid, gt_masks,
        gt_semantic_seg_Nx,
    ):
        """GT-ROI panoptic logits + MaskMatching GT + CE (ignore 255)."""
        num_stuff = self.panoptic_m.num_stuff_classes
        g = gt_bboxes.shape[0]
        mask_feats = self._roi_feats(x, gt_bboxes, 14, valid=gt_valid)
        mask_score = self.mask_head_m(mask_feats)  # (G, 28, 28, C)
        mask_score = jnp.take_along_axis(
            mask_score, gt_labels[:, None, None, None], axis=-1
        )[..., 0]

        seg = fcn_score[0]  # (h, w, 19) at 1/4
        hh, ww = seg.shape[:2]
        boxes4 = gt_bboxes * 0.25

        def inst_logit(mask28, box, label, valid):
            vals, win = _paste_logit_window(mask28, box, (hh, ww))
            seg_win = _seg_window(box, (hh, ww))
            mapped = jnp.clip(num_stuff - 1 + label, 0, seg.shape[-1] - 1)
            term = jnp.where(seg_win & (label > 0), seg[..., mapped], 0.0) + vals
            return jnp.where(valid, term, -1e9)

        inst_logits = jax.vmap(inst_logit)(mask_score, boxes4, gt_labels, gt_valid)
        panoptic_logits = jnp.concatenate(
            [jnp.moveaxis(seg[..., :num_stuff], -1, 0), inst_logits], axis=0
        )  # (num_stuff + G, h, w)

        # MaskMatching (unary_logits.py:160-195): stuff [0..10] from gt seg,
        # instance pixels → 11+i (later instances overwrite), else 255
        gt_seg = gt_semantic_seg_Nx[0]  # (h, w) int
        matched = jnp.where(
            (gt_seg <= num_stuff - 1) | (gt_seg >= 255), gt_seg, -1
        )
        masks4 = gt_masks[:, ::4, ::4]

        def fold(i, m):
            inst = (masks4[i] != 0) & (masks4[i] != 255) & gt_valid[i]
            return jnp.where(inst, i + num_stuff, m)

        matched = jax.lax.fori_loop(0, g, fold, matched)
        matched = jnp.where(matched == -1, 255, matched)

        logits_hwc = jnp.moveaxis(panoptic_logits, 0, -1)[None]
        return softmax_cross_entropy(logits_hwc, matched[None], ignore_index=255)

    # ------------------------------------------------------------------
    # inference (panoptic_fusetrack.py:358-606) — one frame, functional
    # ------------------------------------------------------------------

    def predict(
        self,
        img,
        ref_img,
        track_state: TrackState,
        img_shape_withoutpad: Optional[Tuple[int, int]] = None,
        ref_feats=None,
    ):
        """Single-frame FuseTrack inference. Returns (outputs dict,
        new TrackState). Pass a fresh empty_track_state() at video starts.

        `ref_feats`: the previous frame's plain FPN pyramid (the
        `fpn_feats` entry of the previous step's outputs). Supplying it
        skips the ref-frame backbone pass — the steady-state video-scan
        fast path; None recomputes it (video starts / single frames)."""
        tcfg = self.test_cfg
        h, w = img.shape[1:3]
        x, _, plain_x = self._fused_feats(img, ref_img, ref_feats=ref_feats)

        fcn_output, fcn_score = self.panoptic_m(list(x[: self.panoptic_m.num_levels]))

        # RPN proposals
        cls_outs, reg_outs = self.rpn_head_m(x)
        anchors = self._anchors_for(cls_outs)
        rcfg = tcfg["rpn"]
        proposals, _, prop_valid = rpn_proposals(
            [c[0] for c in cls_outs],
            [r[0] for r in reg_outs],
            anchors,
            (h, w),
            nms_pre=rcfg.get("nms_pre", 1000),
            nms_thr=rcfg.get("nms_thr", 0.7),
            max_num=rcfg.get("max_num", 1000),
        )

        # bbox head + MaskROI panoptic det selection
        roi_feats = self._roi_feats(x, proposals, 7, valid=prop_valid)
        cls_score, bbox_pred = self.bbox_head_m(roi_feats)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        pano_cfg = tcfg.get("panoptic", {})
        det_boxes, det_probs, det_cls, det_valid = panoptic_dets(
            proposals,
            prop_valid,
            cls_prob,
            bbox_pred,
            (h, w),
            score_thresh=pano_cfg.get("score_thresh", 0.6),
            nms_thresh=pano_cfg.get("nms_thresh", 0.5),
            top_n=pano_cfg.get("max_det", 100),
            reg_weights=tuple(pano_cfg.get("bbox_reg_weights", (10.0, 10.0, 5.0, 5.0))),
        )
        det_labels = jnp.maximum(det_cls - 1, 0)

        # tracking
        det_roi_feats = self._roi_feats(x, det_boxes, 7, valid=det_valid)
        if self.track_head_m is not None:
            match_logits = self.track_head_m(
                det_roi_feats, track_state.feats, track_state.valid
            )
            match_logprob = jax.nn.log_softmax(match_logits, axis=-1)
            label_delta = (
                track_state.labels[None, :] == det_labels[:, None]
            ).astype(jnp.float32)
            ious = bbox_overlaps(det_boxes, track_state.bboxes)
            ious = ious * track_state.valid[None, :]
            comp = compute_comp_scores(
                match_logprob, det_probs[:, None], ious, label_delta,
                self.match_coeff,
            )
            # invalid memory columns can never win
            comp = jnp.where(
                jnp.concatenate(
                    [jnp.ones((1,), bool), track_state.valid]
                )[None, :],
                comp,
                -jnp.inf,
            )
            det_obj_ids, new_state = track_assign(
                comp, det_boxes, det_labels, det_roi_feats, det_valid, track_state
            )
        else:
            det_obj_ids = jnp.where(
                det_valid, jnp.cumsum(det_valid.astype(jnp.int32)) - 1, -1
            )
            new_state = track_state

        # mask logits for panoptic fusion
        mask_feats = self._roi_feats(x, det_boxes, 14, valid=det_valid)
        mask_score = self.mask_head_m(mask_feats)
        mask_score = jnp.take_along_axis(
            mask_score, det_cls[:, None, None, None], axis=-1
        )[..., 0]

        fusion = mask_removal_and_fuse(
            det_boxes,
            det_probs,
            det_cls,
            det_valid,
            det_obj_ids,
            mask_score,
            fcn_output[0],
            num_stuff=self.panoptic_m.num_stuff_classes,
        )

        panoptic = fusion.panoptic
        sseg = fusion.sseg
        if img_shape_withoutpad is not None:
            ph, pw = img_shape_withoutpad
            panoptic = panoptic[:ph, :pw]
            sseg = sseg[:ph, :pw]

        outputs = {
            "fcn_outputs": sseg,
            "panoptic_outputs": panoptic,
            "panoptic_cls_inds": fusion.keep_cls,
            "panoptic_cls_prob": fusion.keep_probs,
            "panoptic_det_obj_ids": fusion.keep_obj_ids,
            "panoptic_valid": fusion.keep_valid,
            "num_keep": fusion.num_keep,
            "det_bboxes": det_boxes,
            "det_labels": det_labels,
            "det_probs": det_probs,
            "det_valid": det_valid,
            # carry for the next frame's ref_feats (stays on device)
            "fpn_feats": tuple(plain_x),
        }
        return outputs, new_state

    def predict_aug(
        self,
        imgs,
        ref_imgs,
        track_state: TrackState,
        aug_metas: Tuple[Dict[str, Any], ...],
        img_shape_withoutpad: Optional[Tuple[int, int]] = None,
    ):
        """Test-time-augmented FuseTrack inference: the reference's aug-test
        merge semantics (test_mixins.py:43-110 aug_test_rpn/aug_test_bboxes,
        core/post_processing/merge_augs.py merge_aug_proposals/bboxes/masks/
        semantic_segms) composed with predict()'s panoptic fusion + tracking
        tail.

        imgs / ref_imgs: (V, 1, H, W, 3) — every variant rides ONE padded
        canvas (smaller scales occupy the top-left corner). aug_metas: a
        STATIC tuple of per-variant dicts with `flip` (bool),
        `scale_ratio` (variant scale / canonical scale) and `img_shape`
        ((h_v, w_v) valid content region). Variant 0 must be the canonical
        unflipped scale_ratio=1 variant — merged detections, semantic
        logits, tracking and panoptic outputs all live in its frame.
        """
        tcfg = self.test_cfg
        v_count = imgs.shape[0]
        assert len(aug_metas) == v_count
        m0 = aug_metas[0]
        assert not m0.get("flip", False) and m0.get("scale_ratio", 1.0) == 1.0
        h, w = imgs.shape[2:4]
        h0, w0 = m0.get("img_shape", (h, w))

        rcfg = tcfg["rpn"]
        nms_pre = rcfg.get("nms_pre", 1000)
        max_num = rcfg.get("max_num", 1000)

        feats = []
        fcn_sum = None
        all_props, all_scores, all_valid = [], [], []
        for v in range(v_count):
            meta = aug_metas[v]
            flip = bool(meta.get("flip", False))
            ratio = float(meta.get("scale_ratio", 1.0))
            hv, wv = meta.get("img_shape", (h, w))
            x_v, _, _ = self._fused_feats(imgs[v], ref_imgs[v])
            feats.append(x_v)

            # merge_aug_semantic_segms: unflip the valid content region,
            # resize it to the canonical frame, mean of logits. Content
            # always occupies the top-left [0,hv)×[0,wv) of the canvas and
            # flips happen WITHIN it (MultiScaleFlipAug), the reference's
            # resize→flip→pad order.
            fcn_v, _ = self.panoptic_m(list(x_v[: self.panoptic_m.num_levels]))
            fcn_v = fcn_v[0]
            if flip or (hv, wv) != (h, w):
                fcn_v = fcn_v[:hv, :wv, :]
                if flip:
                    fcn_v = fcn_v[:, ::-1, :]
                if (hv, wv) != (h0, w0):
                    fcn_v = resize_bilinear(fcn_v[None], (h0, w0))[0]
                fcn_v = jnp.pad(fcn_v, (
                    (0, h - fcn_v.shape[0]), (0, w - fcn_v.shape[1]), (0, 0)
                ))
            fcn_sum = fcn_v if fcn_sum is None else fcn_sum + fcn_v

            # aug_test_rpn: per-variant proposals mapped back to canonical
            cls_outs, reg_outs = self.rpn_head_m(x_v)
            props, scores, pvalid = rpn_proposals(
                [c[0] for c in cls_outs],
                [r[0] for r in reg_outs],
                self._anchors_for(cls_outs),
                (hv, wv),
                nms_pre=nms_pre,
                nms_thr=rcfg.get("nms_thr", 0.7),
                max_num=max_num,
            )
            # bbox_mapping_back convention: unflip over the VARIANT's
            # img_shape (core/bbox/transforms.py:99-103), then ÷ratio
            props = self._map_boxes_back(props, flip, ratio, (hv, wv))
            all_props.append(props)
            all_scores.append(scores)
            all_valid.append(pvalid)

        fcn_output = (fcn_sum / v_count)[None]

        # merge_aug_proposals: concat recovered proposals → NMS → top max_num
        cat_p = jnp.concatenate(all_props, axis=0)
        cat_s = jnp.concatenate(all_scores, axis=0)
        cat_v = jnp.concatenate(all_valid, axis=0)
        keep = nms_op(cat_p, jnp.where(cat_v, cat_s, 0.0),
                      rcfg.get("nms_thr", 0.7), valid=cat_v)
        kept_s = jnp.where(keep, cat_s, NEG_INF)
        top_s, top_i = jax.lax.top_k(kept_s, max_num)
        prop_valid = top_s > NEG_INF / 2
        proposals = cat_p[top_i] * prop_valid[:, None]

        # aug_test_bboxes: bbox head per variant on the SAME merged
        # proposals mapped into each variant frame; recovered decoded boxes
        # and scores are averaged before one NMS (merge_aug_bboxes)
        pano_cfg = tcfg.get("panoptic", {})
        reg_w = tuple(pano_cfg.get("bbox_reg_weights", (10.0, 10.0, 5.0, 5.0)))
        boxes_sum = None
        probs_sum = None
        for v in range(v_count):
            meta = aug_metas[v]
            flip = bool(meta.get("flip", False))
            ratio = float(meta.get("scale_ratio", 1.0))
            hv, wv = meta.get("img_shape", (h, w))
            props_v = self._map_boxes_into(proposals, flip, ratio, (hv, wv))
            roi_feats = self._roi_feats(feats[v], props_v, 7, valid=prop_valid)
            cls_score, bbox_pred = self.bbox_head_m(roi_feats)
            boxes_v = delta2bbox_upsnet(props_v, bbox_pred, reg_w, (hv, wv))
            boxes_v = self._map_boxes_back(boxes_v, flip, ratio, (hv, wv))
            probs_v = jax.nn.softmax(cls_score, axis=-1)
            boxes_sum = boxes_v if boxes_sum is None else boxes_sum + boxes_v
            probs_sum = probs_v if probs_sum is None else probs_sum + probs_v
        boxes_mean = boxes_sum / v_count
        probs_mean = probs_sum / v_count

        det_boxes, det_probs, det_cls, det_valid = panoptic_dets_from_decoded(
            boxes_mean,
            probs_mean,
            prop_valid,
            score_thresh=pano_cfg.get("score_thresh", 0.6),
            nms_thresh=pano_cfg.get("nms_thresh", 0.5),
            top_n=pano_cfg.get("max_det", 100),
        )
        det_labels = jnp.maximum(det_cls - 1, 0)

        # tracking runs in the canonical frame on variant-0 features
        det_roi_feats = self._roi_feats(feats[0], det_boxes, 7, valid=det_valid)
        if self.track_head_m is not None:
            match_logits = self.track_head_m(
                det_roi_feats, track_state.feats, track_state.valid
            )
            match_logprob = jax.nn.log_softmax(match_logits, axis=-1)
            label_delta = (
                track_state.labels[None, :] == det_labels[:, None]
            ).astype(jnp.float32)
            ious = bbox_overlaps(det_boxes, track_state.bboxes)
            ious = ious * track_state.valid[None, :]
            comp = compute_comp_scores(
                match_logprob, det_probs[:, None], ious, label_delta,
                self.match_coeff,
            )
            comp = jnp.where(
                jnp.concatenate(
                    [jnp.ones((1,), bool), track_state.valid]
                )[None, :],
                comp,
                -jnp.inf,
            )
            det_obj_ids, new_state = track_assign(
                comp, det_boxes, det_labels, det_roi_feats, det_valid,
                track_state,
            )
        else:
            det_obj_ids = jnp.where(
                det_valid, jnp.cumsum(det_valid.astype(jnp.int32)) - 1, -1
            )
            new_state = track_state

        # merge_aug_masks: per-variant 28×28 mask probs, unflipped in ROI
        # space, averaged; fusion consumes logit(mean prob)
        mask_prob_sum = None
        for v in range(v_count):
            meta = aug_metas[v]
            flip = bool(meta.get("flip", False))
            ratio = float(meta.get("scale_ratio", 1.0))
            hv, wv = meta.get("img_shape", (h, w))
            boxes_v = self._map_boxes_into(det_boxes, flip, ratio, (hv, wv))
            mask_feats = self._roi_feats(feats[v], boxes_v, 14, valid=det_valid)
            mask_score = self.mask_head_m(mask_feats)
            mask_score = jnp.take_along_axis(
                mask_score, det_cls[:, None, None, None], axis=-1
            )[..., 0]
            prob = jax.nn.sigmoid(mask_score)
            if flip:
                prob = prob[:, :, ::-1]
            mask_prob_sum = prob if mask_prob_sum is None \
                else mask_prob_sum + prob
        mean_prob = jnp.clip(mask_prob_sum / v_count, 1e-6, 1.0 - 1e-6)
        mask_logits = jnp.log(mean_prob) - jnp.log1p(-mean_prob)

        fusion = mask_removal_and_fuse(
            det_boxes,
            det_probs,
            det_cls,
            det_valid,
            det_obj_ids,
            mask_logits,
            fcn_output[0],
            num_stuff=self.panoptic_m.num_stuff_classes,
        )

        panoptic = fusion.panoptic
        sseg = fusion.sseg
        if img_shape_withoutpad is not None:
            ph, pw = img_shape_withoutpad
            panoptic = panoptic[:ph, :pw]
            sseg = sseg[:ph, :pw]

        outputs = {
            "fcn_outputs": sseg,
            "panoptic_outputs": panoptic,
            "panoptic_cls_inds": fusion.keep_cls,
            "panoptic_cls_prob": fusion.keep_probs,
            "panoptic_det_obj_ids": fusion.keep_obj_ids,
            "panoptic_valid": fusion.keep_valid,
            "num_keep": fusion.num_keep,
            "det_bboxes": det_boxes,
            "det_labels": det_labels,
            "det_probs": det_probs,
            "det_valid": det_valid,
        }
        return outputs, new_state

    @staticmethod
    def _map_boxes_back(boxes, flip: bool, ratio: float, canvas_hw):
        """bbox_mapping_back (core/bbox/transforms.py): variant frame →
        canonical frame (unflip on the padded canvas width, then ÷ratio)."""
        from vps_tpu.ops.box import bbox_flip

        if flip:
            boxes = bbox_flip(boxes, canvas_hw)
        if ratio != 1.0:
            boxes = boxes / ratio
        return boxes

    @staticmethod
    def _map_boxes_into(boxes, flip: bool, ratio: float, canvas_hw):
        """bbox_mapping: canonical frame → variant frame."""
        from vps_tpu.ops.box import bbox_flip

        if ratio != 1.0:
            boxes = boxes * ratio
        if flip:
            boxes = bbox_flip(boxes, canvas_hw)
        return boxes


def predict_video(
    det,
    variables,
    imgs,
    resets,
    track_state: TrackState,
    prev_img,
    prev_feats=None,
    img_shape_withoutpad: Optional[Tuple[int, int]] = None,
):
    """Scan a clip of frames through FuseTrack inference ON DEVICE.

    The reference's per-frame host loop (tools/test_vpq.py:28-69 upstream)
    dispatches one frame at a time; on TPU each dispatch costs a host→device
    round trip that can exceed the frame's compute. This runner is the
    lax.scan formulation SURVEY §5 calls for: T frames ride one dispatch,
    tracking state and the previous frame's FPN pyramid are carried
    in-graph, and per-frame outputs come back stacked.

    imgs: (T, B, H, W, 3); resets: (T,) bool — frame t starts a new video
    (tracking state cleared, its reference is the frame itself, the feature
    carry is recomputed). prev_img/prev_feats: last frame (+ its pyramid)
    of the previous chunk; prev_feats=None computes it from prev_img.
    Returns (stacked outputs without the fpn_feats carry, (state, feats,
    last_img)).
    """
    extract = lambda im: det.apply(variables, im, method=det.extract_feat)
    if prev_feats is None:
        prev_feats = extract(prev_img)
    empty = jax.tree.map(jnp.zeros_like, track_state)

    def step(carry, xs):
        state, ref_feats, prev = carry
        img, reset = xs
        state = jax.tree.map(
            lambda e, s: jnp.where(reset, e, s), empty, state
        )
        ref_img = jnp.where(reset, img, prev)
        ref_feats = jax.lax.cond(
            reset, lambda: extract(img), lambda: ref_feats
        )
        outputs, state = det.apply(
            variables, img, ref_img, state, ref_feats=ref_feats,
            img_shape_withoutpad=img_shape_withoutpad,
            method=det.predict,
        )
        feats = outputs.pop("fpn_feats")
        return (state, feats, img), outputs

    (state, feats, last), outputs = jax.lax.scan(
        step, (track_state, prev_feats, prev_img), (imgs, resets)
    )
    return outputs, (state, feats, last)


def run_video_streams(
    det,
    variables,
    frames,
    chunk: int,
    record,
    img_shape_withoutpad: Optional[Tuple[int, int]] = None,
    track_cap: int = 256,
    n_streams: Optional[int] = None,
    devices=None,
):
    """Round-robin whole videos over parallel per-device streams.

    Videos are independent (tracking state is per-video), so eval throughput
    scales near-linearly with local devices; jax's async dispatch overlaps
    the streams' chunks. ``frames`` yields (img (1,H,W,3) float array,
    is_first, meta); ``record(outputs_np_frame, meta)`` receives each real
    frame's stacked predict outputs (order is chunk-grouped and interleaved
    across streams — downstream consumers key results by name).

    This is the library core of tools/test_vpq.py --streams.
    """
    devices = devices or jax.local_devices()
    n_streams = n_streams or len(devices)
    T = chunk

    run_chunk = jax.jit(
        lambda v, imgs, resets, ts, pimg, pfeats: predict_video(
            det, v, imgs, resets, ts, pimg, prev_feats=pfeats,
            img_shape_withoutpad=img_shape_withoutpad,
        )
    )

    class _Stream:
        def __init__(self, dev):
            self.dev = dev
            self.variables = jax.device_put(variables, dev)
            self.tstate = jax.device_put(empty_track_state(cap=track_cap), dev)
            self.prev_img = None
            self.prev_feats = None
            self.imgs = []
            self.resets = []
            self.meta = []
            self.pending = []

        def flush(self):
            if not self.imgs:
                return
            n_real = len(self.imgs)
            while len(self.imgs) < T:  # pad; padded outputs are dropped
                self.imgs.append(self.imgs[-1])
                self.resets.append(False)
            imgs = jax.device_put(
                jnp.asarray(np.stack(self.imgs)), self.dev)
            resets = jax.device_put(jnp.asarray(np.asarray(self.resets)),
                                    self.dev)
            if self.prev_img is None:
                self.prev_img = imgs[0]
            if self.prev_feats is None:
                self.prev_feats = det.apply(
                    self.variables, self.prev_img, method=det.extract_feat)
            outputs, (self.tstate, self.prev_feats, self.prev_img) = run_chunk(
                self.variables, imgs, resets, self.tstate, self.prev_img,
                self.prev_feats)
            # async dispatch: materialize later so other streams overlap
            self.pending.append((outputs, self.meta, n_real))
            self.imgs, self.resets, self.meta = [], [], []

        def drain(self):
            for outputs, metas, n_real in self.pending:
                outputs_np = {k: np.asarray(v) for k, v in outputs.items()}
                for t in range(n_real):
                    record({k: v[t] for k, v in outputs_np.items()}, metas[t])
            self.pending = []

    streams = [_Stream(devices[i % len(devices)]) for i in range(n_streams)]
    cur = 0
    nvid = 0
    for img, is_first, meta in frames:
        if is_first:
            streams[cur].flush()
            cur = nvid % n_streams
            nvid += 1
        st = streams[cur]
        st.imgs.append(np.asarray(img))
        st.resets.append(bool(is_first))
        st.meta.append(meta)
        if len(st.imgs) == T:
            st.flush()
        if sum(len(s2.pending) for s2 in streams) > 2 * n_streams:
            for s2 in streams:
                s2.drain()
    for st in streams:
        st.flush()
        st.drain()


@DETECTORS.register
class PanopticFuse(PanopticFuseTrack):
    """Fuse module without tracking (reference panoptic_fuse.py:24)."""

    track_head: Optional[Dict[str, Any]] = None


@DETECTORS.register
class PanopticTrack(PanopticFuseTrack):
    """Tracking without flow fusion (reference panoptic_track.py:22)."""

    extra_neck: Optional[Dict[str, Any]] = None
    with_flow: bool = False
