"""Generic two-stage detector zoo, rebuilt TPU-first.

Reference: /root/reference/mmdet/models/detectors/two_stage.py:14 (base),
faster_rcnn.py:6, mask_rcnn.py:6, fast_rcnn.py:6, rpn.py:14,
grid_rcnn.py:10, mask_scoring_rcnn.py:9, double_head_rcnn.py:8. The math
(assign→sample→targets→losses, NMS decode, grid voting, mask-IoU scoring)
follows the reference; orchestration is redesigned static-shape: fixed
proposal/ROI capacities with validity masks, one jittable loss() and one
jittable predict() per detector, functional rngs for the samplers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import (
    BACKBONES,
    DETECTORS,
    HEADS,
    NECKS,
    SHARED_HEADS,
    build_from_cfg,
)
from vps_tpu.models.rpn_head import RPNHead, rpn_proposals
from vps_tpu.models.bbox_head import get_det_bboxes
from vps_tpu.models.mask_head import select_mask_channel
from vps_tpu.ops import multilevel_roi_align
from vps_tpu.ops.anchors import AnchorGenerator
from vps_tpu.ops.losses import (
    accuracy,
    binary_cross_entropy_with_logits,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from vps_tpu.core.targets import anchor_target, proposal_target


def _build(cfg, registry, default_type=None):
    cfg = dict(cfg)
    if default_type is not None:
        cfg.setdefault("type", default_type)
    return build_from_cfg(cfg, registry)


def roi_rescale(rois, scale_factor: float):
    """Scale ROI w/h about the center (reference
    roi_extractors/single_level.py:75-88 roi_rescale, +1 convention)."""
    cx = (rois[:, 0] + rois[:, 2]) * 0.5
    cy = (rois[:, 1] + rois[:, 3]) * 0.5
    w = (rois[:, 2] - rois[:, 0] + 1.0) * scale_factor
    h = (rois[:, 3] - rois[:, 1] + 1.0) * scale_factor
    return jnp.stack(
        [cx - w * 0.5 + 0.5, cy - h * 0.5 + 0.5,
         cx + w * 0.5 - 0.5, cy + h * 0.5 - 0.5], axis=-1)


@DETECTORS.register
class FasterRCNN(nn.Module):
    """RPN + RoIAlign + SharedFCBBoxHead (faster_rcnn.py:6). Also the base
    class of the two-stage family: MaskRCNN adds the mask branch,
    Grid/MaskScoring/DoubleHead override hooks, CascadeRCNN/HTC live in
    cascade.py on the same helpers."""

    backbone: Dict[str, Any]
    rpn_head: Optional[Dict[str, Any]] = None
    bbox_roi_extractor: Optional[Dict[str, Any]] = None
    bbox_head: Optional[Dict[str, Any]] = None
    neck: Optional[Dict[str, Any]] = None
    shared_head: Optional[Dict[str, Any]] = None
    mask_roi_extractor: Optional[Dict[str, Any]] = None
    mask_head: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = _build(self.backbone, BACKBONES)
        self.neck_m = _build(self.neck, NECKS) if self.neck else None
        self.shared_head_m = (
            _build(self.shared_head, SHARED_HEADS, "ResLayer")
            if self.shared_head else None
        )
        if self.rpn_head is not None:
            r = dict(self.rpn_head)
            self.anchor_scales = list(r.get("anchor_scales", [8]))
            self.anchor_ratios = list(r.get("anchor_ratios", [0.5, 1.0, 2.0]))
            self.anchor_strides = list(
                r.get("anchor_strides", [4, 8, 16, 32, 64]))
            self.rpn_head_m = RPNHead(
                in_channels=r.get("in_channels", 256),
                feat_channels=r.get("feat_channels", 256),
                num_anchors=len(self.anchor_scales) * len(self.anchor_ratios),
                target_means=tuple(r.get("target_means", (0.0,) * 4)),
                target_stds=tuple(r.get("target_stds", (1.0,) * 4)),
                name="rpn_head",
            )
        else:
            self.rpn_head_m = None
        # per-stage list configs are handled by CascadeRCNN._setup_extra.
        # NOTE flax freezes dataclass fields: dict → FrozenDict (not a dict
        # subclass) and list → tuple, so "is it per-stage" is a tuple/list
        # check, never isinstance(dict).
        def _single(cfg):
            return cfg is not None and not isinstance(cfg, (list, tuple))

        self.bbox_head_m = (
            _build(self.bbox_head, HEADS, "SharedFCBBoxHead")
            if _single(self.bbox_head) else None
        )
        self.mask_head_m = (
            _build(self.mask_head, HEADS, "FCNMaskHead")
            if _single(self.mask_head) else None
        )
        self.bbox_roi_cfg = (
            dict(self.bbox_roi_extractor)
            if _single(self.bbox_roi_extractor) else {}
        )
        self.mask_roi_cfg = (
            dict(self.mask_roi_extractor)
            if _single(self.mask_roi_extractor) else self.bbox_roi_cfg
        )
        self._setup_extra()

    def _setup_extra(self):
        """Subclass hook for extra branches (grid/mask-iou heads)."""

    # -- shared pieces ---------------------------------------------------

    def extract_feat(self, img):
        x = self.backbone_m(img)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def _roi_feats(self, feats, rois, which: str, valid=None,
                   roi_scale_factor=None, apply_shared: bool = True):
        cfg = self.bbox_roi_cfg if which == "bbox" else self.mask_roi_cfg
        strides = cfg.get("featmap_strides", [4, 8, 16, 32])
        layer = cfg.get("roi_layer", {})
        if roi_scale_factor is not None:
            rois = roi_rescale(rois, roi_scale_factor)
        out = multilevel_roi_align(
            [f[0] for f in feats[: len(strides)]],
            rois,
            strides,
            layer.get("out_size", 7 if which == "bbox" else 14),
            layer.get("sample_num", 2),
            valid=valid,
            sampling=layer.get("sampling", "bilinear"),
        )
        if self.shared_head_m is not None and apply_shared:
            out = self.shared_head_m(out)
        return out

    def _anchors_for(self, cls_outs):
        anchors = []
        for lvl, stride in enumerate(self.anchor_strides):
            gen = AnchorGenerator(stride, self.anchor_scales,
                                  self.anchor_ratios)
            h, w = cls_outs[lvl].shape[1:3]
            anchors.append(gen.grid_anchors((h, w), stride))
        return anchors

    def _rpn_losses_and_proposals(self, x, img_shape, gt_bboxes, gt_valid,
                                  losses):
        """RPN losses + stop-gradient proposals (two_stage.py:142-170)."""
        tc = self.train_cfg
        cls_outs, reg_outs = self.rpn_head_m(x)
        anchors = self._anchors_for(cls_outs)
        flat_anchors = jnp.concatenate(anchors, axis=0)
        rpn_cfg = tc["rpn"]
        at = anchor_target(
            self.make_rng("sampler"),
            flat_anchors,
            jnp.ones((flat_anchors.shape[0],), bool),
            gt_bboxes,
            gt_valid,
            img_shape,
            rpn_cfg,
        )
        flat_cls = jnp.concatenate([c[0].reshape(-1) for c in cls_outs])
        flat_reg = jnp.concatenate([r[0].reshape(-1, 4) for r in reg_outs])
        num_total = jnp.maximum(at.num_pos + at.num_neg, 1).astype(
            jnp.float32)
        losses["loss_rpn_cls"] = binary_cross_entropy_with_logits(
            flat_cls, at.labels.astype(jnp.float32),
            weight=at.label_weights, avg_factor=num_total,
        )
        losses["loss_rpn_bbox"] = smooth_l1_loss(
            flat_reg, at.bbox_targets, beta=1.0 / 9.0,
            weight=at.bbox_weights, avg_factor=num_total,
        )
        pcfg = tc.get("rpn_proposal", {})
        proposals, _, prop_valid = jax.lax.stop_gradient(
            rpn_proposals(
                [c[0] for c in cls_outs],
                [r[0] for r in reg_outs],
                anchors,
                img_shape,
                nms_pre=pcfg.get("nms_pre", 2000),
                nms_thr=pcfg.get("nms_thr", 0.7),
                max_num=pcfg.get("max_num", 2000),
            )
        )
        return proposals, prop_valid

    def _test_proposals(self, x, img_shape):
        cls_outs, reg_outs = self.rpn_head_m(x)
        rcfg = self.test_cfg["rpn"]
        return rpn_proposals(
            [c[0] for c in cls_outs],
            [r[0] for r in reg_outs],
            self._anchors_for(cls_outs),
            img_shape,
            nms_pre=rcfg.get("nms_pre", 1000),
            nms_thr=rcfg.get("nms_thr", 0.7),
            max_num=rcfg.get("max_num", 1000),
        )

    def _bbox_forward(self, x, rois, valid):
        """Hook: ROI feats → (cls, reg). DoubleHeadRCNN overrides."""
        feats = self._roi_feats(x, rois, "bbox", valid=valid)
        return self.bbox_head_m(feats), feats

    # -- training ---------------------------------------------------------

    def loss(self, img, gt_bboxes, gt_labels, gt_valid, gt_masks=None,
             proposals=None, proposal_valid=None):
        """One-image two-stage losses (two_stage.py forward_train). GT are
        fixed-capacity (G, 4)/(G,) with gt_valid; gt_masks (G, H, W) when a
        mask head is configured. proposals/proposal_valid: pre-computed
        boxes for the RPN-less FastRCNN (fast_rcnn.py:6)."""
        losses = {}
        tc = self.train_cfg
        h, w = img.shape[1:3]
        x = self.extract_feat(img)

        if self.rpn_head_m is not None:
            proposals, proposal_valid = self._rpn_losses_and_proposals(
                x, (h, w), gt_bboxes, gt_valid, losses)
        assert proposals is not None, "FastRCNN needs precomputed proposals"

        rc = tc["rcnn"]
        st = proposal_target(
            self.make_rng("sampler"),
            proposals,
            proposal_valid,
            gt_bboxes,
            gt_labels,
            gt_valid,
            rc,
            gt_masks=gt_masks if self.mask_head_m is not None else None,
            target_means=self.bbox_head_m.target_means,
            target_stds=self.bbox_head_m.target_stds,
        )

        (cls_score, bbox_pred), bbox_feats = self._bbox_forward(
            x, st.rois, st.valid)
        avg = jnp.maximum(jnp.sum(st.label_weights), 1.0)
        losses["loss_cls"] = softmax_cross_entropy(
            cls_score, st.labels, weight=st.label_weights, avg_factor=avg)
        losses["acc"] = accuracy(cls_score, st.labels, valid=st.valid)
        num = st.rois.shape[0]
        if self.bbox_head_m.reg_class_agnostic:
            pred_by_label = bbox_pred
        else:
            nc = self.bbox_head_m.num_classes
            pred_by_label = jnp.take_along_axis(
                bbox_pred.reshape(num, nc, 4),
                st.labels[:, None, None].repeat(4, -1), axis=1,
            )[:, 0, :]
        losses["loss_bbox"] = smooth_l1_loss(
            pred_by_label, st.bbox_targets, beta=1.0,
            weight=st.bbox_weights, avg_factor=float(num),
        )

        mask_pred = None
        if self.mask_head_m is not None:
            n_pos_max = st.mask_targets.shape[0]
            pos_rois = st.rois[:n_pos_max]
            pos_mask = st.pos_mask[:n_pos_max]
            mask_feats = self._roi_feats(x, pos_rois, "mask", valid=pos_mask)
            mask_pred = self.mask_head_m(mask_feats)
            pos_labels = st.labels[:n_pos_max]
            pred_slice = select_mask_channel(mask_pred, pos_labels)
            num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
            msz = st.mask_targets.shape[-1]
            losses["loss_mask"] = binary_cross_entropy_with_logits(
                pred_slice,
                st.mask_targets,
                weight=pos_mask[:, None, None].astype(jnp.float32),
                avg_factor=num_pos * float(msz * msz),
            )
            self._extra_mask_losses(losses, st, mask_feats, mask_pred,
                                    gt_masks)
        self._extra_losses(losses, x, st, (h, w), gt_bboxes, gt_valid)
        return losses

    def _extra_mask_losses(self, losses, st, mask_feats, mask_pred, gt_masks):
        """Hook after the mask loss (MaskScoringRCNN)."""

    def _extra_losses(self, losses, x, st, img_shape, gt_bboxes, gt_valid):
        """Hook after the bbox/mask losses (GridRCNN)."""

    # -- inference ---------------------------------------------------------

    def predict(self, img, proposals=None, proposal_valid=None):
        """Single-image inference. Returns a dict with fixed-size
        det_bboxes (max_per_img, 5), det_labels (0-based), det_valid, and —
        when a mask head is configured — mask_logits (max_per_img, 2S, 2S)
        of each det's class (paste with vps_tpu.ops.mask.paste_masks)."""
        tcfg = self.test_cfg or {}
        h, w = img.shape[1:3]
        x = self.extract_feat(img)
        if self.rpn_head_m is not None:
            proposals, _, proposal_valid = self._test_proposals(x, (h, w))
        (cls_score, bbox_pred), _ = self._bbox_forward(
            x, proposals, proposal_valid)
        rcnn = tcfg.get("rcnn", {})
        dets, labels, valid = get_det_bboxes(
            proposals,
            cls_score,
            bbox_pred,
            (h, w),
            score_thr=rcnn.get("score_thr", 0.05),
            nms_iou_thr=rcnn.get("nms", {}).get("iou_thr", 0.5),
            max_per_img=rcnn.get("max_per_img", 100),
            target_means=self.bbox_head_m.target_means,
            target_stds=self.bbox_head_m.target_stds,
            valid=proposal_valid.astype(jnp.float32),
            nms_cfg=rcnn.get("nms"),
        )
        out = {"det_bboxes": dets, "det_labels": labels, "det_valid": valid}
        if self.mask_head_m is not None:
            mask_feats = self._roi_feats(x, dets[:, :4], "mask", valid=valid)
            mask_pred = self.mask_head_m(mask_feats)
            out["mask_logits"] = select_mask_channel(mask_pred, labels + 1)
            self._extra_predict_mask(out, mask_feats, mask_pred)
        self._extra_predict(out, x, (h, w))
        return out

    def _extra_predict_mask(self, out, mask_feats, mask_pred):
        """Hook after mask prediction (MaskScoringRCNN)."""

    def _extra_predict(self, out, x, img_shape):
        """Hook after detection (GridRCNN refinement)."""


@DETECTORS.register
class MaskRCNN(FasterRCNN):
    """FasterRCNN + FCNMaskHead (mask_rcnn.py:6) — the config supplies
    mask_roi_extractor/mask_head; the class exists for type= parity."""


@DETECTORS.register
class FastRCNN(FasterRCNN):
    """RPN-less: loss/predict take precomputed proposals (fast_rcnn.py:6)."""

    rpn_head: Optional[Dict[str, Any]] = None


@DETECTORS.register
class RPN(nn.Module):
    """Proposal-only detector (rpn.py:14): backbone(+neck) + RPNHead;
    loss() is the RPN loss, predict() returns proposals."""

    backbone: Dict[str, Any]
    rpn_head: Dict[str, Any]
    neck: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = _build(self.backbone, BACKBONES)
        self.neck_m = _build(self.neck, NECKS) if self.neck else None
        r = dict(self.rpn_head)
        self.anchor_scales = list(r.get("anchor_scales", [8]))
        self.anchor_ratios = list(r.get("anchor_ratios", [0.5, 1.0, 2.0]))
        self.anchor_strides = list(r.get("anchor_strides", [4, 8, 16, 32, 64]))
        self.rpn_head_m = RPNHead(
            in_channels=r.get("in_channels", 256),
            feat_channels=r.get("feat_channels", 256),
            num_anchors=len(self.anchor_scales) * len(self.anchor_ratios),
            name="rpn_head",
        )

    def extract_feat(self, img):
        x = self.backbone_m(img)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    _anchors_for = FasterRCNN._anchors_for
    _test_proposals = FasterRCNN._test_proposals

    def loss(self, img, gt_bboxes, gt_valid):
        """RPN-only training (rpn.py forward_train): the anchor cls/reg
        losses, no proposal decode."""
        losses = {}
        h, w = img.shape[1:3]
        x = self.extract_feat(img)
        cls_outs, reg_outs = self.rpn_head_m(x)
        anchors = self._anchors_for(cls_outs)
        flat_anchors = jnp.concatenate(anchors, axis=0)
        at = anchor_target(
            self.make_rng("sampler"),
            flat_anchors,
            jnp.ones((flat_anchors.shape[0],), bool),
            gt_bboxes,
            gt_valid,
            (h, w),
            self.train_cfg["rpn"],
        )
        flat_cls = jnp.concatenate([c[0].reshape(-1) for c in cls_outs])
        flat_reg = jnp.concatenate([r[0].reshape(-1, 4) for r in reg_outs])
        num_total = jnp.maximum(at.num_pos + at.num_neg, 1).astype(
            jnp.float32)
        losses["loss_rpn_cls"] = binary_cross_entropy_with_logits(
            flat_cls, at.labels.astype(jnp.float32),
            weight=at.label_weights, avg_factor=num_total,
        )
        losses["loss_rpn_bbox"] = smooth_l1_loss(
            flat_reg, at.bbox_targets, beta=1.0 / 9.0,
            weight=at.bbox_weights, avg_factor=num_total,
        )
        return losses

    def predict(self, img):
        h, w = img.shape[1:3]
        x = self.extract_feat(img)
        proposals, scores, valid = self._test_proposals(x, (h, w))
        return {"proposals": proposals, "scores": scores,
                "proposal_valid": valid}


@DETECTORS.register
class DoubleHeadRCNN(FasterRCNN):
    """Double-Head R-CNN (double_head_rcnn.py:8): the reg branch pools ROIs
    scaled by reg_roi_scale_factor and both windows feed
    DoubleConvFCBBoxHead's (cls fc / reg conv) branches."""

    reg_roi_scale_factor: float = 1.3

    def _bbox_forward(self, x, rois, valid):
        cls_feats = self._roi_feats(x, rois, "bbox", valid=valid)
        reg_feats = self._roi_feats(
            x, rois, "bbox", valid=valid,
            roi_scale_factor=self.reg_roi_scale_factor)
        return self.bbox_head_m(cls_feats, reg_feats), cls_feats


@DETECTORS.register
class MaskScoringRCNN(FasterRCNN):
    """Mask Scoring R-CNN (mask_scoring_rcnn.py:9): MaskRCNN + MaskIoUHead;
    predict() adds mask_scores = cls score × predicted mask IoU."""

    mask_iou_head: Optional[Dict[str, Any]] = None

    def _setup_extra(self):
        self.mask_iou_head_m = _build(self.mask_iou_head, HEADS,
                                      "MaskIoUHead")

    def _extra_mask_losses(self, losses, st, mask_feats, mask_pred, gt_masks):
        from vps_tpu.models.mask_heads import mask_iou_target

        n_pos_max = st.mask_targets.shape[0]
        pos_labels = st.labels[:n_pos_max]
        pos_mask = st.pos_mask[:n_pos_max]
        pred_slice = select_mask_channel(mask_pred, pos_labels)
        iou_pred = self.mask_iou_head_m(mask_feats, pred_slice)
        pos_iou_pred = jnp.take_along_axis(
            iou_pred, pos_labels[:, None], axis=-1)[:, 0]
        thr = (self.train_cfg or {}).get("rcnn", {}).get(
            "mask_thr_binary", 0.5)
        targets = mask_iou_target(
            st.rois[:n_pos_max], st.pos_gt_idx[:n_pos_max], pos_mask,
            gt_masks, pred_slice, st.mask_targets, thr=thr)
        losses["loss_mask_iou"] = self.mask_iou_head_m.loss(
            pos_iou_pred, targets, pos_mask)

    def _extra_predict_mask(self, out, mask_feats, mask_pred):
        """get_mask_scores (maskiou_head.py:175-190): mask score =
        bbox score × predicted IoU of the det's class."""
        labels = out["det_labels"]
        iou_pred = self.mask_iou_head_m(mask_feats, out["mask_logits"])
        iou = jnp.take_along_axis(
            iou_pred, (labels + 1)[:, None], axis=-1)[:, 0]
        out["mask_scores"] = out["det_bboxes"][:, 4] * iou


@DETECTORS.register
class GridRCNN(FasterRCNN):
    """Grid R-CNN Plus (grid_rcnn.py:10): classification from the bbox head,
    localization from grid-point heatmap voting."""

    grid_roi_extractor: Optional[Dict[str, Any]] = None
    grid_head: Optional[Dict[str, Any]] = None

    def _setup_extra(self):
        self.grid_head_m = _build(self.grid_head, HEADS, "GridHead")
        self.grid_roi_cfg = dict(self.grid_roi_extractor or self.bbox_roi_cfg)

    def _grid_feats(self, x, rois, valid):
        cfg = self.grid_roi_cfg
        strides = cfg.get("featmap_strides", [4, 8, 16, 32])
        layer = cfg.get("roi_layer", {})
        return multilevel_roi_align(
            [f[0] for f in x[: len(strides)]],
            rois,
            strides,
            layer.get("out_size", 14),
            layer.get("sample_num", 2),
            valid=valid,
        )

    def _extra_losses(self, losses, x, st, img_shape, gt_bboxes, gt_valid):
        from vps_tpu.models.mask_heads import grid_target

        rc = self.train_cfg["rcnn"]
        # positive prefix (static capacity ≤ max_num_grid; the reference
        # random-subsamples to 192 only because its positive count is
        # dynamic, grid_rcnn.py:178-184)
        n_pos_max = min(
            int(st.rois.shape[0] * rc["sampler"]["pos_fraction"]),
            rc.get("max_num_grid", 192),
        )
        pos_rois = st.rois[:n_pos_max]
        pos_mask = st.pos_mask[:n_pos_max]
        gt_boxes_of = gt_bboxes[st.pos_gt_idx[:n_pos_max]]
        # random jitter (grid_rcnn.py:58-83)
        amp = 0.15
        offs = jax.random.uniform(
            self.make_rng("sampler"), (n_pos_max, 4), minval=-amp, maxval=amp)
        cxcy = (pos_rois[:, 2:4] + pos_rois[:, :2]) / 2
        wh = jnp.abs(pos_rois[:, 2:4] - pos_rois[:, :2])
        new_c = cxcy + wh * offs[:, :2]
        new_wh = wh * (1 + offs[:, 2:])
        jit = jnp.concatenate([new_c - new_wh / 2, new_c + new_wh / 2], -1)
        hh, ww = img_shape
        jit = jnp.clip(
            jit, 0.0,
            jnp.asarray([ww - 1, hh - 1, ww - 1, hh - 1], jnp.float32))
        grid_feats = self._grid_feats(x, jit, pos_mask)
        fused, unfused = self.grid_head_m(grid_feats, train=True)
        targets = grid_target(
            jit, gt_boxes_of, pos_mask,
            grid_points=self.grid_head_m.grid_points,
            roi_feat_size=self.grid_head_m.roi_feat_size,
            pos_radius=rc.get("pos_radius", 1),
        )
        losses["loss_grid"] = self.grid_head_m.loss(
            fused, unfused, targets, pos_mask)

    def _extra_predict(self, out, x, img_shape):
        from vps_tpu.models.mask_heads import grid_bboxes

        dets = out["det_bboxes"]
        valid = out["det_valid"]
        grid_feats = self._grid_feats(x, dets[:, :4], valid)
        fused, _ = self.grid_head_m(grid_feats)
        refined = grid_bboxes(
            dets[:, :4], dets[:, 4], fused, img_shape,
            grid_points=self.grid_head_m.grid_points,
            roi_feat_size=self.grid_head_m.roi_feat_size,
        )
        out["det_bboxes"] = jnp.concatenate(
            [jnp.where(valid[:, None], refined, 0.0), dets[:, 4:]], axis=-1)
