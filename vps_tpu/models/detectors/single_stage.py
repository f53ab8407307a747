"""Single-stage detectors (RetinaNet / SSD / FCOS) — capability-parity
equivalents of the reference's single_stage.py + retinanet.py/fcos.py
(/root/reference/mmdet/models/detectors/single_stage.py:12, "generic
mmdetection components retained", SURVEY §2.2).

Same static-shape conventions as the panoptic detectors: fixed-capacity
anchor/GT tensors with validity masks; loss() returns a dict of scalars;
predict() returns fixed-size (dets, labels, valid).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import BACKBONES, DETECTORS, NECKS, build_from_cfg
from vps_tpu.models.anchor_heads import (
    FCOSHead,
    RetinaHead,
    anchor_head_bboxes,
    fcos_bboxes,
)
from vps_tpu.models.rpn_head import RPNHead  # noqa: F401 (registry)
from vps_tpu.ops import bbox2delta
from vps_tpu.ops.anchors import AnchorGenerator
from vps_tpu.ops.losses import sigmoid_focal_loss, smooth_l1_loss
from vps_tpu.core.assigner import max_iou_assign


def _build(cfg, registry):
    return build_from_cfg(dict(cfg), registry)


@DETECTORS.register
class RetinaNet(nn.Module):
    """ResNet-FPN + RetinaHead, focal loss (detectors/retinanet.py)."""

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    bbox_head: Dict[str, Any]
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        self.backbone_m = _build(self.backbone, BACKBONES)
        self.neck_m = _build(self.neck, NECKS)
        head = dict(self.bbox_head)
        head.pop("type", None)
        self.head_m = RetinaHead(**head)
        self.strides = (8, 16, 32, 64, 128)
        # retina_head.py: per-level base_size = stride, octave scales 4·2^{i/3}
        self.anchor_gens = [
            AnchorGenerator(
                base_size=s,
                scales=[4 * 2 ** (i / 3) for i in range(3)],
                ratios=[0.5, 1.0, 2.0],
            )
            for s in self.strides
        ]

    def _feats(self, img):
        return self.neck_m(self.backbone_m(img))

    def _anchors(self, feats):
        return [
            g.grid_anchors(f.shape[1:3], s)
            for g, f, s in zip(self.anchor_gens, feats, self.strides)
        ]

    def __call__(self, img):
        return self.head_m(self._feats(img))

    def loss(self, img, gt_bboxes, gt_labels, gt_valid):
        """One-image losses (anchor_head.py loss with focal loss). GT are
        fixed-capacity (G, 4)/(G,) with gt_valid mask."""
        feats = self._feats(img)
        cls_scores, bbox_preds = self.head_m(feats)
        anchors = jnp.concatenate(self._anchors(feats), axis=0)
        fg = self.head_m.num_classes - 1
        cls_flat = jnp.concatenate(
            [c.reshape(-1, fg) for c in cls_scores], axis=0
        )
        reg_flat = jnp.concatenate(
            [r.reshape(-1, 4) for r in bbox_preds], axis=0
        )
        tc = self.train_cfg or {}
        assign = max_iou_assign(
            anchors,
            gt_bboxes,
            pos_iou_thr=tc.get("pos_iou_thr", 0.5),
            neg_iou_thr=tc.get("neg_iou_thr", 0.4),
            min_pos_iou=tc.get("min_pos_iou", 0.0),
            gt_labels=gt_labels,
            gt_valid=gt_valid,
        )
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        labels = jnp.where(pos, assign.labels, 0)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        loss_cls = sigmoid_focal_loss(
            cls_flat, labels, weight=(pos | neg).astype(jnp.float32),
            avg_factor=num_pos,
        )
        gt_idx = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_bboxes.shape[0] - 1)
        targets = bbox2delta(anchors, gt_bboxes[gt_idx])
        loss_reg = smooth_l1_loss(
            reg_flat, targets, beta=0.11,
            weight=pos.astype(jnp.float32)[:, None], avg_factor=num_pos,
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_reg}

    def predict(self, img):
        feats = self._feats(img)
        cls_scores, bbox_preds = self.head_m(feats)
        tcfg = self.test_cfg or {}
        h, w = img.shape[1:3]
        return anchor_head_bboxes(
            [c[0] for c in cls_scores],
            [b[0] for b in bbox_preds],
            self._anchors(feats),
            (h, w),
            num_classes=self.head_m.num_classes,
            nms_pre=tcfg.get("nms_pre", 1000),
            score_thr=tcfg.get("score_thr", 0.05),
            nms_thr=tcfg.get("nms_thr", 0.5),
            max_per_img=tcfg.get("max_per_img", 100),
            nms_cfg=tcfg.get("nms"),
        )


@DETECTORS.register
class RepPointsDetector(nn.Module):
    """ResNet-FPN + RepPointsHead (detectors/reppoints_detector.py:8):
    single-stage point-set detector; loss/predict ride the pure reppoints
    target/decode functions."""

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    bbox_head: Dict[str, Any]
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        from vps_tpu.models.reppoints import RepPointsHead

        self.backbone_m = _build(self.backbone, BACKBONES)
        self.neck_m = _build(self.neck, NECKS)
        head = dict(self.bbox_head)
        head.pop("type", None)
        self.head_m = RepPointsHead(**head)

    def __call__(self, img):
        return self.head_m(self.neck_m(self.backbone_m(img)))

    def loss(self, img, gt_bboxes, gt_labels, gt_valid):
        from vps_tpu.models.reppoints import reppoints_loss

        cls_scores, p_init, p_ref = self(img)
        return reppoints_loss(
            self.head_m, self.head_m.variables, cls_scores, p_init, p_ref,
            gt_bboxes, gt_labels, gt_valid, self.train_cfg or {},
        )

    def predict(self, img):
        from vps_tpu.models.reppoints import reppoints_bboxes

        cls_scores, _, p_ref = self(img)
        tcfg = self.test_cfg or {}
        h, w = img.shape[1:3]
        return reppoints_bboxes(
            self.head_m, self.head_m.variables, cls_scores, p_ref, (h, w),
            nms_pre=tcfg.get("nms_pre", 1000),
            score_thr=tcfg.get("score_thr", 0.05),
            nms_thr=tcfg.get("nms_thr", 0.5),
            max_per_img=tcfg.get("max_per_img", 100),
            nms_cfg=tcfg.get("nms"),
        )


@DETECTORS.register
class FCOS(nn.Module):
    """ResNet-FPN + FCOSHead (detectors/fcos.py)."""

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    bbox_head: Dict[str, Any]
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None

    def setup(self):
        self.backbone_m = _build(self.backbone, BACKBONES)
        self.neck_m = _build(self.neck, NECKS)
        head = dict(self.bbox_head)
        head.pop("type", None)
        self.head_m = FCOSHead(**head)
        self.strides = (8, 16, 32, 64, 128)

    def __call__(self, img):
        return self.head_m(self.neck_m(self.backbone_m(img)))

    def loss(self, img, gt_bboxes, gt_labels, gt_valid):
        """FCOS training losses (reference fcos_head.py:116-187): focal cls,
        centerness-weighted IoU box loss, BCE centerness."""
        from vps_tpu.models.anchor_heads import fcos_loss

        cls_scores, bbox_preds, centernesses = self(img)
        return fcos_loss(
            [c[0] for c in cls_scores],
            [b[0] for b in bbox_preds],
            [c[0] for c in centernesses],
            self.strides,
            gt_bboxes,
            gt_labels,
            gt_valid,
            num_classes=self.head_m.num_classes,
        )

    def predict(self, img):
        cls_scores, bbox_preds, centernesses = self(img)
        tcfg = self.test_cfg or {}
        h, w = img.shape[1:3]
        return fcos_bboxes(
            [c[0] for c in cls_scores],
            [b[0] for b in bbox_preds],
            [c[0] for c in centernesses],
            self.strides,
            (h, w),
            num_classes=self.head_m.num_classes,
            nms_pre=tcfg.get("nms_pre", 1000),
            score_thr=tcfg.get("score_thr", 0.05),
            nms_thr=tcfg.get("nms_thr", 0.5),
            max_per_img=tcfg.get("max_per_img", 100),
            nms_cfg=tcfg.get("nms"),
        )


@DETECTORS.register
class SSD(nn.Module):
    """SSD detector (the reference expresses it as SingleStageDetector +
    SSDVGG + SSDHead, configs/ssd300_coco.py): neck-less multi-scale VGG
    features, per-level cls/reg convs, MultiBox loss with hard-negative
    mining (anchor_heads/ssd_head.py:112-134)."""

    backbone: Dict[str, Any]
    bbox_head: Dict[str, Any]
    neck: Optional[Dict[str, Any]] = None  # SSD has none; kept for parity
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None
    pretrained: Optional[str] = None

    def setup(self):
        from vps_tpu.models.anchor_heads import (
            SSDHead,
            ssd_anchor_generators,
        )

        self.backbone_m = _build(self.backbone, BACKBONES)
        self.neck_m = _build(self.neck, NECKS) if self.neck else None
        h = dict(self.bbox_head)
        h.pop("type", None)
        self.input_size = h.pop("input_size", 300)
        self.anchor_strides = list(
            h.pop("anchor_strides", (8, 16, 32, 64, 100, 300)))
        self.anchor_ratios = [
            list(r) for r in h.pop(
                "anchor_ratios", ([2], [2, 3], [2, 3], [2, 3], [2], [2]))
        ]
        self.basesize_ratio_range = tuple(
            h.pop("basesize_ratio_range", (0.15, 0.9)))
        self.target_means = tuple(h.pop("target_means", (0.0,) * 4))
        self.target_stds = tuple(h.pop("target_stds", (0.1, 0.1, 0.2, 0.2)))
        h.pop("in_channels", None)
        h.setdefault("anchors_per_level",
                     tuple(len(r) * 2 + 2 for r in self.anchor_ratios))
        self.head_m = SSDHead(**h)
        self.anchor_gens = ssd_anchor_generators(
            self.input_size,
            num_levels=len(self.anchor_strides),
            strides=self.anchor_strides,
            anchor_ratios=self.anchor_ratios,
            basesize_ratio_range=self.basesize_ratio_range,
        )

    def extract_feat(self, img):
        x = self.backbone_m(img)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def _anchors(self, cls_scores):
        return [
            g.grid_anchors(c.shape[1:3], s)
            for g, c, s in zip(self.anchor_gens, cls_scores,
                               self.anchor_strides)
        ]

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def loss(self, img, gt_bboxes, gt_labels, gt_valid):
        from vps_tpu.models.anchor_heads import ssd_loss

        cls_scores, bbox_preds = self(img)
        tc = self.train_cfg or {}
        assigner = tc.get("assigner", {})
        return ssd_loss(
            [c[0] for c in cls_scores],
            [b[0] for b in bbox_preds],
            self._anchors(cls_scores),
            gt_bboxes,
            gt_labels,
            gt_valid,
            num_classes=self.head_m.num_classes,
            neg_pos_ratio=tc.get("neg_pos_ratio", 3),
            smoothl1_beta=tc.get("smoothl1_beta", 1.0),
            pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.5),
            target_means=self.target_means,
            target_stds=self.target_stds,
        )

    def predict(self, img):
        cls_scores, bbox_preds = self(img)
        tcfg = self.test_cfg or {}
        h, w = img.shape[1:3]
        return anchor_head_bboxes(
            [c[0] for c in cls_scores],
            [b[0] for b in bbox_preds],
            self._anchors(cls_scores),
            (h, w),
            num_classes=self.head_m.num_classes,
            use_sigmoid=False,
            nms_pre=tcfg.get("nms_pre", 1000),
            score_thr=tcfg.get("score_thr", 0.02),
            nms_thr=tcfg.get("nms_thr", 0.45),
            max_per_img=tcfg.get("max_per_img", 200),
            target_means=self.target_means,
            target_stds=self.target_stds,
            nms_cfg=tcfg.get("nms"),
        )


@DETECTORS.register(name="SingleStageDetector")
def single_stage_detector(**cfg):
    """Generic type= dispatch (reference detectors/single_stage.py:12 builds
    any bbox_head from the registry; here the head type picks the concrete
    detector class)."""
    head_type = (cfg.get("bbox_head") or {}).get("type", "RetinaHead")
    cls = {
        "RetinaHead": RetinaNet,
        "SSDHead": SSD,
        "FCOSHead": FCOS,
        "RepPointsHead": RepPointsDetector,
    }[head_type]
    return cls(**cfg)
