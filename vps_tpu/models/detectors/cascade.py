"""Cascade R-CNN and Hybrid Task Cascade, rebuilt TPU-first.

Reference: /root/reference/mmdet/models/detectors/cascade_rcnn.py:15 and
htc.py:13 (+ mask_heads/fused_semantic_head.py:12, htc_mask_head.py:8).
The stage math follows the reference — per-stage assigners/samplers with
rising IoU thresholds, refine-by-target-label between train stages,
refine-by-predicted-label between test stages, mean-of-stage class scores,
mean-of-stage mask probabilities, HTC's semantic fusion / interleaved
resampling / mask info flow. Orchestration is static-shape: every stage's
ROI set has the sampler's fixed capacity with validity masks, and the
"filter gt bboxes" step of refine_bboxes (bbox_head.py:refine_bboxes)
becomes a validity-mask clear on gt-origin rows.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import DETECTORS, HEADS, build_from_cfg
from vps_tpu.models.bbox_head import get_det_bboxes, regress_by_class
from vps_tpu.models.mask_head import select_mask_channel
from vps_tpu.models.detectors.two_stage import FasterRCNN, _build
from vps_tpu.ops import multilevel_roi_align
from vps_tpu.ops.losses import (
    accuracy,
    binary_cross_entropy_with_logits,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from vps_tpu.core.targets import proposal_target


def _per_stage(cfg, num_stages):
    if cfg is None:
        return [None] * num_stages
    if isinstance(cfg, (list, tuple)):
        assert len(cfg) == num_stages
        return list(cfg)
    return [cfg] * num_stages


@DETECTORS.register
class CascadeRCNN(FasterRCNN):
    """Multi-stage refinement detector (cascade_rcnn.py:15). bbox_head /
    bbox_roi_extractor / mask_head / mask_roi_extractor accept one config
    (shared across stages, separate parameters) or a per-stage list;
    train_cfg.rcnn likewise."""

    num_stages: int = 3

    def _setup_extra(self):
        heads = _per_stage(self.bbox_head, self.num_stages)
        self.bbox_heads = [
            _build(h, HEADS, "SharedFCBBoxHead") for h in heads
        ]
        self.bbox_roi_cfgs = [
            dict(c or {})
            for c in _per_stage(self.bbox_roi_extractor, self.num_stages)
        ]
        if self.mask_head is not None:
            self.mask_heads = [
                _build(h, HEADS, "FCNMaskHead")
                for h in _per_stage(self.mask_head, self.num_stages)
            ]
            self.mask_roi_cfgs = [
                dict(c) if c else self.bbox_roi_cfgs[i]
                for i, c in enumerate(
                    _per_stage(self.mask_roi_extractor, self.num_stages))
            ]
        else:
            self.mask_heads = None

    # -- stage helpers -----------------------------------------------------

    def _stage_roi_feats(self, x, rois, cfg, default_size, valid):
        strides = cfg.get("featmap_strides", [4, 8, 16, 32])
        layer = cfg.get("roi_layer", {})
        out = multilevel_roi_align(
            [f[0] for f in x[: len(strides)]],
            rois,
            strides,
            layer.get("out_size", default_size),
            layer.get("sample_num", 2),
            valid=valid,
            sampling=layer.get("sampling", "bilinear"),
        )
        if self.shared_head_m is not None:
            out = self.shared_head_m(out)
        return out

    def _stage_bbox_forward(self, i, x, rois, valid, semantic_feat=None):
        feats = self._stage_roi_feats(
            x, rois, self.bbox_roi_cfgs[i], 7, valid)
        feats = self._fuse_semantic(feats, rois, semantic_feat, "bbox")
        return self.bbox_heads[i](feats)

    def _fuse_semantic(self, feats, rois, semantic_feat, branch):
        """HTC hook — no-op for plain cascade."""
        return feats

    def _rcnn_cfgs(self):
        return _per_stage(self.train_cfg["rcnn"], self.num_stages)

    def _stage_weights(self):
        return list(self.train_cfg.get(
            "stage_loss_weights", [1.0, 0.5, 0.25][: self.num_stages]))

    def _stage_bbox_losses(self, i, losses, lw, st, cls_score, bbox_pred):
        head = self.bbox_heads[i]
        avg = jnp.maximum(jnp.sum(st.label_weights), 1.0)
        losses[f"s{i}.loss_cls"] = lw * softmax_cross_entropy(
            cls_score, st.labels, weight=st.label_weights, avg_factor=avg)
        losses[f"s{i}.acc"] = accuracy(cls_score, st.labels, valid=st.valid)
        num = st.rois.shape[0]
        if head.reg_class_agnostic:
            pred_by_label = bbox_pred
        else:
            pred_by_label = jnp.take_along_axis(
                bbox_pred.reshape(num, head.num_classes, 4),
                st.labels[:, None, None].repeat(4, -1), axis=1,
            )[:, 0, :]
        losses[f"s{i}.loss_bbox"] = lw * smooth_l1_loss(
            pred_by_label, st.bbox_targets, beta=1.0,
            weight=st.bbox_weights, avg_factor=float(num),
        )

    def _stage_mask_loss(self, i, x, st, rc, semantic_feat=None):
        n_pos_max = st.mask_targets.shape[0]
        pos_rois = st.rois[:n_pos_max]
        pos_mask = st.pos_mask[:n_pos_max]
        mask_feats = self._stage_roi_feats(
            x, pos_rois, self.mask_roi_cfgs[i], 14, pos_mask)
        mask_feats = self._fuse_semantic(
            mask_feats, pos_rois, semantic_feat, "mask")
        mask_pred = self._stage_mask_forward_train(i, mask_feats)
        pos_labels = st.labels[:n_pos_max]
        pred_slice = select_mask_channel(mask_pred, pos_labels)
        num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
        msz = st.mask_targets.shape[-1]
        return binary_cross_entropy_with_logits(
            pred_slice,
            st.mask_targets,
            weight=pos_mask[:, None, None].astype(jnp.float32),
            avg_factor=num_pos * float(msz * msz),
        )

    def _stage_mask_forward_train(self, i, mask_feats):
        return self.mask_heads[i](mask_feats)

    def _refine(self, i, st, bbox_pred, img_shape):
        """refine_bboxes between stages (cascade_rcnn.py:262-268): decode
        the sampled rois with their TARGET-label deltas (roi_labels =
        bbox_targets[0]), drop gt-origin rows via the validity mask."""
        head = self.bbox_heads[i]
        refined = regress_by_class(
            st.rois, st.labels, jax.lax.stop_gradient(bbox_pred), img_shape,
            head.target_means, head.target_stds, head.reg_class_agnostic)
        valid = st.valid & ~st.from_gt
        return jnp.where(valid[:, None], refined, 0.0), valid

    # -- training ----------------------------------------------------------

    def loss(self, img, gt_bboxes, gt_labels, gt_valid, gt_masks=None,
             proposals=None, proposal_valid=None):
        losses = {}
        h, w = img.shape[1:3]
        x = self.extract_feat(img)
        if self.rpn_head_m is not None:
            proposals, proposal_valid = self._rpn_losses_and_proposals(
                x, (h, w), gt_bboxes, gt_valid, losses)

        rcnn_cfgs = self._rcnn_cfgs()
        lws = self._stage_weights()
        for i in range(self.num_stages):
            rc = rcnn_cfgs[i]
            head = self.bbox_heads[i]
            st = proposal_target(
                self.make_rng("sampler"),
                proposals,
                proposal_valid,
                gt_bboxes,
                gt_labels,
                gt_valid,
                rc,
                gt_masks=gt_masks if self.mask_heads is not None else None,
                target_means=head.target_means,
                target_stds=head.target_stds,
            )
            cls_score, bbox_pred = self._stage_bbox_forward(
                i, x, st.rois, st.valid)
            self._stage_bbox_losses(i, losses, lws[i], st, cls_score,
                                    bbox_pred)
            if self.mask_heads is not None:
                losses[f"s{i}.loss_mask"] = lws[i] * self._stage_mask_loss(
                    i, x, st, rc)
            if i < self.num_stages - 1:
                proposals, proposal_valid = self._refine(
                    i, st, bbox_pred, (h, w))
        return losses

    # -- inference ----------------------------------------------------------

    def predict(self, img, proposals=None, proposal_valid=None):
        tcfg = self.test_cfg or {}
        h, w = img.shape[1:3]
        x = self.extract_feat(img)
        if self.rpn_head_m is not None:
            proposals, _, proposal_valid = self._test_proposals(x, (h, w))
        semantic_feat = self._semantic_feat(x)

        rois, valid = proposals, proposal_valid
        ms_scores = []
        for i in range(self.num_stages):
            cls_score, bbox_pred = self._stage_bbox_forward(
                i, x, rois, valid, semantic_feat)
            ms_scores.append(cls_score)
            if i < self.num_stages - 1:
                head = self.bbox_heads[i]
                labels = jnp.argmax(cls_score, axis=-1)
                rois = regress_by_class(
                    rois, labels, bbox_pred, (h, w),
                    head.target_means, head.target_stds,
                    head.reg_class_agnostic)
                rois = jnp.where(valid[:, None], rois, 0.0)

        cls_score = sum(ms_scores) / float(self.num_stages)
        last = self.bbox_heads[-1]
        rcnn = tcfg.get("rcnn", {})
        dets, labels, det_valid = get_det_bboxes(
            rois,
            cls_score,
            bbox_pred,
            (h, w),
            score_thr=rcnn.get("score_thr", 0.05),
            nms_iou_thr=rcnn.get("nms", {}).get("iou_thr", 0.5),
            max_per_img=rcnn.get("max_per_img", 100),
            target_means=last.target_means,
            target_stds=last.target_stds,
            valid=valid.astype(jnp.float32),
            nms_cfg=rcnn.get("nms"),
        )
        out = {"det_bboxes": dets, "det_labels": labels,
               "det_valid": det_valid}
        if self.mask_heads is not None:
            out["mask_logits"] = self._predict_masks(
                x, dets, labels, det_valid, semantic_feat)
        return out

    def _semantic_feat(self, x):
        return None

    def _predict_masks(self, x, dets, labels, det_valid, semantic_feat):
        """Mean of per-stage sigmoid masks on the final boxes
        (cascade_rcnn.py:368-383 merge_aug_masks mean), returned as logits
        of the mean probability."""
        prob_sum = None
        for i in range(self.num_stages):
            mask_feats = self._stage_roi_feats(
                x, dets[:, :4], self.mask_roi_cfgs[i], 14, det_valid)
            mask_feats = self._fuse_semantic(
                mask_feats, dets[:, :4], semantic_feat, "mask")
            mask_pred = self._stage_mask_forward_train(i, mask_feats)
            prob = jax.nn.sigmoid(select_mask_channel(mask_pred, labels + 1))
            prob_sum = prob if prob_sum is None else prob_sum + prob
        mean = jnp.clip(prob_sum / self.num_stages, 1e-6, 1.0 - 1e-6)
        return jnp.log(mean) - jnp.log1p(-mean)


@DETECTORS.register
class HybridTaskCascade(CascadeRCNN):
    """HTC (htc.py:13): cascade + fused semantic branch (features summed
    into bbox/mask ROI windows), interleaved mask resampling on refined
    boxes, and mask information flow across stage mask heads."""

    semantic_roi_extractor: Optional[Dict[str, Any]] = None
    semantic_head: Optional[Dict[str, Any]] = None
    semantic_fusion: Sequence[str] = ("bbox", "mask")
    interleaved: bool = True
    mask_info_flow: bool = True

    def _setup_extra(self):
        super()._setup_extra()
        self.semantic_head_m = (
            _build(self.semantic_head, HEADS, "FusedSemanticHead")
            if self.semantic_head else None
        )
        self.semantic_roi_cfg = dict(self.semantic_roi_extractor or {})

    def _semantic_feat(self, x):
        if self.semantic_head_m is None:
            return None
        _, feat = self.semantic_head_m(list(x[: self.semantic_head_m.num_ins]))
        return feat

    def _fuse_semantic(self, feats, rois, semantic_feat, branch):
        """Element-wise sum of pooled semantic features (htc.py:56-64).
        The semantic extractor pools from the single fused semantic map;
        a size mismatch (14-pooled window into the 7×7 bbox branch) is
        adaptive-avg-pooled like F.adaptive_avg_pool2d."""
        if semantic_feat is None or branch not in self.semantic_fusion:
            return feats
        strides = self.semantic_roi_cfg.get("featmap_strides", [8])
        layer = self.semantic_roi_cfg.get("roi_layer", {})
        sem = multilevel_roi_align(
            [semantic_feat[0]],
            rois,
            strides[:1],
            layer.get("out_size", 14),
            layer.get("sample_num", 2),
        )
        if sem.shape[1] != feats.shape[1]:
            from vps_tpu.models.layers import avg_pool

            factor = sem.shape[1] // feats.shape[1]
            if factor * feats.shape[1] == sem.shape[1]:
                sem = avg_pool(sem, factor, factor, 0)
            else:
                from vps_tpu.models.layers import resize_bilinear

                sem = resize_bilinear(sem, feats.shape[1:3])
        return feats + sem

    def _stage_bbox_forward(self, i, x, rois, valid, semantic_feat=None):
        feats = self._stage_roi_feats(
            x, rois, self.bbox_roi_cfgs[i], 7, valid)
        feats = self._fuse_semantic(feats, rois, semantic_feat, "bbox")
        return self.bbox_heads[i](feats)

    def _htc_mask_pred(self, i, mask_feats, train: bool):
        """Mask info flow (htc.py:96-106): chain res-features through the
        previous stages' mask heads."""
        if not self.mask_info_flow:
            return self.mask_heads[i](mask_feats, return_feat=False)
        last_feat = None
        for j in range(i):
            last_feat = self.mask_heads[j](
                mask_feats, last_feat, return_logits=False)
        return self.mask_heads[i](mask_feats, last_feat, return_feat=False)

    def _stage_mask_loss_htc(self, i, x, st, semantic_feat):
        n_pos_max = st.mask_targets.shape[0]
        pos_rois = st.rois[:n_pos_max]
        pos_mask = st.pos_mask[:n_pos_max]
        mask_feats = self._stage_roi_feats(
            x, pos_rois, self.mask_roi_cfgs[i], 14, pos_mask)
        mask_feats = self._fuse_semantic(
            mask_feats, pos_rois, semantic_feat, "mask")
        mask_pred = self._htc_mask_pred(i, mask_feats, train=True)
        pred_slice = select_mask_channel(mask_pred, st.labels[:n_pos_max])
        num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
        msz = st.mask_targets.shape[-1]
        return binary_cross_entropy_with_logits(
            pred_slice,
            st.mask_targets,
            weight=pos_mask[:, None, None].astype(jnp.float32),
            avg_factor=num_pos * float(msz * msz),
        )

    def loss(self, img, gt_bboxes, gt_labels, gt_valid, gt_masks=None,
             gt_semantic_seg=None, proposals=None, proposal_valid=None):
        """HTC forward_train (htc.py:197-308). gt_semantic_seg: (1, h, w)
        int labels at the semantic head's fused resolution (the reference
        pipeline's SegRescale output)."""
        losses = {}
        h, w = img.shape[1:3]
        x = self.extract_feat(img)
        if self.rpn_head_m is not None:
            proposals, proposal_valid = self._rpn_losses_and_proposals(
                x, (h, w), gt_bboxes, gt_valid, losses)

        semantic_feat = None
        if self.semantic_head_m is not None:
            semantic_pred, semantic_feat = self.semantic_head_m(
                list(x[: self.semantic_head_m.num_ins]))
            if gt_semantic_seg is not None:
                losses["loss_semantic_seg"] = self.semantic_head_m.loss(
                    semantic_pred, gt_semantic_seg)

        rcnn_cfgs = self._rcnn_cfgs()
        lws = self._stage_weights()
        for i in range(self.num_stages):
            rc = rcnn_cfgs[i]
            head = self.bbox_heads[i]
            st = proposal_target(
                self.make_rng("sampler"),
                proposals,
                proposal_valid,
                gt_bboxes,
                gt_labels,
                gt_valid,
                rc,
                gt_masks=gt_masks if self.mask_heads is not None else None,
                target_means=head.target_means,
                target_stds=head.target_stds,
            )
            cls_score, bbox_pred = self._stage_bbox_forward(
                i, x, st.rois, st.valid, semantic_feat)
            self._stage_bbox_losses(i, losses, lws[i], st, cls_score,
                                    bbox_pred)

            if self.mask_heads is not None:
                mask_st = st
                if self.interleaved:
                    # refine + re-sample BEFORE the mask branch
                    # (htc.py:274-293)
                    proposals, proposal_valid = self._refine(
                        i, st, bbox_pred, (h, w))
                    mask_st = proposal_target(
                        self.make_rng("sampler"),
                        proposals,
                        proposal_valid,
                        gt_bboxes,
                        gt_labels,
                        gt_valid,
                        rc,
                        gt_masks=gt_masks,
                        target_means=head.target_means,
                        target_stds=head.target_stds,
                    )
                losses[f"s{i}.loss_mask"] = lws[i] * \
                    self._stage_mask_loss_htc(i, x, mask_st, semantic_feat)

            if i < self.num_stages - 1 and not self.interleaved:
                proposals, proposal_valid = self._refine(
                    i, st, bbox_pred, (h, w))
        return losses

    def _predict_masks(self, x, dets, labels, det_valid, semantic_feat):
        """htc.py simple_test mask tail: ONE pooled window from the last
        stage's extractor, per-stage predictions chained through the info
        flow, mean of sigmoids."""
        mask_feats = self._stage_roi_feats(
            x, dets[:, :4], self.mask_roi_cfgs[-1], 14, det_valid)
        mask_feats = self._fuse_semantic(
            mask_feats, dets[:, :4], semantic_feat, "mask")
        prob_sum = None
        last_feat = None
        for i in range(self.num_stages):
            if self.mask_info_flow:
                mask_pred, last_feat = self.mask_heads[i](
                    mask_feats, last_feat)
            else:
                mask_pred = self.mask_heads[i](mask_feats, return_feat=False)
            prob = jax.nn.sigmoid(select_mask_channel(mask_pred, labels + 1))
            prob_sum = prob if prob_sum is None else prob_sum + prob
        mean = jnp.clip(prob_sum / self.num_stages, 1e-6, 1.0 - 1e-6)
        return jnp.log(mean) - jnp.log1p(-mean)


@DETECTORS.register(name="HTC")
class _HTCAlias(HybridTaskCascade):
    """Config alias: the reference registers the class as
    HybridTaskCascade but configs commonly say type='HTC'."""
