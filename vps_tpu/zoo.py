"""Model-config presets: the flagship VPSNet-FuseTrack R-50 (mirroring
/root/reference/configs/cityscapes/fusetrack.py) and a tiny variant for
tests / dry runs."""

from __future__ import annotations

import copy
from typing import Any, Dict


def fusetrack_model_cfg(depth: int = 50) -> Dict[str, Any]:
    return dict(
        type="PanopticFuseTrack",
        backbone=dict(type="ResNet", depth=depth, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      style="pytorch", compute_dtype="bfloat16"),
        neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                  out_channels=256, num_outs=5),
        extra_neck=dict(type="BFPTcea", in_channels=256, num_levels=5,
                        refine_level=0, refine_type="conv", center=0, nframes=2),
        panoptic=dict(type="UPSNetFPN", in_channels=256, out_channels=128,
                      num_levels=4, num_things_classes=8, num_classes=19,
                      ignore_label=255, loss_weight=1.0),
        rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                      anchor_scales=[8], anchor_ratios=[0.5, 1.0, 2.0],
                      anchor_strides=[4, 8, 16, 32, 64],
                      target_means=[0.0] * 4, target_stds=[1.0] * 4),
        bbox_roi_extractor=dict(type="SingleRoIExtractor",
                                roi_layer=dict(type="RoIAlign", out_size=7,
                                               sample_num=2),
                                out_channels=256, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(type="SharedFCBBoxHead", num_fcs=2, in_channels=256,
                       fc_out_channels=1024, roi_feat_size=7, num_classes=9,
                       target_means=[0.0] * 4,
                       target_stds=[0.1, 0.1, 0.2, 0.2],
                       reg_class_agnostic=False),
        track_head=dict(type="TrackHead", num_fcs=2, in_channels=256,
                        fc_out_channels=1024, roi_feat_size=7,
                        match_coeff=[1.0, 2.0, 10.0],
                        loss_match=dict(type="CrossEntropyLoss",
                                        use_sigmoid=False, loss_weight=0.5)),
        mask_roi_extractor=dict(type="SingleRoIExtractor",
                                roi_layer=dict(type="RoIAlign", out_size=14,
                                               sample_num=2),
                                out_channels=256, featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(type="FCNMaskHead", num_convs=4, in_channels=256,
                       conv_out_channels=256, num_classes=9,
                       loss_mask=dict(type="CrossEntropyLoss", use_mask=True,
                                      loss_weight=1.0)),
    )


def fusetrack_train_cfg() -> Dict[str, Any]:
    return dict(
        rpn=dict(
            assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3, ignore_iof_thr=-1),
            sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5,
                         neg_pos_ub=-1, add_gt_as_proposals=False),
            allowed_border=0, pos_weight=-1,
        ),
        rpn_proposal=dict(nms_across_levels=False, nms_pre=2000, nms_post=2000,
                          max_num=2000, nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(
            assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.5, ignore_iof_thr=-1),
            sampler=dict(type="RandomSampler", num=512, pos_fraction=0.25,
                         neg_pos_ub=-1, add_gt_as_proposals=True),
            mask_size=28, pos_weight=-1,
        ),
        loss_pano_weight=0.5,
        # NOTE: the reference's class_mapping {thing i -> panoptic 10+i}
        # (tools/config yaml) is hard-coded arithmetic in the detector;
        # int-keyed dicts must NOT ride in flax module attributes (they
        # break module cloning via flax's flatten_dict path join).
    )


def fusetrack_test_cfg() -> Dict[str, Any]:
    return dict(
        rpn=dict(nms_across_levels=False, nms_pre=1000, nms_post=1000,
                 max_num=1000, nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(score_thr=0.05, nms=dict(type="nms", iou_thr=0.5),
                  max_per_img=100, mask_thr_binary=0.5),
        # single config system: the reference's parallel UPSNet yaml knobs
        # (test_cityscapes_1gpu.yaml) live here
        panoptic=dict(score_thresh=0.6, nms_thresh=0.5, max_det=100,
                      bbox_reg_weights=(10.0, 10.0, 5.0, 5.0),
                      stuff_area_limit=2048),
        loss_pano_weight=None,
    )


def exact_overrides(cfg):
    """Reference-exact preset: FlowNet2 on FULL-RES frames
    (panoptic_fusetrack.py:117-143 computes flow at input resolution) and f32
    compute everywhere (the reference runs f32 end to end). The shipped
    default ('half-flow') keeps half-res flow input + bf16 conv stacks —
    documented approximations (PERF.md) that this preset removes."""
    cfg = copy.deepcopy(cfg)
    cfg["flow_input_scale"] = 1.0
    cfg["backbone"]["compute_dtype"] = "float32"
    if cfg.get("bbox_roi_extractor"):
        cfg["bbox_roi_extractor"]["compute_dtype"] = "float32"
    if cfg.get("extra_neck"):
        cfg["extra_neck"]["compute_dtype"] = "float32"
    if cfg.get("panoptic"):
        cfg["panoptic"]["compute_dtype"] = "float32"
    cfg["flow"] = dict(cfg.get("flow") or {}, compute_dtype="float32")
    return cfg


def f32_compute_overrides(cfg):
    """Force f32 activation compute in every compute_dtype-knobbed tower,
    leaving all other knobs (flow resolution, sampling modes) untouched.

    This is the TRAINING default (tools/train.py): on the current XLA:TPU
    stack the bf16 mixed-dtype backward mis-fuses — ~half of all train steps
    produced inf/NaN trunk gradients that the same data computed finite in a
    standalone grad graph (PERF.md "TPU train-step NaN investigation";
    measured 0/120 bad steps after this override, converging). Params were
    always f32, so checkpoints are fully compatible with the bf16 inference
    presets. Opt back into bf16 train compute with tools/train.py
    --bf16-compute for A/B work."""
    cfg = copy.deepcopy(cfg)
    for key in ("backbone", "bbox_roi_extractor", "mask_roi_extractor",
                "extra_neck", "panoptic"):
        if cfg.get(key):
            cfg[key] = dict(cfg[key], compute_dtype="float32")
    cfg["flow"] = dict(cfg.get("flow") or {}, compute_dtype="float32")
    return cfg


def fast_overrides(cfg):
    """Documented speed/accuracy-tradeoff preset (see PERF.md: the exact
    pipeline is gather-index-bound on TPU). Approximations vs reference:
    nearest-neighbour DCN sampling in the semantic head (1 gather/tap
    instead of 4) and 1x1 in-bin RoIAlign sampling (sample_num=1)."""
    cfg = copy.deepcopy(cfg)
    cfg["panoptic"]["dcn_sampling"] = "nearest"
    cfg["bbox_roi_extractor"]["roi_layer"]["sample_num"] = 1
    if cfg.get("mask_roi_extractor"):
        cfg["mask_roi_extractor"]["roi_layer"]["sample_num"] = 1
    # quarter-res FlowNet2 input: the neck consumes flow at 1/4 scale and
    # LiteFlowNetCorr refines residual flow, so coarse initial flow costs
    # little accuracy while cutting the 162M-param cascade 4x further
    cfg["flow_input_scale"] = 0.25
    # nearest feature warping in the fuse neck (2 warps, 4 gathers -> 1 each)
    cfg["extra_neck"]["warp_sampling"] = "nearest"
    return cfg


PRESETS = ("exact", "half-flow", "lowres-sem", "fast", "fast-lowres")


def lowres_sem_overrides(cfg):
    """lowres-sem preset: the UPSNet semantic tower runs from stride 8
    instead of 4 (level 0 avg-pooled 2x; fcn_score bilinearly restored to
    the stride-4 contract). Targets the single largest frame cost — the
    ~18M-index stride-4 DCN gather stream (PERF.md UPSNetFPN section) —
    param-free, so reference-trained weights still load. Accuracy cost is
    measured on the synthetic fixture by tools/preset_accuracy.py."""
    cfg = copy.deepcopy(cfg)
    cfg["panoptic"]["head_stride"] = 8
    return cfg


def preset_overrides(cfg: Dict[str, Any], preset: str) -> Dict[str, Any]:
    """Apply a named inference preset (bench.py / tools docs): 'exact' =
    reference-exact semantics, 'half-flow' = the shipped default (identity),
    'lowres-sem' = default + stride-8 semantic tower, 'fast' = documented
    approximations, 'fast-lowres' = fast + stride-8 semantic tower."""
    if preset == "exact":
        return exact_overrides(cfg)
    if preset in ("half-flow", "default"):
        return copy.deepcopy(cfg)
    if preset == "lowres-sem":
        return lowres_sem_overrides(cfg)
    if preset == "fast":
        return fast_overrides(cfg)
    if preset == "fast-lowres":
        return lowres_sem_overrides(fast_overrides(cfg))
    raise ValueError(f"unknown preset {preset!r}; known: {PRESETS}")


def tiny_overrides(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Shrink a model cfg for tests/dry-runs: ResNet-18 trunk."""
    cfg = copy.deepcopy(cfg)
    cfg["backbone"]["depth"] = 18
    cfg["neck"]["in_channels"] = [64, 128, 256, 512]
    cfg["flow"] = dict(type="TinyFlow")
    return cfg


def tiny_train_cfg() -> Dict[str, Any]:
    cfg = fusetrack_train_cfg()
    cfg["rpn"]["sampler"]["num"] = 64
    cfg["rpn_proposal"].update(nms_pre=200, nms_post=200, max_num=128)
    cfg["rcnn"]["sampler"]["num"] = 64
    return cfg


def tiny_test_cfg() -> Dict[str, Any]:
    cfg = fusetrack_test_cfg()
    cfg["rpn"].update(nms_pre=128, nms_post=128, max_num=128)
    cfg["panoptic"]["max_det"] = 16
    return cfg
