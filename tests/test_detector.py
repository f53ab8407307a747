import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vps_tpu.models.detectors import (
    PanopticFuseTrack,
    empty_track_state,
)

H, W = 128, 256
MAX_GT = 8

MODEL_CFG = dict(
    backbone=dict(type="ResNet", depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style="pytorch"),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5),
    extra_neck=dict(type="BFPTcea", in_channels=256, num_levels=5, refine_level=0,
                    refine_type="conv", center=0, nframes=2),
    panoptic=dict(type="UPSNetFPN", in_channels=256, out_channels=128, num_levels=4,
                  num_things_classes=8, num_classes=19, ignore_label=255,
                  loss_weight=1.0),
    rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256,
                  anchor_scales=[8], anchor_ratios=[0.5, 1.0, 2.0],
                  anchor_strides=[4, 8, 16, 32, 64]),
    bbox_roi_extractor=dict(roi_layer=dict(out_size=7, sample_num=2),
                            featmap_strides=[4, 8, 16, 32]),
    bbox_head=dict(type="SharedFCBBoxHead", num_fcs=2, in_channels=256,
                   fc_out_channels=1024, roi_feat_size=7, num_classes=9),
    track_head=dict(type="TrackHead", num_fcs=2, in_channels=256,
                    fc_out_channels=1024, roi_feat_size=7,
                    match_coeff=[1.0, 2.0, 10.0],
                    loss_match=dict(loss_weight=0.5)),
    mask_head=dict(type="FCNMaskHead", num_convs=4, in_channels=256,
                   conv_out_channels=256, num_classes=9),
)

TRAIN_CFG = dict(
    rpn=dict(
        assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3),
        sampler=dict(num=64, pos_fraction=0.5),
        allowed_border=0,
    ),
    rpn_proposal=dict(nms_pre=200, nms_thr=0.7, max_num=100),
    rcnn=dict(
        assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5),
        sampler=dict(num=64, pos_fraction=0.25),
        mask_size=28,
    ),
    loss_pano_weight=0.5,
)

TEST_CFG = dict(
    rpn=dict(nms_pre=100, nms_thr=0.7, max_num=50),
    panoptic=dict(score_thresh=0.6, nms_thresh=0.5, max_det=16,
                  bbox_reg_weights=(10.0, 10.0, 5.0, 5.0)),
)


def _detector():
    return PanopticFuseTrack(
        train_cfg=TRAIN_CFG, test_cfg=TEST_CFG, **MODEL_CFG
    )


def _train_batch():
    rng = np.random.RandomState(0)
    img = rng.randn(1, H, W, 3).astype(np.float32)
    ref_img = rng.randn(1, H, W, 3).astype(np.float32)
    gt_bboxes = np.zeros((MAX_GT, 4), np.float32)
    gt_bboxes[0] = [10, 10, 60, 60]
    gt_bboxes[1] = [100, 40, 180, 100]
    gt_labels = np.zeros((MAX_GT,), np.int32)
    gt_labels[:2] = [1, 3]
    gt_valid = np.zeros((MAX_GT,), bool)
    gt_valid[:2] = True
    gt_masks = np.zeros((MAX_GT, H, W), np.float32)
    gt_masks[0, 10:61, 10:61] = 1
    gt_masks[1, 40:101, 100:181] = 1
    sseg = rng.randint(0, 19, (1, H, W)).astype(np.int32)
    sseg_nx = rng.randint(0, 19, (1, H // 4, W // 4)).astype(np.int32)
    gt_pids = np.zeros((MAX_GT,), np.int32)
    gt_pids[:2] = [1, 0]
    ref_bboxes = np.zeros((MAX_GT, 4), np.float32)
    ref_bboxes[0] = [12, 12, 62, 62]
    ref_valid = np.zeros((MAX_GT,), bool)
    ref_valid[0] = True
    return {k: jnp.asarray(v) for k, v in dict(
        img=img, ref_img=ref_img, gt_bboxes=gt_bboxes, gt_labels=gt_labels,
        gt_valid=gt_valid, gt_masks=gt_masks, gt_semantic_seg=sseg,
        gt_semantic_seg_Nx=sseg_nx, gt_pids=gt_pids, ref_bboxes=ref_bboxes,
        ref_valid=ref_valid,
    ).items()}


@pytest.mark.slow
def test_fusetrack_train_loss_and_predict():
    det = _detector()
    batch = _train_batch()
    rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    variables = det.init(rngs, **batch, method=det.loss)
    losses = det.apply(
        variables, **batch, method=det.loss, rngs={"sampler": jax.random.PRNGKey(2)}
    )
    expected = {
        "loss_segm", "loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "acc",
        "loss_bbox", "loss_match", "match_acc", "loss_mask", "loss_pano",
    }
    assert expected <= set(losses.keys())
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # inference step
    state = empty_track_state(cap=32)
    outputs, new_state = det.apply(
        variables, batch["img"], batch["ref_img"], state, method=det.predict
    )
    assert outputs["panoptic_outputs"].shape == (H, W)
    assert outputs["fcn_outputs"].shape == (H, W)
    pano = np.asarray(outputs["panoptic_outputs"])
    assert pano.min() >= 0
    nk = int(outputs["num_keep"])
    assert 0 <= nk <= 16
    assert int(new_state.count) >= nk

    # a second frame continues tracking without error
    outputs2, state2 = det.apply(
        variables, batch["ref_img"], batch["img"], new_state, method=det.predict
    )
    assert int(state2.count) >= int(new_state.count)


@pytest.mark.slow
def test_fast_preset_predict_runs():
    # zoo.fast_overrides (nearest DCN sampling, sn=1 RoIAlign, quarter-res
    # flow) must produce a working detector with the same output contract
    from vps_tpu import zoo
    from vps_tpu.models import build_detector

    cfg = zoo.fast_overrides(zoo.tiny_overrides(zoo.fusetrack_model_cfg()))
    det = build_detector(cfg, train_cfg=zoo.tiny_train_cfg(),
                         test_cfg=zoo.tiny_test_cfg())
    img = jnp.asarray(np.random.RandomState(0).randn(1, H, W, 3), jnp.float32)
    state = empty_track_state(cap=16)
    variables = det.init(jax.random.PRNGKey(0), img, img, state,
                         method=det.predict)
    outputs, new_state = det.apply(variables, img, img, state,
                                   method=det.predict)
    assert "panoptic_outputs" in outputs or "det_bboxes" in outputs
    for v in jax.tree.leaves(outputs):
        assert np.isfinite(np.asarray(v, np.float32)).all()
