"""Cascade R-CNN / HTC (vps_tpu/models/detectors/cascade.py): per-stage
losses with stage weights, between-stage refinement, mean-of-stage test
scores/masks, HTC semantic fusion + interleaved + mask info flow — the
reference's detectors/cascade_rcnn.py:15 and htc.py:13 surface."""

import numpy as np

import jax
import jax.numpy as jnp

from vps_tpu.models import build_detector  # noqa: F401 (registers)
from vps_tpu.registry import DETECTORS

from tests.test_two_stage import IMG, TEST_CFG, gt, init_and_loss, tiny_cfg


def cascade_train_cfg():
    rcnn = [
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=thr,
                           neg_iou_thr=thr, min_pos_iou=thr),
             sampler=dict(type="RandomSampler", num=16, pos_fraction=0.25,
                          add_gt_as_proposals=True),
             mask_size=28, pos_weight=-1)
        for thr in (0.5, 0.6, 0.7)
    ]
    return dict(
        rpn=dict(
            assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3),
            sampler=dict(type="RandomSampler", num=32, pos_fraction=0.5),
            allowed_border=0,
        ),
        rpn_proposal=dict(nms_pre=32, nms_thr=0.7, max_num=16),
        rcnn=rcnn,
        stage_loss_weights=[1.0, 0.5, 0.25],
    )


def stage_heads():
    # rising-IoU stages with the reference's shrinking target stds
    return [
        dict(num_classes=5, in_channels=32, fc_out_channels=32,
             target_stds=s)
        for s in ([0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1],
                  [0.033, 0.033, 0.067, 0.067])
    ]


def test_cascade_rcnn_loss_and_predict():
    det = DETECTORS.get("CascadeRCNN")(
        num_stages=3,
        train_cfg=cascade_train_cfg(),
        test_cfg=TEST_CFG,
        **tiny_cfg(bbox_head=stage_heads()),
    )
    gtb, gtl, gtv, _ = gt()
    v, losses = init_and_loss(det, (IMG, gtb, gtl, gtv))
    for i in range(3):
        assert f"s{i}.loss_cls" in losses and f"s{i}.loss_bbox" in losses
    out = jax.jit(lambda v: det.apply(v, IMG, method=det.predict))(v)
    assert out["det_bboxes"].shape == (6, 5)
    dets = np.asarray(out["det_bboxes"])
    valid = np.asarray(out["det_valid"])
    assert (dets[valid, :4] >= 0).all()


def test_cascade_mask_rcnn():
    det = DETECTORS.get("CascadeRCNN")(
        num_stages=2,
        train_cfg=dict(cascade_train_cfg(),
                       rcnn=cascade_train_cfg()["rcnn"][:2],
                       stage_loss_weights=[1.0, 0.5]),
        test_cfg=TEST_CFG,
        **tiny_cfg(
            bbox_head=stage_heads()[:2],
            mask_roi_extractor=dict(
                roi_layer=dict(out_size=14, sample_num=2),
                featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=5),
        ),
    )
    gtb, gtl, gtv, gtm = gt()
    v, losses = init_and_loss(det, (IMG, gtb, gtl, gtv, gtm))
    assert "s0.loss_mask" in losses and "s1.loss_mask" in losses
    out = jax.jit(lambda v: det.apply(v, IMG, method=det.predict))(v)
    assert out["mask_logits"].shape == (6, 28, 28)


def htc_detector(interleaved=True, mask_info_flow=True, semantic=True):
    kw = {}
    if semantic:
        kw.update(
            semantic_roi_extractor=dict(
                roi_layer=dict(out_size=14, sample_num=2),
                featmap_strides=[8]),
            semantic_head=dict(num_ins=5, fusion_level=1, num_convs=1,
                               in_channels=32, conv_out_channels=32,
                               num_classes=7),
        )
    return DETECTORS.get("HybridTaskCascade")(
        num_stages=2,
        interleaved=interleaved,
        mask_info_flow=mask_info_flow,
        train_cfg=dict(cascade_train_cfg(),
                       rcnn=cascade_train_cfg()["rcnn"][:2],
                       stage_loss_weights=[1.0, 0.5]),
        test_cfg=TEST_CFG,
        **tiny_cfg(
            bbox_head=stage_heads()[:2],
            mask_roi_extractor=dict(
                roi_layer=dict(out_size=14, sample_num=2),
                featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(type="HTCMaskHead", num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=5),
        ),
        **kw,
    )


def test_htc_loss_and_predict():
    det = htc_detector()
    gtb, gtl, gtv, gtm = gt()
    # semantic GT at the fusion level (stride 8 → 8×8 for the 64×64 image)
    sem = jnp.zeros((1, 8, 8), jnp.int32).at[:, 4:].set(2)
    v, losses = init_and_loss(det, (IMG, gtb, gtl, gtv, gtm, sem))
    assert "loss_semantic_seg" in losses
    assert "s0.loss_mask" in losses and "s1.loss_mask" in losses
    out = jax.jit(lambda v: det.apply(v, IMG, method=det.predict))(v)
    assert out["det_bboxes"].shape == (6, 5)
    assert out["mask_logits"].shape == (6, 28, 28)
    assert np.isfinite(np.asarray(out["mask_logits"])).all()


def test_htc_no_semantic_no_flow():
    """HTC degrades gracefully without the semantic branch / info flow
    (htc.py: semantic_head=None, mask_info_flow=False)."""
    det = htc_detector(interleaved=False, mask_info_flow=False,
                       semantic=False)
    gtb, gtl, gtv, gtm = gt()
    v, losses = init_and_loss(det, (IMG, gtb, gtl, gtv, gtm))
    assert "loss_semantic_seg" not in losses
    out = jax.jit(lambda v: det.apply(v, IMG, method=det.predict))(v)
    assert out["mask_logits"].shape == (6, 28, 28)


def test_htc_alias_registered():
    assert DETECTORS.get("HTC") is not None
    assert DETECTORS.get("HybridTaskCascade") is not None
