import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vps_tpu.models.resnet import ResNet
from vps_tpu.models.fpn import FPN
from vps_tpu.models.rpn_head import RPNHead, rpn_proposals
from vps_tpu.models.bbox_head import SharedFCBBoxHead, get_det_bboxes
from vps_tpu.models.mask_head import FCNMaskHead
from vps_tpu.models.panoptic_fpn import UPSNetFPN
from vps_tpu.models.track_head import TrackHead, compute_comp_scores, track_match_loss
from vps_tpu.models.bfp_tcea import BFPTcea
from vps_tpu.ops.anchors import AnchorGenerator


KEY = jax.random.PRNGKey(0)


def test_resnet50_fpn_shapes():
    x = jnp.zeros((1, 128, 256, 3))
    backbone = ResNet(depth=50, frozen_stages=1)
    variables = backbone.init(KEY, x)
    outs = backbone.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 32, 64, 256),
        (1, 16, 32, 512),
        (1, 8, 16, 1024),
        (1, 4, 8, 2048),
    ]
    neck = FPN()
    nv = neck.init(KEY, outs)
    pyramid = neck.apply(nv, outs)
    assert len(pyramid) == 5
    assert pyramid[0].shape == (1, 32, 64, 256)
    assert pyramid[4].shape == (1, 2, 4, 256)


def _pyramid(b=1, h=64, w=128, c=256):
    shapes = [(b, h // s, w // s, c) for s in (1, 2, 4, 8, 16)]
    return [jnp.asarray(np.random.RandomState(i).randn(*s), jnp.float32) * 0.1 for i, s in enumerate(shapes)]


def test_rpn_head_and_proposals():
    feats = _pyramid()
    head = RPNHead()
    v = head.init(KEY, feats)
    cls_outs, reg_outs = head.apply(v, feats)
    assert cls_outs[0].shape == (1, 64, 128, 3)
    assert reg_outs[0].shape == (1, 64, 128, 12)

    strides = [4, 8, 16, 32, 64]
    gen = AnchorGenerator(base_size=4, scales=[8], ratios=[0.5, 1.0, 2.0])
    anchors = []
    for lvl, s in enumerate(strides):
        gen_l = AnchorGenerator(base_size=s, scales=[8], ratios=[0.5, 1.0, 2.0])
        h, w = cls_outs[lvl].shape[1:3]
        anchors.append(gen_l.grid_anchors((h, w), s))
    props, scores, valid = rpn_proposals(
        [c[0] for c in cls_outs],
        [r[0] for r in reg_outs],
        anchors,
        img_shape=(256, 512),
        nms_pre=500,
        max_num=300,
    )
    assert props.shape == (300, 4) and valid.shape == (300,)
    props = np.asarray(props)
    assert props[:, 0].min() >= 0 and props[:, 2].max() <= 511


def test_bbox_head_and_dets():
    rois_feats = jnp.asarray(np.random.RandomState(0).randn(16, 7, 7, 256), jnp.float32)
    head = SharedFCBBoxHead()
    v = head.init(KEY, rois_feats)
    cls, reg = head.apply(v, rois_feats)
    assert cls.shape == (16, 9) and reg.shape == (16, 36)
    rois = jnp.asarray(
        np.random.RandomState(1).uniform(0, 100, (16, 4)).astype(np.float32)
    )
    rois = rois.at[:, 2:].set(rois[:, :2] + 20)
    dets, labels, valid = get_det_bboxes(
        rois, cls, reg, (256, 512), 0.05, 0.5, 10
    )
    assert dets.shape == (10, 5) and labels.shape == (10,)


def test_mask_head():
    feats = jnp.zeros((8, 14, 14, 256))
    head = FCNMaskHead()
    v = head.init(KEY, feats)
    out = head.apply(v, feats)
    assert out.shape == (8, 28, 28, 9)


def test_upsnet_fpn_panoptic_head():
    levels = [jnp.zeros((1, 32 // s, 64 // s, 256)) for s in (1, 2, 4, 8)]
    head = UPSNetFPN()
    v = head.init(KEY, levels)
    fcn_output, fcn_score = head.apply(v, levels)
    assert fcn_score.shape == (1, 32, 64, 19)
    assert fcn_output.shape == (1, 128, 256, 19)
    labels = jnp.zeros((1, 32, 64), jnp.int32)
    losses = head.loss(fcn_score, labels)
    assert "loss_segm" in losses and np.isfinite(float(losses["loss_segm"]))


def test_track_head_match_and_loss():
    head = TrackHead()
    x = jnp.asarray(np.random.RandomState(0).randn(6, 7, 7, 256), jnp.float32)
    ref = jnp.asarray(np.random.RandomState(1).randn(4, 7, 7, 256), jnp.float32)
    v = head.init(KEY, x, ref)
    logits = head.apply(v, x, ref)
    assert logits.shape == (6, 5)
    assert np.allclose(np.asarray(logits[:, 0]), 0.0)  # dummy col
    ref_valid = jnp.asarray([True, True, False, False])
    logits_m = head.apply(v, x, ref, ref_valid)
    assert np.all(np.asarray(logits_m[:, 3:]) < -1e9)

    ids = jnp.asarray([0, 1, 2, 0, 1, 2])
    w = jnp.asarray([1.0, 1, 1, 1, 0, 0])
    loss, acc = track_match_loss(logits, ids, w)
    assert np.isfinite(float(loss)) and 0 <= float(acc) <= 1

    comp = compute_comp_scores(
        logits,
        bbox_scores=jnp.full((6, 5), 0.9),
        bbox_ious=jnp.zeros((6, 4)),
        label_delta=jnp.ones((6, 4)),
    )
    assert comp.shape == (6, 5)


def test_bfp_tcea_fuse_neck():
    feats = tuple(_pyramid(h=32, w=64))
    ref_feats = tuple(_pyramid(h=32, w=64))
    flow = jnp.zeros((1, 32, 64, 2))
    neck = BFPTcea()
    v = neck.init(KEY, feats, ref_feats, flow)
    outs = neck.apply(v, feats, ref_feats, flow)
    assert len(outs) == 5
    for o, f in zip(outs, feats):
        assert o.shape == f.shape


@pytest.mark.slow
def test_flownet2_shapes():
    from vps_tpu.models.flow.flownet2 import FlowNet2

    img = jnp.zeros((1, 64, 64, 3))
    net = FlowNet2()
    v = net.init(KEY, img, img)
    flow = net.apply(v, img, img)
    assert flow.shape == (1, 64, 64, 2)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    # reference: 'Parameter count = 162,518,834' (flownet2.py:29)
    assert n_params == 162518834, n_params
