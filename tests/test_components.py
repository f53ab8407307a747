"""Tests for the wider component inventory: sampler/assigner variants,
extra losses, roi_pool/masked_conv ops, extra backbones/necks/heads,
corruptions, flow IO (SURVEY.md §2.2 parity items)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------- samplers ----------


def _assigned(n=64, seed=0):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.randint(-1, 4, n))


def test_random_sample_quota():
    from vps_tpu.core import random_sample

    res = random_sample(jax.random.PRNGKey(0), _assigned(), 16, 0.25)
    assert int(res.num_pos) <= 4
    assert int(res.num_pos) + int(res.num_neg) == int(res.valid.sum())
    # positives occupy a prefix
    pm = np.asarray(res.pos_mask)
    assert not np.any(pm[np.argmin(pm):])


def test_pseudo_sample_keeps_all_pos():
    from vps_tpu.core import pseudo_sample

    agi = jnp.asarray([2, 0, 1, 0, -1, 3])
    res = pseudo_sample(agi, 6)
    assert int(res.num_pos) == 3
    assert int(res.num_neg) == 2  # -1 neutral excluded


def test_ohem_picks_hardest():
    from vps_tpu.core import ohem_sample

    agi = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0])
    losses = jnp.asarray([0.1, 0.9, 0.5, 0.2, 0.8, 0.1, 0.9, 0.3])
    res = ohem_sample(agi, losses, 4, 0.5)
    inds = np.asarray(res.inds)
    pos_sel = set(inds[np.asarray(res.pos_mask)].tolist())
    assert pos_sel == {1, 2}  # two hardest positives
    neg_sel = set(inds[np.asarray(res.valid & ~res.pos_mask)].tolist())
    assert neg_sel == {4, 6}  # two hardest negatives


def test_instance_balanced_round_robin():
    from vps_tpu.core import instance_balanced_sample

    # 1 candidate of gt1, many of gt2 — gt1's single positive must be kept
    agi = jnp.asarray([1] + [2] * 10 + [0] * 10)
    res = instance_balanced_sample(jax.random.PRNGKey(1), agi, 8, 0.5)
    inds = np.asarray(res.inds)[np.asarray(res.pos_mask)]
    assert 0 in inds.tolist()


def test_iou_balanced_neg_bins():
    from vps_tpu.core import iou_balanced_neg_sample

    agi = jnp.asarray([0] * 30)
    # 10 negs each in 3 IoU bins [0,.167),[.167,.33),[.33,.5)
    ious = jnp.asarray([0.05] * 10 + [0.25] * 10 + [0.45] * 10)
    res = iou_balanced_neg_sample(
        jax.random.PRNGKey(2), agi, ious, 9, 0.0, num_bins=3, neg_iou_thr=0.5
    )
    inds = np.asarray(res.inds)[np.asarray(res.valid)]
    bins = [np.sum(inds < 10), np.sum((inds >= 10) & (inds < 20)),
            np.sum(inds >= 20)]
    assert bins == [3, 3, 3]  # perfectly balanced across bins


def test_combined_sample_runs():
    from vps_tpu.core import combined_sample

    res = combined_sample(
        jax.random.PRNGKey(3), _assigned(), jnp.zeros(64), 16, 0.25
    )
    assert int(res.valid.sum()) > 0


# ---------- assigners ----------


def test_approx_max_iou_assign_uses_best_approx():
    from vps_tpu.core import approx_max_iou_assign

    gt = jnp.asarray([[0, 0, 40, 40]], jnp.float32)
    # location 0: one perfect approx among 3; location 1: all far
    approxs = jnp.asarray(
        [[0, 0, 40, 40], [100, 100, 140, 140], [200, 200, 240, 240],
         [300, 300, 340, 340], [400, 400, 440, 440], [500, 500, 540, 540]],
        jnp.float32,
    )
    res = approx_max_iou_assign(approxs, gt, 0.5, 0.4, approxs_per_octave=3)
    assert int(res.assigned_gt_inds[0]) == 1
    assert int(res.assigned_gt_inds[1]) == 0


def test_point_assign_closest_points():
    from vps_tpu.core import point_assign

    gt = jnp.asarray([[0, 0, 64, 64]], jnp.float32)
    pts = jnp.asarray(
        [[32, 32, 8], [30, 30, 8], [60, 60, 8], [500, 500, 8], [31, 33, 8]],
        jnp.float32,
    )
    res = point_assign(pts, gt, pos_num=3)
    pos = np.asarray(res.assigned_gt_inds > 0)
    assert pos.sum() == 3
    assert not pos[3]  # the far point is never selected


# ---------- losses ----------


def test_iou_losses_zero_for_perfect():
    from vps_tpu.ops import iou_loss, giou_loss, bounded_iou_loss

    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 20, 20]], jnp.float32)
    assert float(iou_loss(b, b)) < 1e-5
    assert float(giou_loss(b, b)) < 1e-5
    assert float(bounded_iou_loss(b, b)) < 1e-5


def test_balanced_l1_matches_smooth_l1_shape():
    from vps_tpu.ops import balanced_l1_loss

    p = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    t = jnp.asarray([[1.0, 2.0, 0.5, 0.1]])
    v = float(balanced_l1_loss(p, t))
    assert np.isfinite(v) and v > 0
    # gradient exists and is finite
    g = jax.grad(lambda x: balanced_l1_loss(x, t))(p)
    assert np.all(np.isfinite(np.asarray(g)))


def test_ghm_c_weights_sum():
    from vps_tpu.ops import ghm_c_loss

    r = np.random.RandomState(0)
    logits = jnp.asarray(r.randn(32, 8).astype(np.float32))
    labels = jnp.asarray(r.randint(0, 9, 32))
    v = float(ghm_c_loss(logits, labels))
    assert np.isfinite(v) and v > 0
    g = jax.grad(lambda x: ghm_c_loss(x, labels))(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_ghm_r_finite_grad():
    from vps_tpu.ops import ghm_r_loss

    r = np.random.RandomState(1)
    pred = jnp.asarray(r.randn(16, 4).astype(np.float32))
    tgt = jnp.zeros((16, 4))
    g = jax.grad(lambda x: ghm_r_loss(x, tgt))(pred)
    assert np.all(np.isfinite(np.asarray(g)))


def test_mse_loss():
    from vps_tpu.ops import mse_loss

    assert float(mse_loss(jnp.ones(4), jnp.zeros(4), avg_factor=4)) == 1.0


# ---------- ops ----------


def test_roi_pool_max_semantics():
    from vps_tpu.ops import roi_pool

    feat = jnp.zeros((16, 16, 1)).at[4, 4, 0].set(9.0)
    rois = jnp.asarray([[0, 0, 63, 63]], jnp.float32)  # maps to whole 16×16
    out = roi_pool(feat, rois, 0.25, 4, samples_per_bin=4)
    assert float(out.max()) == 9.0  # max pooling catches the spike


def test_deform_roi_pool_no_offset_matches_avg():
    from vps_tpu.ops import deform_roi_pool

    r = np.random.RandomState(0)
    feat = jnp.asarray(r.rand(16, 16, 4).astype(np.float32))
    rois = jnp.asarray([[0, 0, 32, 32]], jnp.float32)
    out = deform_roi_pool(feat, rois, None, 0.5, 7)
    assert out.shape == (1, 7, 7, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_masked_conv_zeroes_masked():
    from vps_tpu.ops import masked_conv2d

    x = jnp.ones((1, 8, 8, 2))
    w = jnp.ones((3, 3, 2, 3))
    m = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    out = masked_conv2d(x, m, w)
    assert float(jnp.abs(out[:, 4:]).max()) == 0.0
    assert float(jnp.abs(out[:, :4]).max()) > 0.0


# ---------- backbones / necks / heads ----------


def test_resnext_grouped_shapes():
    from vps_tpu.models.resnet import ResNeXt

    m = ResNeXt(depth=50)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # conv2 kernels are grouped: param shape in-channels reduced 32×
    k = v["params"]["layer1_0"]["conv2"]["Conv_0"]["kernel"]
    assert k.shape[2] * 32 == 128  # width=128 for planes=64, groups=32


def test_hrnet_hrfpn_pipeline():
    from vps_tpu.models.hrnet import HRNet
    from vps_tpu.models.fpn import HRFPN

    x = jnp.ones((1, 32, 32, 3))
    m = HRNet()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]
    neck = HRFPN()
    v2 = neck.init(jax.random.PRNGKey(0), outs)
    fpn_outs = neck.apply(v2, outs)
    assert len(fpn_outs) == 5
    assert all(o.shape[-1] == 256 for o in fpn_outs)


def test_ssd_vgg_levels():
    from vps_tpu.models.ssd_vgg import SSDVGG

    m = SSDVGG(input_size=300)
    x = jnp.ones((1, 300, 300, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert len(outs) == 6
    assert outs[0].shape[1] == 37  # conv4_3 level


@pytest.mark.slow
def test_retinanet_end_to_end():
    from vps_tpu.models.detectors.single_stage import RetinaNet

    bb = dict(type="ResNet", depth=18, frozen_stages=-1)
    nk = dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=64,
              num_outs=5)
    det = RetinaNet(
        backbone=bb, neck=nk,
        bbox_head=dict(num_classes=9, in_channels=64, feat_channels=64,
                       stacked_convs=1),
    )
    img = jnp.ones((1, 64, 64, 3))
    v = det.init(jax.random.PRNGKey(0), img)
    dets, labels, valid = det.apply(v, img, method=det.predict)
    assert dets.shape == (100, 5)
    gtb = jnp.asarray([[10, 10, 60, 60], [0, 0, 0, 0]], jnp.float32)
    losses = det.apply(
        v, img, gtb, jnp.asarray([1, 0]), jnp.asarray([True, False]),
        method=det.loss,
    )
    assert all(np.isfinite(float(l)) for l in losses.values())


# ---------- corruptions / flow io ----------


def test_corruptions_all_run():
    from vps_tpu.data.corruptions import CORRUPTIONS, corrupt

    img = (np.random.RandomState(0).rand(32, 48, 3) * 255).astype(np.float32)
    for name in CORRUPTIONS:
        out = corrupt(img, name, severity=3, seed=0)
        assert out.shape == img.shape, name
        assert out.dtype == np.float32, name
        assert float(out.min()) >= 0 and float(out.max()) <= 255, name


def test_corruption_severity_monotone_noise():
    from vps_tpu.data.corruptions import corrupt

    img = np.full((32, 32, 3), 128, np.float32)
    d1 = np.abs(corrupt(img, "gaussian_noise", 1, seed=0) - img).mean()
    d5 = np.abs(corrupt(img, "gaussian_noise", 5, seed=0) - img).mean()
    assert d5 > d1


def test_flo_roundtrip(tmp_path):
    from vps_tpu.utils import flow as F

    fl = np.random.RandomState(0).randn(6, 8, 2).astype(np.float32)
    p = str(tmp_path / "t.flo")
    F.write_flo(p, fl)
    assert np.allclose(F.read_flo(p), fl)


def test_flow_to_rgb():
    from vps_tpu.utils import flow as F

    fl = np.zeros((8, 8, 2), np.float32)
    fl[:4, :, 0] = 1.0
    img = F.flow_to_rgb(fl)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_all_shipped_configs_build_detectors():
    # every config file must load through Config.fromfile and build its
    # detector (catches config drift and flax-attribute constraints like
    # the int-keyed class_mapping regression)
    import glob
    import os.path as osp

    from vps_tpu.config import Config
    from vps_tpu.models import build_detector

    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    files = sorted(glob.glob(osp.join(root, "configs", "*", "*.py")))
    assert len(files) >= 5
    for f in files:
        cfg = Config.fromfile(f)
        det = build_detector(cfg.model, train_cfg=cfg.train_cfg,
                             test_cfg=cfg.test_cfg)
        assert det is not None, f


def test_conv_ws_matches_torch():
    """ConvWS (layers.py) vs the reference's conv_ws_2d math
    (mmdet/models/utils/conv_ws.py:5): per-out-channel unbiased weight
    standardization before the conv."""
    import numpy as np
    import torch
    import torch.nn.functional as F
    import jax
    import jax.numpy as jnp

    from vps_tpu.models.layers import ConvWS

    rng = np.random.RandomState(0)
    x = rng.randn(1, 9, 9, 4).astype(np.float32)
    m = ConvWS(6, 3, 1, 1)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))

    w = np.asarray(v["params"]["kernel"])  # (kh, kw, in, out)
    b = np.asarray(v["params"]["bias"])
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1)).contiguous()  # (out,in,kh,kw)
    flat = wt.reshape(wt.size(0), -1)
    mean = flat.mean(dim=1).view(-1, 1, 1, 1)
    std = flat.std(dim=1).view(-1, 1, 1, 1)
    wt = (wt - mean) / (std + 1e-5)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.conv2d(xt, wt, torch.from_numpy(b), 1, 1)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=2e-5)
