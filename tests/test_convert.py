import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from vps_tpu.utils.convert import conv_w, deconv_w, linear_w, linear_chw_w
from vps_tpu.models.layers import Conv, FrozenBatchNorm
from vps_tpu.models.flow.flownet2 import TorchConvTranspose

KEY = jax.random.PRNGKey(0)


def test_conv_weight_conversion_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 9, 11, 4).astype(np.float32)
    w = rng.randn(8, 4, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    want = (
        F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
                 torch.from_numpy(b), padding=1)
        .permute(0, 2, 3, 1).numpy()
    )
    mod = Conv(8, 3, 1, 1)
    vars0 = mod.init(KEY, jnp.asarray(x))
    params = {"Conv_0": {"kernel": jnp.asarray(conv_w(w)), "bias": jnp.asarray(b)}}
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deconv_weight_conversion_matches_torch():
    rng = np.random.RandomState(1)
    for (k, s, p) in [(4, 2, 1), (2, 2, 0)]:
        x = rng.randn(1, 6, 7, 3).astype(np.float32)
        w = rng.randn(3, 5, k, k).astype(np.float32)  # torch (in, out, kh, kw)
        b = rng.randn(5).astype(np.float32)
        want = (
            F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                               torch.from_numpy(w), torch.from_numpy(b),
                               stride=s, padding=p)
            .permute(0, 2, 3, 1).numpy()
        )
        mod = TorchConvTranspose(5, k, s, p)
        mod.init(KEY, jnp.asarray(x))
        params = {"kernel": jnp.asarray(deconv_w(w)), "bias": jnp.asarray(b)}
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_linear_chw_conversion():
    """torch Linear on flattened (C, H, W) ROI features == our Dense on
    flattened (H, W, C) after input-axis permutation."""
    rng = np.random.RandomState(2)
    c, h, w, o = 16, 7, 7, 32
    feat_hwc = rng.randn(5, h, w, c).astype(np.float32)
    wt = rng.randn(o, c * h * w).astype(np.float32)
    b = rng.randn(o).astype(np.float32)
    feat_chw = np.transpose(feat_hwc, (0, 3, 1, 2)).reshape(5, -1)
    want = feat_chw @ wt.T + b
    got = feat_hwc.reshape(5, -1) @ linear_chw_w(wt, c, h, w) + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_frozen_bn_matches_torch_eval_bn():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 6, 8).astype(np.float32)
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.5
    bn = torch.nn.BatchNorm2d(8)
    bn.weight.data = torch.from_numpy(gamma)
    bn.bias.data = torch.from_numpy(beta)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    bn.eval()
    want = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    mod = FrozenBatchNorm(8)
    got = np.asarray(mod.apply(
        {"params": {"scale": gamma, "bias": beta},
         "batch_stats": {"mean": mean, "var": var}},
        jnp.asarray(x),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_detector_mapping_structure():
    """Converted fake torch weights must form a subtree of the real param
    tree (paths AND shapes), for the R-50 FuseTrack."""
    from vps_tpu import zoo
    from vps_tpu.models.detectors import PanopticFuseTrack, empty_track_state
    from vps_tpu.utils.convert import convert_detector

    cfg = zoo.fusetrack_model_cfg()
    cfg.pop("type")
    det = PanopticFuseTrack(train_cfg=zoo.tiny_train_cfg(),
                            test_cfg=zoo.tiny_test_cfg(), **cfg)
    img = jnp.zeros((1, 64, 128, 3))
    shapes = jax.eval_shape(
        lambda: det.init({"params": KEY}, img, img, empty_track_state(cap=8),
                         method=det.predict)
    )

    # synthesize a torch state_dict by inverting shapes through the mapping
    flat = jax.tree_util.tree_flatten_with_path(shapes["params"])[0]
    ours = {
        "/".join(str(getattr(k, "key", k)) for k in path): v.shape
        for path, v in flat
    }
    stats_flat = jax.tree_util.tree_flatten_with_path(
        shapes.get("batch_stats", {}))[0]
    our_stats = {
        "/".join(str(getattr(k, "key", k)) for k in path): v.shape
        for path, v in stats_flat
    }

    sd = _fake_torch_sd()
    params, batch_stats, used = convert_detector(sd, depth=50)
    pf = jax.tree_util.tree_flatten_with_path(params)[0]
    n_checked = 0
    for path, v in pf:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        assert key in ours, f"converted key {key} not in model tree"
        assert tuple(v.shape) == tuple(ours[key]), (key, v.shape, ours[key])
        n_checked += 1
    sf = jax.tree_util.tree_flatten_with_path(batch_stats)[0]
    for path, v in sf:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        assert key in our_stats, key
        assert tuple(v.shape) == tuple(our_stats[key]), key
    assert n_checked > 50
    assert len(used) == len(sd), set(sd) - used


def _fake_torch_sd():
    """Minimal-yet-representative mmdet R-50 FuseTrack state_dict shapes."""
    rng = np.random.RandomState(0)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.01

    sd = {}

    def add_conv(key, o, i, k):
        sd[key + ".weight"] = t(o, i, k, k)
        sd[key + ".bias"] = t(o)

    def add_conv_nb(key, o, i, k):
        sd[key + ".weight"] = t(o, i, k, k)

    def add_bn(key, c):
        sd[key + ".weight"] = t(c)
        sd[key + ".bias"] = t(c)
        sd[key + ".running_mean"] = t(c)
        sd[key + ".running_var"] = np.abs(t(c)) + 1

    def add_linear(key, o, i):
        sd[key + ".weight"] = t(o, i)
        sd[key + ".bias"] = t(o)

    # backbone R50
    add_conv_nb("backbone.conv1", 64, 3, 7)
    add_bn("backbone.bn1", 64)
    blocks = (3, 4, 6, 3)
    planes = 64
    inp = 64
    for s, nb in enumerate(blocks, start=1):
        for j in range(nb):
            p = f"backbone.layer{s}.{j}"
            add_conv_nb(p + ".conv1", planes, inp if j == 0 else planes * 4, 1)
            add_bn(p + ".bn1", planes)
            add_conv_nb(p + ".conv2", planes, planes, 3)
            add_bn(p + ".bn2", planes)
            add_conv_nb(p + ".conv3", planes * 4, planes, 1)
            add_bn(p + ".bn3", planes * 4)
            if j == 0:
                add_conv_nb(p + ".downsample.0", planes * 4,
                            inp if s == 1 else planes * 2, 1)
                add_bn(p + ".downsample.1", planes * 4)
        inp = planes * 4
        planes *= 2
    # FPN
    for i, c in enumerate((256, 512, 1024, 2048)):
        add_conv(f"neck.lateral_convs.{i}.conv", 256, c, 1)
        add_conv(f"neck.fpn_convs.{i}.conv", 256, 256, 3)
    # RPN
    add_conv("rpn_head.rpn_conv", 256, 256, 3)
    add_conv("rpn_head.rpn_cls", 3, 256, 1)
    add_conv("rpn_head.rpn_reg", 12, 256, 1)
    # bbox head
    add_linear("bbox_head.shared_fcs.0", 1024, 256 * 49)
    add_linear("bbox_head.shared_fcs.1", 1024, 1024)
    add_linear("bbox_head.fc_cls", 9, 1024)
    add_linear("bbox_head.fc_reg", 36, 1024)
    # track head
    add_linear("track_head.fcs.0", 1024, 256 * 49)
    add_linear("track_head.fcs.1", 1024, 1024)
    # mask head
    for i in range(4):
        add_conv(f"mask_head.convs.{i}.conv", 256, 256, 3)
    sd["mask_head.upsample.weight"] = t(256, 256, 2, 2)
    sd["mask_head.upsample.bias"] = t(256)
    add_conv("mask_head.conv_logits", 9, 256, 1)
    # panoptic head
    chans = [(256, 256), (128, 256), (128, 128)]
    for i, seq in enumerate((0, 3, 6)):
        o, ci = chans[i]
        add_conv(f"panopticFPN.deform_convs.0.{seq}.conv_offset", 18, ci, 3)
        sd[f"panopticFPN.deform_convs.0.{seq}.conv.weight"] = t(o, ci, 3)
        sd[f"panopticFPN.deform_convs.0.{seq}.conv.weight"] = t(o, ci, 3, 3)
    for i, seq in enumerate((1, 4, 7)):
        o = chans[i][0]
        sd[f"panopticFPN.deform_convs.0.{seq}.weight"] = t(o)
        sd[f"panopticFPN.deform_convs.0.{seq}.bias"] = t(o)
    add_conv("panopticFPN.conv_pred.conv", 19, 512, 1)
    # fuse neck
    add_conv("extra_neck.liteflownet.flow_estimator.convs.0.0", 64, 256 + 81 + 2, 3)
    add_conv("extra_neck.liteflownet.flow_estimator.convs.1.0", 64, 64, 3)
    add_conv("extra_neck.liteflownet.flow_estimator.convs.2.0", 32, 64, 3)
    add_conv("extra_neck.liteflownet.flow_estimator.convs.3", 2, 32, 3)
    for tname, (o, i) in dict(
        tAtt_1=(256, 256), tAtt_2=(256, 256), fea_fusion=(256, 512),
        sAtt_1=(256, 512), sAtt_2=(256, 512), sAtt_3=(256, 256),
        sAtt_4=(256, 256), sAtt_add_1=(256, 256), sAtt_add_2=(256, 256),
    ).items():
        k = 3 if tname in ("tAtt_1", "tAtt_2", "sAtt_3", "sAtt_4") else 1
        add_conv(f"extra_neck.tcea_fusion.{tname}", o, i, k)
    add_conv("extra_neck.refine.conv", 256, 256, 3)
    return sd


def test_checkpoint_train_payload_loads_into_inference_template(tmp_path):
    # a training checkpoint (params+opt_state+batch_stats) must restore into
    # a params-only template — what tools/test_vpq.py does with Runner output
    import jax.numpy as jnp
    from vps_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

    params = {"head": {"w": jnp.arange(6.0).reshape(2, 3)}}
    opt_state = {"mu": {"head": {"w": jnp.zeros((2, 3))}}}
    path = save_checkpoint(str(tmp_path), 7, params, opt_state=opt_state,
                           batch_stats={})
    out = load_checkpoint(path, {
        "params": {"head": {"w": jnp.zeros((2, 3))}},
        "batch_stats": {},
    })
    np.testing.assert_array_equal(np.asarray(out["params"]["head"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert "opt_state" not in out
