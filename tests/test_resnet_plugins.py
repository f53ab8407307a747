"""ResNet plugin hooks: DCN conv2, GCNet ContextBlock, GeneralizedAttention
(reference mmdet/models/backbones/resnet.py:148-250,
mmdet/ops/context_block.py, mmdet/models/plugins/generalized_attention.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vps_tpu.models.plugins import ContextBlock, GeneralizedAttention
from vps_tpu.models.resnet import ResNet
from vps_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_grouped


def test_context_block_identity_at_init():
    """last_zero_init: a fresh channel_add ContextBlock is an identity."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16), jnp.float32)
    cb = ContextBlock(ratio=0.25)
    v = cb.init(jax.random.PRNGKey(0), x)
    y = cb.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_context_block_avg_pool_and_mul():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 8), jnp.float32)
    cb = ContextBlock(ratio=0.5, pooling_type="avg",
                      fusion_types=("channel_add", "channel_mul"))
    v = cb.init(jax.random.PRNGKey(0), x)
    # zero-init last convs → add term 0, mul term sigmoid(0)=0.5
    y = cb.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 0.5, atol=1e-6)


def test_generalized_attention_shapes_and_identity_at_init():
    """gamma is zero-init → the block starts as an identity; all four
    attention terms compile at stride 2."""
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 18), jnp.float32)
    for at in ("1111", "0010", "0100", "0001", "1000"):
        ga = GeneralizedAttention(in_dim=18, num_heads=3, kv_stride=2,
                                  attention_type=at)
        v = ga.init(jax.random.PRNGKey(0), x)
        y = ga.apply(v, x)
        assert y.shape == x.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6,
                                   err_msg=at)


def test_generalized_attention_gamma_nonidentity():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 8, 18), jnp.float32)
    ga = GeneralizedAttention(in_dim=18, num_heads=3, attention_type="1010")
    v = ga.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda a: a, v)
    v["params"]["gamma"] = jnp.ones((1,))
    y = ga.apply(v, x)
    assert float(jnp.abs(y - x).max()) > 1e-4


def test_grouped_deform_conv_matches_split_sum():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 6, 6, 8), jnp.float32)
    off = jnp.asarray(rng.randn(1, 6, 6, 2 * 9 * 2) * 0.3, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.1, jnp.float32)
    got = deform_conv2d_grouped(x, off, w, groups=2)
    want = deform_conv2d(
        x[..., :4], off[..., :18], w[:, :, :4, :]
    ) + deform_conv2d(x[..., 4:], off[..., 18:], w[:, :, 4:, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_resnet_with_plugins_forward_and_grads():
    """depth-50 stage-2+ DCN + GCB + gen-attention builds, runs, and every
    plugin parameter receives gradient."""
    net = ResNet(
        depth=50,
        num_stages=2,
        strides=(1, 2),
        dilations=(1, 1),
        out_indices=(0, 1),
        dcn=dict(deformable_groups=1),
        stage_with_dcn=(False, True),
        gcb=dict(ratio=0.25),
        stage_with_gcb=(False, True),
        gen_attention=dict(num_heads=8, kv_stride=2, attention_type="0010"),
        stage_with_gen_attention=((), (0,)),
    )
    x = jnp.asarray(np.random.RandomState(5).randn(1, 32, 32, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(v, x)
    assert outs[0].shape == (1, 8, 8, 256)
    assert outs[1].shape == (1, 4, 4, 512)
    p = v["params"]["layer2_0"]
    assert "conv2_offset" in p and "conv2_weight" in p
    assert "context_block" in p and "gen_attention_block" in p

    def loss(params):
        return sum(
            jnp.sum(o ** 2) for o in net.apply(
                {**v, "params": params}, x
            )
        )

    g = jax.grad(loss)(v["params"])
    for key in ("conv2_weight", "context_block", "gen_attention_block"):
        gn = sum(
            float(jnp.sum(jnp.abs(a)))
            for a in jax.tree.leaves(g["layer2_0"][key])
        )
        assert np.isfinite(gn) and gn > 0, key


def test_resnet_modulated_dcn():
    net = ResNet(
        depth=50, num_stages=1, strides=(1,), dilations=(1,),
        out_indices=(0,),
        dcn=dict(modulated=True, deformable_groups=1),
        stage_with_dcn=(True,),
    )
    x = jnp.asarray(np.random.RandomState(6).randn(1, 16, 16, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x)
    out, = net.apply(v, x)
    assert out.shape == (1, 4, 4, 256)
    # zero-init offset conv → masks sigmoid(0) = 0.5; output finite
    assert np.isfinite(np.asarray(out)).all()
