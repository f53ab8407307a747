"""deform_conv2d_multilevel (one concatenated gather stream over all FPN
levels, the UPSNet semantic head's shared tower upsnetFPN.py:24-36) must
reproduce per-level deform_conv2d calls exactly — same corner order, same
f32 accumulation — for both bilinear and nearest sampling."""

import numpy as np
import jax.numpy as jnp

from vps_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_multilevel


def _levels(rng, b=2, cin=8, cout=16, k=3):
    shapes = [(16, 32), (8, 16), (4, 8), (2, 4)]
    xs = [jnp.asarray(rng.randn(b, h, w, cin), jnp.float32) for h, w in shapes]
    offs = [
        jnp.asarray(rng.randn(b, h, w, 2 * k * k) * 2.0, jnp.float32)
        for h, w in shapes
    ]
    weight = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    return xs, offs, weight


def test_multilevel_matches_per_level_bilinear():
    rng = np.random.RandomState(0)
    xs, offs, weight = _levels(rng)
    outs_ml = deform_conv2d_multilevel(xs, offs, weight, padding=1)
    for x, off, out_ml in zip(xs, offs, outs_ml):
        out_sl = deform_conv2d(x, off, weight, padding=1)
        np.testing.assert_allclose(
            np.asarray(out_ml), np.asarray(out_sl), rtol=1e-5, atol=1e-5
        )


def test_multilevel_matches_per_level_nearest():
    rng = np.random.RandomState(1)
    xs, offs, weight = _levels(rng)
    outs_ml = deform_conv2d_multilevel(
        xs, offs, weight, padding=1, sampling="nearest"
    )
    for x, off, out_ml in zip(xs, offs, outs_ml):
        out_sl = deform_conv2d(x, off, weight, padding=1, sampling="nearest")
        np.testing.assert_allclose(
            np.asarray(out_ml), np.asarray(out_sl), rtol=1e-5, atol=1e-5
        )


def test_xpair_matches_plain_bilinear():
    """x-paired corner gather (2 gathers/tap from the right-neighbour pair
    table instead of 4 — PERF.md: flat per-index cost only while the paired
    slice stays <= 512 B) must reproduce the plain 4-corner formulation to
    f32 association noise, including OOB corners, modulation (v2), the
    multilevel stream, and the input gradient."""
    rng = np.random.RandomState(3)
    xs, offs, weight = _levels(rng)
    x, off = xs[0], offs[0] * 4.0  # big offsets -> plenty of OOB corners
    a = deform_conv2d(x, off, weight, xpair=False)
    b = deform_conv2d(x, off, weight, xpair=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    msk = jnp.asarray(rng.rand(*off.shape[:3], 9), jnp.float32)
    a = deform_conv2d(x, off, weight, mask=msk, xpair=False)
    b = deform_conv2d(x, off, weight, mask=msk, xpair=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    ml0 = deform_conv2d_multilevel(xs, offs, weight, xpair=False)
    ml1 = deform_conv2d_multilevel(xs, offs, weight, xpair=True)
    for u, v in zip(ml0, ml1):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-5)

    import jax

    g0 = jax.grad(lambda t: deform_conv2d(t, off, weight, xpair=False).sum())(x)
    g1 = jax.grad(lambda t: deform_conv2d(t, off, weight, xpair=True).sum())(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)


def test_multilevel_bf16_path():
    rng = np.random.RandomState(2)
    xs, offs, weight = _levels(rng)
    xs16 = [x.astype(jnp.bfloat16) for x in xs]
    outs = deform_conv2d_multilevel(xs16, offs, weight.astype(jnp.bfloat16),
                                    padding=1)
    ref = deform_conv2d_multilevel(xs, offs, weight, padding=1)
    for o, r in zip(outs, ref):
        assert o.dtype == jnp.float32  # f32 accumulation
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=0.05, atol=0.05
        )

def test_xpair_grouped_plumbing_and_nearest_rejection():
    """ADVICE r3: deform_conv2d_grouped must forward an explicit xpair to
    every per-group call (not just the VPS_TPU_XPAIR env opt-in), and
    xpair=True with sampling='nearest' must raise instead of being silently
    ignored."""
    import pytest
    from vps_tpu.ops.deform_conv import deform_conv2d_grouped

    rng = np.random.RandomState(5)
    b, h, w, cin, cout, k, groups = 2, 8, 16, 8, 12, 3, 2
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    off = jnp.asarray(rng.randn(b, h, w, groups * 2 * k * k) * 2, jnp.float32)
    weight = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)

    a = deform_conv2d_grouped(x, off, weight, groups, xpair=False)
    bq = deform_conv2d_grouped(x, off, weight, groups, xpair=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bq),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="xpair"):
        deform_conv2d(x, off[..., : 2 * k * k], weight,
                      sampling="nearest", xpair=True)
    with pytest.raises(ValueError, match="xpair"):
        deform_conv2d_grouped(x, off, weight, groups,
                              sampling="nearest", xpair=True)
