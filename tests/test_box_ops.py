import numpy as np
import jax.numpy as jnp

from vps_tpu.ops import bbox2delta, delta2bbox, bbox_overlaps, bbox_flip, clip_boxes


def _np_bbox2delta(p, g, means, stds):
    px = (p[..., 0] + p[..., 2]) * 0.5
    py = (p[..., 1] + p[..., 3]) * 0.5
    pw = p[..., 2] - p[..., 0] + 1.0
    ph = p[..., 3] - p[..., 1] + 1.0
    gx = (g[..., 0] + g[..., 2]) * 0.5
    gy = (g[..., 1] + g[..., 3]) * 0.5
    gw = g[..., 2] - g[..., 0] + 1.0
    gh = g[..., 3] - g[..., 1] + 1.0
    d = np.stack(
        [(gx - px) / pw, (gy - py) / ph, np.log(gw / pw), np.log(gh / ph)], -1
    )
    return (d - np.array(means)) / np.array(stds)


def _rand_boxes(n, rng, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def test_bbox2delta_matches_numpy():
    rng = np.random.RandomState(0)
    p = _rand_boxes(32, rng)
    g = _rand_boxes(32, rng)
    means, stds = (0.1, -0.1, 0.0, 0.0), (0.5, 0.5, 1.0, 1.0)
    got = np.asarray(bbox2delta(jnp.asarray(p), jnp.asarray(g), means, stds))
    want = _np_bbox2delta(p, g, means, stds)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_delta2bbox_roundtrip():
    rng = np.random.RandomState(1)
    p = _rand_boxes(64, rng)
    g = _rand_boxes(64, rng)
    d = bbox2delta(jnp.asarray(p), jnp.asarray(g))
    back = delta2bbox(jnp.asarray(p), d)
    np.testing.assert_allclose(np.asarray(back), g, rtol=1e-4, atol=1e-3)


def test_delta2bbox_multiclass_and_clip():
    rng = np.random.RandomState(2)
    p = _rand_boxes(8, rng)
    deltas = rng.randn(8, 4 * 3).astype(np.float32) * 0.1
    out = delta2bbox(jnp.asarray(p), jnp.asarray(deltas), max_shape=(50, 60))
    out = np.asarray(out)
    assert out.shape == (8, 12)
    assert out[:, 0::4].min() >= 0 and out[:, 0::4].max() <= 59
    assert out[:, 1::4].min() >= 0 and out[:, 1::4].max() <= 49


def test_bbox_overlaps_against_numpy():
    rng = np.random.RandomState(3)
    a = _rand_boxes(20, rng)
    b = _rand_boxes(30, rng)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    # numpy reference with legacy +1
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    want = inter / (area_a[:, None] + area_b[None, :] - inter)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flip_and_clip():
    b = jnp.asarray([[10.0, 5.0, 20.0, 15.0]])
    f = np.asarray(bbox_flip(b, (100, 50)))
    np.testing.assert_allclose(f, [[50 - 20 - 1, 5, 50 - 10 - 1, 15]])
    c = np.asarray(clip_boxes(jnp.asarray([[-5.0, -5.0, 200.0, 200.0]]), (100, 50)))
    np.testing.assert_allclose(c, [[0, 0, 49, 99]])
