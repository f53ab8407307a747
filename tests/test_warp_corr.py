import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vps_tpu.ops import grid_sample, flow_warp, resample2d, channel_norm, correlation


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 13, 3).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 5, 7, 2)).astype(np.float32)
    for align in (False, True):
        got = np.asarray(
            grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=align)
        )
        want = (
            F.grid_sample(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(grid),
                mode="bilinear",
                padding_mode="zeros",
                align_corners=align,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flow_warp_matches_reference_warping_layer():
    """Reproduce the reference WarpingLayer (flow_modules.py:131-152) in
    torch and compare."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 12, 4).astype(np.float32)
    flow = rng.uniform(-2, 2, (1, 8, 12, 2)).astype(np.float32)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ft = torch.from_numpy(flow).permute(0, 3, 1, 2)
    b, c, h, w = xt.shape
    horiz = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(b, 1, h, w)
    vert = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(b, 1, h, w)
    grid = torch.cat([horiz, vert], 1)
    fg = torch.zeros_like(ft)
    fg[:, 0] = ft[:, 0] / ((w - 1.0) / 2.0)
    fg[:, 1] = ft[:, 1] / ((h - 1.0) / 2.0)
    want = (
        F.grid_sample(xt, (grid + fg).permute(0, 2, 3, 1), align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resample2d_identity_on_zero_flow():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 7, 5).astype(np.float32)
    flow = np.zeros((1, 6, 7, 2), np.float32)
    got = np.asarray(resample2d(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got, x, rtol=1e-6, atol=1e-6)


def test_resample2d_integer_shift_with_border_clamp():
    x = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    flow = np.ones((1, 3, 4, 2), np.float32)  # shift sample point +1 in x and y
    got = np.asarray(resample2d(jnp.asarray(x), jnp.asarray(flow)))[0, :, :, 0]
    want = np.array([[5, 6, 7, 7], [9, 10, 11, 11], [9, 10, 11, 11]], np.float32)
    np.testing.assert_allclose(got, want)


def test_channel_norm():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 5, 6).astype(np.float32)
    got = np.asarray(channel_norm(jnp.asarray(x)))
    want = np.sqrt((x ** 2).sum(-1, keepdims=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _np_correlation(f1, f2, md, stride2):
    b, h, w, c = f1.shape
    steps = 2 * (md // stride2) + 1
    f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    out = np.zeros((b, h, w, steps * steps), np.float32)
    k = 0
    for iy in range(steps):
        dy = -md + iy * stride2
        for ix in range(steps):
            dx = -md + ix * stride2
            shifted = f2p[:, md + dy : md + dy + h, md + dx : md + dx + w]
            out[..., k] = (f1 * shifted).mean(-1)
            k += 1
    return out


def test_correlation_matches_numpy():
    rng = np.random.RandomState(4)
    f1 = rng.randn(1, 8, 10, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 10, 16).astype(np.float32)
    got = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2), 4, 1))
    want = _np_correlation(f1, f2, 4, 1)
    assert got.shape == (1, 8, 10, 81)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_correlation_stride2_flownetc_shape():
    rng = np.random.RandomState(5)
    f1 = rng.randn(1, 12, 16, 8).astype(np.float32)
    f2 = rng.randn(1, 12, 16, 8).astype(np.float32)
    got = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2), 20, 2))
    want = _np_correlation(f1, f2, 20, 2)
    assert got.shape[-1] == 441
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
