import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vps_tpu.ops import (
    deform_conv2d,
    crop_and_resize_masks,
    paste_masks,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
    accuracy,
)


def _np_deform_conv(x, offset, weight, stride, pad, dil):
    """Direct scalar port of deformable_im2col (deform_conv_cuda_kernel.cu)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho, wo = offset.shape[1], offset.shape[2]
    out = np.zeros((b, ho, wo, cout), np.float32)

    def bil(img, y, xx):
        hh, ww = img.shape
        if y <= -1 or y >= hh or xx <= -1 or xx >= ww:
            return 0.0
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        val = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xc = y0 + dy, x0 + dx
                if 0 <= yy < hh and 0 <= xc < ww:
                    wgt = (1 - abs(y - yy)) * (1 - abs(xx - xc))
                    if wgt > 0:
                        val += wgt * img[yy, xc]
        return val

    for bi in range(b):
        for yo in range(ho):
            for xo in range(wo):
                for i in range(kh):
                    for j in range(kw):
                        k = i * kw + j
                        oy = offset[bi, yo, xo, 2 * k]
                        ox = offset[bi, yo, xo, 2 * k + 1]
                        y = yo * stride - pad + i * dil + oy
                        xx = xo * stride - pad + j * dil + ox
                        for ci in range(cin):
                            v = bil(x[bi, :, :, ci], y, xx)
                            out[bi, yo, xo] += v * weight[i, j, ci]
    return out


def test_deform_conv_matches_scalar_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 7, 3).astype(np.float32)
    offset = (rng.randn(1, 6, 7, 18) * 0.7).astype(np.float32)
    weight = rng.randn(3, 3, 3, 4).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight))
    )
    want = _np_deform_conv(x, offset, weight, 1, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offset_equals_regular_conv():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    weight = rng.randn(3, 3, 4, 6).astype(np.float32)
    offset = np.zeros((2, 8, 8, 18), np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight))
    )
    want = (
        F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(weight).permute(3, 2, 0, 1),
            padding=1,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv_grads_finite():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 5, 5, 2).astype(np.float32))
    offset = jnp.asarray((rng.randn(1, 5, 5, 18) * 0.5).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    gx, go, gw = jax.grad(
        lambda x, o, w: (deform_conv2d(x, o, w) ** 2).sum(), argnums=(0, 1, 2)
    )(x, offset, weight)
    for g in (gx, go, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(go)).sum() > 0  # offsets get gradients (v1 property)


def test_crop_and_resize_masks():
    mask = np.zeros((1, 40, 40), np.float32)
    mask[0, 10:30, 10:30] = 1.0
    boxes = np.array([[10.0, 10.0, 29.0, 29.0]], np.float32)
    out = np.asarray(crop_and_resize_masks(jnp.asarray(mask), jnp.asarray(boxes), 28))
    assert out.shape == (1, 28, 28)
    # interior of the crop is fully inside the mask
    assert np.all(out[0, 4:24, 4:24] > 0.9)


def test_paste_masks_roundtrip():
    m = np.ones((1, 28, 28), np.float32)
    boxes = np.array([[8.0, 4.0, 23.0, 19.0]], np.float32)
    out = np.asarray(paste_masks(jnp.asarray(m), jnp.asarray(boxes), (32, 32)))
    assert out.shape == (1, 32, 32)
    assert out[0, 12, 16] == 1.0  # inside box
    assert out[0, 0, 0] == 0.0  # outside
    inside_sum = out[0, 4:20, 8:24].sum()
    assert inside_sum > 0.9 * 16 * 16


def test_smooth_l1_matches_torch():
    rng = np.random.RandomState(3)
    p = rng.randn(20, 4).astype(np.float32)
    t = rng.randn(20, 4).astype(np.float32)
    got = float(smooth_l1_loss(jnp.asarray(p), jnp.asarray(t), beta=1.0 / 9.0,
                               avg_factor=20.0))
    want = float(
        F.smooth_l1_loss(torch.from_numpy(p), torch.from_numpy(t), beta=1.0 / 9.0,
                         reduction="sum") / 20.0
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_softmax_ce_matches_torch_with_ignore():
    rng = np.random.RandomState(4)
    logits = rng.randn(30, 19).astype(np.float32)
    labels = rng.randint(0, 19, 30)
    labels[:5] = 255
    got = float(
        softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=255)
    )
    want = float(
        F.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(labels), ignore_index=255
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_positive_negative():
    logits = jnp.asarray(np.zeros((4, 3), np.float32))
    labels = jnp.asarray(np.array([0, 1, 2, 3]))  # 0=bg, 1..3 = fg classes
    loss = float(sigmoid_focal_loss(logits, labels, avg_factor=4.0))
    assert loss > 0


def test_accuracy():
    logits = jnp.asarray(np.eye(4, dtype=np.float32) * 5)
    labels = jnp.asarray(np.array([0, 1, 2, 0]))
    assert float(accuracy(logits, labels)) == 0.75


def test_deform_conv_windowed_matches_clamped_gather():
    # in-window offsets: windowed == exact deform conv; out-of-window
    # offsets: windowed == deform conv on clip()ed offsets
    from vps_tpu.ops.deform_conv import deform_conv2d_windowed

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))

    off_in = jnp.asarray((rng.randn(1, 8, 8, 18) * 1.0).astype(np.float32))
    got = deform_conv2d_windowed(x, off_in, weight, 1, 4)
    want = deform_conv2d(x, jnp.clip(off_in, -4.0, 4.0), weight, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    off_big = off_in * 8.0
    got = deform_conv2d_windowed(x, off_big, weight, 1, 4)
    want = deform_conv2d(x, jnp.clip(off_big, -4.0, 4.0), weight, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_windowed_grads_match_clamped_graph():
    from vps_tpu.ops.deform_conv import deform_conv2d_windowed

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    offset = jnp.asarray((rng.randn(1, 6, 6, 18) * 1.5).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))

    def f_win(x, o, w):
        return (deform_conv2d_windowed(x, o, w, 1, 4) ** 2).sum()

    def f_ref(x, o, w):
        return (deform_conv2d(x, jnp.clip(o, -4.0, 4.0), w, padding=1) ** 2).sum()

    gw = jax.grad(f_win, argnums=(0, 1, 2))(x, offset, weight)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, offset, weight)
    for a, b in zip(gw, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_deform_conv_gather_y_path_matches_scalar_reference():
    # cout < cin triggers the gather-from-Y formulation (gathers commute
    # with the tap matmul); must agree with the scalar reference
    rng = np.random.RandomState(5)
    x = rng.randn(1, 6, 7, 5).astype(np.float32)
    offset = (rng.randn(1, 6, 7, 18) * 0.7).astype(np.float32)
    weight = rng.randn(3, 3, 5, 3).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight))
    )
    want = _np_deform_conv(x, offset, weight, 1, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # modulated (v2) mask composes with the gather-y path too
    m = rng.rand(1, 6, 7, 9).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
                      mask=jnp.asarray(m))
    )
    assert np.isfinite(got).all()


def test_deform_conv_large_offsets_boundaries_match_scalar_reference():
    # large offsets drive samples far out of bounds in every direction,
    # exercising the paired-gather boundary selects
    rng = np.random.RandomState(6)
    x = rng.randn(1, 7, 9, 4).astype(np.float32)
    offset = (rng.randn(1, 7, 9, 18) * 6.0).astype(np.float32)
    weight = rng.randn(3, 3, 4, 2).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight))
    )
    want = _np_deform_conv(x, offset, weight, 1, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv_nearest_sampling():
    # nearest = bilinear when sample positions are exactly integral; and
    # equals bilinear-at-rounded-offsets otherwise (grid+tap are integral,
    # so rounding the total position == rounding the offset)
    rng = np.random.RandomState(7)
    x = rng.randn(1, 6, 7, 3).astype(np.float32)
    weight = rng.randn(3, 3, 3, 4).astype(np.float32)

    off_int = np.round(rng.randn(1, 6, 7, 18) * 2).astype(np.float32)
    a = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off_int),
                                 jnp.asarray(weight), sampling="nearest"))
    b = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off_int),
                                 jnp.asarray(weight)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    off = (rng.randn(1, 6, 7, 18) * 1.3).astype(np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(weight), sampling="nearest"))
    off_round = np.asarray(jnp.round(jnp.asarray(off)))  # same tie rule
    want = _np_deform_conv(x, off_round, weight, 1, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
