import numpy as np
import jax.numpy as jnp

from vps_tpu.ops import roi_align, multilevel_roi_align


def _np_bilinear(data, h, w, y, x):
    """Reference kernel's bilinear_interpolate (roi_align_kernel.cu:17-61)."""
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * data[y_low, x_low]
        + hy * lx * data[y_low, x_high]
        + ly * hx * data[y_high, x_low]
        + ly * lx * data[y_high, x_high]
    )


def _np_roi_align(feat, rois, scale, out_size, sn):
    """Direct port of ROIAlignForward (roi_align_kernel.cu:64-124)."""
    h, w, c = feat.shape
    r = rois.shape[0]
    out = np.zeros((r, out_size, out_size, c), np.float32)
    for n in range(r):
        sw = rois[n, 0] * scale
        sh = rois[n, 1] * scale
        ew = (rois[n, 2] + 1) * scale
        eh = (rois[n, 3] + 1) * scale
        rw = max(ew - sw, 0.0)
        rh = max(eh - sh, 0.0)
        bh = rh / out_size
        bw = rw / out_size
        for ph in range(out_size):
            for pw in range(out_size):
                for ch in range(c):
                    val = 0.0
                    for iy in range(sn):
                        y = sh + ph * bh + (iy + 0.5) * bh / sn
                        for ix in range(sn):
                            x = sw + pw * bw + (ix + 0.5) * bw / sn
                            val += _np_bilinear(feat[:, :, ch], h, w, y, x)
                    out[n, ph, pw, ch] = val / (sn * sn)
    return out


def test_roi_align_matches_cuda_reference_port():
    rng = np.random.RandomState(0)
    feat = rng.randn(16, 20, 3).astype(np.float32)
    rois = np.array(
        [
            [4.0, 4.0, 28.0, 28.0],
            [0.0, 0.0, 79.0, 63.0],
            [10.5, 7.25, 40.0, 30.0],
            [70.0, 50.0, 90.0, 80.0],  # partially outside
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2))
    want = _np_roi_align(feat, rois, 0.25, 7, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_multilevel_matches_per_level():
    rng = np.random.RandomState(1)
    strides = [4, 8, 16, 32]
    feats = [rng.randn(64 // (s // 4), 80 // (s // 4), 8).astype(np.float32) for s in strides]
    # boxes sized to hit all 4 levels: scale thresholds at 112/224/448
    sizes = [50, 150, 300, 600]
    rois = np.stack(
        [np.array([10, 10, 10 + s - 1, 10 + s - 1], np.float32) for s in sizes]
    )
    got = np.asarray(
        multilevel_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(rois), strides, 7, 2
        )
    )
    for i, (s, lvl) in enumerate(zip(sizes, [0, 1, 2, 3])):
        want = _np_roi_align(feats[lvl], rois[i : i + 1], 1.0 / strides[lvl], 7, 2)
        np.testing.assert_allclose(got[i], want[0], rtol=1e-4, atol=1e-5)


def test_roi_align_grad_flows():
    import jax

    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(8, 8, 4).astype(np.float32))
    rois = jnp.asarray(np.array([[2.0, 2.0, 20.0, 20.0]], np.float32))

    def f(feat):
        return roi_align(feat, rois, 0.25, 7, 2).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_nearest_sampling_matches_bilinear_at_integer_coords():
    """fast-preset knob: with the ROI laid out so every in-bin sample lands
    exactly on a pixel center, bilinear degenerates to the one corner and
    nearest must agree with it bitwise."""
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(32, 32, 4).astype(np.float32))
    # +1 end offset: roi_w = x2 + 1 = 2*out -> bin = 2; sn=1 sample offsets
    # p + 0.5 -> x = 2p + 1, integers.
    out = 7
    rois = jnp.asarray(np.array([[0.0, 0.0, 2.0 * out - 1, 2.0 * out - 1]],
                                np.float32))
    near = roi_align(feat, rois, 1.0, out, sample_num=1, sampling="nearest")
    bilin = roi_align(feat, rois, 1.0, out, sample_num=1)
    np.testing.assert_allclose(np.asarray(near), np.asarray(bilin),
                               rtol=0, atol=0)


def test_nearest_sampling_multilevel_shape_and_validity():
    rng = np.random.RandomState(4)
    strides = [4, 8]
    feats = [jnp.asarray(rng.randn(16 // (s // 4), 20 // (s // 4), 8)
                         .astype(np.float32)) for s in strides]
    rois = jnp.asarray(np.array([[4.0, 4.0, 40.0, 40.0],
                                 [0.0, 0.0, 60.0, 60.0]], np.float32))
    valid = jnp.asarray(np.array([True, False]))
    got = multilevel_roi_align(feats, rois, strides, 7, 1, valid=valid,
                               sampling="nearest")
    assert got.shape == (2, 7, 7, 8)
    assert np.abs(np.asarray(got[1])).max() == 0.0
    assert np.isfinite(np.asarray(got)).all()


def test_custom_vjp_backward_matches_autodiff():
    """The hand-written features-only scatter backward (custom_vjp, the
    reference roi_align_kernel.cu backward semantics) must equal autodiff
    of the same forward — including degenerate/padded/off-image ROIs and a
    masked valid row."""
    import jax
    from vps_tpu.ops.roi_align import multilevel_roi_align_autodiff

    rng = np.random.RandomState(7)
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(32 // (s // 4), 24 // (s // 4), 6)
                         .astype(np.float32)) for s in strides]
    rois = jnp.asarray(np.array(
        [[4.0, 4.0, 40.0, 40.0],
         [0.0, 0.0, 0.0, 0.0],          # padded slot
         [10.0, 10.0, 9.0, 9.0],        # degenerate (x2 < x1)
         [-30.0, -30.0, -5.0, -5.0],    # fully off-image
         [0.0, 0.0, 120.0, 90.0],       # big -> coarse level
         [2.0, 2.0, 2.4, 2.6]],         # sub-pixel
        np.float32))
    valid = jnp.asarray(np.array([1, 0, 1, 1, 1, 1], np.float32))
    ct = jnp.asarray(rng.randn(6, 7, 7, 6).astype(np.float32))

    def loss_custom(fs):
        return jnp.sum(multilevel_roi_align(fs, rois, strides, 7, 2,
                                            valid=valid) * ct)

    def loss_ad(fs):
        return jnp.sum(multilevel_roi_align_autodiff(fs, rois, strides, 7, 2,
                                                     valid=valid) * ct)

    g_custom = jax.grad(loss_custom)(feats)
    g_ad = jax.grad(loss_ad)(feats)
    for gc, ga in zip(g_custom, g_ad):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                   rtol=1e-5, atol=1e-5)
    # forward parity too
    np.testing.assert_allclose(
        np.asarray(multilevel_roi_align(feats, rois, strides, 7, 2,
                                        valid=valid)),
        np.asarray(multilevel_roi_align_autodiff(feats, rois, strides, 7, 2,
                                                 valid=valid)),
        rtol=0, atol=0)


def test_custom_vjp_backward_under_vmap_and_bf16():
    """The detector vmaps the loss over the device batch and runs the
    gathers in bf16 — the custom backward must batch and cast correctly."""
    import jax

    rng = np.random.RandomState(8)
    strides = [4, 8]
    feats = [jnp.asarray(rng.randn(2, 16 // (s // 4), 12 // (s // 4), 4)
                         .astype(np.float32)) for s in strides]
    # image frame is 64x48 (level-0 16x12 at stride 4): keep boxes inside
    xy = rng.rand(2, 5, 2).astype(np.float32) * np.array([24.0, 32.0],
                                                         np.float32)
    wh = 2.0 + rng.rand(2, 5, 2).astype(np.float32) * 12.0
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    ct = jnp.asarray(rng.randn(2, 5, 7, 7, 4).astype(np.float32))

    def one(fs, r, c):
        out = multilevel_roi_align([f.astype(jnp.bfloat16) for f in fs],
                                   r, strides, 7, 2).astype(jnp.float32)
        return jnp.sum(out * c)

    def batched(fs):
        return jnp.sum(jax.vmap(one, in_axes=(0, 0, 0))(fs, rois, ct))

    g = jax.grad(batched)(feats)
    for leaf in g:
        assert leaf.shape[0] == 2
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    # small boxes all map to level 0 — that level must carry signal
    assert np.abs(np.asarray(g[0], np.float32)).max() > 0
