"""Aug-test (TTA) merge path: detector.predict_aug implements the
reference's test_mixins.py:43-110 + core/post_processing/merge_augs.py
semantics (proposal NMS-merge, box/score averaging, ROI-space mask unflip,
semantic logit mean) on static shapes.

The strongest check available with random weights: a SINGLE identity
variant must reduce every merge to a no-op, so predict_aug(V=1) must
reproduce predict() exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from vps_tpu import zoo
from vps_tpu.models.detectors import PanopticFuseTrack, empty_track_state
from vps_tpu.ops.box import bbox_flip

H, W = 64, 128


def _detector():
    cfg = zoo.tiny_overrides(zoo.fusetrack_model_cfg())
    cfg.pop("type")
    return PanopticFuseTrack(
        train_cfg=zoo.tiny_train_cfg(), test_cfg=zoo.tiny_test_cfg(), **cfg
    )


def _init(det, img):
    state = empty_track_state(cap=16)
    variables = det.init(
        {"params": jax.random.PRNGKey(0)}, img, img, state,
        method=det.predict,
    )
    return variables, state


def test_box_map_roundtrip():
    boxes = jnp.asarray(
        [[10.0, 5.0, 40.0, 30.0], [0.0, 0.0, 20.0, 20.0]])
    for flip in (False, True):
        for ratio in (1.0, 0.5):
            into = PanopticFuseTrack._map_boxes_into(
                boxes, flip, ratio, (H, W))
            back = PanopticFuseTrack._map_boxes_back(
                into, flip, ratio, (H, W))
            np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                                       atol=1e-5)
    # flip convention matches bbox_flip (legacy -1)
    f = np.asarray(bbox_flip(boxes, (H, W)))
    assert f[0, 0] == W - boxes[0, 2] - 1


def test_predict_aug_single_identity_variant_matches_predict():
    det = _detector()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    ref = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    variables, state = _init(det, img)

    out_plain, st_plain = det.apply(
        variables, img, ref, state, method=det.predict)
    metas = (dict(flip=False, scale_ratio=1.0, img_shape=(H, W)),)
    out_aug, st_aug = det.apply(
        variables, img[None], ref[None], state, metas,
        method=det.predict_aug)

    # aug_test(V=1) is NOT bit-identical to simple_test even in the
    # reference: merge_aug_proposals re-NMSes the proposal pool ACROSS
    # levels (merge_augs.py:30-37), while the simple path NMSes per level
    # (nms_across_levels=False). So assert near-agreement + the parts that
    # must be exact.
    # semantic path has no NMS dependence → exact
    np.testing.assert_array_equal(
        np.asarray(out_plain["fcn_outputs"]), np.asarray(out_aug["fcn_outputs"]))
    assert abs(int(out_plain["num_keep"]) - int(out_aug["num_keep"])) <= 2
    pp = np.asarray(out_plain["panoptic_outputs"])
    pa = np.asarray(out_aug["panoptic_outputs"])
    # any disagreement must come from differing instance channels (the
    # re-NMSed det set), never from the stuff/semantic path
    diff = pp != pa
    num_stuff = 11
    assert np.all((pp[diff] >= num_stuff) | (pa[diff] >= num_stuff))
    # ...and wherever BOTH paths label a pixel as stuff, the label comes
    # from the (bit-identical) fcn path, so it must agree EXACTLY. (A raw
    # pixel-agreement threshold is NOT asserted: with random weights the
    # across-levels re-NMS keeps a near-tie-dependent det set, and a single
    # large flipped det moves whole-image agreement discretely — measured
    # 0.95 -> 0.55 from an XLA:CPU codegen change alone; see CLAUDE.md on
    # cross-graph near-tie assertions.)
    both_stuff = (pp < num_stuff) & (pa < num_stuff)
    np.testing.assert_array_equal(pp[both_stuff], pa[both_stuff])
    # both paths produce dets; valid counts close
    assert abs(int(np.asarray(out_plain["det_valid"]).sum())
               - int(np.asarray(out_aug["det_valid"]).sum())) <= 2
    assert np.asarray(st_aug.valid).sum() >= 1


def test_predict_aug_flip_variant_runs_and_merges():
    det = _detector()
    rng = np.random.RandomState(1)
    img = rng.randn(1, H, W, 3).astype(np.float32)
    ref = rng.randn(1, H, W, 3).astype(np.float32)
    variables, state = _init(det, jnp.asarray(img))

    imgs = jnp.asarray(np.stack([img, img[:, :, ::-1]]))
    refs = jnp.asarray(np.stack([ref, ref[:, :, ::-1]]))
    metas = (
        dict(flip=False, scale_ratio=1.0, img_shape=(H, W)),
        dict(flip=True, scale_ratio=1.0, img_shape=(H, W)),
    )
    out, new_state = det.apply(
        variables, imgs, refs, state, metas, method=det.predict_aug)
    assert out["panoptic_outputs"].shape == (H, W)
    assert out["fcn_outputs"].shape == (H, W)
    dv = np.asarray(out["det_valid"])
    boxes = np.asarray(out["det_bboxes"])[dv]
    if boxes.size:
        assert boxes[:, 0].min() >= 0 and boxes[:, 2].max() <= W - 1
    assert np.isfinite(np.asarray(out["panoptic_cls_prob"])).all()


def test_box_map_matches_reference_bbox_mapping():
    """_map_boxes_into/_map_boxes_back vs a numpy transcription of the
    reference bbox_mapping/bbox_mapping_back (core/bbox/transforms.py:71-103)
    at unequal scales: flip happens over the VARIANT's img_shape."""

    def ref_flip(b, shape):
        out = b.copy()
        out[..., 0] = shape[1] - b[..., 2] - 1
        out[..., 2] = shape[1] - b[..., 0] - 1
        return out

    def ref_mapping(b, shape, sf, flip):
        nb = b * sf
        return ref_flip(nb, shape) if flip else nb

    def ref_mapping_back(b, shape, sf, flip):
        nb = ref_flip(b, shape) if flip else b
        return nb / sf

    rng = np.random.RandomState(3)
    boxes = np.zeros((16, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, W - 20, 16)
    boxes[:, 1] = rng.uniform(0, H - 20, 16)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(4, 19, 16)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(4, 19, 16)
    jb = jnp.asarray(boxes)
    for ratio in (0.5, 1.0, 1.5):
        hv, wv = int(round(H * ratio)), int(round(W * ratio))
        for flip in (False, True):
            into = np.asarray(PanopticFuseTrack._map_boxes_into(
                jb, flip, ratio, (hv, wv)))
            want = ref_mapping(boxes, (hv, wv), ratio, flip)
            np.testing.assert_allclose(into, want, atol=1e-4)
            back = np.asarray(PanopticFuseTrack._map_boxes_back(
                jnp.asarray(want), flip, ratio, (hv, wv)))
            np.testing.assert_allclose(
                back, ref_mapping_back(want, (hv, wv), ratio, flip),
                atol=1e-4)
            np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_predict_aug_multiscale_variants_run_and_merge():
    """Three variants on one canvas — canonical, half-scale, half-scale
    flipped — exercise the scale_ratio mapping + content-region flips."""
    det = _detector()
    rng = np.random.RandomState(4)
    img = rng.randn(H, W, 3).astype(np.float32)
    ref = rng.randn(H, W, 3).astype(np.float32)

    import cv2

    def variant(src, ratio, flip):
        hv, wv = int(H * ratio), int(W * ratio)
        v = cv2.resize(src, (wv, hv), interpolation=cv2.INTER_LINEAR)
        if flip:
            v = v[:, ::-1]
        canvas = np.zeros((H, W, 3), np.float32)
        canvas[:hv, :wv] = v
        return canvas

    metas = (
        dict(flip=False, scale_ratio=1.0, img_shape=(H, W)),
        dict(flip=False, scale_ratio=0.5, img_shape=(H // 2, W // 2)),
        dict(flip=True, scale_ratio=0.5, img_shape=(H // 2, W // 2)),
    )
    imgs = jnp.asarray(np.stack(
        [variant(img, m["scale_ratio"], m["flip"]) for m in metas]
    )[:, None])
    refs = jnp.asarray(np.stack(
        [variant(ref, m["scale_ratio"], m["flip"]) for m in metas]
    )[:, None])

    variables, state = _init(det, imgs[0])
    out, new_state = det.apply(
        variables, imgs, refs, state, metas, method=det.predict_aug)
    assert out["panoptic_outputs"].shape == (H, W)
    assert out["fcn_outputs"].shape == (H, W)
    assert np.isfinite(np.asarray(out["panoptic_cls_prob"])).all()
    dv = np.asarray(out["det_valid"])
    boxes = np.asarray(out["det_bboxes"])[dv]
    if boxes.size:
        # merged dets live in the canonical frame
        assert boxes[:, 0].min() >= 0 and boxes[:, 2].max() <= W - 1
        assert boxes[:, 1].min() >= 0 and boxes[:, 3].max() <= H - 1
