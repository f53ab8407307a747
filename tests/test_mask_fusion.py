"""mask_removal_and_fuse vs a numpy transcription of the reference pipeline
(MaskRemoval greedy suppression mask_removal.py:23-92 + SegTerm/MaskTerm
instance logits + channel argmax panoptic_fusetrack.py:566-597)."""

import numpy as np
import jax.numpy as jnp

from vps_tpu.models.detectors.panoptic_ops import (
    _paste_logit_window,
    _seg_window,
    mask_removal_and_fuse,
)

NUM_STUFF = 11


def numpy_fusion(det_boxes, det_probs, det_cls, det_valid, det_obj_ids,
                 masks28, fcn, fraction_threshold=0.3):
    hh, ww, nseg = fcn.shape
    num_things = nseg - NUM_STUFF
    order = np.argsort(-np.where(det_valid, det_probs, -np.inf), kind="stable")

    coverage = np.zeros((num_things, hh, ww), bool)
    best_val = fcn[..., :NUM_STUFF].max(-1)
    best_idx = fcn[..., :NUM_STUFF].argmax(-1)
    keep_cls, keep_probs, keep_obj = [], [], []

    for d in order:
        if not det_valid[d]:
            continue
        # paste via the same windowed-resize helper (its own numerics are
        # covered by the detector end-to-end tests)
        vals, window = _paste_logit_window(
            jnp.asarray(masks28[d]), jnp.asarray(det_boxes[d]), (hh, ww))
        vals = np.asarray(vals)
        window = np.asarray(window)
        mask = (vals > 0) & window
        ms = mask.sum()
        plane = coverage[det_cls[d] - 1]
        if ms == 0:
            continue
        if (plane & mask).sum() / ms > fraction_threshold:
            continue
        coverage[det_cls[d] - 1] |= mask
        seg_win = np.asarray(_seg_window(jnp.asarray(det_boxes[d]), (hh, ww)))
        inst = np.where(seg_win, fcn[..., NUM_STUFF - 1 + det_cls[d]], 0.0) \
            + np.where(window, vals, 0.0)
        rank = len(keep_cls)
        better = inst > best_val
        best_val = np.where(better, inst, best_val)
        best_idx = np.where(better, NUM_STUFF + rank, best_idx)
        keep_cls.append(det_cls[d])
        keep_probs.append(det_probs[d])
        keep_obj.append(det_obj_ids[d])
    return best_idx, keep_cls, keep_probs, keep_obj


def test_fusion_matches_numpy():
    rng = np.random.RandomState(0)
    n, hh, ww = 12, 64, 96
    det_boxes = np.zeros((n, 4), np.float32)
    det_boxes[:, 0] = rng.uniform(0, ww - 20, n)
    det_boxes[:, 1] = rng.uniform(0, hh - 20, n)
    det_boxes[:, 2] = det_boxes[:, 0] + rng.uniform(8, 40, n)
    det_boxes[:, 3] = det_boxes[:, 1] + rng.uniform(8, 40, n)
    det_boxes[:, 2] = np.minimum(det_boxes[:, 2], ww - 1)
    det_boxes[:, 3] = np.minimum(det_boxes[:, 3], hh - 1)
    det_probs = rng.uniform(0.3, 1.0, n).astype(np.float32)
    det_cls = rng.randint(1, 9, n).astype(np.int32)
    det_valid = rng.rand(n) > 0.25
    det_obj_ids = np.arange(n, dtype=np.int32)
    masks28 = rng.randn(n, 28, 28).astype(np.float32)
    fcn = rng.randn(hh, ww, 19).astype(np.float32)

    out = mask_removal_and_fuse(
        jnp.asarray(det_boxes), jnp.asarray(det_probs), jnp.asarray(det_cls),
        jnp.asarray(det_valid), jnp.asarray(det_obj_ids),
        jnp.asarray(masks28), jnp.asarray(fcn), num_stuff=NUM_STUFF,
    )
    ref_pan, ref_cls, ref_probs, ref_obj = numpy_fusion(
        det_boxes, det_probs, det_cls, det_valid, det_obj_ids, masks28, fcn)

    nk = int(out.num_keep)
    assert nk == len(ref_cls)
    np.testing.assert_array_equal(np.asarray(out.keep_cls[:nk]), ref_cls)
    np.testing.assert_allclose(np.asarray(out.keep_probs[:nk]), ref_probs,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.keep_obj_ids[:nk]), ref_obj)
    np.testing.assert_array_equal(np.asarray(out.panoptic), ref_pan)


def test_fusion_no_valid_dets():
    hh, ww = 32, 32
    fcn = np.random.RandomState(1).randn(hh, ww, 19).astype(np.float32)
    n = 5
    out = mask_removal_and_fuse(
        jnp.zeros((n, 4)), jnp.zeros((n,)), jnp.ones((n,), jnp.int32),
        jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, 28, 28)), jnp.asarray(fcn), num_stuff=NUM_STUFF,
    )
    assert int(out.num_keep) == 0
    np.testing.assert_array_equal(
        np.asarray(out.panoptic), fcn[..., :NUM_STUFF].argmax(-1))


def test_degenerate_box_paste_is_empty_and_dropped():
    """An inverted/degenerate box (x2 < x0 — possible from delta2bbox at
    wild regression outputs) must paste an EMPTY window: the reference crop
    [x0, x2+1) (mask_removal.py x_0/x_1 slices) is empty even though the
    cv2.resize target is clamped to >= 1, so the mask sum is 0 and
    MaskRemoval drops the det. Regression test for a round-4 bug found by
    test_full_graph_parity: forcing the paste window to >= 1 px kept 11
    degenerate random-weight dets that the reference dropped."""
    hh, ww = 32, 48
    mask28 = jnp.ones((28, 28), jnp.float32)

    # inverted in x, inverted in y, and both
    for box in ([20.0, 5.0, 12.0, 9.0], [10.0, 9.0, 14.0, 3.0],
                [20.0, 9.0, 12.0, 3.0]):
        vals, window = _paste_logit_window(mask28, jnp.asarray(box), (hh, ww))
        assert not bool(np.asarray(window).any()), box
        assert float(np.asarray(vals).sum()) == 0.0, box

    # a 1-px box is still a 1-px PASTE (the clamp applies to the resize
    # target, not the interval)
    vals, window = _paste_logit_window(
        mask28, jnp.asarray([7.0, 5.0, 7.0, 5.0]), (hh, ww))
    assert int(np.asarray(window).sum()) == 1
    assert np.asarray(window)[5, 7]

    # end to end: one valid normal det + one degenerate det -> only the
    # normal one survives MaskRemoval
    n = 2
    det_boxes = np.array([[4, 4, 20, 20], [30.0, 9.0, 22.0, 3.0]], np.float32)
    det_probs = np.array([0.9, 0.95], np.float32)  # degenerate scores HIGHER
    det_cls = np.ones((n,), np.int32)
    det_valid = np.ones((n,), bool)
    det_obj_ids = np.arange(n, dtype=np.int32)
    masks28 = np.full((n, 28, 28), 5.0, np.float32)
    fcn = np.zeros((hh, ww, 19), np.float32)
    out = mask_removal_and_fuse(
        jnp.asarray(det_boxes), jnp.asarray(det_probs), jnp.asarray(det_cls),
        jnp.asarray(det_valid), jnp.asarray(det_obj_ids),
        jnp.asarray(masks28), jnp.asarray(fcn), num_stuff=NUM_STUFF,
    )
    assert int(out.num_keep) == 1
    assert int(np.asarray(out.keep_obj_ids)[0]) == 0
