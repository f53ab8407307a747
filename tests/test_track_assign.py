"""track_assign vs a direct numpy transcription of the reference's greedy
association loop (panoptic_fusetrack.py:400-469 semantics: per-det argmax,
per-slot competition keeps the higher score, losers demoted to new objects).
"""

import numpy as np
import jax.numpy as jnp

from vps_tpu.models.detectors.panoptic_ops import (
    TrackState,
    empty_track_state,
    track_assign,
)


def numpy_track_assign(comp, det_boxes, det_labels, det_feats, det_valid,
                       feats, bboxes, labels, valid, count):
    n, _ = comp.shape
    cap = feats.shape[0]
    obj_ids = np.full((n,), -1, np.int64)
    was_new = np.zeros((n,), bool)
    best_scores = np.full((cap,), -100.0)
    best_ids = np.full((cap,), -1, np.int64)
    match_like = comp.max(1)
    match_ids = comp.argmax(1)

    def insert_new(i):
        nonlocal count
        slot = min(count, cap - 1)
        valid[slot] = True
        count = min(count + 1, cap)
        obj_ids[i] = slot
        was_new[i] = True

    for i in range(n):
        if not det_valid[i]:
            continue
        mid = match_ids[i]
        if mid == 0:
            insert_new(i)
        else:
            obj = min(max(mid - 1, 0), cap - 1)
            score = match_like[i]
            if score > best_scores[obj]:
                prev = best_ids[obj]
                if prev >= 0:
                    obj_ids[prev] = -1
                obj_ids[i] = obj
                best_scores[obj] = score
                best_ids[obj] = i

    for i in range(n):
        if det_valid[i] and obj_ids[i] < 0:
            insert_new(i)

    for i in range(n):
        if det_valid[i] and obj_ids[i] >= 0:
            s = obj_ids[i]
            feats[s] = det_feats[i]
            bboxes[s] = det_boxes[i]
            if was_new[i]:
                labels[s] = det_labels[i]
    return obj_ids, feats, bboxes, labels, valid, count


def _run_case(seed, n=24, cap=16, mem=5):
    rng = np.random.RandomState(seed)
    comp = rng.randn(n, cap + 1).astype(np.float32)
    # only existing memory columns can be finite (detector masks the rest)
    comp[:, 1 + mem:] = -np.inf
    det_boxes = np.abs(rng.randn(n, 4)).astype(np.float32) * 50
    det_boxes[:, 2:] += det_boxes[:, :2] + 5
    det_labels = rng.randint(0, 8, size=(n,)).astype(np.int32)
    det_feats = rng.randn(n, 3, 3, 4).astype(np.float32)
    det_valid = rng.rand(n) > 0.3

    state0 = empty_track_state(cap=cap, feat_hw=3, feat_c=4)
    feats = np.asarray(state0.feats).copy()
    bboxes = np.asarray(state0.bboxes).copy()
    labels = np.asarray(state0.labels).copy()
    valid = np.asarray(state0.valid).copy()
    feats[:mem] = rng.randn(mem, 3, 3, 4)
    bboxes[:mem] = np.abs(rng.randn(mem, 4)) * 50
    labels[:mem] = rng.randint(0, 8, size=(mem,))
    valid[:mem] = True

    state = TrackState(
        jnp.asarray(feats), jnp.asarray(bboxes), jnp.asarray(labels),
        jnp.asarray(valid), jnp.asarray(mem, jnp.int32),
    )
    obj_ids, new_state = track_assign(
        jnp.asarray(comp), jnp.asarray(det_boxes), jnp.asarray(det_labels),
        jnp.asarray(det_feats), jnp.asarray(det_valid), state,
    )

    ref_ids, rfeats, rboxes, rlabels, rvalid, rcount = numpy_track_assign(
        comp, det_boxes, det_labels, det_feats, det_valid,
        feats.copy(), bboxes.copy(), labels.copy(), valid.copy(), mem,
    )

    got = np.asarray(obj_ids)
    want = np.where(det_valid, ref_ids, -1)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(np.asarray(new_state.feats), rfeats, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.bboxes), rboxes, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(new_state.labels), rlabels)
    np.testing.assert_array_equal(np.asarray(new_state.valid), rvalid)
    assert int(new_state.count) == rcount


def test_track_assign_matches_numpy_greedy():
    for seed in range(8):
        _run_case(seed)


def test_track_assign_capacity_overflow():
    # more new objects than free slots: count saturates at cap
    _run_case(99, n=40, cap=8, mem=6)


def test_track_assign_all_new_on_empty_memory():
    n, cap = 10, 16
    comp = np.full((n, cap + 1), -np.inf, np.float32)
    comp[:, 0] = 0.0  # dummy column wins -> all new
    det_boxes = np.tile(np.array([0, 0, 10, 10], np.float32), (n, 1))
    det_feats = np.zeros((n, 3, 3, 4), np.float32)
    det_labels = np.arange(n, dtype=np.int32)
    det_valid = np.ones((n,), bool)
    state = empty_track_state(cap=cap, feat_hw=3, feat_c=4)
    obj_ids, new_state = track_assign(
        jnp.asarray(comp), jnp.asarray(det_boxes), jnp.asarray(det_labels),
        jnp.asarray(det_feats), jnp.asarray(det_valid), state,
    )
    np.testing.assert_array_equal(np.asarray(obj_ids), np.arange(n))
    assert int(new_state.count) == n
    np.testing.assert_array_equal(
        np.asarray(new_state.labels[:n]), np.arange(n))
