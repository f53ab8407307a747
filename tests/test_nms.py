import numpy as np
import jax
import jax.numpy as jnp

from vps_tpu.ops import nms, multiclass_nms, soft_nms


def _np_greedy_nms(boxes, scores, thr, offset=1.0):
    """Sequential greedy NMS, the reference CUDA algorithm."""
    order = np.argsort(-scores, kind="stable")
    keep_mask = np.zeros(len(boxes), bool)
    supp = np.zeros(len(boxes), bool)
    for i in order:
        if supp[i]:
            continue
        keep_mask[i] = True
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.clip(x2 - x1 + offset, 0, None)
        h = np.clip(y2 - y1 + offset, 0, None)
        inter = w * h
        area_i = (boxes[i, 2] - boxes[i, 0] + offset) * (
            boxes[i, 3] - boxes[i, 1] + offset
        )
        area = (boxes[:, 2] - boxes[:, 0] + offset) * (
            boxes[:, 3] - boxes[:, 1] + offset
        )
        iou = inter / (area_i + area - inter)
        supp |= iou > thr
        supp[i] = False
    return keep_mask


def _rand(n, rng, size=60.0):
    xy = rng.uniform(0, size, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 25, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_nms_matches_sequential_reference():
    rng = np.random.RandomState(0)
    for trial in range(5):
        boxes, scores = _rand(100, rng)
        keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        want = _np_greedy_nms(boxes, scores, 0.5)
        np.testing.assert_array_equal(keep, want)


def test_nms_respects_valid_mask():
    rng = np.random.RandomState(1)
    boxes, scores = _rand(50, rng)
    valid = rng.rand(50) > 0.4
    keep = np.asarray(
        nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid=jnp.asarray(valid))
    )
    assert not np.any(keep & ~valid)
    want = _np_greedy_nms(boxes[valid], scores[valid], 0.5)
    np.testing.assert_array_equal(keep[valid], want)


def test_nms_is_jittable():
    rng = np.random.RandomState(2)
    boxes, scores = _rand(64, rng)
    f = jax.jit(lambda b, s: nms(b, s, 0.5))
    keep = np.asarray(f(jnp.asarray(boxes), jnp.asarray(scores)))
    want = _np_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, want)


def test_multiclass_nms_shapes_and_scores_sorted():
    rng = np.random.RandomState(3)
    n, c = 200, 9
    boxes = np.tile(_rand(n, rng)[0][:, None, :], (1, c, 1)).reshape(n, c * 4)
    scores = rng.dirichlet(np.ones(c), size=n).astype(np.float32)
    dets, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05, iou_thr=0.5, max_num=40
    )
    dets, labels, valid = map(np.asarray, (dets, labels, valid))
    assert dets.shape == (40, 5) and labels.shape == (40,)
    s = dets[valid, 4]
    assert np.all(np.diff(s) <= 1e-6)
    assert np.all(s > 0.05)
    assert labels[valid].min() >= 0 and labels[valid].max() < c - 1
    # invalid slots zeroed
    assert np.all(dets[~valid] == 0)


def test_soft_nms_decays_overlapping():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    new_scores, keep = soft_nms(jnp.asarray(boxes), jnp.asarray(scores), iou_thr=0.3)
    new_scores = np.asarray(new_scores)
    assert np.isclose(new_scores[0], 0.9)
    assert new_scores[1] < 0.8  # decayed by overlap with box 0
    assert np.isclose(new_scores[2], 0.7)
    assert np.asarray(keep).all()


def test_multiclass_nms_cfg_dispatch():
    """test_cfg.rcnn.nms-style dispatch (reference nms_wrapper.py:52):
    nms_cfg(type='nms') matches the plain path; type='soft_nms' rescored
    outputs keep decayed scores and suppress less than hard NMS."""
    rng = np.random.RandomState(4)
    n, c = 100, 5
    boxes = np.tile(_rand(n, rng)[0][:, None, :], (1, c, 1)).reshape(n, c * 4)
    scores = rng.dirichlet(np.ones(c), size=n).astype(np.float32)
    b, s = jnp.asarray(boxes), jnp.asarray(scores)

    base = multiclass_nms(b, s, score_thr=0.05, iou_thr=0.5, max_num=30)
    via_cfg = multiclass_nms(
        b, s, score_thr=0.05, iou_thr=0.9, max_num=30,
        nms_cfg=dict(type="nms", iou_thr=0.5),  # cfg overrides iou_thr
    )
    for x, y in zip(base, via_cfg):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    sdets, slabels, svalid = multiclass_nms(
        b, s, score_thr=0.05, iou_thr=0.5, max_num=30,
        nms_cfg=dict(type="soft_nms", iou_thr=0.3, min_score=0.05),
    )
    sdets, svalid = np.asarray(sdets), np.asarray(svalid)
    # soft-NMS keeps at least as many boxes (decay instead of suppression)
    assert svalid.sum() >= np.asarray(base[2]).sum()
    ss = sdets[svalid, 4]
    assert np.all(np.diff(ss) <= 1e-6) and np.all(ss > 0.05)
