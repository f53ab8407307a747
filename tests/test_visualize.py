"""utils/visualize.py + utils/timer.py — the reference's show_result /
imshow_det_bboxes / lib-colormap / lib-timer surface."""
import numpy as np
import pytest

from vps_tpu.utils.timer import Timer
from vps_tpu.utils.visualize import (colormap, draw_detections, palette,
                                     panoptic_to_color, show_result)


def test_palette_deterministic_prefix_and_distinct():
    p8 = palette(8)
    p64 = palette(64)
    assert p8.shape == (8, 3) and p8.dtype == np.uint8
    assert np.array_equal(p64[:8], p8)
    # consecutive colors must be visually distinct
    d = np.abs(p64.astype(int)[1:] - p64.astype(int)[:-1]).sum(-1)
    assert (d > 60).all()
    assert colormap().shape == (79, 3)


def test_draw_detections_thresholds_and_writes(tmp_path):
    img = np.zeros((64, 96, 3), np.uint8)
    boxes = np.array([[4, 4, 40, 30, 0.9], [10, 10, 80, 60, 0.1]], np.float32)
    labels = np.array([2, 5])
    out = tmp_path / "det.png"
    drawn = draw_detections(img, boxes, labels, score_thr=0.3,
                            class_names=["a", "b", "c", "d", "e", "f"],
                            out_file=str(out))
    assert drawn.shape == img.shape and out.exists()
    # the 0.9 box got drawn, the 0.1 box suppressed
    assert drawn[4, 4:41].any() and not drawn[60, 79].any()


def test_draw_detections_masks_blend():
    img = np.full((32, 32, 3), 200, np.uint8)
    boxes = np.array([[2, 2, 20, 20]], np.float32)
    masks = np.zeros((1, 32, 32), bool)
    masks[0, 5:15, 5:15] = True
    drawn = draw_detections(img, boxes, np.array([0]), masks=masks,
                            score_thr=0.0)
    assert not np.array_equal(drawn[8, 8], img[8, 8])  # blended
    assert np.array_equal(drawn[30, 30], img[30, 30])  # untouched


def test_show_result_fixed_capacity_dict(tmp_path):
    img = np.zeros((48, 48, 3), np.uint8)
    outputs = dict(
        det_bboxes=np.array([[1, 1, 30, 30], [0, 0, 0, 0]], np.float32),
        det_scores=np.array([0.8, 0.0], np.float32),
        det_labels=np.array([1, 0]),
        num_keep=1,
    )
    drawn = show_result(img, outputs, out_file=str(tmp_path / "r.png"))
    assert drawn.any()


def test_panoptic_to_color_separates_categories_and_instances():
    pan = np.array([[7000, 7001], [11000, 0]])
    col = panoptic_to_color(pan)
    assert col.shape == (2, 2, 3)
    assert not np.array_equal(col[0, 0], col[1, 0])  # different category
    assert not np.array_equal(col[0, 0], col[0, 1])  # same cat, diff inst


def test_timer_accumulates_and_context():
    t = Timer()
    with t:
        pass
    t.tic()
    v = t.toc(average=False)
    assert v >= 0 and t.calls == 2 and t.average > 0 or t.average >= 0
    with pytest.raises(RuntimeError):
        Timer().toc()
