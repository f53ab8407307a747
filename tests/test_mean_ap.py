"""Tests for the detection mAP/recall evaluator and observability utils."""

import numpy as np


def test_average_precision_area():
    from vps_tpu.eval.mean_ap import average_precision

    rec = np.asarray([0.25, 0.5, 0.75, 1.0])
    prec = np.asarray([1.0, 1.0, 1.0, 1.0])
    assert abs(float(average_precision(rec, prec)) - 1.0) < 1e-6
    prec2 = np.asarray([1.0, 0.5, 0.5, 0.25])
    v = float(average_precision(rec, prec2))
    assert 0 < v < 1


def test_tpfp_basic():
    from vps_tpu.eval.mean_ap import tpfp_default

    gts = np.asarray([[0, 0, 10, 10]], np.float32)
    dets = np.asarray(
        [[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8], [50, 50, 60, 60, 0.7]],
        np.float32,
    )
    tp, fp = tpfp_default(dets, gts, iou_thr=0.5)
    assert tp.tolist() == [1, 0, 0]
    assert fp.tolist() == [0, 1, 1]


def test_eval_map_perfect():
    from vps_tpu.eval.mean_ap import eval_map

    gt_b = [np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)]
    gt_l = [np.asarray([1, 2])]
    det = [[
        np.asarray([[0, 0, 10, 10, 0.9]], np.float32),   # class 1
        np.asarray([[20, 20, 40, 40, 0.8]], np.float32),  # class 2
    ]]
    m, per_cls = eval_map(det, gt_b, gt_l, print_summary=False)
    assert abs(m - 1.0) < 1e-6
    assert per_cls[0]["num_gts"] == 1


def test_eval_map_ignores():
    from vps_tpu.eval.mean_ap import eval_map

    gt_b = [np.asarray([[0, 0, 10, 10], [100, 100, 120, 120]], np.float32)]
    gt_l = [np.asarray([1, 1])]
    ignore = [np.asarray([False, True])]
    det = [[np.asarray([[0, 0, 10, 10, 0.9],
                        [100, 100, 120, 120, 0.8]], np.float32)]]
    m, per_cls = eval_map(det, gt_b, gt_l, gt_ignore=ignore,
                          print_summary=False)
    # the ignored gt absorbs its detection without fp; single real gt found
    assert abs(m - 1.0) < 1e-6
    assert per_cls[0]["num_gts"] == 1


def test_eval_recalls():
    from vps_tpu.eval.mean_ap import eval_recalls

    gts = [np.asarray([[0, 0, 10, 10]], np.float32)]
    props = [np.asarray([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.1]],
                        np.float32)]
    r = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    assert r.shape == (2, 1)
    assert r[0, 0] == 1.0 and r[1, 0] == 1.0


def test_speedometer_and_metric():
    from vps_tpu.utils.metrics import EvalMetric, Speedometer, Timer

    m = EvalMetric()
    m.update({"loss": 2.0})
    m.update({"loss": 4.0})
    assert m.get()["loss"] == 3.0

    s = Speedometer(frequent=2)
    assert s(1) is None  # init call
    assert s(1) is None
    v = s(1)
    assert v is None or v > 0  # window boundary

    t = Timer()
    t.tic()
    assert t.toc() >= 0
    assert t.calls == 1


def test_colormap():
    from vps_tpu.utils.metrics import colormap

    c = colormap(10)
    assert c.shape == (10, 3)
    assert c.min() >= 0 and c.max() <= 255
    # colors distinct
    assert len({tuple(r) for r in c.astype(int).tolist()}) == 10
