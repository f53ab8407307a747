"""VIPER evaluation parity: the reference's ``Viper.evaluate_panoptic``
(/root/reference/tools/dataset/viper.py:171-377) specifics — consecutive-
frame windows {1,5,10,15}, the SIZE_THR=32² small-GT skip, per-window
result tables — exercised on a synthetic 2-video fixture end to end
(2ch maps → encode_panoptic_video → VPQ), plus the ViperDataset subclass
deriving its classes from the json categories."""

import json
import os

import numpy as np
import pytest

from vps_tpu.eval.viper import (
    SIZE_THR,
    default_viper_categories,
    evaluate_panoptic_viper,
    viper_vpq_compute,
)
from vps_tpu.eval.unified import encode_panoptic_video
from vps_tpu.eval.vpq import vpq_compute_video

H, W = 64, 64
NUM_STUFF = 13  # viper.py:100-102: 23 semantic classes, 10 things


def _2ch(sem, track):
    """(H, W, 3) 2ch map: ch0 semantic, ch2 track id (0 = stuff)."""
    out = np.zeros((H, W, 3), np.uint8)
    out[..., 0] = sem
    out[..., 2] = track
    return out


def _frame(inst_box, thing_cls=13, track_id=1, stuff_cls=2):
    """Stuff everywhere except one thing instance in `inst_box`."""
    sem = np.full((H, W), stuff_cls, np.uint8)
    track = np.zeros((H, W), np.uint8)
    y0, x0, y1, x1 = inst_box
    sem[y0:y1, x0:x1] = thing_cls
    track[y0:y1, x0:x1] = track_id
    return _2ch(sem, track)


def _gt_from_2ch(frames_2ch, categories):
    """GT in (gt_json, gt_pan_rgb) pairs via the same encoder the
    reference uses for both sides (converter_2ch_single_core)."""
    pans, anns = encode_panoptic_video(frames_2ch, categories)
    return list(zip(anns, pans))


def test_viper_perfect_prediction_all_windows(tmp_path):
    cats = default_viper_categories()
    # 2 videos x 5 frames, instance 40x40=1600px > SIZE_THR, drifting
    videos_2ch = [
        [_frame((10, 5 + 2 * t, 50, 45 + 2 * t), track_id=1 + v)
         for t in range(5)]
        for v in range(2)
    ]
    gt_videos = [_gt_from_2ch(v, cats) for v in videos_2ch]
    out = str(tmp_path / "viper_out")
    results = evaluate_panoptic_viper(
        videos_2ch, gt_videos, categories=cats, output_dir=out,
        windows=(1, 5),
    )
    for nf in (1, 5):
        assert abs(results[nf]["All"]["pq"] - 1.0) < 1e-6
        assert abs(results[nf]["Things"]["pq"] - 1.0) < 1e-6
        assert abs(results[nf]["Stuff"]["pq"] - 1.0) < 1e-6
        table = os.path.join(out, f"viper_vpq_nf{nf:02d}.txt")
        assert os.path.exists(table)
        txt = open(table).read()
        assert f"for {nf}-frames" in txt and "Things" in txt

    # track-id identity must hold across the 5-frame window: re-encode
    # predictions with a switched id mid-video and the nf=5 tube splits
    switched = [list(v) for v in videos_2ch]
    for t in range(2, 5):
        f = switched[0][t].copy()
        f[..., 2][f[..., 2] == 1] = 9
        switched[0][t] = f
    res_sw = evaluate_panoptic_viper(
        switched, gt_videos, categories=cats, windows=(1, 5))
    assert abs(res_sw[1]["Things"]["pq"] - 1.0) < 1e-6  # per-frame fine
    assert res_sw[5]["Things"]["pq"] < 1.0  # tube split detected


def test_viper_size_thr_skips_small_gt():
    """GT tubes smaller than 32² pixels neither match nor count as FN
    (viper.py:449-451, 482-483) — unlike the Cityscapes-VPS protocol."""
    cats = default_viper_categories()
    stuff_cls, thing_cls = 2, 13
    # GT: one LARGE (40x40) + one SMALL (8x8=64px < 1024) instance
    sem = np.full((H, W), stuff_cls, np.uint8)
    track = np.zeros((H, W), np.uint8)
    sem[10:50, 10:50] = thing_cls
    track[10:50, 10:50] = 1
    sem[55:63, 55:63] = thing_cls
    track[55:63, 55:63] = 2
    gt_2ch = _2ch(sem, track)
    # pred: only the large instance (small one entirely missed)
    pred_2ch = _frame((10, 10, 50, 50), thing_cls=thing_cls, track_id=1,
                      stuff_cls=stuff_cls)

    gt_video = _gt_from_2ch([gt_2ch], cats)
    pred_pans, pred_anns = encode_panoptic_video([pred_2ch], cats)
    frames = [(gt_video[0][0], pred_anns[0], gt_video[0][1], pred_pans[0])]

    # VIPER protocol: small GT skipped -> large TP, no FN
    stat = vpq_compute_video(frames, cats, nframes=1, size_thr=SIZE_THR)
    assert stat[thing_cls].tp == 1
    assert stat[thing_cls].fn == 0
    # Cityscapes-VPS protocol (no size filter): the missed small GT is a FN
    stat0 = vpq_compute_video(frames, cats, nframes=1, size_thr=0)
    assert stat0[thing_cls].tp == 1
    assert stat0[thing_cls].fn == 1

    res, per_class = viper_vpq_compute([frames], cats, nframes=1)
    assert abs(res["Things"]["pq"] - 1.0) < 1e-6


def test_viper_size_thr_is_tube_area():
    """The threshold applies to the TUBE area (sum over the window,
    viper.py:436-449: per-frame areas merged then compared) — a 20x20
    instance (400px < 1024) becomes a valid 2000px tube over 5 frames."""
    cats = default_viper_categories()
    frames_2ch = [_frame((20, 20, 40, 40)) for _ in range(5)]
    gt_video = _gt_from_2ch(frames_2ch, cats)
    pred_pans, pred_anns = encode_panoptic_video(frames_2ch, cats)
    frames = [
        (g[0], pa, g[1], pp)
        for g, pa, pp in zip(gt_video, pred_anns, pred_pans)
    ]
    thing_cls = 13
    # nf=1: 400px < SIZE_THR -> skipped entirely
    s1 = vpq_compute_video(frames, cats, nframes=1, size_thr=SIZE_THR)
    assert s1[thing_cls].tp == 0 and s1[thing_cls].fn == 0
    # nf=5: 2000px tube > SIZE_THR -> matched
    s5 = vpq_compute_video(frames, cats, nframes=5, size_thr=SIZE_THR)
    assert s5[thing_cls].tp == 1


def test_viper_evaluate_panoptic_from_files(tmp_path):
    """File-level Viper.evaluate_panoptic plumbing (viper.py:171-363):
    GT loaded from a panoptic json + color-PNG folder, predictions encoded
    per video, pan/pan_2ch artifact folders + gt/pred json dumps written,
    image-PQ (nf=1) and vpq tables produced."""
    cv2 = pytest.importorskip("cv2")
    from vps_tpu.eval.viper import evaluate_panoptic_from_files

    cats = default_viper_categories()
    n_video, nframes = 2, 4
    videos_2ch = [
        [_frame((10, 5 + 2 * t, 50, 45 + 2 * t), track_id=1 + v)
         for t in range(nframes)]
        for v in range(n_video)
    ]
    flat_2ch = [f for v in videos_2ch for f in v]

    # GT side on disk: color PNGs via the same converter + panoptic json
    gt_dir = str(tmp_path / "gt_viper_pans")
    os.makedirs(gt_dir)
    images, annotations = [], []
    k = 0
    for v2ch in videos_2ch:
        pans, anns = encode_panoptic_video(v2ch, cats)
        for pan, ann in zip(pans, anns):
            name = f"{k // nframes:03d}_{k % nframes:05d}.jpg"
            cv2.imwrite(os.path.join(gt_dir, name.replace(".jpg", ".png")),
                        pan[..., ::-1])
            images.append(dict(id=k, file_name=name, height=H, width=W))
            annotations.append(dict(ann, image_id=k))
            k += 1
    gt_json_file = str(tmp_path / "gt.json")
    with open(gt_json_file, "w") as f:
        json.dump(dict(
            images=images, annotations=annotations,
            categories=list(cats.values()),
        ), f)

    out = str(tmp_path / "viper_out")
    results = evaluate_panoptic_from_files(
        flat_2ch, out, gt_json_file, gt_dir, n_video=n_video,
        windows=(1, 4),
    )
    for nf in (1, 4):
        assert abs(results[nf]["All"]["pq"] - 1.0) < 1e-6, results[nf]["All"]
        assert os.path.exists(os.path.join(out, f"viper_vpq_nf{nf:02d}.txt"))
    for sub in ("pan", "pan_2ch"):
        files = os.listdir(os.path.join(out, sub))
        assert len(files) == n_video * nframes, (sub, files)
    assert os.path.exists(os.path.join(out, "gt.json"))
    with open(os.path.join(out, "pred.json")) as f:
        pred = json.load(f)
    assert len(pred["annotations"]) == n_video * nframes


def test_viper_dataset_classes_from_json(tmp_path):
    """ViperDataset derives CLASSES from the json's categories
    (viper.py:100-102) instead of the hardcoded Cityscapes list."""
    cv2 = pytest.importorskip("cv2")
    from vps_tpu.data.dataset import build_dataset

    img_dir = str(tmp_path / "img")
    os.makedirs(img_dir)
    names = []
    for vid in range(2):
        for t in range(2):
            name = f"{vid:03d}_{t:05d}.png"
            cv2.imwrite(os.path.join(img_dir, name),
                        np.zeros((H, W, 3), np.uint8))
            names.append(name)
    images = [
        dict(id=i + 1, file_name=n, height=H, width=W)
        for i, n in enumerate(names)
    ]
    viper_things = ["car", "truck", "bus", "train", "moped", "motorcycle",
                    "bicycle", "person", "rider", "van"]
    categories = [dict(id=i + 1, name=n) for i, n in enumerate(viper_things)]
    annotations = [dict(
        id=1, image_id=1, category_id=1, bbox=[10, 10, 30, 30], area=900,
        iscrowd=0, inst_id=7,
        segmentation=[[10, 10, 40, 10, 40, 40, 10, 40]],
    )]
    ann_file = str(tmp_path / "viper.json")
    with open(ann_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)

    from vps_tpu.data.transforms import TestPipeline

    ds = build_dataset(dict(
        type="ViperDataset", ann_file=ann_file, img_prefix=img_dir,
        pipeline=TestPipeline(img_scale=(W, H)),
        nframes_span_test=2,
    ))
    assert len(ds) == 4
    assert list(ds.CLASSES) == viper_things
    img, ref, meta = ds.prepare_test(0)
    assert meta["is_first"]
    _, _, meta1 = ds.prepare_test(1)
    assert not meta1["is_first"]
