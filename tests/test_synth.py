"""Synthetic-fixture generator invariants (vps_tpu/data/synth.py) — the
data layer under tools/preset_accuracy.py. Checks the contracts the
GT-building scripts and CityscapesVPSDataset rely on: stable per-instance
raw ids across frames (GT track identity), label/annotation agreement, and
pixel-learnability (instances rendered in their class colors)."""

import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vps_tpu.data.synth import make_synth_vps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_synth_fixture_invariants(tmp_path):
    from PIL import Image

    ann_file, img_dir, seg_dir = make_synth_vps(
        str(tmp_path), mode="val", n_videos=2, n_frames=3, H=128, W=256,
        seed=3)
    with open(ann_file) as f:
        ann = json.load(f)
    assert len(ann["images"]) == 6
    # 3 instances per frame, every frame
    by_img = {}
    for a in ann["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    assert all(len(v) == 3 for v in by_img.values())

    # inst_id is video-stable: the same 3 ids on every frame of a video
    ids_f0 = sorted(a["inst_id"] for a in by_img[1])
    ids_f2 = sorted(a["inst_id"] for a in by_img[3])
    assert ids_f0 == ids_f2
    # and disjoint across videos
    ids_v2 = sorted(a["inst_id"] for a in by_img[4])
    assert not set(ids_f0) & set(ids_v2)

    inst_dir = os.path.join(str(tmp_path), "val", "inst")
    names = sorted(os.listdir(inst_dir))
    # raw instance ids (ori_id*1000+slot) stable across frames of a video
    raw0 = np.array(Image.open(os.path.join(inst_dir, names[0])))
    raw2 = np.array(Image.open(os.path.join(inst_dir, names[2])))
    assert set(np.unique(raw0)) == set(np.unique(raw2))

    # annotation bbox matches the labelmap on EVERY frame: inside the box
    # the semantic class is the annotated thing class (trainId = 10 +
    # category_id). Checking only frame 0 of video 1 let the pre-fix
    # band-spill overlap bug ship green (round-4 advisor finding).
    sys.path.insert(0, os.path.join(REPO, "prepare_data"))
    from city_categories import ID2CATINFO

    H = ann["images"][0]["height"]
    for im in ann["images"]:
        seg_name = im["file_name"].replace("newImg8bit", "final_mask")
        seg = cv2.imread(os.path.join(seg_dir, seg_name),
                         cv2.IMREAD_GRAYSCALE)
        rgb = cv2.imread(
            os.path.join(img_dir, im["file_name"]))[..., ::-1]
        for a in by_img[im["id"]]:
            x, y, w, h = a["bbox"]
            assert y + h <= H and x + w <= im["width"], (a["bbox"], im)
            assert (seg[y:y + h, x:x + w] == 10 + a["category_id"]).all(), \
                (im["file_name"], a["bbox"])
            # learnability: inside each instance box the mean RGB sits near
            # the class palette color (stable jitter <= 45 + noise)
            mean = rgb[y:y + h, x:x + w].reshape(-1, 3).mean(0)
            base = np.asarray(ID2CATINFO[10 + a["category_id"]]["color"])
            assert np.abs(mean - base).max() < 60, (mean, base)


@pytest.mark.parametrize("seed", [0, 1, 5, 7])
def test_synth_disjoint_bands(tmp_path, seed):
    """Instances never overlap and stay in-frame — for every frame of every
    video, across the seeds that used to break (round-4 advisor finding)."""
    ann_file, img_dir, seg_dir = make_synth_vps(
        str(tmp_path), mode="val", n_videos=3, n_frames=4, H=128, W=256,
        seed=seed)
    with open(ann_file) as f:
        ann = json.load(f)
    by_img = {}
    for a in ann["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    for im in ann["images"]:
        anns = by_img[im["id"]]
        for a in anns:
            x, y, w, h = a["bbox"]
            assert 0 <= x and x + w <= im["width"], a["bbox"]
            assert 0 <= y and y + h <= im["height"], a["bbox"]
        # pairwise disjoint boxes (the y-band invariant)
        for i in range(len(anns)):
            for j in range(i + 1, len(anns)):
                xa, ya, wa, ha = anns[i]["bbox"]
                xb, yb, wb, hb = anns[j]["bbox"]
                sep = ya + ha <= yb or yb + hb <= ya \
                    or xa + wa <= xb or xb + wb <= xa
                assert sep, (anns[i]["bbox"], anns[j]["bbox"])


def test_epoch_losses_parser(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from preset_accuracy import epoch_losses

    log = tmp_path / "train.log"
    log.write_text(
        "2026-01-01 - INFO - Epoch [1][10] time: 0.1s, loss: 4.0, "
        "loss_mask: 9.0, match_acc: 0.1\n"
        "2026-01-01 - INFO - Epoch [1][20] time: 0.1s, loss: 2.0, "
        "loss_mask: 8.0, match_acc: 0.1\n"
        "2026-01-01 - INFO - Epoch [2][10] time: 0.1s, loss: 1.0, "
        "loss_mask: 7.0, match_acc: 0.2\n"
        "2026-01-01 - INFO - Eval [2] vpq: 10.0\n"
    )
    losses = epoch_losses(str(log))
    # picks the TOTAL loss (not loss_mask), averaged per epoch
    assert losses == {1: 3.0, 2: 1.0}
