"""prepare_data pipeline: raw Cityscapes-style color/instance pngs →
per-frame panoptic/label maps (create_panoptic_labels) → COCO-panoptic
video annotations (create_panoptic_video_labels), run through the real CLI
scripts on a fabricated 2-video fixture."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "prepare_data"))

from city_categories import CATEGORIES, VOID  # noqa: E402

H, W = 64, 96
ROAD = next(c for c in CATEGORIES if c["name"] == "road")
SKY = next(c for c in CATEGORIES if c["name"] == "sky")
CAR = next(c for c in CATEGORIES if c["name"] == "car")


def _write_raw(root, mode="val", nframes=2):
    cls_dir = os.path.join(root, mode, "cls")
    inst_dir = os.path.join(root, mode, "inst")
    os.makedirs(cls_dir, exist_ok=True)
    os.makedirs(inst_dir, exist_ok=True)
    # 2 videos x 2 frames; image id = VVVV_FFFF_..., video = first 4 chars
    for vid in ("0001", "0002"):
        for t in range(nframes):
            name = f"{vid}_{t:04d}_city_gtFine_color.png"
            sem = np.zeros((H, W, 3), np.uint8)
            sem[:32] = SKY["color"]
            sem[32:] = ROAD["color"]
            x0 = 10 + 12 * t  # car moves right between frames
            sem[40:60, x0:x0 + 24] = CAR["color"]
            Image.fromarray(sem).save(os.path.join(cls_dir, name))
            inst = np.zeros((H, W), np.int32)
            # cityscapes instance coding: ori_id * 1000 + instance index
            inst[40:60, x0:x0 + 24] = CAR["ori_id"] * 1000 + 0
            Image.fromarray(inst, mode="I").save(
                os.path.join(inst_dir, name))
    return root


def test_prepare_data_pipeline(tmp_path):
    root = _write_raw(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "prepare_data", "create_panoptic_labels.py"),
         "--mode", "val", "--root_dir", root, "--workers", "2"],
        env=env, capture_output=True, text=True, timeout=300,
        cwd=os.path.join(REPO, "prepare_data"),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    pan_dir = os.path.join(root, "val", "panoptic_inst")
    label_dir = os.path.join(root, "val", "labelmap")
    names = sorted(os.listdir(pan_dir))
    assert len(names) == 4 and len(os.listdir(label_dir)) == 4

    pan = np.array(Image.open(os.path.join(pan_dir, names[0])))
    label = np.array(Image.open(os.path.join(label_dir, names[0])))
    # semantic map decodes to trainIds
    assert (label[:32] == SKY["id"]).all()
    assert label[35, 2] == ROAD["id"]
    assert label[50, 20] == CAR["id"]
    # panoptic coding: stuff = id, things = id*1000 + inst
    assert (pan[:32] == SKY["id"]).all()
    assert pan[50, 20] == CAR["id"] * 1000 + 0
    # area of the car instance matches geometry (20 x 24 box)
    assert (pan == CAR["id"] * 1000).sum() == 20 * 24

    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "prepare_data",
                      "create_panoptic_video_labels.py"),
         "--mode", "val", "--root_dir", root],
        env=env, capture_output=True, text=True, timeout=300,
        cwd=os.path.join(REPO, "prepare_data"),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    with open(os.path.join(root, "panoptic_gt_val_city_vps.json")) as f:
        gt = json.load(f)
    assert len(gt["images"]) == 4
    assert len(gt["annotations"]) == 4
    assert len(gt["categories"]) == 19

    # track consistency: the car keeps ONE segment id across frames of a
    # video (colors reset between videos)
    def car_seg_ids(video):
        out = []
        for ann in gt["annotations"]:
            if not ann["image_id"].startswith(video):
                continue
            ids = [s["id"] for s in ann["segments_info"]
                   if s["category_id"] == CAR["id"]]
            assert len(ids) == 1
            out.append(ids[0])
        return out

    v1 = car_seg_ids("0001")
    v2 = car_seg_ids("0002")
    assert len(set(v1)) == 1, v1
    assert len(set(v2)) == 1, v2
    assert v1[0] != v2[0]  # fresh id per video

    # areas recorded in the json match the drawn geometry
    for ann in gt["annotations"]:
        for s in ann["segments_info"]:
            if s["category_id"] == CAR["id"]:
                assert s["area"] == 20 * 24


def test_debug_panoptic_labels_jsons(tmp_path):
    """The GT cross-check tool regenerates a things-instances RLE json from
    panoptic_inst pngs; its annotations must decode back to the exact
    instance masks the pipeline wrote."""
    root = _write_raw(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for script, extra in (
        ("create_panoptic_labels.py", ["--workers", "2"]),
        ("debug_panoptic_labels_jsons.py", ["--workers", "1"]),
    ):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "prepare_data", script),
             "--mode", "val", "--root_dir", root] + extra,
            env=env, capture_output=True, text=True, timeout=300,
            cwd=os.path.join(REPO, "prepare_data"),
        )
        assert r.returncode == 0, r.stdout + r.stderr

    with open(os.path.join(root, "instances_val_cityscapes_rle.json")) as f:
        coco = json.load(f)
    assert len(coco["images"]) == 4
    assert len(coco["annotations"]) == 4  # one car per frame
    assert all(c["isthing"] == 1 for c in coco["categories"])

    from vps_tpu.data.coco import ann_to_mask

    pan_dir = os.path.join(root, "val", "panoptic_inst")
    by_image = {im["id"]: im for im in coco["images"]}
    names = sorted(os.listdir(pan_dir))
    for ann in coco["annotations"]:
        assert ann["category_id"] == CAR["id"]
        im = by_image[ann["image_id"]]
        mask = ann_to_mask(ann["segmentation"], im["height"], im["width"])
        name = [n for n in names
                if int(n[:9].replace("_", "")) == ann["image_id"]][0]
        pan = np.array(Image.open(os.path.join(pan_dir, name)))
        np.testing.assert_array_equal(
            mask.astype(bool), pan == ann["inst_id"])
        assert ann["area"] == int(mask.sum())
        x, y, w, h = ann["bbox"]
        ys, xs = np.nonzero(mask)
        assert (x, y) == (xs.min(), ys.min())
        assert (w, h) == (xs.max() - xs.min() + 1, ys.max() - ys.min() + 1)
