"""File-level dataset integration: a fabricated on-disk Cityscapes-VPS
fixture (COCO-video json + pngs + labelmaps) driven through
CityscapesVPSDataset's train and test paths — the layer the class-mapping
bug class hides in (everything below model code, nothing mocked)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vps_tpu.data.dataset import CityscapesVPSDataset, build_dataset

H, W = 128, 256


def _write_fixture(root):
    img_dir = os.path.join(root, "img")
    seg_dir = os.path.join(root, "labelmap")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(seg_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    rng = np.random.RandomState(0)
    # 2 videos x 2 frames; inst_id stable across frames of a video
    for vid in range(2):
        for t in range(2):
            iid = vid * 2 + t + 1
            name = f"{vid:04d}_{t:04d}_city_000000_newImg8bit.png"
            img = rng.randint(0, 255, (H, W, 3), np.uint8)
            cv2.imwrite(os.path.join(img_dir, name), img)
            # labelmap: stuff class 2 everywhere, thing region class 11
            seg = np.full((H, W), 2, np.uint8)
            seg[20:60, 30 + 10 * t:90 + 10 * t] = 11
            cv2.imwrite(
                os.path.join(
                    seg_dir, name.replace("newImg8bit", "final_mask")
                ),
                seg,
            )
            images.append(dict(id=iid, file_name=name, height=H, width=W))
            # one car per frame, moving 10px right per frame
            x0 = 30 + 10 * t
            annotations.append(dict(
                id=ann_id, image_id=iid, category_id=3,
                bbox=[x0, 20, 60, 40], area=2400, iscrowd=0,
                inst_id=1000 + vid,  # video-stable track id
                segmentation=[[x0, 20, x0 + 60, 20, x0 + 60, 60, x0, 60]],
            ))
            ann_id += 1
    categories = [
        dict(id=i + 1, name=n) for i, n in enumerate(
            CityscapesVPSDataset.CLASSES)
    ]
    ann = dict(images=images, annotations=annotations, categories=categories)
    ann_file = os.path.join(root, "instances.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, img_dir, seg_dir


def test_train_sample_from_files(tmp_path):
    ann_file, img_dir, seg_dir = _write_fixture(str(tmp_path))
    from vps_tpu.data.transforms import TrainPipeline

    ds = build_dataset(dict(
        type="CityscapesVPSDataset",
        ann_file=ann_file, img_prefix=img_dir, seg_prefix=seg_dir,
        ref_ann_file=ann_file, offsets=[-1, 1],
        semantic2label={**{i: i for i in range(19)}, 255: 255},
        pipeline=TrainPipeline(
            img_scale=(W, H), ratio_range=(1.0, 1.0), flip_ratio=0.0,
            crop_size=(96, 192), max_gt=8,
        ),
    ))
    assert len(ds) == 4
    rng = np.random.RandomState(1)
    # frame 0 of video 0 only has ref offset +1 (id 2); sample it
    s = ds.prepare_train(0, rng)
    assert s is not None
    assert s["img"].shape == (96, 192, 3)
    assert s["gt_bboxes"].shape == (8, 4)
    assert s["gt_masks"].shape == (8, 96, 192)
    assert s["gt_semantic_seg"].shape == (96, 192)
    assert s["gt_semantic_seg_Nx"].shape == (24, 48)
    assert s["gt_valid"].any()
    # the (only) gt tracks to the (only) ref instance: pid = 1 (1-based)
    n = int(s["gt_valid"].sum())
    assert list(s["gt_pids"][:n]) == [1]
    # semantic labels survived the pipeline (class 11 region exists)
    assert (s["gt_semantic_seg"] == 11).sum() > 0

    # a frame whose candidate refs span both directions still works
    s2 = ds.prepare_train(1, rng)
    assert s2 is not None and s2["gt_valid"].any()


def test_test_samples_and_video_resets(tmp_path):
    ann_file, img_dir, _ = _write_fixture(str(tmp_path))
    from vps_tpu.data.transforms import TestPipeline

    ds = build_dataset(dict(
        type="CityscapesVPSDataset",
        ann_file=ann_file, img_prefix=img_dir,
        nframes_span_test=2, test_mode=True,
        pipeline=TestPipeline(img_scale=(W, H)),
    ))
    metas = []
    for i in range(len(ds)):
        img, ref, meta = ds.prepare_test(i)
        assert img.shape[-1] == 3 and img.shape == ref.shape
        assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0
        metas.append(meta)
    # span=2: frames 0 and 2 start new videos
    assert [m["is_first"] for m in metas] == [True, False, True, False]
    assert metas[0]["filename"].endswith(".png")


def test_ann_parsing_skips_crowd_and_degenerate(tmp_path):
    ann_file, img_dir, _ = _write_fixture(str(tmp_path))
    with open(ann_file) as f:
        data = json.load(f)
    data["annotations"].append(dict(
        id=99, image_id=1, category_id=3, bbox=[5, 5, 0.5, 20], area=10,
        iscrowd=0, inst_id=77, segmentation=[[5, 5, 6, 5, 6, 25, 5, 25]],
    ))
    data["annotations"].append(dict(
        id=100, image_id=1, category_id=3, bbox=[5, 5, 50, 50], area=2500,
        iscrowd=1, inst_id=78, segmentation=[[5, 5, 55, 5, 55, 55, 5, 55]],
    ))
    with open(ann_file, "w") as f:
        json.dump(data, f)
    ds = CityscapesVPSDataset(ann_file=ann_file, img_prefix=img_dir)
    ann = ds.get_ann_info(0)
    # the degenerate (w<1) and crowd boxes are dropped; the real one stays
    assert ann["bboxes"].shape == (1, 4)
    assert ann["labels"].tolist() == [3]


def test_prepare_test_aug_variants(tmp_path):
    """--aug path: MultiScaleFlipAug enumerates (scale x flip) variants of
    the test-pipeline output; variant 0 must equal prepare_test's output
    and the flip variant must be its exact horizontal mirror (same padded
    canvas at the test scale)."""
    ann_file, img_dir, _ = _write_fixture(str(tmp_path))
    from vps_tpu.data.transforms import TestPipeline

    ds = build_dataset(dict(
        type="CityscapesVPSDataset",
        ann_file=ann_file, img_prefix=img_dir,
        nframes_span_test=2, test_mode=True,
        pipeline=TestPipeline(img_scale=(W, H)),
    ))
    img, ref, meta = ds.prepare_test(1)
    variants, ameta = ds.prepare_test_aug(1, flip=True)
    assert len(variants) == 2
    assert not variants[0]["flip"] and variants[1]["flip"]
    np.testing.assert_array_equal(variants[0]["img"], img)
    np.testing.assert_array_equal(variants[0]["ref_img"], ref)
    np.testing.assert_array_equal(variants[1]["img"], img[:, ::-1])
    assert ameta["img_shape_withoutpad"] == meta["img_shape_withoutpad"]
    assert ameta["is_first"] == meta["is_first"]
    assert variants[1]["scale_factor"] == variants[0]["scale_factor"]
