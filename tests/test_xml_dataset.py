"""VOC/XML dataset loading (reference mmdet/datasets/xml_style.py, voc.py):
xml annotations -> legacy 0-based boxes, difficult/min-size to ignore, and
the standard prepare_train/prepare_test sample contract."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vps_tpu.data.xml_style import VOCDataset

XML_TMPL = """<annotation>
  <folder>VOC2007</folder>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""

OBJ_TMPL = """<object>
  <name>{name}</name>
  <difficult>{difficult}</difficult>
  <bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin><xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox>
</object>
"""


def _write_voc(root, n_imgs=3, h=64, w=96):
    img_prefix = os.path.join(root, "VOC2007")
    os.makedirs(os.path.join(img_prefix, "Annotations"))
    os.makedirs(os.path.join(img_prefix, "JPEGImages"))
    ids = []
    rng = np.random.RandomState(0)
    for i in range(n_imgs):
        iid = f"{i:06d}"
        ids.append(iid)
        objs = OBJ_TMPL.format(name="car", difficult=0, x0=10, y0=12,
                               x1=40, y1=30)
        objs += OBJ_TMPL.format(name="person", difficult=1, x0=50, y0=8,
                                x1=70, y1=28)  # difficult -> ignore
        objs += OBJ_TMPL.format(name="dog", difficult=0, x0=5, y0=40,
                                x1=9, y1=44)   # 4x4: under min_size=8
        with open(os.path.join(img_prefix, "Annotations", iid + ".xml"),
                  "w") as f:
            f.write(XML_TMPL.format(w=w, h=h, objects=objs))
        cv2.imwrite(os.path.join(img_prefix, "JPEGImages", iid + ".jpg"),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
    split = os.path.join(root, "trainval.txt")
    with open(split, "w") as f:
        f.write("\n".join(ids) + "\n")
    return split, img_prefix


def test_voc_annotations(tmp_path):
    split, prefix = _write_voc(str(tmp_path))
    ds = VOCDataset(ann_file=split, img_prefix=prefix, min_size=8,
                    pipeline=dict(img_scale=(96, 64), crop_size=(64, 96)))
    assert len(ds) == 3 and ds.year == 2007
    ann = ds.get_ann_info(0)
    np.testing.assert_allclose(ann["bboxes"], [[9, 11, 39, 29]])
    assert ann["labels"].tolist() == [ds.cat2label["car"]]
    # difficult person + tiny dog both land in ignore
    assert len(ann["bboxes_ignore"]) == 2
    assert sorted(ann["labels_ignore"].tolist()) == sorted(
        [ds.cat2label["person"], ds.cat2label["dog"]])


def test_voc_prepare_train_and_test(tmp_path):
    split, prefix = _write_voc(str(tmp_path))
    ds = VOCDataset(ann_file=split, img_prefix=prefix,
                    pipeline=dict(img_scale=(96, 64), crop_size=(64, 96)))
    s = ds.prepare_train(0, np.random.RandomState(1))
    assert s is not None
    assert s["img"].shape == s["ref_img"].shape
    assert (s["gt_semantic_seg"] == 255).all()  # det-only: all-void
    assert s["gt_valid"].sum() >= 1

    ds_t = VOCDataset(ann_file=split, img_prefix=prefix, test_mode=True,
                      pipeline=dict(img_scale=(96, 64)))
    img, ref, meta = ds_t.prepare_test(1)
    assert img.shape == ref.shape and meta["is_first"]


def test_pascal_voc_converter(tmp_path):
    """tools/convert_datasets/pascal_voc.py middle-format converter agrees
    with XMLDataset's own xml parsing (reference pascal_voc.py:13-64)."""
    import json
    import subprocess
    import sys

    split, prefix = _write_voc(str(tmp_path))
    # lay the split file where the devkit layout expects it
    main_dir = os.path.join(prefix, "ImageSets", "Main")
    os.makedirs(main_dir)
    for name in ("train", "val", "trainval", "test"):
        with open(os.path.join(main_dir, name + ".txt"), "w") as f:
            with open(split) as s:
                f.write(s.read())
    out = os.path.join(str(tmp_path), "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "tools/convert_datasets/pascal_voc.py",
         str(tmp_path), "-o", out],
        check=True, cwd=os.path.dirname(os.path.dirname(__file__)), env=env)
    recs = json.load(open(os.path.join(out, "voc07_trainval.json")))
    assert len(recs) == 3
    ds = VOCDataset(ann_file=split, img_prefix=prefix,
                    pipeline=dict(img_scale=(96, 64), crop_size=(64, 96)))
    for i, rec in enumerate(recs):
        assert rec["filename"] == f"VOC2007/JPEGImages/{i:06d}.jpg"
        assert (rec["width"], rec["height"]) == (96, 64)
        ann = ds.get_ann_info(i)
        # converter has no min_size filter: dataset ignore = difficult only
        np.testing.assert_allclose(rec["ann"]["bboxes"][0], ann["bboxes"][0])
        np.testing.assert_allclose(rec["ann"]["bboxes_ignore"],
                                   [[49, 7, 69, 27]])
        assert rec["ann"]["labels"] == [ds.cat2label["car"],
                                        ds.cat2label["dog"]]
