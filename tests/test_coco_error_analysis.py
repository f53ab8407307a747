"""tools/coco_error_analysis.py — the native error-budget decomposition
(reference tools/coco_error_analysis.py:1-177): on a fabricated GT +
detections pair the error-type curves must be ordered (each successive
type forgives strictly more errors) and a perfect submission must be
perfect at every IoU."""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

TYPES = ["C75", "C50", "Loc", "Sim", "Oth", "BG", "FN"]


def fixture(tmp_path, jitter=0.0, wrong_class=False, extra_fp=False):
    imgs = [dict(id=1, height=100, width=100),
            dict(id=2, height=100, width=100)]
    cats = [dict(id=1, name="cat", supercategory="animal"),
            dict(id=2, name="dog", supercategory="animal"),
            dict(id=3, name="car", supercategory="vehicle")]
    anns, dets = [], []
    rng = np.random.RandomState(0)
    aid = 1
    for im in imgs:
        for k, cid in enumerate((1, 2, 3)):
            x, y, w, h = 10 + 25 * k, 15 + 20 * k, 18, 22
            anns.append(dict(id=aid, image_id=im["id"], category_id=cid,
                             bbox=[x, y, w, h], area=w * h, iscrowd=0))
            aid += 1
            dx = jitter * w * rng.rand()
            det_cid = (cid % 3 + 1) if wrong_class else cid
            dets.append(dict(image_id=im["id"], category_id=det_cid,
                             bbox=[x + dx, y, w, h], score=0.9 - 0.1 * k))
        if extra_fp:
            dets.append(dict(image_id=im["id"], category_id=1,
                             bbox=[70, 70, 10, 10], score=0.5))
    ann_file = str(tmp_path / "ann.json")
    res_file = str(tmp_path / "res.json")
    with open(ann_file, "w") as f:
        json.dump(dict(images=imgs, annotations=anns, categories=cats), f)
    with open(res_file, "w") as f:
        json.dump(dets, f)
    return res_file, ann_file


def run(tmp_path, **kw):
    from coco_error_analysis import analyze_results

    res, ann = fixture(tmp_path, **kw)
    out = str(tmp_path / "out")
    analyze_results(res, ann, ["bbox"], out, plots=False)
    with open(os.path.join(out, "bbox", "error_analysis.json")) as f:
        return json.load(f)


def test_perfect_submission_is_perfect(tmp_path):
    s = run(tmp_path)
    a = s["allclass"]
    for t in TYPES:
        assert a[t]["allarea"] > 0.99, (t, a[t])


def test_error_types_are_ordered(tmp_path):
    """C75 ≤ C50 ≤ Loc ≤ Sim ≤ Oth ≤ BG ≤ FN — each type forgives more."""
    s = run(tmp_path, jitter=0.35, extra_fp=True)
    a = s["allclass"]
    vals = [a[t]["allarea"] for t in TYPES]
    for lo, hi in zip(vals, vals[1:]):
        assert lo <= hi + 1e-9, (TYPES, vals)
    # jittered boxes: localization errors exist → Loc gains over C75
    assert a["Loc"]["allarea"] > a["C75"]["allarea"]
    # the stray fp is background confusion: FN=1 > BG resolves it
    assert a["FN"]["allarea"] >= a["BG"]["allarea"]


def test_class_confusion_shows_in_sim(tmp_path):
    """Confusion FPs (a high-scoring 'cat' det on a dog box, another on a
    car box) hurt plain precision; Sim forgives the same-supercategory one
    (dog, both 'animal'), Oth forgives both — the ignored-gt absorption
    semantics of COCOeval's analyze path."""
    from coco_error_analysis import analyze_results

    imgs = [dict(id=1, height=100, width=100)]
    cats = [dict(id=1, name="cat", supercategory="animal"),
            dict(id=2, name="dog", supercategory="animal"),
            dict(id=3, name="car", supercategory="vehicle")]
    gt_boxes = {1: [10, 10, 20, 20], 2: [50, 10, 20, 20],
                3: [10, 60, 20, 20]}
    anns = [dict(id=i, image_id=1, category_id=c, bbox=b, area=400,
                 iscrowd=0) for i, (c, b) in enumerate(gt_boxes.items(), 1)]
    dets = [
        # correct cat det, ranked below the confusions
        dict(image_id=1, category_id=1, bbox=gt_boxes[1], score=0.5),
        # cat det on the DOG box (same supercategory) — Sim forgives
        dict(image_id=1, category_id=1, bbox=gt_boxes[2], score=0.9),
        # cat det on the CAR box (cross supercategory) — only Oth forgives
        dict(image_id=1, category_id=1, bbox=gt_boxes[3], score=0.8),
    ]
    ann_file = str(tmp_path / "ann.json")
    res_file = str(tmp_path / "res.json")
    with open(ann_file, "w") as f:
        json.dump(dict(images=imgs, annotations=anns, categories=cats), f)
    with open(res_file, "w") as f:
        json.dump(dets, f)
    out = str(tmp_path / "out")
    analyze_results(res_file, ann_file, ["bbox"], out, plots=False)
    with open(os.path.join(out, "bbox", "error_analysis.json")) as f:
        s = json.load(f)
    cat = s["cat"]
    # plain: 2 confusion FPs above the single TP → precision 1/3 at recall 1
    assert cat["C50"]["allarea"] < 0.5
    # Sim absorbs the dog confusion but not the car one
    assert cat["C50"]["allarea"] < cat["Sim"]["allarea"] < 0.99
    # Oth absorbs both → perfect
    assert cat["Oth"]["allarea"] > 0.99


def test_cli_writes_plots(tmp_path):
    import subprocess
    import sys as _sys

    res, ann = fixture(tmp_path)
    out = str(tmp_path / "cli_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [_sys.executable, os.path.join(REPO, "tools",
                                       "coco_error_analysis.py"),
         res, out, "--ann", ann],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = os.listdir(os.path.join(out, "bbox"))
    assert "bbox-allclass-allarea.png" in pngs
    assert "error_analysis.json" in pngs