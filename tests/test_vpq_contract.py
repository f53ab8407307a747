"""Cross-evaluator VPQ/PQ contract tests.

The VPQ evaluator is the ground truth of the whole exercise, and the
reference's is pure numpy+PIL (/root/reference/tools/eval_vpq.py) — runnable
here with zero CUDA. These tests build ADVERSARIAL file fixtures (dropped
segments, track-id swaps, crowd overlap, void-majority predictions, GT
json/png area mismatch, category confusion, GT segments that disappear
mid-video, duplicated segment-info ids) and assert the reference script's
vpq-{0,5,10,15} numbers equal vps_tpu.eval.vpq's on the SAME artifacts,
bit-for-bit-on-ints (float comparison at 1e-9).

Image PQ: the reference's per-image PQ
(/root/reference/tools/dataset/base_dataset.py:338 _pq_compute_single_core)
can't be imported (its module needs pycocotools + py<3.10 collections), so
the static method's source is extracted from the reference file at test
runtime and exec'd — same code, no copy checked in.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_EVAL_VPQ = "/root/reference/tools/eval_vpq.py"
REF_BASE_DATASET = "/root/reference/tools/dataset/base_dataset.py"

H, W = 48, 64

CATEGORIES = [
    dict(id=7, isthing=0, name="road", color=[128, 64, 128]),
    dict(id=11, isthing=0, name="sky", color=[70, 130, 180]),
    dict(id=13, isthing=1, name="car", color=[0, 0, 142]),
    dict(id=24, isthing=1, name="person", color=[220, 20, 60]),
]


def id_to_rgb(idmap):
    rgb = np.zeros(idmap.shape + (3,), np.uint8)
    rgb[..., 0] = idmap % 256
    rgb[..., 1] = (idmap // 256) % 256
    rgb[..., 2] = idmap // 65536
    return rgb


def segments_from_map(idmap, cats, crowd_ids=()):
    """One segments_info entry per non-void id, area from the map."""
    out = []
    for sid in sorted(np.unique(idmap).tolist()):
        if sid == 0:
            continue
        out.append(dict(
            id=int(sid), category_id=int(cats[sid]),
            area=int((idmap == sid).sum()),
            iscrowd=1 if sid in crowd_ids else 0,
        ))
    return out


def build_video1():
    """6 frames with: moving car dropped by pred mid-video, pred id swap,
    crowd-overlap pred, void-majority pred, GT json area mismatch, and a
    duplicated GT segments_info id (eval_vpq sums duplicate entries)."""
    gt_cats = {1: 7, 2: 11, 1001: 13, 1002: 13, 3000: 13, 2001: 24}
    pr_cats = {1: 7, 2: 11, 5001: 13, 5002: 13, 5003: 13, 5004: 24,
               5005: 24}
    frames = []
    for t in range(6):
        gt = np.zeros((H, W), np.int64)
        gt[32:48, :] = 1                      # road
        gt[0:8, :] = 2                        # sky   (rows 8:12 = void)
        gt[16:24, 4 + 2 * t:12 + 2 * t] = 1001  # car A, moving
        gt[16:24, 40:48] = 1002               # car B
        gt[26:30, 0:16] = 3000                # crowd car region
        gt[12:16, 20:28] = 2001               # person

        pr = np.zeros((H, W), np.int64)
        pr[33:48, :] = 1                      # road, eroded one row
        pr[0:8, :] = 2
        if t < 3:
            pr[16:24, 4 + 2 * t:12 + 2 * t] = 5001  # car A tracked
            pr[16:24, 40:48] = 5002                 # car B tracked
        else:
            # id swap: car A dropped; its id takes over car B's tube
            pr[16:24, 40:48] = 5001
        pr[26:30, 0:16] = 5003                # sits exactly on GT crowd
        pr[8:13, 50:60] = 5004                # 80% on GT void -> ignored
        pr[12:16, 21:28] = 5005               # person, IoU 7/9

        gt_segs = segments_from_map(gt, gt_cats, crowd_ids={3000})
        for s in gt_segs:
            if s["id"] == 1002:
                s["area"] += 40  # json/png area mismatch: json is trusted
        if t == 0:
            # duplicate-id entries: eval_vpq SUMS duplicated segments_info
            road = [s for s in gt_segs if s["id"] == 1][0]
            half = road["area"] // 2
            rest = road["area"] - half
            road["area"] = half
            gt_segs.append(dict(road, area=rest))
        pred_segs = segments_from_map(pr, pr_cats)
        frames.append((dict(segments_info=gt_segs), dict(segments_info=pred_segs),
                       gt, pr))
    return frames


def build_video2():
    """6 frames with: stuff category confusion, borderline IoU above and
    below 0.5, and a GT segment that disappears mid-video while the
    prediction persists (void-majority FP in late windows)."""
    gt_cats = {1: 7, 2: 11, 1003: 13, 2002: 24, 2003: 24}
    pr_cats = {7001: 7, 7002: 11, 7003: 11, 7004: 24, 7005: 24, 7006: 13}
    frames = []
    for t in range(6):
        gt = np.zeros((H, W), np.int64)
        gt[24:48, :] = 1                      # road
        gt[0:8, :] = 2                        # sky
        gt[12:20, 10:20] = 2002               # person, matched 0.7
        gt[12:20, 30:40] = 2003               # person, matched 1/3 (miss)
        if t < 4:
            gt[20:24, 0:8] = 1003             # car, disappears at t=4

        pr = np.zeros((H, W), np.int64)
        pr[24:40, :] = 7001                   # road (top 2/3)
        pr[40:48, :] = 7002                   # sky over road (confusion)
        pr[0:8, :] = 7003                     # sky exact
        pr[12:20, 13:20] = 7004               # person IoU 56/80
        pr[12:20, 35:45] = 7005               # person IoU 40/120
        pr[20:24, 0:8] = 7006                 # car persists after GT gone

        frames.append((
            dict(segments_info=segments_from_map(gt, gt_cats)),
            dict(segments_info=segments_from_map(pr, pr_cats)),
            gt, pr,
        ))
    return frames


def write_fixture(root):
    """Write the two 6-frame videos in the reference's file layout:
    truth_dir/<base>_final_mask.png, submit/pan_pred/<id>.png, pred.json,
    gt json with images/annotations/categories."""
    truth_dir = os.path.join(root, "truth")
    submit_dir = os.path.join(root, "submit")
    os.makedirs(truth_dir)
    os.makedirs(os.path.join(submit_dir, "pan_pred"))

    images, gt_anns, pred_anns = [], [], []
    videos = [build_video1(), build_video2()]
    for v, frames in enumerate(videos, start=1):
        for t, (gt_json, pred_json, gt, pr) in enumerate(frames):
            iid = f"{v:04d}_{t:04d}"
            images.append(dict(id=iid, file_name=f"{iid}_newImg8bit.png",
                               height=H, width=W))
            gt_anns.append(dict(image_id=iid, segments_info=gt_json[
                "segments_info"]))
            pred_anns.append(dict(image_id=iid, segments_info=pred_json[
                "segments_info"]))
            Image.fromarray(id_to_rgb(gt)).save(
                os.path.join(truth_dir, f"{iid}_final_mask.png"))
            Image.fromarray(id_to_rgb(pr)).save(
                os.path.join(submit_dir, "pan_pred", f"{iid}.png"))

    gt_json_path = os.path.join(root, "gt.json")
    with open(gt_json_path, "w") as f:
        json.dump(dict(images=images, annotations=gt_anns,
                       categories=CATEGORIES), f)
    with open(os.path.join(submit_dir, "pred.json"), "w") as f:
        json.dump(dict(annotations=pred_anns), f)
    return truth_dir, submit_dir, gt_json_path, videos


def load_videos_from_disk(truth_dir, submit_dir, gt_json_path,
                          nframes_per_video=6):
    """Re-read the artifacts the way tools/eval_vpq.py does, returning
    [[(gt_ann, pred_ann, gt_pan_rgb, pred_pan_rgb), ...] per video]."""
    with open(gt_json_path) as f:
        gt = json.load(f)
    with open(os.path.join(submit_dir, "pred.json")) as f:
        pred = json.load(f)
    frames = []
    for img, ga, pa in zip(gt["images"], gt["annotations"],
                           pred["annotations"]):
        gt_pan = np.array(Image.open(os.path.join(
            truth_dir, img["file_name"].replace("_newImg8bit.png",
                                                "_final_mask.png"))))
        pred_pan = np.array(Image.open(os.path.join(
            submit_dir, "pan_pred", img["id"] + ".png")))
        frames.append((ga, pa, gt_pan, pred_pan))
    cats = {c["id"]: c for c in gt["categories"]}
    videos = [frames[i:i + nframes_per_video]
              for i in range(0, len(frames), nframes_per_video)]
    return videos, cats


DRIVER = """
import sys, runpy
import numpy as np

# the reference calls np.array_split on a ragged python list (frames zipped
# with json dicts) — legal on its numpy vintage, a ValueError on modern
# numpy. Restore the legacy list behavior WITHOUT touching the reference.
_orig = np.array_split


def array_split(a, n, *args, **kw):
    if isinstance(a, list):
        k, m = divmod(len(a), n)
        out, i = [], 0
        for j in range(n):
            step = k + (1 if j < m else 0)
            out.append(a[i:i + step])
            i += step
        return out
    return _orig(a, n, *args, **kw)


np.array_split = array_split
path = sys.argv[1]
sys.argv = [path] + sys.argv[2:]
runpy.run_path(path, run_name="__main__")
"""


def run_reference_eval_vpq(truth_dir, submit_dir, gt_json_path):
    """Run the reference's own evaluator; parse per-window (all, thing,
    stuff) triples from stdout and the final averages from vpq-final.txt."""
    driver = os.path.join(os.path.dirname(submit_dir), "_driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER)
    r = subprocess.run(
        [sys.executable, driver, REF_EVAL_VPQ, "--submit_dir", submit_dir,
         "--truth_dir", truth_dir, "--pan_gt_json_file", gt_json_path],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    triples = []
    for line in r.stdout.splitlines():
        m = re.fullmatch(
            r"(-?\d+\.?\d*(?:e-?\d+)?) (-?\d+\.?\d*(?:e-?\d+)?)"
            r" (-?\d+\.?\d*(?:e-?\d+)?)", line.strip())
        if m:
            triples.append(tuple(float(g) for g in m.groups()))
    assert len(triples) == 4, r.stdout
    final = {}
    with open(os.path.join(submit_dir, "vpq-final.txt")) as f:
        for line in f:
            k, v = line.strip().split(":")
            final[k] = float(v)
    return triples, final


def test_vpq_matches_reference_evaluator(tmp_path):
    truth_dir, submit_dir, gt_json_path, _ = write_fixture(str(tmp_path))
    ref_windows, ref_final = run_reference_eval_vpq(
        truth_dir, submit_dir, gt_json_path)

    from vps_tpu.eval.vpq import vpq_compute, vpq_eval_all

    videos, cats = load_videos_from_disk(truth_dir, submit_dir, gt_json_path)
    for nf, ref in zip((1, 2, 3, 4), ref_windows):
        got = vpq_compute(videos, cats, nf)
        assert got == pytest.approx(ref, abs=1e-9), (
            f"window nframes={nf}: ours {got} != reference {ref}")

    out_dir = str(tmp_path / "ours")
    os.makedirs(out_dir)
    got_final = vpq_eval_all(videos, cats, output_dir=out_dir)
    # vpq-final.txt is written at 4 decimals by both sides
    assert got_final[0] == pytest.approx(ref_final["vpq_all"], abs=5e-4)
    assert got_final[1] == pytest.approx(ref_final["vpq_thing"], abs=5e-4)
    assert got_final[2] == pytest.approx(ref_final["vpq_stuff"], abs=5e-4)


def _extract_reference_pq_single_core():
    """Exec the reference's PQStatCat/PQStat classes and the
    _pq_compute_single_core static-method body from source (the module
    itself needs pycocotools and py<3.10)."""
    with open(REF_BASE_DATASET) as f:
        src = f.read()
    # classes: from `class PQStatCat` up to `class BaseDataset`
    cls_src = src[src.index("class PQStatCat"):src.index("class BaseDataset")]
    # the static method: from its def to the next @staticmethod/def at the
    # same indentation
    start = src.index("def _pq_compute_single_core")
    rest = src[start:]
    m = re.search(r"\n    @staticmethod\n|\n    def ", rest)
    fn_src = rest[:m.start()] if m else rest
    # dedent the method body by 4 (it sits inside the class)
    fn_src = "\n".join(
        line[4:] if line.startswith("    ") else line
        for line in fn_src.splitlines())
    ns = {"np": np, "defaultdict": __import__("collections").defaultdict}
    exec(cls_src + "\n" + fn_src, ns)  # noqa: S102 — reference code, test-only
    return ns["_pq_compute_single_core"], ns["PQStat"]


def test_image_pq_matches_reference_single_core(tmp_path):
    """Our window-1 VPQ (== image PQ) vs the reference's
    _pq_compute_single_core on video 2 (which has no duplicate-id
    segments_info — the PQ variant overwrites duplicates where eval_vpq
    sums them)."""
    truth_dir, submit_dir, gt_json_path, _ = write_fixture(str(tmp_path))
    videos, cats = load_videos_from_disk(truth_dir, submit_dir, gt_json_path)
    video2 = videos[1]

    pq_single, _PQStat = _extract_reference_pq_single_core()
    gt_jsons = [f[0] for f in video2]
    pred_jsons = [json.loads(json.dumps(f[1])) for f in video2]
    gt_pans = [f[2] for f in video2]
    pred_pans = [f[3] for f in video2]
    stat = pq_single(0, gt_jsons, pred_jsons, gt_pans, pred_pans,
                     [None] * len(video2), cats)

    from vps_tpu.eval.vpq import vpq_compute_video

    ours = vpq_compute_video(video2, cats, nframes=1)
    for cat in cats:
        ref_c = stat.pq_per_cat[cat]
        our_c = ours.pq_per_cat[cat]
        assert (ref_c.tp, ref_c.fp, ref_c.fn) == (
            our_c.tp, our_c.fp, our_c.fn), f"cat {cat}"
        assert ref_c.iou == pytest.approx(our_c.iou, abs=1e-12), f"cat {cat}"
