"""tools/eval_vpq.py CLI over artifacts produced by the framework's own
writers: GT from the prepare_data pipeline fixture, predictions built from
the SAME maps via save_panoptic_outputs — a perfect submission must score
VPQ = 100 through the actual file/naming contract (pan_pred/<id>.png,
pred.json) the reference toolchain defines."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
cv2 = pytest.importorskip("cv2")
from PIL import Image

from test_prepare_data import _write_raw, CAR
from test_cli_train_eval import cpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.cli
def test_eval_vpq_cli_perfect_submission(tmp_path):
    root = str(tmp_path)
    _write_raw(root, nframes=4)  # >= the largest VPQ window (k=15 -> 4)
    env = cpu_env()
    for script in ("create_panoptic_labels.py",
                   "create_panoptic_video_labels.py"):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "prepare_data", script),
             "--mode", "val", "--root_dir", root] +
            (["--workers", "2"]
             if script == "create_panoptic_labels.py" else []),
            env=env, capture_output=True, text=True, timeout=300,
            cwd=os.path.join(REPO, "prepare_data"),
        )
        assert r.returncode == 0, r.stdout + r.stderr

    # predictions: the GT panoptic maps re-expressed as the model-output
    # 2ch format [semantic, per-frame inst idx, track id], then written by
    # the framework's own save_panoptic_outputs
    from vps_tpu.eval.unified import save_panoptic_outputs

    pan_dir = os.path.join(root, "val", "panoptic_inst")
    pred_2ch = {}
    for f in sorted(os.listdir(pan_dir)):
        pan = np.array(Image.open(os.path.join(pan_dir, f))).astype(np.int64)
        sem = np.where(pan >= 1000, pan // 1000, pan).astype(np.uint8)
        two = np.zeros(pan.shape + (3,), np.uint8)
        two[..., 0] = sem
        things = pan >= 1000
        two[..., 1] = np.where(things, 1, 0)
        # track id: the fixture has one car per video, stable inst 0;
        # give video 0001 track 1 and 0002 track 2
        vid = 1 if f.startswith("0001") else 2
        two[..., 2] = np.where(things, vid, 0)
        # the dataset image names strip to <id>.png
        name = f.replace("_gtFine_color", "_newImg8bit")
        pred_2ch[name] = two

    with open(os.path.join(root, "panoptic_gt_val_city_vps.json")) as gfp:
        gt = json.load(gfp)
    categories = {c["id"]: c for c in gt["categories"]}
    submit_dir = os.path.join(root, "submit")
    save_panoptic_outputs(pred_2ch, categories, submit_dir, lambda_=1,
                          labeled_fid=0, nframes_per_video=4)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_vpq.py"),
         "--submit_dir", submit_dir,
         "--truth_dir", os.path.join(root, "val", "panoptic_video"),
         "--pan_gt_json_file",
         os.path.join(root, "panoptic_gt_val_city_vps.json"),
         "--nframes_per_video", "4"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("vpq_all")][-1]
    vpq_all = float(line.split()[1])
    assert vpq_all == pytest.approx(100.0, abs=0.1), r.stdout[-1500:]
    assert os.path.exists(os.path.join(submit_dir, "vpq-final.txt"))
