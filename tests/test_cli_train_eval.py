"""CLI-level end-to-end smoke: tools/train.py on a fabricated on-disk
dataset (1 epoch, tiny model) → checkpoint → tools/test_vpq.py over the
same frames → pickle + unified panoptic artifacts. This is the reference's
own quality-assurance shape (SURVEY.md §4: eval scripts ARE the test
harness), run end-to-end through OUR CLIs with nothing mocked."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_dataset_files import _write_fixture, H, W

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_env():
    """Subprocess env pinned to single-device CPU. Strips conftest's
    8-virtual-device XLA flag: the CLI fixtures are 4 frames, and an
    inherited device_count=8 makes the global batch (= device count)
    exceed the dataset (steps/epoch = 0)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    return env

CONFIG_TMPL = """
from vps_tpu import zoo

model = zoo.tiny_overrides(zoo.fusetrack_model_cfg())
train_cfg = zoo.tiny_train_cfg()
test_cfg = zoo.tiny_test_cfg()

_pipe = dict(img_scale=({W}, {H}), ratio_range=(1.0, 1.0), flip_ratio=0.5,
             crop_size=(96, 192), max_gt=8)
data = dict(
    imgs_per_gpu=1,
    workers_per_gpu=0,
    train=dict(type="CityscapesVPSDataset", ann_file=r"{ann}",
               img_prefix=r"{img}", seg_prefix=r"{seg}",
               ref_ann_file=r"{ann}", offsets=[-1, 1], pipeline=_pipe),
    test=dict(type="CityscapesVPSDataset", ann_file=r"{ann}",
              img_prefix=r"{img}", nframes_span_test=2, test_mode=True,
              pipeline=dict(img_scale=({W}, {H}))),
)
optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=2,
                 warmup_ratio=0.5, step=[1])
checkpoint_config = dict(interval=1)
log_config = dict(interval=1)
total_epochs = 1
work_dir = r"{work}"
"""


@pytest.mark.cli
def test_train_then_test_vpq_cli(tmp_path):
    ann_file, img_dir, seg_dir = _write_fixture(str(tmp_path))
    work = str(tmp_path / "work")
    cfg_path = str(tmp_path / "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL.format(W=W, H=H, ann=ann_file, img=img_dir,
                                   seg=seg_dir, work=work))

    env = cpu_env()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), cfg_path],
        env=env, capture_output=True, text=True, timeout=2700,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    with open(os.path.join(work, "latest.txt")) as f:
        ckpt = os.path.join(work, f.read().strip())
    assert os.path.exists(ckpt), os.listdir(work)
    log = open(os.path.join(work, "train.log")).read()
    assert "Epoch [1]" in log

    # Run BOTH inference paths against the same checkpoint: --chunk 2
    # (on-device lax.scan streams) and --chunk 1 (per-frame host loop).
    # Their agreement is a scan-vs-loop equivalence proof.
    results_by_chunk = {}
    for chunk in (2, 1):
        out_pkl = str(tmp_path / f"out_c{chunk}.pkl")
        show = ["--show_dir", str(tmp_path / "show")] if chunk == 1 else []
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "test_vpq.py"),
             cfg_path, "--checkpoint", ckpt, "--out", out_pkl,
             "--chunk", str(chunk)] + show,
            env=env, capture_output=True, text=True, timeout=2700,
        )
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        if chunk == 1:
            # --show_dir saved one drawn frame+panoptic composite per image
            pngs = list((tmp_path / "show").glob("*.png"))
            assert len(pngs) == 4, pngs
        out_pano = out_pkl.replace(".pkl", "_pano.pkl")
        assert os.path.exists(out_pano)
        with open(out_pano, "rb") as f:
            results = pickle.load(f)
        assert len(results["all_names"]) == 4
        for pano in results["all_panos"]:
            assert pano.shape == (H, W)
        results_by_chunk[chunk] = results

    # --aug: flip TTA through MultiScaleFlipAug -> predict_aug merge. The
    # merged predictions legitimately differ from the plain path, so the
    # assertions are structural (it runs end-to-end and emits all frames).
    out_pkl = str(tmp_path / "out_aug.pkl")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_vpq.py"),
         cfg_path, "--checkpoint", ckpt, "--out", out_pkl, "--aug"],
        env=env, capture_output=True, text=True, timeout=2700,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    with open(out_pkl.replace(".pkl", "_pano.pkl"), "rb") as f:
        aug_results = pickle.load(f)
    assert len(aug_results["all_names"]) == 4
    for pano in aug_results["all_panos"]:
        assert pano.shape == (H, W)

    # --aug-scales: TWO scales x flip = 4 variants on one canvas (the
    # multi-scale TTA path: scale_ratio box mapping + content-region flips)
    out_pkl = str(tmp_path / "out_aug_ms.pkl")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_vpq.py"),
         cfg_path, "--checkpoint", ckpt, "--out", out_pkl, "--aug",
         "--aug-scales", f"{W // 2}x{H // 2}"],
        env=env, capture_output=True, text=True, timeout=2700,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    with open(out_pkl.replace(".pkl", "_pano.pkl"), "rb") as f:
        ms_results = pickle.load(f)
    assert len(ms_results["all_names"]) == 4
    for pano in ms_results["all_panos"]:
        assert pano.shape == (H, W)

    r1, r2 = results_by_chunk[1], results_by_chunk[2]
    assert r1["all_names"] == r2["all_names"]
    # The per-frame loop and the lax.scan path are the same math compiled as
    # DIFFERENT XLA graphs — fusion/vectorization differences perturb floats
    # at the ulp level, which flips argmax pixels exactly at decision
    # boundaries (everywhere, on a 1-epoch fixture model). Equivalence here
    # means near-total agreement, not bitwise identity (measured ~0.7%
    # boundary flips on this fixture).
    for i in range(4):
        for key in ("all_ssegs", "all_panos"):
            a, b = r1[key][i], r2[key][i]
            agree = float(np.mean(a == b))
            assert agree > 0.97, (key, i, agree)
