"""Fast-preset validation (round-1 VERDICT item 4): the `fast` preset
(zoo.fast_overrides — nearest DCN sampling, 1-sample RoIAlign, quarter-res
flow, nearest warps) must approximate the exact pipeline ON A TRAINED
CHECKPOINT, not just run. Trains the CLI fixture once, runs tools/test_vpq.py
with the exact and fast configs against the SAME checkpoint, and asserts
output agreement; the measured numbers are written to
<tmp>/fast_preset_report.json and recorded in PERF.md."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_dataset_files import _write_fixture, H, W
from test_cli_train_eval import CONFIG_TMPL, cpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAST_SUFFIX = """
model = zoo.fast_overrides(model)
"""

# 1 training epoch leaves the fixture model's logits near-random, so argmax
# flips under ANY perturbation dominate the agreement measure (measured
# sseg 0.85 at 1 epoch). Overfit the 4-frame fixture instead so decision
# boundaries are confident and disagreement reflects the approximations.
EPOCH_SUFFIX = """
total_epochs = 4
lr_config = dict(policy="step", warmup="linear", warmup_iters=2,
                 warmup_ratio=0.5, step=[3])
"""


def test_exact_overrides_restore_reference_semantics():
    """round-2 VERDICT item 2: the `exact` preset must recover full-res
    FlowNet2 input (panoptic_fusetrack.py:117-143) and f32 compute in every
    stack that defaults to bf16 (backbone, fuse neck, semantic-head DCN,
    FlowNet2 cascade)."""
    from vps_tpu import zoo
    from vps_tpu.models.detectors import PanopticFuseTrack

    cfg = zoo.exact_overrides(zoo.fusetrack_model_cfg())
    assert cfg["flow_input_scale"] == 1.0
    c = dict(cfg)
    c.pop("type")
    det = PanopticFuseTrack(
        train_cfg=zoo.fusetrack_train_cfg(),
        test_cfg=zoo.fusetrack_test_cfg(), **c,
    )
    b = det.bind({"params": {}})  # triggers setup without any compute
    assert b.flow_input_scale == 1.0
    assert b.backbone_m.dtype is None
    assert b.extra_neck_m.compute_dtype is None
    assert b.panoptic_m.compute_dtype is None
    assert b.flownet2_m.compute_dtype is None

    # ... and the shipped default keeps the documented half-flow
    # approximations (half-res flow, bf16 conv stacks)
    import jax.numpy as jnp
    dc = zoo.fusetrack_model_cfg()
    dc.pop("type")
    det_d = PanopticFuseTrack(
        train_cfg=zoo.fusetrack_train_cfg(),
        test_cfg=zoo.fusetrack_test_cfg(), **dc,
    )
    bd = det_d.bind({"params": {}})
    assert bd.flow_input_scale == 0.5
    assert bd.backbone_m.dtype == jnp.bfloat16
    assert bd.flownet2_m.compute_dtype == jnp.bfloat16


@pytest.mark.cli
def test_fast_preset_agrees_with_exact(tmp_path):
    ann_file, img_dir, seg_dir = _write_fixture(str(tmp_path))
    work = str(tmp_path / "work")
    cfg_path = str(tmp_path / "cfg.py")
    body = CONFIG_TMPL.format(W=W, H=H, ann=ann_file, img=img_dir,
                              seg=seg_dir, work=work)
    with open(cfg_path, "w") as f:
        f.write(body + EPOCH_SUFFIX)
    fast_cfg_path = str(tmp_path / "cfg_fast.py")
    with open(fast_cfg_path, "w") as f:
        f.write(body + EPOCH_SUFFIX + FAST_SUFFIX)

    env = cpu_env()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), cfg_path],
        env=env, capture_output=True, text=True, timeout=2700,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    with open(os.path.join(work, "latest.txt")) as f:
        ckpt = os.path.join(work, f.read().strip())

    results = {}
    for tag, cpath in (("exact", cfg_path), ("fast", fast_cfg_path)):
        out_pkl = str(tmp_path / f"out_{tag}.pkl")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "test_vpq.py"),
             cpath, "--checkpoint", ckpt, "--out", out_pkl, "--chunk", "2"],
            env=env, capture_output=True, text=True, timeout=2700,
        )
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        with open(out_pkl.replace(".pkl", "_pano.pkl"), "rb") as f:
            results[tag] = pickle.load(f)

    ex, fa = results["exact"], results["fast"]
    assert ex["all_names"] == fa["all_names"]
    pano_agree, sseg_agree = [], []
    for i in range(len(ex["all_names"])):
        pano_agree.append(
            float(np.mean(ex["all_panos"][i] == fa["all_panos"][i]))
        )
        sseg_agree.append(
            float(np.mean(ex["all_ssegs"][i] == fa["all_ssegs"][i]))
        )
    report = dict(
        pano_agreement=pano_agree,
        sseg_agreement=sseg_agree,
        pano_mean=float(np.mean(pano_agree)),
        sseg_mean=float(np.mean(sseg_agree)),
    )
    with open(str(tmp_path / "fast_preset_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("FAST_PRESET_REPORT", json.dumps(report))
    # the fast approximations may move decision boundaries a little; large
    # disagreement means the preset is broken, not merely approximate.
    # Measured on this overfit fixture: see PERF.md "fast preset validation".
    assert report["sseg_mean"] > 0.90, report
    assert report["pano_mean"] > 0.85, report


def test_lowres_sem_head_contract():
    """lowres-sem preset (zoo.lowres_sem_overrides): the stride-8 UPSNet
    tower must keep the stride-4 output contract (fcn_score H/4, fcn_output
    H) AND the exact param tree of the stride-4 head, so reference-trained
    weights load unchanged."""
    import jax
    import jax.numpy as jnp

    from vps_tpu.models.panoptic_fpn import UPSNetFPN

    rng = np.random.RandomState(0)
    h, w = 32, 64
    feats = [jnp.asarray(rng.randn(1, h // s, w // s, 256).astype(np.float32))
             for s in (1, 2, 4, 8)]  # strides 4..32 of a 128x256 image

    ref = UPSNetFPN(compute_dtype=None)
    low = UPSNetFPN(compute_dtype=None, head_stride=8)
    v_ref = ref.init(jax.random.PRNGKey(0), feats)
    v_low = low.init(jax.random.PRNGKey(0), feats)
    # identical param trees: weights are interchangeable across presets
    assert jax.tree.map(lambda a: a.shape, v_ref) == \
        jax.tree.map(lambda a: a.shape, v_low)

    out_ref, score_ref = ref.apply(v_ref, feats)
    out_low, score_low = low.apply(v_ref, feats)  # ref weights on purpose
    assert score_low.shape == score_ref.shape == (1, h, w, 19)
    assert out_low.shape == out_ref.shape == (1, 4 * h, 4 * w, 19)
    # smooth inputs: the stride-8 tower is a coarse approximation, not a
    # different function — argmax maps should mostly agree
    agree = float(np.mean(np.argmax(np.asarray(out_low), -1)
                          == np.argmax(np.asarray(out_ref), -1)))
    assert agree > 0.5, agree
