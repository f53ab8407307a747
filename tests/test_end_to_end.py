"""End-to-end checks on synthetic video data.

1. Oracle: perfect model outputs → unified 2ch → color encode → VPQ == 100.
2. Full plumbing: tiny untrained detector → video scan inference → unified →
   encode → VPQ runs and returns a sane value.
"""

import numpy as np
import pytest

from vps_tpu.eval.unified import (
    get_unified_pan_result,
    encode_panoptic_video,
)
from vps_tpu.eval.vpq import vpq_eval_all

H, W = 64, 128
NUM_STUFF = 11

CATEGORIES = {}
for i in range(19):
    CATEGORIES[i] = dict(
        id=i, isthing=1 if i >= NUM_STUFF else 0,
        color=[(i * 37 + 29) % 256, (i * 91 + 7) % 256, (i * 173 + 83) % 256],
    )


def synth_video(nframes=6, seed=0):
    """Two moving boxes (classes 11, 13) over road(0)+sky(10) background.
    Returns per-frame (sseg, pano, cls_inds, obj_ids) in model-output
    format plus gt 2ch maps."""
    frames = []
    for t in range(nframes):
        sseg = np.zeros((H, W), np.uint8)
        sseg[: H // 2] = 10  # sky
        pano = sseg.copy()  # stuff regions = semantic class
        # instance 0: class 11 (person), moves right
        x0 = 10 + 4 * t
        sseg[20:40, x0 : x0 + 15] = 11
        pano[20:40, x0 : x0 + 15] = NUM_STUFF + 0
        # instance 1: class 13 (car), moves down
        y0 = 5 + 3 * t
        sseg[y0 : y0 + 12, 80:110] = 13
        pano[y0 : y0 + 12, 80:110] = NUM_STUFF + 1
        cls_inds = np.array([1, 3])  # 1-based thing classes (11-10, 13-10)
        obj_ids = np.array([0, 1])
        gt_2ch = np.zeros((H, W, 3), np.uint8)
        gt_2ch[..., 0] = sseg
        gt_2ch[..., 1] = (pano >= NUM_STUFF) * (pano - NUM_STUFF + 1)
        gt_2ch[..., 2] = (pano >= NUM_STUFF) * (pano - NUM_STUFF + 1)
        frames.append(dict(sseg=sseg, pano=pano, cls_inds=cls_inds,
                           obj_ids=obj_ids, gt_2ch=gt_2ch))
    return frames


def test_oracle_vpq_is_100(tmp_path):
    frames = synth_video()
    names = [f"frame{t:04d}.png" for t in range(len(frames))]

    # GT: encode gt 2ch maps
    gt_pans, gt_anns = encode_panoptic_video(
        [f["gt_2ch"] for f in frames], CATEGORIES
    )

    # predictions through the full unified path
    pred_2ch = get_unified_pan_result(
        [f["sseg"] for f in frames],
        [f["pano"] for f in frames],
        [f["cls_inds"] for f in frames],
        [f["obj_ids"] for f in frames],
        names=names,
        stuff_area_limit=16,
    )
    pred_pans, pred_anns = encode_panoptic_video(
        [pred_2ch[n] for n in names], CATEGORIES
    )

    videos = [list(zip(gt_anns, pred_anns, gt_pans, pred_pans))]
    vpq_all, vpq_thing, vpq_stuff = vpq_eval_all(
        videos, CATEGORIES, output_dir=str(tmp_path)
    )
    assert abs(vpq_all - 100.0) < 1e-6, (vpq_all, vpq_thing, vpq_stuff)
    assert (tmp_path / "vpq-final.txt").exists()
    assert (tmp_path / "vpq-0.txt").exists()


def test_identity_drift_costs_vpq(tmp_path):
    """Breaking track identity at frame 3 must lower windowed VPQ but not
    the single-frame window."""
    frames = synth_video()
    names = [f"f{t}.png" for t in range(len(frames))]
    gt_pans, gt_anns = encode_panoptic_video(
        [f["gt_2ch"] for f in frames], CATEGORIES
    )
    # corrupt: from frame 3 on, instance 0 gets a new object id
    for f in frames[3:]:
        f["obj_ids"] = np.array([5, 1])
    pred_2ch = get_unified_pan_result(
        [f["sseg"] for f in frames],
        [f["pano"] for f in frames],
        [f["cls_inds"] for f in frames],
        [f["obj_ids"] for f in frames],
        names=names, stuff_area_limit=16,
    )
    pred_pans, pred_anns = encode_panoptic_video(
        [pred_2ch[n] for n in names], CATEGORIES
    )
    videos = [list(zip(gt_anns, pred_anns, gt_pans, pred_pans))]
    from vps_tpu.eval.vpq import vpq_compute

    a1, t1, s1 = vpq_compute(videos, CATEGORIES, nframes=1)
    a2, t2, s2 = vpq_compute(videos, CATEGORIES, nframes=2)
    assert abs(a1 - 100.0) < 1e-6  # per-frame still perfect
    assert t2 < t1  # tube matching penalizes the id switch
    assert abs(s2 - 100.0) < 1e-6  # stuff unaffected


@pytest.mark.slow
def test_model_to_vpq_plumbing(tmp_path):
    """Untrained tiny detector → sequential video inference → VPQ pipeline."""
    import jax
    import jax.numpy as jnp

    from vps_tpu import zoo
    from vps_tpu.models.detectors import PanopticFuseTrack, empty_track_state

    cfg = zoo.tiny_overrides(zoo.fusetrack_model_cfg())
    cfg.pop("type")
    det = PanopticFuseTrack(
        train_cfg=zoo.tiny_train_cfg(), test_cfg=zoo.tiny_test_cfg(), **cfg
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    state = empty_track_state(cap=32)
    variables = det.init({"params": jax.random.PRNGKey(0)}, img, img, state,
                         method=det.predict)

    @jax.jit
    def step(img, ref, st):
        return det.apply(variables, img, ref, st, method=det.predict)

    results = dict(names=[], ssegs=[], panos=[], cls_inds=[], obj_ids=[])
    imgs = [rng.randn(1, H, W, 3).astype(np.float32) for _ in range(3)]
    for t in range(3):
        ref = imgs[t - 1] if t > 0 else imgs[t]
        out, state = step(jnp.asarray(imgs[t]), jnp.asarray(ref), state)
        nk = int(out["num_keep"])
        results["names"].append(f"f{t}.png")
        results["ssegs"].append(np.asarray(out["fcn_outputs"], np.uint8))
        results["panos"].append(np.asarray(out["panoptic_outputs"], np.uint8))
        results["cls_inds"].append(np.asarray(out["panoptic_cls_inds"][:nk]))
        results["obj_ids"].append(np.asarray(out["panoptic_det_obj_ids"][:nk]))

    pred_2ch = get_unified_pan_result(
        results["ssegs"], results["panos"], results["cls_inds"],
        results["obj_ids"], names=results["names"], stuff_area_limit=16,
    )
    pred_pans, pred_anns = encode_panoptic_video(
        [pred_2ch[n] for n in results["names"]], CATEGORIES
    )
    # GT = synthetic
    frames = synth_video(nframes=3)
    gt_pans, gt_anns = encode_panoptic_video(
        [f["gt_2ch"] for f in frames], CATEGORIES
    )
    videos = [list(zip(gt_anns, pred_anns, gt_pans, pred_pans))]
    vpq_all, _, _ = vpq_eval_all(videos, CATEGORIES, output_dir=str(tmp_path),
                                 window_sizes=(1, 2))
    assert 0.0 <= vpq_all <= 100.0
