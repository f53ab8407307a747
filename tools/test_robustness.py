"""Corruption-robustness benchmark (reference tools/test_robustness.py):
run inference over the val set under image corruptions × severities and
report per-corruption degradation.

The reference evaluates COCO-style detection under the `imagecorruptions`
package's 15 benchmark corruptions; here the corruptions are implemented
natively (vps_tpu/data/corruptions.py) and the per-run metric is bbox mAP
(eval/mean_ap.py) against the dataset GT — the reference's own measure —
plus mean detections/fps. Aggregate P/mPC/rPC with tools/robustness_eval.py
(reference tools/robustness_eval.py:40-140).

Usage: python tools/test_robustness.py CONFIG --checkpoint CKPT --out DIR
       [--corruptions gaussian_noise fog ...] [--severities 1 3 5]
       [--max_frames 30]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from vps_tpu.data.corruptions import BENCHMARK_CORRUPTIONS, corrupt


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--corruptions", nargs="+", default=BENCHMARK_CORRUPTIONS,
                   help="corruption names or 'benchmark'/'noise'/'blur'")
    p.add_argument("--severities", type=int, nargs="+", default=[1, 3, 5])
    p.add_argument("--max_frames", type=int, default=0,
                   help="cap evaluated frames (0 = all)")
    p.add_argument("--track_cap", type=int, default=256)
    return p.parse_args()


GROUPS = {
    "benchmark": BENCHMARK_CORRUPTIONS,
    "noise": ["gaussian_noise", "shot_noise", "impulse_noise"],
    "blur": ["defocus_blur", "gaussian_blur", "motion_blur", "zoom_blur"],
    "weather": ["snow", "frost", "fog", "brightness"],
    "digital": ["contrast", "elastic_transform", "pixelate",
                "jpeg_compression"],
}


def main():
    args = parse_args()
    import jax

    from vps_tpu.utils.platform import apply_env_platforms
    apply_env_platforms()

    from vps_tpu.utils.platform import configure_compile_cache
    configure_compile_cache()
    import jax.numpy as jnp

    from vps_tpu.config import Config
    from vps_tpu.data import build_dataset
    from vps_tpu.models import build_detector
    from vps_tpu.models.detectors import empty_track_state
    from vps_tpu.utils.checkpoint import load_checkpoint

    corruptions = []
    for c in args.corruptions:
        corruptions.extend(GROUPS.get(c, [c]))

    cfg = Config.fromfile(args.config)
    detector = build_detector(cfg.model, train_cfg=cfg.train_cfg,
                              test_cfg=cfg.test_cfg)
    dataset = build_dataset(cfg.data["test"])
    n_frames = len(dataset) if args.max_frames == 0 else min(
        len(dataset), args.max_frames
    )

    img0, ref0, meta0 = dataset.prepare_test(0)
    state0 = empty_track_state(cap=args.track_cap)
    variables = detector.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(img0[None]), jnp.asarray(ref0[None]), state0,
        method=detector.predict,
    )
    restored = load_checkpoint(args.checkpoint, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })
    variables = dict(variables)
    variables["params"] = restored["params"]
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    shape_nopad = tuple(meta0["img_shape_withoutpad"])

    # params passed as an argument: closure-captured device arrays become
    # MLIR constants that trigger a device→host weight fetch at lowering.
    @jax.jit
    def step(variables, img, ref_img, tstate):
        return detector.apply(
            variables, img, ref_img, tstate,
            img_shape_withoutpad=shape_nopad, method=detector.predict,
        )

    os.makedirs(args.out, exist_ok=True)
    report = {}
    # clean pass first (severity 0), then corruption × severity
    runs = [("clean", 0)] + [
        (c, s) for c in corruptions for s in args.severities
    ]
    from vps_tpu.eval.mean_ap import eval_map

    num_fg = cfg.model["bbox_head"]["num_classes"] - 1
    gt_bboxes_all, gt_labels_all = [], []
    for idx in range(n_frames):
        ann = dataset.get_ann_info(idx)
        gt_bboxes_all.append(np.asarray(ann["bboxes"], np.float32))
        gt_labels_all.append(np.asarray(ann["labels"], np.int64))

    for cname, severity in runs:
        tstate = state0
        t0 = time.time()
        seg_counts = []
        det_results = []
        for idx in range(n_frames):
            img, ref_img, meta = dataset.prepare_test(idx)
            if severity > 0:
                # corrupt in raw-intensity space, then renormalize
                from vps_tpu.data.transforms import IMG_MEAN, IMG_STD

                mean = np.asarray(IMG_MEAN, np.float32)
                std = np.asarray(IMG_STD, np.float32)
                raw = img * std + mean
                raw = corrupt(raw, cname, severity, seed=idx)
                img = ((raw - mean) / std).astype(np.float32)
                raw_r = ref_img * std + mean
                raw_r = corrupt(raw_r, cname, severity, seed=idx + 10000)
                ref_img = ((raw_r - mean) / std).astype(np.float32)
            if meta["is_first"]:
                tstate = empty_track_state(cap=args.track_cap)
            outputs, tstate = step(
                variables, jnp.asarray(img[None]), jnp.asarray(ref_img[None]),
                tstate,
            )
            seg_counts.append(int(outputs["num_keep"]))
            # per-class det lists in ORIGINAL image coords for eval_map
            boxes = np.asarray(outputs["det_bboxes"], np.float32)
            probs = np.asarray(outputs["det_probs"], np.float32)
            labels = np.asarray(outputs["det_labels"], np.int64)
            valid = np.asarray(outputs["det_valid"], bool)
            sf = float(meta.get("scale_factor", 1.0))
            per_cls = []
            # outputs["det_labels"] is 0-based (det_cls - 1); eval_map's gt
            # labels are 1-based, handled by its own c+1 indexing
            for c in range(1, num_fg + 1):
                sel = valid & (labels == c - 1)
                per_cls.append(
                    np.concatenate(
                        [boxes[sel] / sf, probs[sel][:, None]], axis=-1
                    )
                )
            det_results.append(per_cls)
        dt = time.time() - t0
        mean_ap, _ = eval_map(
            det_results, gt_bboxes_all, gt_labels_all, print_summary=False
        )
        key = f"{cname}_s{severity}" if severity else "clean"
        report[key] = dict(
            frames=n_frames,
            mean_detections=float(np.mean(seg_counts)),
            bbox_mAP=float(mean_ap),
            fps=n_frames / dt,
        )
        print(f"{key}: {report[key]}", file=sys.stderr)

    with open(osp.join(args.out, "robustness.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
