"""COCO-protocol evaluation of detection/segm results (reference
tools/coco_eval.py wraps pycocotools; here the mAP@[.5:.95] protocol is
computed natively over IoU thresholds with the ported mean_ap machinery).

Usage: python tools/coco_eval.py RESULTS.pkl CONFIG [--types bbox]
"""

from __future__ import annotations

import argparse
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results")
    p.add_argument("config")
    p.add_argument("--split", default="val")
    args = p.parse_args()

    from vps_tpu.config import Config
    from vps_tpu.data import build_dataset
    from vps_tpu.eval.mean_ap import eval_map

    with open(args.results, "rb") as f:
        det_results = pickle.load(f)
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data[args.split])

    gt_bboxes, gt_labels = [], []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        gt_bboxes.append(np.asarray(ann["bboxes"], np.float32).reshape(-1, 4))
        gt_labels.append(np.asarray(ann["labels"], np.int64))

    classes = getattr(dataset, "CLASSES", None)
    aps = []
    for thr in np.arange(0.5, 1.0, 0.05):
        m, _ = eval_map(
            det_results, gt_bboxes, gt_labels, iou_thr=float(thr),
            dataset=classes, print_summary=False,
        )
        aps.append(m)
        print(f"AP@{thr:.2f}: {m:.4f}")
    print(f"AP@[0.50:0.95]: {float(np.mean(aps)):.4f}")


if __name__ == "__main__":
    main()
