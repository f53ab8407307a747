"""VOC-style mAP evaluation of pickled detection results (reference
tools/voc_eval.py): results pickle is a per-image list of per-class (n, 5)
arrays; annotations come from the dataset config.

Usage: python tools/voc_eval.py RESULTS.pkl CONFIG [--iou-thr 0.5]
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
    p.add_argument("results", help="detection results pickle")
    p.add_argument("config")
    p.add_argument("--iou-thr", type=float, default=0.5)
    p.add_argument("--mode", default="area", choices=["area", "11points"])
    args = p.parse_args()

    from vps_tpu.config import Config
    from vps_tpu.data import build_dataset
    from vps_tpu.eval.mean_ap import eval_map

    with open(args.results, "rb") as f:
        det_results = pickle.load(f)
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data["val"])

    gt_bboxes, gt_labels, gt_ignore = [], [], []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        bboxes = np.asarray(ann["bboxes"], np.float32).reshape(-1, 4)
        labels = np.asarray(ann["labels"], np.int64)
        ignore = np.zeros(len(labels), bool)
        if "bboxes_ignore" in ann and len(ann["bboxes_ignore"]):
            big = np.asarray(ann["bboxes_ignore"], np.float32).reshape(-1, 4)
            bboxes = np.vstack([bboxes, big])
            labels = np.concatenate(
                [labels, np.zeros(len(big), np.int64)]
            )
            ignore = np.concatenate([ignore, np.ones(len(big), bool)])
        gt_bboxes.append(bboxes)
        gt_labels.append(labels)
        gt_ignore.append(ignore)

    classes = getattr(dataset, "CLASSES", None)
    eval_map(
        det_results, gt_bboxes, gt_labels, gt_ignore=gt_ignore,
        iou_thr=args.iou_thr, mode=args.mode, dataset=classes,
    )


if __name__ == "__main__":
    main()
