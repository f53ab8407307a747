"""Regenerate the things-instances json straight from the panoptic_inst
PNGs — the GT cross-check tool (port of the reference
prepare_data/debug_panoptic_labels_jsons.py:133-269): every thing segment
(pan_id >= 1000) becomes a COCO-style RLE annotation with bbox/area, so a
dataset build can be verified against its own panoptic maps (or a fresh
instances json produced for a debug layout).

Output: <root_dir>/instances_<mode>_cityscapes_rle.json with
categories = the 8 thing classes, annotations carrying
{category_id (=fcn id), inst_id (=pan id), area, bbox [x,y,w,h],
segmentation {counts, size}} — the same fields the CityscapesVPS dataset
loader consumes (vps_tpu/data/coco.py).

Usage: python prepare_data/debug_panoptic_labels_jsons.py --mode val \
    --root_dir data/city_dbg/
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import os.path as osp
import sys

import numpy as np

from city_categories import CATEGORIES

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

SIZE_THR = 8 ** 2  # reference debug_panoptic_labels_jsons.py:134
OFFSET = 1000
STUFF_MAX = 10


def png2insts(png_file):
    """One annotation per thing segment of a panoptic_inst png
    (reference png2insts, debug_panoptic_labels_jsons.py:136-169)."""
    from PIL import Image

    from vps_tpu.native import rle_encode

    pan_map = np.array(Image.open(png_file), dtype=np.uint32)
    insts = []
    for pan_id in np.unique(pan_map):
        fcn_id = int(pan_id) // OFFSET
        if fcn_id == 0:  # stuff / void
            continue
        obj_mask = pan_map == pan_id
        area = int(obj_mask.sum())
        ys, xs = np.where(obj_mask)
        x0, y0 = int(xs.min()), int(ys.min())
        bw, bh = int(xs.max() - x0 + 1), int(ys.max() - y0 + 1)
        h, w = obj_mask.shape
        insts.append(dict(
            fcn_id=fcn_id,
            inst_id=int(pan_id),
            area=area,
            iscrowd=0,
            bbox=[x0, y0, bw, bh],
            segmentation=dict(counts=rle_encode(obj_mask.astype(np.uint8)),
                              size=[h, w]),
        ))
    return insts


def _one_file(args):
    pan_dir, png_file, mode = args
    name = osp.basename(png_file)
    vid = name[:4]
    iid = int(name[:9].replace("_", ""))
    insts = png2insts(osp.join(pan_dir, png_file))
    from PIL import Image

    with Image.open(osp.join(pan_dir, png_file)) as im:
        w, h = im.size
    kept = []
    for inst in insts:
        if inst["fcn_id"] <= STUFF_MAX:
            print(f"Warning: wrong FCN id {inst['fcn_id']} in {name}")
            continue
        inst["image_id"] = iid
        inst["category_id"] = inst["fcn_id"]
        inst["width"] = w
        inst["height"] = h
        kept.append(inst)
    img_name = name.replace("final_mask", "newImg8bit").replace(
        "gtFine_color", "leftImg8bit")
    image_info = dict(id=iid, file_name=img_name, width=w, height=h,
                      video_id=vid)
    return image_info, kept


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="val")
    p.add_argument("--root_dir", default="data/city_dbg/")
    p.add_argument("--workers", type=int,
                   default=max(multiprocessing.cpu_count() // 2, 1))
    args = p.parse_args()

    pan_dir = osp.join(args.root_dir, args.mode, "panoptic_inst")
    assert osp.isdir(pan_dir), pan_dir
    png_files = sorted(x for x in os.listdir(pan_dir) if x.endswith(".png"))
    tasks = [(pan_dir, f, args.mode) for f in png_files]
    if args.workers > 1:
        with multiprocessing.Pool(args.workers) as pool:
            outs = pool.map(_one_file, tasks)
    else:
        outs = [_one_file(t) for t in tasks]

    images, annotations = [], []
    for im, insts in outs:
        images.append(im)
        annotations.extend(insts)
    for idx, ann in enumerate(annotations):
        ann["id"] = idx

    coco = dict(
        categories=[c for c in CATEGORIES if c["isthing"] == 1],
        images=images,
        annotations=annotations,
    )
    out = osp.join(args.root_dir, f"instances_{args.mode}_cityscapes_rle.json")
    with open(out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations -> "
          f"{out}")


if __name__ == "__main__":
    main()
