"""Fetch Cityscapes sequence frames into the Cityscapes-VPS layout.

Port of the reference prepare_data/fetch_city_images.py: for every image
entry in panoptic_im_{mode}_city_vps.json (and im_all_info_*.json for
val/test), copy the matching frame out of leftImg8bit_sequence into
{dst}/{mode}/img (and img_all).

Usage: python prepare_data/fetch_city_images.py --mode train \
    --src_dir data/leftImg8bit_sequence/train --dst_dir data/cityscapes_vps
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import shutil

PREFIX_LEN = len("0000_0000_")


def fetch(json_path, src_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    with open(json_path) as f:
        images = json.load(f)["images"]
    for img in images:
        name = img["id"][PREFIX_LEN:]
        city = name.split("_")[0]
        src = osp.join(src_dir, city, name + "_leftImg8bit.png")
        shutil.copy(src, osp.join(out_dir, img["file_name"]))
    return len(images)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train", choices=["train", "val", "test"])
    p.add_argument("--src_dir", default="data/leftImg8bit_sequence/val")
    p.add_argument("--dst_dir", default="data/city_ext")
    args = p.parse_args()

    dst = osp.join(args.dst_dir, args.mode)
    n = fetch(
        osp.join(args.dst_dir, f"panoptic_im_{args.mode}_city_vps.json"),
        args.src_dir,
        osp.join(dst, "img"),
    )
    print(f"fetched {n} annotated frames -> {dst}/img")

    if args.mode in ("val", "test"):
        n = fetch(
            osp.join(args.dst_dir, f"im_all_info_{args.mode}_city_vps.json"),
            args.src_dir,
            osp.join(dst, "img_all"),
        )
        print(f"fetched {n} sequence frames -> {dst}/img_all")


if __name__ == "__main__":
    main()
