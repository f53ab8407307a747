"""Copy original-Cityscapes 20th-frame annotations into the VPS layout.

Port of the reference prepare_data/merge_datasets.py: for every
leftImg8bit entry in panoptic_im_{mode}_city_vps.json, copy
{city}/{name}_gtFine_color.png → {mode}/cls/ and
{name}_gtFine_instanceIds.png → {mode}/inst/ with the video-frame prefix.

Usage: python prepare_data/merge_datasets.py --mode train \
    --src_dir data/cityscapes/gtFine/train --dst_dir data/city_ext
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import shutil

PREFIX_LEN = len("0000_0000_")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train")
    p.add_argument("--src_dir",
                   default="data/cityscapes/gtFine_trainvaltest/gtFine/val")
    p.add_argument("--dst_dir", default="data/city_ext")
    args = p.parse_args()

    dst = osp.join(args.dst_dir, args.mode)
    os.makedirs(osp.join(dst, "cls"), exist_ok=True)
    os.makedirs(osp.join(dst, "inst"), exist_ok=True)
    with open(
        osp.join(args.dst_dir, f"panoptic_im_{args.mode}_city_vps.json")
    ) as f:
        images = json.load(f)["images"]

    n = 0
    for img in images:
        if "leftImg8bit" not in img["file_name"]:
            continue
        name = img["id"][PREFIX_LEN:]
        prefix = img["id"][:PREFIX_LEN]
        city = name.split("_")[0]
        shutil.copy(
            osp.join(args.src_dir, city, name + "_gtFine_color.png"),
            osp.join(dst, "cls", prefix + name + "_gtFine_color.png"),
        )
        shutil.copy(
            osp.join(args.src_dir, city, name + "_gtFine_instanceIds.png"),
            osp.join(dst, "inst", prefix + name + "_gtFine_instanceIds.png"),
        )
        n += 1
    print(f"copied {n} gtFine color/instance annotation pairs -> {dst}")


if __name__ == "__main__":
    main()
