"""Build per-frame panoptic instance maps + semantic label maps from raw
Cityscapes gtFine color/instanceIds annotations.

Port of the reference prepare_data/create_panoptic_labels.py semantics:
- label_map (uint8): trainId semantic map decoded from the gtFine color png
  via the category color table; void = 255.
- pan_map (uint32): stuff pixels = category id; thing pixels =
  category_id * 1000 + (instanceId % 1000); void = 255. Thing instances are
  taken from gtFine_instanceIds (ids >= 1000), each instance's category
  decided by majority vote of the semantic map under its mask.

Usage: python prepare_data/create_panoptic_labels.py --mode val \
    --root_dir data/city_ext/
"""

from __future__ import annotations

import argparse
import multiprocessing
import os
import os.path as osp

import numpy as np

from city_categories import COLOR2ID, ID2CATINFO, VOID


def sem_inst_to_pan(sem_file, inst_file):
    from PIL import Image

    color = np.array(Image.open(sem_file), dtype=np.uint32)[:, :, :3]
    sem_map = color[:, :, 0] + color[:, :, 1] * 256 + color[:, :, 2] * 65536
    inst_map = np.array(Image.open(inst_file))
    pan_map = np.full(sem_map.shape, VOID, np.uint32)
    label_map = np.full(sem_map.shape, VOID, np.uint8)

    for sem_id in np.unique(sem_map):
        if sem_id not in COLOR2ID:
            continue
        fcn_id = COLOR2ID[sem_id]
        mask = sem_map == sem_id
        label_map[mask] = fcn_id
        if ID2CATINFO[fcn_id]["isthing"] == 1:
            continue  # things enter pan_map via the instance loop
        pan_map[mask] = fcn_id

    for inst_id in np.unique(inst_map):
        if inst_id < 1000:  # stuff-coded ids carry no instance
            continue
        obj_mask = inst_map == inst_id
        ids, cnt = np.unique(sem_map[obj_mask], return_counts=True)
        sem_id = ids[np.argmax(cnt)]
        if sem_id not in COLOR2ID:
            continue
        fcn_id = COLOR2ID[sem_id]
        if ID2CATINFO[fcn_id]["isthing"] == 0:
            continue
        pan_map[obj_mask] = fcn_id * 1000 + inst_id % 1000

    return pan_map, label_map


def _worker(pairs, pan_dir, label_dir):
    from PIL import Image

    for sem_file, inst_file in pairs:
        pan_map, label_map = sem_inst_to_pan(sem_file, inst_file)
        name = osp.basename(sem_file)
        Image.fromarray(pan_map).save(osp.join(pan_dir, name))
        Image.fromarray(label_map).save(osp.join(label_dir, name))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="val")
    p.add_argument("--root_dir", default="data/city_ext/")
    p.add_argument("--workers", type=int,
                   default=max(multiprocessing.cpu_count() // 2, 1))
    args = p.parse_args()

    sem_dir = osp.join(args.root_dir, args.mode, "cls")
    inst_dir = osp.join(args.root_dir, args.mode, "inst")
    label_dir = osp.join(args.root_dir, args.mode, "labelmap")
    pan_dir = osp.join(args.root_dir, args.mode, "panoptic_inst")
    os.makedirs(label_dir, exist_ok=True)
    os.makedirs(pan_dir, exist_ok=True)

    sem_files = sorted(
        osp.join(sem_dir, x) for x in os.listdir(sem_dir) if x.endswith(".png")
    )
    inst_files = sorted(
        osp.join(inst_dir, x) for x in os.listdir(inst_dir)
        if x.endswith(".png")
    )
    assert len(sem_files) == len(inst_files)
    pairs = list(zip(sem_files, inst_files))
    chunks = np.array_split(pairs, args.workers)
    procs = [
        multiprocessing.Process(target=_worker, args=(c, pan_dir, label_dir))
        for c in chunks if len(c)
    ]
    for pr in procs:
        pr.start()
    for pr in procs:
        pr.join()
    print(f"wrote {len(pairs)} panoptic/label map pairs -> {pan_dir}")


if __name__ == "__main__":
    main()
