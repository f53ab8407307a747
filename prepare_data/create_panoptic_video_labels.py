"""Convert per-frame panoptic instance maps into COCO-panoptic video
annotations: color-encoded PNGs + panoptic_gt_{mode}_city_vps.json.

Port of the reference prepare_data/create_panoptic_video_labels.py:
- segment ids are track-consistent within a video (the instid→color map is
  reset at every new video id, i.e. first 4 chars of the image id);
- colors follow the COCO panopticapi IdGenerator scheme: each category's
  base color, jittered per instance, with segment_id = R + 256·G + 65536·B
  (IdGenerator is re-implemented here since panopticapi is not installed);
- areas are recomputed from the encoded png as a sanity check.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp

import numpy as np

from city_categories import CATEGORIES


class IdGenerator:
    """Minimal panopticapi.utils.IdGenerator equivalent: per-category color
    assignment with deterministic jitter, unique across the dataset."""

    def __init__(self, categories_dict):
        self.cats = categories_dict
        self.taken = set()
        self.rng = np.random.RandomState(0)

    def get_id_and_color(self, cat_id):
        base = np.asarray(self.cats[cat_id]["color"], np.int32)
        if self.cats[cat_id]["isthing"] == 0:
            color = tuple(int(v) for v in base)
            sid = color[0] + 256 * color[1] + 65536 * color[2]
            self.taken.add(sid)
            return sid, list(color)
        for _ in range(10000):
            jit = self.rng.randint(-32, 33, size=3)
            color = tuple(int(np.clip(v, 0, 255)) for v in base + jit)
            sid = color[0] + 256 * color[1] + 65536 * color[2]
            if sid not in self.taken and sid != 0:
                self.taken.add(sid)
                return sid, list(color)
        raise RuntimeError(f"color space exhausted for category {cat_id}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="val")
    p.add_argument("--root_dir", default="data/city_ext/")
    args = p.parse_args()

    from PIL import Image

    src = osp.join(args.root_dir, args.mode, "panoptic_inst")
    out_folder = osp.join(args.root_dir, args.mode, "panoptic_video")
    out_file = osp.join(
        args.root_dir, f"panoptic_gt_{args.mode}_city_vps.json"
    )
    os.makedirs(out_folder, exist_ok=True)

    cats_dict = {c["id"]: c for c in CATEGORIES}
    files = sorted(glob.glob(osp.join(src, "*.png")))
    id_gen = IdGenerator(cats_dict)

    images, annotations, videos = [], [], []
    instid2color = {}
    for f in files:
        arr = np.array(Image.open(f))
        file_name = osp.basename(f)
        image_id = file_name.rsplit("_", 2)[0]
        video_id = image_id[:4]
        if video_id not in videos:
            videos.append(video_id)
            instid2color = {}  # track colors reset per video

        image_filename = file_name.replace("final_mask", "newImg8bit").replace(
            "gtFine_color", "leftImg8bit"
        )
        images.append({
            "id": image_id,
            "width": arr.shape[1],
            "height": arr.shape[0],
            "file_name": image_filename,
        })

        pan_png = np.zeros(arr.shape + (3,), np.uint8)
        segm_info = {}
        for el in np.unique(arr):
            if el < 1000:
                semantic_id, is_crowd = int(el), 1
            else:
                semantic_id, is_crowd = int(el // 1000), 0
            if semantic_id not in cats_dict:
                continue
            if cats_dict[semantic_id]["isthing"] == 0:
                is_crowd = 0
            if el not in instid2color:
                instid2color[el] = id_gen.get_id_and_color(semantic_id)
            segment_id, color = instid2color[el]
            pan_png[arr == el] = color
            segm_info[int(segment_id)] = {
                "id": int(segment_id),
                "category_id": semantic_id,
                "iscrowd": is_crowd,
            }

        Image.fromarray(pan_png).save(osp.join(out_folder, file_name))

        # recompute areas from the encoded png (sanity check, as reference)
        enc = pan_png.astype(np.uint32)
        ids = enc[:, :, 0] + enc[:, :, 1] * 256 + enc[:, :, 2] * 65536
        labels, counts = np.unique(ids, return_counts=True)
        remaining = set(segm_info)
        for label, area in zip(labels, counts):
            if label == 0:
                continue
            if int(label) not in segm_info:
                print(f"png label {label} not in json labels ({file_name})")
                continue
            segm_info[int(label)]["area"] = int(area)
            remaining.discard(int(label))
        if remaining:
            raise KeyError(f"segments missing from png: {remaining}")

        annotations.append({
            "image_id": image_id,
            "file_name": file_name,
            "segments_info": list(segm_info.values()),
        })

    with open(out_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": CATEGORIES},
            f,
        )
    print(f"wrote {len(files)} panoptic pngs -> {out_folder}")
    print(f"wrote {out_file}")


if __name__ == "__main__":
    main()
