"""Cityscapes-VPS category table (19 train classes: 11 stuff + 8 things).

Data equivalent of the reference prepare_data/city_default.py CATEGORIES —
the names/colors/ids are the standard public Cityscapes label definitions
(cityscapesScripts labels.py), with Cityscapes-VPS's id ordering:
stuff 0-10, things 11-18. `ori_id` is the original Cityscapes labelId.
"""

# (id, name, supercategory, isthing, ori_id, color)
_RAW = [
    (0, "road", "flat", 0, 7, (128, 64, 128)),
    (1, "sidewalk", "flat", 0, 8, (244, 35, 232)),
    (2, "building", "construction", 0, 11, (70, 70, 70)),
    (3, "wall", "construction", 0, 12, (102, 102, 156)),
    (4, "fence", "construction", 0, 13, (190, 153, 153)),
    (5, "pole", "object", 0, 17, (153, 153, 153)),
    (6, "traffic light", "object", 0, 19, (250, 170, 30)),
    (7, "traffic sign", "object", 0, 20, (220, 220, 0)),
    (8, "vegetation", "nature", 0, 21, (107, 142, 35)),
    (9, "terrain", "nature", 0, 22, (152, 251, 152)),
    (10, "sky", "sky", 0, 23, (70, 130, 180)),
    (11, "person", "human", 1, 24, (220, 20, 60)),
    (12, "rider", "human", 1, 25, (255, 0, 0)),
    (13, "car", "vehicle", 1, 26, (0, 0, 142)),
    (14, "truck", "vehicle", 1, 27, (0, 0, 70)),
    (15, "bus", "vehicle", 1, 28, (0, 60, 100)),
    (16, "train", "vehicle", 1, 31, (0, 80, 100)),
    (17, "motorcycle", "vehicle", 1, 32, (0, 0, 230)),
    (18, "bicycle", "vehicle", 1, 33, (119, 11, 32)),
]

CATEGORIES = [
    dict(
        id=i,
        name=name,
        supercategory=sup,
        isthing=isthing,
        instance_eval=isthing,
        trainid=i,
        ori_id=ori,
        color=list(color),
    )
    for i, name, sup, isthing, ori, color in _RAW
]

ID2CATINFO = {c["id"]: c for c in CATEGORIES}
COLOR2ID = {
    c["color"][0] + c["color"][1] * 256 + c["color"][2] * 256 * 256: c["id"]
    for c in CATEGORIES
}
ORI2FCN = {c["ori_id"]: c["id"] for c in CATEGORIES}
VOID = 255
