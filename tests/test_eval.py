import numpy as np

from vps_tpu.eval.pq import PQStat
from vps_tpu.eval.vpq import vpq_compute_video, vpq_compute
from vps_tpu.eval.unified import (
    get_unified_pan_result,
    encode_panoptic_video,
    ColorGenerator,
)

CATEGORIES = {
    0: dict(id=0, isthing=0, color=[128, 64, 128]),   # stuff (road)
    11: dict(id=11, isthing=1, color=[220, 20, 60]),  # thing (person)
}


def _id2rgb(idmap):
    out = np.zeros((*idmap.shape, 3), np.uint8)
    out[..., 0] = idmap % 256
    out[..., 1] = (idmap // 256) % 256
    out[..., 2] = idmap // (256 * 256)
    return out


def _frame(inst_box, stuff_id=7, inst_id=300):
    """20x20 map: stuff everywhere except an instance box."""
    idmap = np.full((20, 20), stuff_id, np.uint32)
    y0, x0, y1, x1 = inst_box
    idmap[y0:y1, x0:x1] = inst_id
    segments = [
        dict(id=stuff_id, category_id=0, iscrowd=0, area=int((idmap == stuff_id).sum())),
        dict(id=inst_id, category_id=11, iscrowd=0, area=int((idmap == inst_id).sum())),
    ]
    return dict(segments_info=segments), _id2rgb(idmap)


def test_vpq_perfect_match():
    gt_json, gt_pan = _frame((5, 5, 10, 10))
    pred_json, pred_pan = _frame((5, 5, 10, 10))
    frames = [(gt_json, pred_json, gt_pan, pred_pan)] * 2
    stat = vpq_compute_video(frames, CATEGORIES, nframes=2)
    assert stat[0].tp == 1 and stat[11].tp == 1
    assert stat[0].fp == 0 and stat[11].fn == 0
    res, _ = stat.pq_average(CATEGORIES, None)
    assert abs(res["pq"] - 1.0) < 1e-6


def test_vpq_tube_mismatch_across_time():
    # instance matches per-frame but drifts: frame2 prediction uses a
    # DIFFERENT id → tube is split → IoU per tube < 0.5 → FN + FP
    gt1, gtp1 = _frame((5, 5, 10, 10))
    gt2, gtp2 = _frame((5, 5, 10, 10))
    pr1, prp1 = _frame((5, 5, 10, 10), inst_id=300)
    pr2, prp2 = _frame((5, 5, 10, 10), inst_id=301)
    pr2["segments_info"][1]["id"] = 301
    frames = [(gt1, pr1, gtp1, prp1), (gt2, pr2, gtp2, prp2)]
    stat = vpq_compute_video(frames, CATEGORIES, nframes=2)
    assert stat[11].tp == 0
    assert stat[11].fn == 1
    assert stat[11].fp == 2
    # with window 1 both frames match fine
    stat1 = vpq_compute_video(frames, CATEGORIES, nframes=1)
    assert stat1[11].tp == 2


def test_vpq_iou_threshold():
    gt_json, gt_pan = _frame((5, 5, 10, 10))  # 25 px
    pred_json, pred_pan = _frame((5, 5, 10, 8))  # 15 px, inter 15, union 25
    frames = [(gt_json, pred_json, gt_pan, pred_pan)]
    stat = vpq_compute_video(frames, CATEGORIES, nframes=1)
    assert stat[11].tp == 1  # IoU 0.6 > 0.5
    pred_json2, pred_pan2 = _frame((5, 5, 10, 7))  # 10 px, IoU 0.4
    stat2 = vpq_compute_video([(gt_json, pred_json2, gt_pan, pred_pan2)],
                              CATEGORIES, nframes=1)
    assert stat2[11].tp == 0 and stat2[11].fn == 1 and stat2[11].fp == 1


def test_unified_pan_result_majority_vote():
    # panoptic map: stuff 0 everywhere, instance (11) in a box
    pan = np.zeros((20, 20), np.uint8)
    pan[5:10, 5:10] = 11  # first instance channel
    seg = np.zeros((20, 20), np.uint8)
    seg[5:10, 5:10] = 11  # semantic agrees (thing class 1 → 11)
    out = get_unified_pan_result(
        [seg], [pan], [np.array([1])], [np.array([4])], names=["f1"],
        stuff_area_limit=10,
    )["f1"]
    assert out.shape == (20, 20, 3)
    region = out[5:10, 5:10]
    assert np.all(region[..., 0] == 11)  # semantic class
    assert np.all(region[..., 1] == 1)  # instance index
    assert np.all(region[..., 2] == 5)  # obj id + 1
    assert np.all(out[0, 0] == [0, 0, 0])


def test_unified_stuff_area_limit():
    pan = np.zeros((20, 20), np.uint8)
    pan[0, 0:3] = 5  # tiny stuff region of class 5
    seg = pan.copy()
    out = get_unified_pan_result(
        [seg], [pan], [np.zeros(0, int)], [np.zeros(0, int)], names=["f"],
        stuff_area_limit=5,
    )["f"]
    assert np.all(out[0, 0:3, 0] == 255)  # removed as too small


def test_encode_video_track_color_persistence():
    pan1 = np.zeros((16, 16, 3), np.uint8)
    pan1[..., 0] = 0
    pan1[2:8, 2:8, 0] = 11
    pan1[2:8, 2:8, 2] = 7  # track id 7
    pan2 = pan1.copy()
    pan2[..., 2] = 0
    pan2[4:10, 4:10, 0] = 11
    pan2[4:10, 4:10, 2] = 7  # same track id, moved
    cats = {0: dict(id=0, isthing=0, color=[10, 20, 30]),
            11: dict(id=11, isthing=1, color=[200, 30, 30])}
    pans, anns = encode_panoptic_video([pan1, pan2], cats)
    c1 = pans[0][4, 4]
    c2 = pans[1][6, 6]
    np.testing.assert_array_equal(c1, c2)  # same color across frames
    assert len(anns) == 2
    ids1 = {s["id"] for s in anns[0]["segments_info"]}
    assert ColorGenerator.rgb2id(c1) in ids1
