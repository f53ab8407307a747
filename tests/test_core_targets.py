import numpy as np
import jax
import jax.numpy as jnp

from vps_tpu.core import max_iou_assign, random_sample, anchor_target, proposal_target


def _boxes(arr):
    return jnp.asarray(np.array(arr, np.float32))


def test_assigner_basic():
    gts = _boxes([[0, 0, 10, 10], [20, 20, 40, 40]])
    boxes = _boxes(
        [
            [0, 0, 10, 10],     # iou 1.0 with gt0 -> pos
            [0, 0, 9, 9],       # high iou gt0 -> pos
            [50, 50, 60, 60],   # no overlap -> neg
            [19, 19, 41, 41],   # high iou gt1 -> pos
            [5, 5, 30, 30],     # middling -> depends
        ]
    )
    labels = jnp.asarray([3, 5])
    res = max_iou_assign(
        boxes, gts, pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
        gt_labels=labels,
    )
    a = np.asarray(res.assigned_gt_inds)
    assert a[0] == 1 and a[1] == 1
    assert a[2] == 0
    assert a[3] == 2
    l = np.asarray(res.labels)
    assert l[0] == 3 and l[3] == 5


def test_assigner_low_quality_match():
    # gt whose best anchor has IoU in [min_pos, pos_thr): claimed via step 4
    gts = _boxes([[0, 0, 20, 20]])
    boxes = _boxes([[0, 0, 20, 30], [100, 100, 120, 120]])
    res = max_iou_assign(boxes, gts, pos_iou_thr=0.95, neg_iou_thr=0.3,
                         min_pos_iou=0.3)
    a = np.asarray(res.assigned_gt_inds)
    assert a[0] == 1  # claimed by gt despite being below pos_iou_thr
    assert a[1] == 0


def test_assigner_padded_gt_ignored():
    gts = _boxes([[0, 0, 10, 10], [0, 0, 10, 10]])
    gt_valid = jnp.asarray([True, False])
    boxes = _boxes([[0, 0, 10, 10]])
    res = max_iou_assign(boxes, gts, 0.5, 0.3, 0.3, gt_valid=gt_valid)
    assert int(res.assigned_gt_inds[0]) == 1  # assigned to the valid gt only


def test_assigner_no_valid_gt_all_negative():
    gts = _boxes([[0, 0, 10, 10]])
    gt_valid = jnp.asarray([False])
    boxes = _boxes([[0, 0, 10, 10], [5, 5, 20, 20]])
    res = max_iou_assign(boxes, gts, 0.5, 0.3, 0.3, gt_valid=gt_valid)
    assert np.all(np.asarray(res.assigned_gt_inds) == 0)


def test_sampler_caps_and_fills():
    rng = np.random.RandomState(0)
    assigned = np.zeros(1000, np.int32)
    assigned[:300] = 1  # 300 positives
    assigned[300:350] = -1  # neutral
    res = random_sample(jax.random.PRNGKey(0), jnp.asarray(assigned), 256, 0.5)
    pos = np.asarray(res.pos_mask)
    valid = np.asarray(res.valid)
    assert pos.sum() == 128  # capped at num * pos_fraction
    assert valid.sum() == 256
    # positives form a prefix
    assert np.all(pos[:128]) and not np.any(pos[128:])
    inds = np.asarray(res.inds)
    assert np.all(assigned[inds[:128]] > 0)
    assert np.all(assigned[inds[128:]] == 0)
    # no duplicate indices among valid slots
    assert len(np.unique(inds[valid])) == valid.sum()


def test_sampler_few_positives():
    assigned = np.zeros(100, np.int32)
    assigned[:5] = 1
    res = random_sample(jax.random.PRNGKey(1), jnp.asarray(assigned), 64, 0.25)
    assert int(res.num_pos) == 5
    assert int(res.num_neg) == 59


def test_anchor_target_shapes_and_weights():
    n = 500
    rng = np.random.RandomState(0)
    anchors = np.concatenate(
        [rng.uniform(0, 90, (n, 2)), np.zeros((n, 2))], -1
    ).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 20, (n, 2))
    gts = _boxes([[10, 10, 30, 30], [50, 50, 80, 80]])
    cfg = dict(
        assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3),
        sampler=dict(num=64, pos_fraction=0.5),
        allowed_border=0,
    )
    t = anchor_target(
        jax.random.PRNGKey(0),
        jnp.asarray(anchors),
        jnp.ones((n,), bool),
        gts,
        jnp.ones((2,), bool),
        (100, 100),
        cfg,
    )
    assert t.labels.shape == (n,)
    assert float(jnp.sum(t.label_weights)) == float(t.num_pos + t.num_neg)
    # positive anchors have bbox weights
    assert float(jnp.sum(t.bbox_weights)) == 4 * float(t.num_pos)
    # all positives labeled 1
    assert np.all(np.asarray(t.labels)[np.asarray(t.bbox_weights[:, 0]) > 0] == 1)


def test_proposal_target_with_masks_and_pids():
    rng = np.random.RandomState(0)
    p = 100
    proposals = np.concatenate(
        [rng.uniform(0, 60, (p, 2)), np.zeros((p, 2))], -1
    ).astype(np.float32)
    proposals[:, 2:] = proposals[:, :2] + rng.uniform(8, 30, (p, 2))
    gts = _boxes([[10, 10, 30, 30], [40, 40, 70, 70]])
    gt_labels = jnp.asarray([2, 7])
    gt_pids = jnp.asarray([1, 0])  # gt0 matches ref obj 1; gt1 is new
    masks = np.zeros((2, 80, 80), np.float32)
    masks[0, 10:31, 10:31] = 1
    masks[1, 40:71, 40:71] = 1
    cfg = dict(
        assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5),
        sampler=dict(num=32, pos_fraction=0.25),
        mask_size=28,
    )
    t = proposal_target(
        jax.random.PRNGKey(2),
        jnp.asarray(proposals),
        jnp.ones((p,), bool),
        gts,
        gt_labels,
        jnp.ones((2,), bool),
        cfg,
        gt_pids=gt_pids,
        gt_masks=jnp.asarray(masks),
    )
    assert t.rois.shape == (32, 4)
    assert t.mask_targets.shape == (8, 28, 28)
    npos = int(t.num_pos)
    assert npos >= 2  # gts added as proposals guarantee positives
    labels = np.asarray(t.labels)
    assert set(labels[:npos]) <= {2, 7}
    ids = np.asarray(t.ids)
    w = np.asarray(t.id_weights)
    assert np.all(w[:npos] == 1)
    # positives matched to gt0 carry pid 1, gt1 pid 0
    for i in range(npos):
        assert ids[i] == (1 if labels[i] == 2 else 0)
    # mask target of a gt-box roi should be ~all ones
    pos_lbl = labels[:npos]
    mt = np.asarray(t.mask_targets)
    for i in range(min(npos, 8)):
        assert mt[i].mean() > 0.5


# -- config-dispatched samplers/assigners (reference registry `type=`
# semantics, mmdet/core/bbox/samplers/__init__.py) ---------------------

def _dispatch_fixture():
    rng = np.random.RandomState(3)
    p = 80
    proposals = np.concatenate(
        [rng.uniform(0, 60, (p, 2)), np.zeros((p, 2))], -1
    ).astype(np.float32)
    proposals[:, 2:] = proposals[:, :2] + rng.uniform(8, 30, (p, 2))
    gts = _boxes([[10, 10, 30, 30], [40, 40, 70, 70]])
    gt_labels = jnp.asarray([2, 7])
    return jnp.asarray(proposals), gts, gt_labels


def _run_with_sampler(sampler_cfg, loss_fn=None):
    proposals, gts, gt_labels = _dispatch_fixture()
    cfg = dict(
        assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5),
        sampler=sampler_cfg,
    )
    return proposal_target(
        jax.random.PRNGKey(4),
        proposals,
        jnp.ones((proposals.shape[0],), bool),
        gts,
        gt_labels,
        jnp.ones((2,), bool),
        cfg,
        loss_fn=loss_fn,
    )


def test_sampler_config_dispatch_switches_behavior():
    """A config `type=` change ALONE selects the sampler — no code change."""
    base = dict(num=16, pos_fraction=0.25)
    t_rand = _run_with_sampler(dict(type="RandomSampler", **base))
    t_inst = _run_with_sampler(
        dict(type="InstanceBalancedPosSampler", **base))
    t_iou = _run_with_sampler(dict(type="IoUBalancedNegSampler", **base))
    t_comb = _run_with_sampler(dict(type="CombinedSampler", **base))
    for t in (t_rand, t_inst, t_iou, t_comb):
        assert t.rois.shape == (16, 4)
        assert int(t.num_pos) >= 2
    # default type omitted == RandomSampler
    t_default = _run_with_sampler(dict(**base))
    assert t_default.rois.shape == (16, 4)


def test_sampler_config_dispatch_ohem():
    """OHEMSampler picks the HARDEST candidates by the supplied loss."""
    proposals, gts, gt_labels = _dispatch_fixture()
    n_cand = proposals.shape[0] + 2

    hard = np.zeros((n_cand,), np.float32)
    hard[5] = 100.0  # make candidate 5 maximally hard

    def loss_fn(cand, cand_valid, assign):
        assert cand.shape[0] == n_cand
        return jnp.asarray(hard)

    t = _run_with_sampler(
        dict(type="OHEMSampler", num=16, pos_fraction=0.25), loss_fn=loss_fn)
    # the hardest candidate must be among the sampled rois
    cand5 = np.asarray(proposals)[5]
    rois = np.asarray(t.rois)
    assert np.any(np.all(np.isclose(rois, cand5[None], atol=1e-5), axis=1))


def test_sampler_unknown_type_raises():
    import pytest

    with pytest.raises(KeyError):
        _run_with_sampler(dict(type="NopeSampler", num=16, pos_fraction=0.25))


def test_ohem_train_smoke():
    """One FuseTrack train loss step with sampler switched to OHEM purely
    via config (reference ohem_sampler.py hard-mining path)."""
    from vps_tpu import zoo
    from vps_tpu.models.detectors import PanopticFuseTrack

    cfg = zoo.tiny_overrides(zoo.fusetrack_model_cfg())
    cfg.pop("type")
    train_cfg = zoo.tiny_train_cfg()
    train_cfg["rcnn"] = dict(train_cfg["rcnn"])
    train_cfg["rcnn"]["sampler"] = dict(
        train_cfg["rcnn"]["sampler"], type="OHEMSampler")
    det = PanopticFuseTrack(
        train_cfg=train_cfg, test_cfg=zoo.tiny_test_cfg(), **cfg)

    h, w, max_gt = 64, 128, 4
    rng = np.random.RandomState(0)
    gt_bboxes = np.zeros((max_gt, 4), np.float32)
    gt_bboxes[0] = [8, 8, 40, 40]
    gt_valid = np.zeros((max_gt,), bool)
    gt_valid[0] = True
    gt_labels = np.zeros((max_gt,), np.int32)
    gt_labels[0] = 1
    gt_masks = np.zeros((max_gt, h, w), np.float32)
    gt_masks[0, 8:41, 8:41] = 1

    losses = det.init_with_output(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        img=jnp.asarray(rng.randn(1, h, w, 3), jnp.float32),
        ref_img=jnp.asarray(rng.randn(1, h, w, 3), jnp.float32),
        gt_bboxes=jnp.asarray(gt_bboxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_valid=jnp.asarray(gt_valid),
        gt_masks=jnp.asarray(gt_masks),
        gt_semantic_seg=jnp.asarray(
            rng.randint(0, 19, (1, h, w)), jnp.int32),
        gt_semantic_seg_Nx=jnp.asarray(
            rng.randint(0, 19, (1, h // 4, w // 4)), jnp.int32),
        gt_pids=jnp.asarray(np.where(gt_valid, 1, 0), jnp.int32),
        ref_bboxes=jnp.asarray(gt_bboxes),
        ref_valid=jnp.asarray(gt_valid),
        method=det.loss,
    )[0]
    total = sum(
        float(v) for k, v in losses.items()
        if k.startswith("loss_")
    )
    assert np.isfinite(total)
