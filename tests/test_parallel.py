import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vps_tpu.models.detectors import PanopticFuseTrack
from vps_tpu.train import build_lr_schedule, build_optimizer, make_train_step
from vps_tpu.train.step import TrainState, make_mesh, shard_batch, replicate
from vps_tpu import zoo

H, W, MAX_GT = 64, 128, 4


def _tiny_detector():
    cfg = zoo.tiny_overrides(zoo.fusetrack_model_cfg())
    cfg.pop("type")
    return PanopticFuseTrack(
        train_cfg=zoo.tiny_train_cfg(), test_cfg=zoo.tiny_test_cfg(), **cfg
    )


def _sample(rng):
    gt_bboxes = np.zeros((MAX_GT, 4), np.float32)
    gt_bboxes[0] = [8, 8, 40, 40]
    gt_valid = np.zeros((MAX_GT,), bool)
    gt_valid[0] = True
    gt_labels = np.zeros((MAX_GT,), np.int32)
    gt_labels[0] = 1
    gt_masks = np.zeros((MAX_GT, H, W), np.float32)
    gt_masks[0, 8:41, 8:41] = 1
    return dict(
        img=rng.randn(H, W, 3).astype(np.float32),
        ref_img=rng.randn(H, W, 3).astype(np.float32),
        gt_bboxes=gt_bboxes,
        gt_labels=gt_labels,
        gt_valid=gt_valid,
        gt_masks=gt_masks,
        gt_semantic_seg=rng.randint(0, 19, (H, W)).astype(np.int32),
        gt_semantic_seg_Nx=rng.randint(0, 19, (H // 4, W // 4)).astype(np.int32),
        gt_pids=np.where(gt_valid, 1, 0).astype(np.int32),
        ref_bboxes=gt_bboxes,
        ref_valid=gt_valid,
    )


@pytest.mark.slow
def test_data_parallel_train_step_8_devices():
    assert len(jax.devices()) == 8
    det = _tiny_detector()
    rng = np.random.RandomState(0)
    batch = jax.tree.map(
        lambda *xs: np.stack(xs), *[_sample(rng) for _ in range(8)]
    )

    init_rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    s0 = {k: jnp.asarray(v[0]) for k, v in batch.items()}
    variables = det.init(
        init_rngs,
        img=s0["img"][None],
        ref_img=s0["ref_img"][None],
        gt_bboxes=s0["gt_bboxes"],
        gt_labels=s0["gt_labels"],
        gt_valid=s0["gt_valid"],
        gt_masks=s0["gt_masks"],
        gt_semantic_seg=s0["gt_semantic_seg"][None],
        gt_semantic_seg_Nx=s0["gt_semantic_seg_Nx"][None],
        gt_pids=s0["gt_pids"],
        ref_bboxes=s0["ref_bboxes"],
        ref_valid=s0["ref_valid"],
        method=det.loss,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    schedule = build_lr_schedule(0.005, steps_per_epoch=100, total_epochs=12)
    tx, mask = build_optimizer(params, schedule)
    opt_state = tx.init(params)
    state = TrainState(params, batch_stats, opt_state, jnp.asarray(0))

    mesh = make_mesh(8)
    sharded = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    state = replicate(state, mesh)

    step = make_train_step(det, tx, donate=False)
    new_state, log_vars = step(state, sharded, jax.random.PRNGKey(7))

    for k, v in log_vars.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    # frozen FlowNet2 params unchanged; trainable params changed
    fn_before = jax.tree.leaves(state.params["flownet2"])[0]
    fn_after = jax.tree.leaves(new_state.params["flownet2"])[0]
    np.testing.assert_array_equal(np.asarray(fn_before), np.asarray(fn_after))
    rpn_before = np.asarray(jax.tree.leaves(state.params["rpn_head"])[0])
    rpn_after = np.asarray(jax.tree.leaves(new_state.params["rpn_head"])[0])
    assert not np.allclose(rpn_before, rpn_after)
    # backbone stem frozen (frozen_stages=1)
    sb = np.asarray(jax.tree.leaves(state.params["backbone"]["conv1"])[0])
    sa = np.asarray(jax.tree.leaves(new_state.params["backbone"]["conv1"])[0])
    np.testing.assert_array_equal(sb, sa)
    # layer1 frozen too, layer2 not
    l1b = np.asarray(jax.tree.leaves(state.params["backbone"]["layer1_0"])[0])
    l1a = np.asarray(jax.tree.leaves(new_state.params["backbone"]["layer1_0"])[0])
    np.testing.assert_array_equal(l1b, l1a)
