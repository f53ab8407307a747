"""Training-dynamics sanity: repeated steps on one fixed sample must drive
the total loss down (the reference has no unit tests at all — SURVEY.md §4;
this is the overfit smoke check that stands in for a full training run)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vps_tpu.train import build_optimizer, make_train_step
from vps_tpu.train.step import TrainState

from test_parallel import _tiny_detector, _sample


@pytest.mark.slow
def test_loss_decreases_when_overfitting_one_sample():
    det = _tiny_detector()
    rng = np.random.RandomState(0)
    sample = _sample(rng)
    # deterministic, structured image so there is signal to fit
    sample["img"] = (sample["gt_masks"].sum(0)[..., None]
                     * np.ones((1, 1, 3), np.float32)
                     + 0.1 * sample["img"])
    sample["ref_img"] = sample["img"].copy()
    # consistent semantic labels: class 1 inside the object, 0 outside
    sem = (sample["gt_masks"].sum(0) > 0).astype(np.int32)
    sample["gt_semantic_seg"] = sem
    sample["gt_semantic_seg_Nx"] = sem[::4, ::4].copy()
    batch = {k: jnp.asarray(v)[None] for k, v in sample.items()}

    init_rngs = {"params": jax.random.PRNGKey(0),
                 "sampler": jax.random.PRNGKey(1)}
    s0 = {k: v[0] for k, v in batch.items()}
    variables = det.init(
        init_rngs,
        img=s0["img"][None], ref_img=s0["ref_img"][None],
        gt_bboxes=s0["gt_bboxes"], gt_labels=s0["gt_labels"],
        gt_valid=s0["gt_valid"], gt_masks=s0["gt_masks"],
        gt_semantic_seg=s0["gt_semantic_seg"][None],
        gt_semantic_seg_Nx=s0["gt_semantic_seg_Nx"][None],
        gt_pids=s0["gt_pids"], ref_bboxes=s0["ref_bboxes"],
        ref_valid=s0["ref_valid"],
        method=det.loss,
    )
    params = variables["params"]
    tx, _ = build_optimizer(params, 0.02, momentum=0.9, weight_decay=0.0,
                            grad_clip=35.0)
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.asarray(0))
    step = make_train_step(det, tx, donate=False)

    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(8):
        state, logs = step(state, batch, key)  # same key: deterministic
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1]), (i, logs)

    # robust decrease check: best recent loss well below the first
    assert min(losses[4:]) < losses[0] * 0.9, losses
