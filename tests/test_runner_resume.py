"""Runner checkpoint/resume semantics (the reference's load_from vs
resume_from split, SURVEY §5): an interrupted run resumed from its last
checkpoint continues at the right epoch with restored params+opt state."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vps_tpu.train.runner import Runner
from vps_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

from test_parallel import _tiny_detector, _sample


class _FakeLoader:
    """Deterministic 2-step-per-epoch loader over one synthetic sample."""

    def __init__(self, n_steps=2):
        rng = np.random.RandomState(0)
        s = _sample(rng)
        # one sample per device (the conftest mesh has 8 virtual devices)
        n_dev = len(jax.devices())
        self.batch = {k: np.stack([np.asarray(v)] * n_dev)
                      for k, v in s.items()}
        self.n = n_steps

    def steps_per_epoch(self):
        return self.n

    def epoch(self, e):
        for _ in range(self.n):
            yield self.batch


def test_wrong_model_checkpoint_refuses_to_load(tmp_path):
    """Lenient top-level restore (train ckpt -> inference template) must NOT
    extend to silently loading a checkpoint from a DIFFERENT model: a
    structure or leaf-shape mismatch inside a requested subtree raises
    (reference: strict=False still surfaces incompatible shapes via
    load_state_dict warnings; here it is a hard error)."""
    from vps_tpu.utils.checkpoint import save_checkpoint

    params = {"backbone": {"w": np.ones((3, 3), np.float32)},
              "head": {"b": np.zeros((4,), np.float32)}}
    path = save_checkpoint(str(tmp_path), 1, params,
                           opt_state={"mu": np.zeros((4,), np.float32)})

    # same-structure template: exact restore
    out = load_checkpoint(path, {"params": jax.tree.map(np.zeros_like, params)})
    np.testing.assert_array_equal(out["params"]["backbone"]["w"],
                                  params["backbone"]["w"])

    # inference template (params only): lenient top-level subset works
    out = load_checkpoint(path, {"params": jax.tree.map(np.zeros_like, params),
                                 "batch_stats": {}})
    assert out["batch_stats"] == {}

    # different model structure: must raise, not merge
    wrong_struct = {"params": {"backbone": {"w": np.zeros((3, 3), np.float32)},
                               "other_head": {"x": np.zeros((4,), np.float32)}},
                    "batch_stats": {}}
    with pytest.raises(ValueError):
        load_checkpoint(path, wrong_struct)

    # same structure, wrong leaf shapes: must raise
    wrong_shape = {"params": {"backbone": {"w": np.zeros((5, 5), np.float32)},
                              "head": {"b": np.zeros((4,), np.float32)}},
                   "batch_stats": {}}
    with pytest.raises(ValueError):
        load_checkpoint(path, wrong_shape)


@pytest.mark.slow
def test_runner_resume_continues_epochs(tmp_path):
    det = _tiny_detector()
    cfg = dict(optimizer=dict(lr=0.001),
               lr_config=dict(warmup_iters=1, step=[100]))
    work = str(tmp_path)

    r1 = Runner(det, _FakeLoader(), cfg, work, total_epochs=1,
                log_interval=1, ckpt_interval=1)
    r1.run()
    ck1 = latest_checkpoint(work)
    assert ck1 and os.path.basename(ck1) == "ckpt_2"  # 2 steps/epoch

    # resume with a higher total: must run ONLY epoch 2 and end at step 4
    r2 = Runner(det, _FakeLoader(), cfg, work, total_epochs=2,
                log_interval=1, ckpt_interval=1)
    r2.run(resume_from=ck1)
    ck2 = latest_checkpoint(work)
    assert os.path.basename(ck2) == "ckpt_4", ck2

    # params actually moved between the checkpoints
    raw1 = load_checkpoint(ck1)
    raw2 = load_checkpoint(ck2)
    w1 = jax.tree.leaves(raw1["params"]["rpn_head"])[0]
    w2 = jax.tree.leaves(raw2["params"]["rpn_head"])[0]
    assert not np.allclose(np.asarray(w1), np.asarray(w2))

    # warm-start (load_from): weights restored, step counter fresh
    work3 = str(tmp_path / "warm")
    r3 = Runner(det, _FakeLoader(), cfg, work3, total_epochs=1,
                log_interval=1, ckpt_interval=1)
    r3.run(load_from=ck2)
    ck3 = latest_checkpoint(work3)
    assert os.path.basename(ck3) == "ckpt_2", ck3
