"""Rank-sharded train-time validation hook (round-2 VERDICT item 8): every
host runs its video shard through run_video_streams over local devices and
exchanges results through work-dir files (the reference DistEvalHook's
tmpdir barrier, eval_hooks.py:18-74)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vps_tpu.models.detectors import empty_track_state
from vps_tpu.train.eval_hook import make_video_eval_hook
from vps_tpu.train.step import TrainState

from test_parallel import _tiny_detector, H, W


class _FakeValDataset:
    nframes_span_test = 3

    def __init__(self, n_videos=2):
        rng = np.random.RandomState(5)
        self.n = n_videos * self.nframes_span_test
        self.frames = [rng.randn(1, H, W, 3).astype(np.float32)
                       for _ in range(self.n)]

    def __len__(self):
        return self.n

    def prepare_test(self, idx):
        meta = dict(iid=idx,
                    is_first=(idx % self.nframes_span_test == 0))
        return self.frames[idx], self.frames[max(idx - 1, 0)], meta


def _state(det):
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    ts = empty_track_state(cap=16)
    variables = jax.jit(
        lambda k: det.init({"params": k}, img, img, ts, method=det.predict)
    )(jax.random.PRNGKey(0))
    return TrainState(variables["params"],
                      variables.get("batch_stats", {}), None,
                      jnp.asarray(0))


@pytest.mark.slow
def test_eval_hook_single_host(tmp_path):
    det = _tiny_detector()
    ds = _FakeValDataset()
    state = _state(det)
    hook = make_video_eval_hook(det, ds, str(tmp_path), chunk=2,
                                track_cap=16)
    metrics = hook(state, epoch=1)
    assert metrics["eval_frames"] == len(ds)
    part = os.path.join(str(tmp_path), ".eval_hook", "epoch1.host0.pkl")
    assert os.path.exists(part)
    with open(part, "rb") as f:
        results = pickle.load(f)
    assert set(results) == set(range(len(ds)))
    assert results[0]["panoptic_outputs"].shape == (H, W)


@pytest.mark.slow
def test_eval_hook_two_host_merge(tmp_path, monkeypatch):
    det = _tiny_detector()
    ds = _FakeValDataset(n_videos=2)
    state = _state(det)

    # host 1 first: computes ONLY video 1 (ids 3..5), returns {}
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    hook1 = make_video_eval_hook(det, ds, str(tmp_path), chunk=2,
                                 track_cap=16)
    assert hook1(state, epoch=2) == {}
    with open(os.path.join(str(tmp_path), ".eval_hook",
                           "epoch2.host1.pkl"), "rb") as f:
        part1 = pickle.load(f)
    assert set(part1) == {3, 4, 5}

    # host 0: computes video 0, then merges host 1's shard from disk
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    hook0 = make_video_eval_hook(det, ds, str(tmp_path), chunk=2,
                                 track_cap=16)
    metrics = hook0(state, epoch=2)
    assert metrics["eval_frames"] == len(ds)


@pytest.mark.slow
def test_eval_during_train_on_mesh(tmp_path):
    """Runner drives the hook after each epoch on the 8-device mesh."""
    from vps_tpu.train.runner import Runner
    from test_runner_resume import _FakeLoader

    det = _tiny_detector()
    ds = _FakeValDataset()
    seen = []

    def evaluate(results, epoch):
        seen.append((epoch, len(results)))
        return {"val_frames": float(len(results))}

    hook = make_video_eval_hook(det, ds, str(tmp_path), chunk=2,
                                track_cap=16, evaluate=evaluate)
    cfg = dict(optimizer=dict(lr=0.001),
               lr_config=dict(warmup_iters=1, step=[100]))
    r = Runner(det, _FakeLoader(), cfg, str(tmp_path), total_epochs=1,
               log_interval=1, ckpt_interval=1, eval_fn=hook,
               eval_interval=1)
    r.run()
    assert seen == [(1, len(ds))]
