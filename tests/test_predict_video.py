"""predict_video (on-device lax.scan video runner) must reproduce the
per-frame predict() loop exactly, including mid-clip video resets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vps_tpu import zoo
from vps_tpu.models.detectors import (
    PanopticFuseTrack,
    empty_track_state,
    predict_video,
)


@pytest.fixture(scope="module")
def small_det():
    cfg = zoo.fusetrack_model_cfg()
    cfg.pop("type")
    cfg["flow"] = {"type": "TinyFlow"}
    det = PanopticFuseTrack(
        train_cfg=zoo.fusetrack_train_cfg(),
        test_cfg=zoo.fusetrack_test_cfg(),
        **cfg,
    )
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(5, 1, 64, 128, 3).astype(np.float32))
    state = empty_track_state(cap=8)
    variables = det.init(
        {"params": jax.random.PRNGKey(0)}, imgs[0], imgs[0], state,
        method=det.predict,
    )
    return det, variables, imgs, state


def test_predict_video_matches_frame_loop(small_det):
    det, variables, imgs, state0 = small_det
    resets = np.array([True, False, False, True, False])

    # reference: the per-frame host loop with feature carry
    want = []
    tstate = state0
    ref_feats = None
    prev = None
    for t in range(imgs.shape[0]):
        if resets[t]:
            tstate = state0
            ref_feats = None
            prev = imgs[t]
        if ref_feats is None:
            ref_feats = det.apply(variables, prev, method=det.extract_feat)
        out, tstate = det.apply(
            variables, imgs[t], prev, tstate, ref_feats=ref_feats,
            method=det.predict,
        )
        ref_feats = out.pop("fpn_feats")
        prev = imgs[t]
        want.append(out)

    got, (state, feats, last) = predict_video(
        det, variables, imgs, jnp.asarray(resets), state0, imgs[0],
    )

    for k in want[0]:
        for t in range(len(want)):
            a = np.asarray(want[t][k], np.float32)
            b = np.asarray(got[k][t], np.float32)
            np.testing.assert_allclose(
                a, b, atol=1e-5, rtol=1e-4,
                err_msg=f"key={k} frame={t}")
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(imgs[-1]), rtol=0, atol=0)
    np.testing.assert_array_equal(
        np.asarray(state.valid), np.asarray(tstate.valid))
    assert int(state.count) == int(tstate.count)


def test_run_video_streams_matches_single_stream(small_det):
    """Two videos round-robined over 2 device streams must reproduce the
    single-stream chunked results frame-for-frame (streams never interact:
    tracking state is per-video)."""
    from vps_tpu.models.detectors import run_video_streams

    det, variables, imgs, state0 = small_det
    rng = np.random.RandomState(3)
    # two videos: 4 + 3 frames
    vids = [
        rng.randn(4, 1, 64, 128, 3).astype(np.float32),
        rng.randn(3, 1, 64, 128, 3).astype(np.float32),
    ]

    def frames():
        n = 0
        for v in vids:
            for t in range(v.shape[0]):
                yield v[t], t == 0, {"name": f"v{n}_f{t}"}
            n += 1

    def collect(n_streams):
        got = {}

        def record(out, meta):
            got[meta["name"]] = out

        run_video_streams(
            det, variables, frames(), chunk=3, record=record,
            track_cap=8, n_streams=n_streams,
        )
        return got

    one = collect(1)
    two = collect(2)
    assert set(one) == set(two) == {
        f"v{n}_f{t}" for n, v in enumerate(vids) for t in range(v.shape[0])
    }
    for name in one:
        for k in one[name]:
            np.testing.assert_allclose(
                np.asarray(one[name][k], np.float32),
                np.asarray(two[name][k], np.float32),
                atol=1e-5, rtol=1e-4, err_msg=f"{name}/{k}")
