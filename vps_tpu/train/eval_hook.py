"""Train-time validation hook — the reference's DistEvalHook family
(/root/reference/mmdet/core/evaluation/eval_hooks.py:18-74) re-designed for
the device-mesh world:

- videos (not frames: tracking state is per-video) are sharded across HOSTS
  by round-robin on video index — the reference shards frame indices across
  ranks with `self.dataset[idx] for idx in range(rank, len, world_size)`;
- each host runs its shard through run_video_streams, which round-robins
  videos over its LOCAL devices (one lax.scan chunk dispatch per clip);
- results are exchanged through the work dir exactly like the reference's
  tmpdir barrier (eval_hooks.py:32-41 mmcv.dump + barrier + load per rank):
  every host pickles its results and drops a .done marker; host 0 polls for
  all markers, merges, and computes metrics.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def file_exchange_gather(
    work_dir: str,
    epoch: int,
    results: Dict,
    host: int,
    n_hosts: int,
    barrier_timeout: float = 3600.0,
    poll_interval: float = 1.0,
) -> Dict:
    """The reference's tmpdir result barrier (eval_hooks.py:32-41: per-rank
    mmcv.dump → dist.barrier() → rank-0 load-and-merge), as a file exchange:
    every host atomically publishes its results pickle; host 0 polls for all
    peers (TimeoutError past ``barrier_timeout`` — a dead peer must not hang
    training forever) and returns the merge. Non-zero hosts return {}."""
    tmpdir = os.path.join(work_dir, ".eval_hook")
    os.makedirs(tmpdir, exist_ok=True)
    part = os.path.join(tmpdir, f"epoch{epoch}.host{host}.pkl")
    with open(part + ".tmp", "wb") as f:
        pickle.dump(results, f)
    os.replace(part + ".tmp", part)  # atomic: file visible == complete

    if host != 0:
        return {}
    merged = dict(results)
    deadline = time.time() + barrier_timeout
    for h in range(1, n_hosts):
        p = os.path.join(tmpdir, f"epoch{epoch}.host{h}.pkl")
        while not os.path.exists(p):
            if time.time() > deadline:
                raise TimeoutError(f"eval barrier: missing {p}")
            time.sleep(poll_interval)
        with open(p, "rb") as f:
            merged.update(pickle.load(f))
    return merged


def make_video_eval_hook(
    detector,
    dataset,
    work_dir: str,
    chunk: int = 4,
    track_cap: int = 256,
    evaluate: Optional[Callable] = None,
    keep_keys=("panoptic_outputs", "fcn_outputs", "num_keep"),
    barrier_timeout: float = 3600.0,
):
    """Returns eval_fn(state, epoch) -> metrics dict for Runner(eval_fn=...).

    ``evaluate(results, epoch)`` receives {frame_id: {key: np.ndarray}}
    merged across all hosts (host 0 only; other hosts get {}) and returns a
    metrics dict. Default: fraction of frames with any detection — a
    smoke-level metric; pass a VPQ-backed callable for real validation.
    """
    nspan = getattr(dataset, "nframes_span_test", 1) or 1
    n_hosts = jax.process_count()
    host = jax.process_index()

    def eval_fn(state, epoch: int) -> Dict[str, float]:
        from vps_tpu.models.detectors import run_video_streams

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        n = len(dataset)
        n_videos = (n + nspan - 1) // nspan
        my_videos = [v for v in range(n_videos) if v % n_hosts == host]

        results: Dict[object, Dict[str, np.ndarray]] = {}

        def frames():
            for v in my_videos:
                for idx in range(v * nspan, min((v + 1) * nspan, n)):
                    img, _ref, meta = dataset.prepare_test(idx)
                    yield img, meta["is_first"], meta

        def record(outputs_np, meta):
            results[meta["iid"]] = {
                k: outputs_np[k] for k in keep_keys if k in outputs_np
            }

        run_video_streams(
            detector, variables, frames(), chunk=chunk, record=record,
            track_cap=track_cap,
        )

        # ---- file-exchange gather (the reference's tmpdir barrier) ----
        merged = file_exchange_gather(
            work_dir, epoch, results, host, n_hosts,
            barrier_timeout=barrier_timeout,
        )
        if host != 0:
            return {}

        if evaluate is not None:
            return evaluate(merged, epoch)
        if not merged:
            return {"eval_frames": 0.0}
        det_frac = float(np.mean([
            float(r.get("num_keep", 0)) > 0 for r in merged.values()
        ]))
        return {"eval_frames": float(len(merged)),
                "eval_det_frac": det_frac}

    return eval_fn
