"""Per-host data loading — replaces the reference's DataLoader +
DistributedGroupSampler (mmdet/datasets/loader/build_loader.py:17-48): each
host draws its own shard of a deterministic per-epoch permutation (seed =
base_seed + epoch, matching DistSamplerSeedHook semantics), loads/augments
in ``num_workers`` OS processes (fork, like torch's DataLoader workers),
and yields device-batch dicts with a leading dim of ``batch_size`` ready for
`shard_batch`. Aspect-ratio grouping is unnecessary — the static 800×1600
crop makes every sample the same shape.

Parallelism model: decode + RLE + augmentation are numpy/cv2-heavy and
GIL-bound, so threads don't scale them; workers are forked processes that
inherit the dataset (no per-task pickling of the dataset), receive
(seq, index, seed) tasks and return (seq, sample-dict) over a queue. The
parent reorders by seq so batch composition is IDENTICAL to the serial
path for the same seed — determinism is a test invariant
(tests/test_loader_parallel.py). Prefetch depth is ``prefetch_batches``
full batches ahead of the consumer.
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def _load_one(dataset, idx: int, seed: int, n: int, max_retries: int):
    r = np.random.RandomState(seed)
    for _ in range(max_retries):
        s = dataset.prepare_train(idx, r)
        if s is not None:
            return s
        idx = int(r.randint(n))
    raise RuntimeError("too many invalid samples in a row")


def _worker_loop(dataset, task_q, out_q, n, max_retries):
    while True:
        task = task_q.get()
        if task is None:
            return
        seq, idx, seed = task
        try:
            out_q.put((seq, _load_one(dataset, idx, seed, n, max_retries)))
        except Exception as e:  # surfaced in the parent
            out_q.put((seq, e))


class TrainLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        num_hosts: int = 1,
        host_id: int = 0,
        repeat_times: int = 1,
        num_workers: int = 2,
        max_retries: int = 20,
        prefetch_batches: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.repeat_times = getattr(dataset, "repeat_times", None) or repeat_times
        self.num_workers = num_workers
        self.max_retries = max_retries
        self.prefetch_batches = max(prefetch_batches, 2)
        self._procs = []
        self._task_q = None
        self._out_q = None

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) * self.repeat_times
        return n // (self.batch_size * self.num_hosts)

    # ------------------------------------------------------------------
    # worker pool lifecycle (lazy; survives across epochs)
    # ------------------------------------------------------------------

    def _ensure_pool(self):
        if self._procs:
            return
        ctx = multiprocessing.get_context("fork")
        self._task_q = ctx.Queue()
        self._out_q = ctx.Queue()
        n = len(self.dataset)
        for _ in range(self.num_workers):
            p = ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self._task_q, self._out_q, n,
                      self.max_retries),
                daemon=True,
            )
            p.start()
            self._procs.append(p)

    def close(self):
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._procs = []
        self._task_q = None
        self._out_q = None

    def __del__(self):  # pragma: no cover
        try:
            if self._procs:
                for p in self._procs:
                    p.terminate()
        except Exception:
            pass

    # ------------------------------------------------------------------

    def _plan_epoch(self, epoch: int):
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + epoch)
        order = np.concatenate(
            [rng.permutation(n) for _ in range(self.repeat_times)]
        )
        order = order[self.host_id :: self.num_hosts]
        steps = len(order) // self.batch_size
        seeds = [
            (self.seed + epoch) * 100003 + self.host_id * 1009 + i
            for i in range(len(order))
        ]
        return order, seeds, steps, n

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        order, seeds, steps, n = self._plan_epoch(epoch)
        total = steps * self.batch_size

        if self.num_workers <= 0:
            for step in range(steps):
                samples = [
                    _load_one(self.dataset, int(order[i]), seeds[i], n,
                              self.max_retries)
                    for i in range(step * self.batch_size,
                                   (step + 1) * self.batch_size)
                ]
                yield _stack(samples)
            return

        self._ensure_pool()
        window = self.prefetch_batches * self.batch_size + self.num_workers
        submitted = 0
        done = 0
        buf: Dict[int, dict] = {}
        next_emit = 0
        pending_batch = []
        try:
            while done < total:
                while submitted < total and submitted - done < window:
                    self._task_q.put(
                        (submitted, int(order[submitted]), seeds[submitted])
                    )
                    submitted += 1
                seq, sample = self._out_q.get()
                if isinstance(sample, Exception):
                    raise sample
                buf[seq] = sample
                while next_emit in buf:
                    pending_batch.append(buf.pop(next_emit))
                    next_emit += 1
                    done += 1
                    if len(pending_batch) == self.batch_size:
                        yield _stack(pending_batch)
                        pending_batch = []
        except GeneratorExit:
            # consumer stopped mid-epoch: drain what the workers still owe
            # so seq numbers can't leak into the next epoch's reorder buffer
            while done < submitted:
                try:
                    self._out_q.get(timeout=30)
                except queue.Empty:  # pragma: no cover
                    self.close()
                    break
                done += 1
            raise


def _stack(samples):
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def build_loader(dataset, batch_size, **kw) -> TrainLoader:
    return TrainLoader(dataset, batch_size, **kw)
