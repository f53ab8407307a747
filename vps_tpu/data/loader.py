"""Per-host data loading — replaces the reference's DataLoader +
DistributedGroupSampler (mmdet/datasets/loader/): each host draws its own
shard of a deterministic per-epoch permutation (seed = base_seed + epoch,
matching DistSamplerSeedHook semantics), loads/augments in a thread pool,
and yields device-batch dicts with a leading dim of ``batch_size`` ready for
`shard_batch`. Aspect-ratio grouping is unnecessary — the static 800×1600
crop makes every sample the same shape.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.repeat_times = getattr(dataset, "repeat_times", None) or repeat_times
        self.num_workers = num_workers
        self.max_retries = max_retries

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) * self.repeat_times
        return n // (self.batch_size * self.num_hosts)

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + epoch)
        order = np.concatenate(
            [rng.permutation(n) for _ in range(self.repeat_times)]
        )
        # shard across hosts
        order = order[self.host_id :: self.num_hosts]
        steps = len(order) // self.batch_size

        sample_rngs = [
            np.random.RandomState(
                (self.seed + epoch) * 100003 + self.host_id * 1009 + i
            )
            for i in range(len(order))
        ]

        def load_one(i):
            idx = int(order[i])
            r = sample_rngs[i]
            for attempt in range(self.max_retries):
                s = self.dataset.prepare_train(idx, r)
                if s is not None:
                    return s
                idx = int(r.randint(n))
            raise RuntimeError("too many invalid samples in a row")

        if self.num_workers <= 0:
            for step in range(steps):
                samples = [
                    load_one(step * self.batch_size + j)
                    for j in range(self.batch_size)
                ]
                yield _stack(samples)
            return

        q: "queue.Queue" = queue.Queue(maxsize=4)

        def producer():
            try:
                for step in range(steps):
                    samples = [
                        load_one(step * self.batch_size + j)
                        for j in range(self.batch_size)
                    ]
                    q.put(_stack(samples))
                q.put(None)
            except Exception as e:  # pragma: no cover
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item


def _stack(samples):
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def build_loader(dataset, batch_size, **kw) -> TrainLoader:
    return TrainLoader(dataset, batch_size, **kw)
