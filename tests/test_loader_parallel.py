"""TrainLoader with real multiprocessing workers (round-2 VERDICT item 6):
the parallel path must yield BIT-IDENTICAL batches to the serial path for
the same seed (same permutation, same per-sample rng streams, same retry
behavior), survive early consumer exit (the Runner breaks out of epoch(0)
to grab an init batch), and keep its worker pool across epochs."""

import numpy as np

from vps_tpu.data.loader import TrainLoader


class ToyDataset:
    """prepare_train returns a deterministic function of (idx, rng) and is
    invalid ~20% of the time to exercise the retry-with-redraw path."""

    def __init__(self, n=17):
        self.n = n

    def __len__(self):
        return self.n

    def prepare_train(self, idx, rng):
        if rng.rand() < 0.2:
            return None
        return {
            "img": np.full((4, 6), idx, np.float32) + rng.rand(4, 6),
            "idx": np.asarray(idx, np.int64),
        }


def _collect(loader, epoch):
    return list(loader.epoch(epoch))


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_parallel_loader_matches_serial():
    ds = ToyDataset()
    serial = TrainLoader(ds, batch_size=3, seed=7, num_workers=0)
    par = TrainLoader(ds, batch_size=3, seed=7, num_workers=3)
    try:
        for epoch in (0, 1):
            _assert_batches_equal(_collect(serial, epoch),
                                  _collect(par, epoch))
    finally:
        par.close()


def test_parallel_loader_survives_early_break():
    ds = ToyDataset()
    par = TrainLoader(ds, batch_size=3, seed=7, num_workers=2)
    try:
        it = par.epoch(0)
        first = next(it)
        it.close()  # Runner's init-batch pattern
        serial = TrainLoader(ds, batch_size=3, seed=7, num_workers=0)
        _assert_batches_equal([first], [next(serial.epoch(0))])
        # the pool must still produce a clean full epoch afterwards
        _assert_batches_equal(_collect(par, 1), _collect(serial, 1))
    finally:
        par.close()


def test_host_sharding_disjoint():
    ds = ToyDataset(n=16)
    a = TrainLoader(ds, batch_size=2, seed=3, num_hosts=2, host_id=0,
                    num_workers=0)
    b = TrainLoader(ds, batch_size=2, seed=3, num_hosts=2, host_id=1,
                    num_workers=0)
    ia = np.concatenate([x["idx"] for x in a.epoch(0)])
    ib = np.concatenate([x["idx"] for x in b.epoch(0)])
    assert len(ia) == len(ib) == 8
    # retries may redraw, so compare the PLANNED shards
    oa = a._plan_epoch(0)[0]
    ob = b._plan_epoch(0)[0]
    assert set(oa.tolist()).isdisjoint(ob.tolist())
    assert len(np.concatenate([oa, ob])) == 16


class SlowDataset(ToyDataset):
    """~40 ms of IO-shaped work per sample (sleep, like decode on another
    core) — 4 workers must hide it behind a 150 ms consumer."""

    def prepare_train(self, idx, rng):
        import time

        time.sleep(0.04)
        return {
            "img": np.full((4, 6), idx, np.float32) + rng.rand(4, 6),
            "idx": np.asarray(idx, np.int64),
        }


def test_prefetch_overlaps_consumer():
    import time

    ds = SlowDataset(n=40)
    par = TrainLoader(ds, batch_size=4, seed=1, num_workers=4,
                      prefetch_batches=2)
    try:
        it = par.epoch(0)
        next(it)  # warm: fills the prefetch window
        waits = []
        for _ in range(6):
            time.sleep(0.15)  # the "train step"
            t0 = time.time()
            next(it)
            waits.append(time.time() - t0)
        it.close()
        # 4 workers produce a 4-sample batch in ~40-80 ms < 150 ms step, so
        # steady-state waits must be far below the serial cost (4 x 40 ms)
        assert np.median(waits) < 0.05, waits
    finally:
        par.close()
