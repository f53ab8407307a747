"""Wall-clock accumulation timer — UPSNet's ``lib/utils/timer.py`` surface
(tic/toc with running average) re-done with a context-manager API.

On-device timing caveat (PERF.md): jax dispatch is async — wrap the region so
the LAST op's result is host-fetched (e.g. ``float(x.sum())``) before toc(),
or the timer measures dispatch, not execution.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.calls = 0
        self.diff = 0.0
        self._start = None

    def tic(self):
        self._start = time.perf_counter()
        return self

    def toc(self, average: bool = True) -> float:
        if self._start is None:
            raise RuntimeError("toc() before tic()")
        self.diff = time.perf_counter() - self._start
        self.total += self.diff
        self.calls += 1
        return self.average if average else self.diff

    @property
    def average(self) -> float:
        return self.total / self.calls if self.calls else 0.0

    # context-manager flavor: `with t: ...` == tic/toc
    def __enter__(self):
        return self.tic()

    def __exit__(self, *exc):
        self.toc()
        return False
