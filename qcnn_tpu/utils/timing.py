"""Wall-clock timers for device work.

Replaces the reference's StopWatch set (include/StopWatch.h, 14 named watches +
per-layer vector, CaffeEva.h:115-133). Device-side profiling on TPU should use
jax.profiler traces; these timers measure dispatch-to-completion wall time with
explicit block_until_ready fencing so async dispatch can't flatter the numbers.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class StopWatch:
    """Accumulating pause/resume timer (StopWatch.h:13-33 analogue, wall time)."""

    def __init__(self) -> None:
        self.total = 0.0
        self.count = 0
        self._start: float | None = None

    def resume(self) -> None:
        self._start = time.perf_counter()

    def pause(self) -> None:
        if self._start is None:
            raise RuntimeError("StopWatch not running")
        self.total += time.perf_counter() - self._start
        self.count += 1
        self._start = None

    def reset(self) -> None:
        self.__init__()


class TimerSet:
    """Named timer registry; the DispElpsTime analogue (CaffeEva.cc:297-326)."""

    def __init__(self) -> None:
        self._watches: dict[str, StopWatch] = defaultdict(StopWatch)

    @contextmanager
    def time(self, name: str, result=None):
        w = self._watches[name]
        w.resume()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            w.pause()

    def report(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": w.total, "count": w.count,
                "mean_ms": 1e3 * w.total / max(1, w.count)}
            for k, w in self._watches.items()
        }


# NOTE: a block_until_ready-fenced `timeit` used to live here. Deleted
# (round-5 review): on the tunneled TPU block_until_ready does NOT fence
# (CLAUDE.md; measured 3890 "TFLOP/s" on a matmul chain), so any caller
# would get fabricated numbers. Use utils.devtime.time_device_fn.
