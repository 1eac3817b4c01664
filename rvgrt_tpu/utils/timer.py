"""Phase timers + frame-time averager (Timer.hpp equivalents)."""

from __future__ import annotations

import sys
import time
from collections import deque


class Timer:
    """Context-manager stopwatch printing '<name> took X ms' like the
    reference's RAII Timer (Timer.hpp:7-27)."""

    def __init__(self, name: str, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed_ms = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_ms = (time.perf_counter() - self.t0) * 1e3
        if self.verbose:
            # stderr: diagnostics must not pollute stdout protocols
            # (bench.py's one-JSON-line contract)
            print(f"{self.name} took {self.elapsed_ms:.1f} ms",
                  file=sys.stderr, flush=True)
        return False


class FrameTimeAverager:
    """Sliding-window frame-time average (Timer.hpp:33-58, 30-frame window)."""

    def __init__(self, window: int = 30):
        self.times = deque(maxlen=window)
        self.last = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self.last is not None:
            self.times.append(now - self.last)
        self.last = now
        return self.average_ms

    @property
    def average_ms(self) -> float:
        if not self.times:
            return 0.0
        return 1e3 * sum(self.times) / len(self.times)

    @property
    def fps(self) -> float:
        ms = self.average_ms
        return 1e3 / ms if ms > 0 else 0.0
