"""Tracing / profiling / structured metrics.

The reference's observability is a RAII stopwatch, a title-bar frame-time
average, and printf (SURVEY.md §5.1/§5.5).  Here: a device-honest frame
profiler built on ``jax.profiler`` (wall clock lies through remote-device
tunnels - block_until_ready can return before device completion), plus a
JSONL metrics sink for structured logging.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
import time
from contextlib import contextmanager


def device_time_ms(fn, *args, warmup: int = 1) -> tuple[float, dict]:
    """Run ``fn(*args)`` under jax.profiler and return honest device time.

    Returns (total_ms_of_longest_jit, {op_name: ms} for the top ops).
    Wall-clock + block_until_ready is NOT trustworthy on remote-tunneled
    devices; the profiler's device timeline is.
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        jax.block_until_ready(fn(*args))
        jax.profiler.stop_trace()
        traces = sorted(glob.glob(os.path.join(
            d, "plugins/profile/*/*.trace.json.gz")))
        if not traces:
            return float("nan"), {}
        with gzip.open(traces[-1]) as f:
            tr = json.load(f)
    dur = collections.Counter()
    top = 0.0
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            dur[name] += e["dur"]
            if name.startswith("jit_"):
                top = max(top, e["dur"])
    ops = {n: d / 1000.0 for n, d in dur.most_common(12)}
    return top / 1000.0, ops


@contextmanager
def phase(name: str, sink: "MetricsLog | None" = None, verbose: bool = True):
    """Wall-clock phase timer (build phases; NOT for device kernels)."""
    t0 = time.perf_counter()
    yield
    ms = (time.perf_counter() - t0) * 1e3
    if verbose:
        print(f"{name} took {ms:.1f} ms")
    if sink is not None:
        sink.log(event="phase", name=name, ms=round(ms, 2))


class MetricsLog:
    """Append-only JSONL metrics (frame times, build phases, bench runs)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)

    def log(self, **fields):
        fields.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(fields) + "\n")

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
