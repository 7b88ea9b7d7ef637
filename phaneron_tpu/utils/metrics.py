"""Tracing / profiling utilities.

Parity with the reference's instrumentation (SURVEY.md §5.1): the
per-kernel RunTimings tables become per-stage host timers with
percentile aggregation (showTimings levels), the buffer census
(clContext.logBuffers) becomes device memory stats, and full XLA traces
come from jax.profiler."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Iterator

import numpy as np

__all__ = ["StageTimings", "device_memory_stats", "profiler_trace"]


class StageTimings:
    """Ring-buffered per-stage wall timings with percentile summary
    (the ClProcessJobs.logTimings equivalent, clJobQueue.ts:159-215)."""

    def __init__(self, window: int = 512):
        self.window = window
        self._samples: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.monotonic()
        try:
            yield
        finally:
            self._samples[name].append(time.monotonic() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, samples in self._samples.items():
            arr = np.asarray(samples) * 1e3
            if arr.size == 0:
                continue
            out[name] = {
                "n": int(arr.size),
                "p50_ms": float(np.percentile(arr, 50)),
                "p99_ms": float(np.percentile(arr, 99)),
                "max_ms": float(arr.max()),
            }
        return out

    def log_table(self) -> str:
        rows = [f"{'stage':24s} {'n':>6s} {'p50 ms':>8s} {'p99 ms':>8s} {'max ms':>8s}"]
        for name, s in sorted(self.summary().items()):
            rows.append(
                f"{name:24s} {s['n']:6d} {s['p50_ms']:8.3f} {s['p99_ms']:8.3f} {s['max_ms']:8.3f}"
            )
        return "\n".join(rows)


def device_memory_stats() -> dict:
    """HBM census — the clContext.logBuffers() analogue."""
    import jax

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "device": str(dev),
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


@contextlib.contextmanager
def profiler_trace(log_dir: str) -> Iterator[None]:
    """XLA/TPU profiler trace (view with tensorboard or xprof)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
