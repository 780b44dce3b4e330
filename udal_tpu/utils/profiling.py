"""Tracing / profiling hooks.

Parity with the reference observability surface (SURVEY §5):
TensorBoard `profile_batch` (`train_lib.py:679-687`), the
`tf.profiler.experimental` trace around serving benchmarks
(`infer_lib.py:226-230`), and per-step latency capture with IQR
summarization (`validate_model.py:153-158,683-704`) — rebuilt on
`jax.profiler` plus plain wall-clock collectors.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory-in-use (bytes), where the backend exposes it."""
    import jax

    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = stats.get("bytes_in_use", 0)
    return out


class LatencyRecorder:
    """Wall-clock step latencies with IQR-filtered summary."""

    def __init__(self):
        self.samples: List[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        r = np.asarray(self.samples)
        if not len(r):
            return {}
        q1, q3 = np.percentile(r, [25, 75])
        iqr = q3 - q1
        keep = r[(r >= q1 - 1.5 * iqr) & (r <= q3 + 1.5 * iqr)]
        return {"mean": float(keep.mean()), "std": float(keep.std()),
                "median": float(np.median(keep)), "n": int(len(keep)),
                "n_outliers": int(len(r) - len(keep))}
