"""Profiling / tracing hooks (SURVEY.md §5 "tracing/profiling").

The reference has only coarse `time.time()` + ru_maxrss measurement
(complexity_benchmark.py:18-26). Here:

  * `trace(logdir)`: context manager around `jax.profiler` — produces a
    TensorBoard-loadable device trace (op-level timeline, HBM usage),
  * `StepTimer`: cheap per-step wall-clock ring buffer with percentile
    summary, usable inside any training loop,
  * `device_memory_mb()`: live HBM allocation where the backend
    supports memory_stats().
"""

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace via jax.profiler; view with TensorBoard's profile
    plugin. No-op (with a notice) if the backend refuses to trace."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:
        print(f"jax.profiler trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                print(f"jax.profiler stop failed: {e}")


class StepTimer:
    """Per-step wall-clock stats. Call mark() after each blocking step
    (or pass an array to block on)."""

    def __init__(self, capacity: int = 10_000):
        self.capacity = capacity
        self.times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def mark(self, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        now = time.perf_counter()
        if self._last is not None and len(self.times) < self.capacity:
            self.times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        a = np.array(self.times)
        return {
            "steps": len(a),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p90_ms": float(np.percentile(a, 90) * 1e3),
            "p99_ms": float(np.percentile(a, 99) * 1e3),
            "total_s": float(a.sum()),
        }


def device_memory_mb() -> float:
    """Bytes in use on device 0, in MB.

    Prefers the runtime allocator's own counter; the tunneled axon
    backend returns None from memory_stats(), so fall back to summing
    the DEVICE-0 shards of live arrays (params/opt state/datasets —
    everything the framework holds a handle to; excludes allocator
    overhead and transient scratch, so it is a floor, not a peak).
    Per-shard so a mesh-sharded array contributes only its device-0
    slice bytes, keeping the number per-device under DP/EP runs.
    """
    d0 = jax.devices()[0]
    try:
        stats = d0.memory_stats()
        if stats is not None:
            return stats.get("bytes_in_use", 0) / (1024.0**2)
    except Exception:
        pass
    if d0.platform != "tpu":
        # forced-CPU runs report 0 like the pre-fallback behavior —
        # host RAM is not "device memory" in the complexity-table sense
        return 0.0
    try:
        total = 0
        for a in jax.live_arrays():
            for sh in a.addressable_shards:
                if sh.device == d0:
                    total += sh.data.nbytes
        return total / (1024.0**2)
    except Exception:
        return 0.0
