"""Profiling / tracing utilities.

TPU-native equivalents of the reference's ad-hoc profilers (SURVEY §5.1:
CUDA peak-memory probe, tqdm VRAM postfix, ONNX latency benchmark):

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable trace of device execution;
  * `annotate(name)` — TraceAnnotation for labeling host-side regions;
  * `benchmark_fn` — warmup + timed loop with the value-fetch barrier
    (block_until_ready alone can return early on relayed transports);
  * `step_timer` — rolling it/s + images/s tracker for training loops;
  * `live_memory` — per-device HBM in-use/peak from the runtime.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """Capture a device+host profiler trace viewable in TensorBoard/XProf.

    (jax.profiler.start_trace exposes no tracer-level knob — accepting one
    here and silently ignoring it would misrepresent the captured trace.)
    """
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region in the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def _fetch(x):
    """Force completion by materializing a scalar — see SKILL.md: on
    relayed device transports block_until_ready may return early."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def benchmark_fn(
    fn: Callable,
    *args,
    warmup_runs: int = 10,
    benchmark_iterations: int = 100,
    images_per_call: int = 1,
) -> dict:
    """Latency/throughput stats mirroring the reference benchmark protocol
    (onnx_inference.py:96-146: warmup, timed loop, ms stats + FPS)."""
    for _ in range(warmup_runs):
        _fetch(fn(*args))

    times = []
    for _ in range(benchmark_iterations):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        times.append((time.perf_counter() - t0) * 1000.0)
    times = np.asarray(times)
    mean = float(times.mean())
    return {
        "mean_ms": mean,
        "std_ms": float(times.std()),
        "min_ms": float(times.min()),
        "max_ms": float(times.max()),
        "p50_ms": float(np.percentile(times, 50)),
        "p99_ms": float(np.percentile(times, 99)),
        "fps": 1000.0 / mean,
        "images_per_sec": images_per_call * 1000.0 / mean,
    }


class step_timer:
    """Rolling steps/s + images/s over a window (tqdm-postfix equivalent)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._stamps: list = []

    def tick(self, images: int = 0) -> dict:
        now = time.perf_counter()
        self._stamps.append((now, images))
        if len(self._stamps) > self.window:
            self._stamps.pop(0)
        if len(self._stamps) < 2:
            return {"steps_per_sec": 0.0, "images_per_sec": 0.0}
        dt = self._stamps[-1][0] - self._stamps[0][0]
        n = len(self._stamps) - 1
        imgs = sum(i for _, i in self._stamps[1:])
        return {
            "steps_per_sec": n / dt if dt > 0 else 0.0,
            "images_per_sec": imgs / dt if dt > 0 else 0.0,
        }


def live_memory() -> dict:
    """Per-device HBM stats (bytes in use / peak / limit) when exposed."""
    from msid_tpu.utils.setup_helpers import device_memory_stats

    return device_memory_stats()
