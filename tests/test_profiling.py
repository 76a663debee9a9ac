"""utils/profiling.py coverage (VERDICT r2 weak #5: the one untested
module). All tests run on the CPU backend in milliseconds."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msid_tpu.utils.profiling import (
    annotate,
    benchmark_fn,
    live_memory,
    step_timer,
    trace,
)


def test_benchmark_fn_stats_contract():
    calls = {"n": 0}

    def fn(x):
        calls["n"] += 1
        return x + 1.0

    x = jnp.ones((4,))
    stats = benchmark_fn(fn, x, warmup_runs=3, benchmark_iterations=10)
    assert calls["n"] == 13  # warmup + timed
    for key in ("mean_ms", "std_ms", "min_ms", "max_ms", "p50_ms", "p99_ms",
                "fps", "images_per_sec"):
        assert key in stats and np.isfinite(stats[key])
    assert stats["min_ms"] <= stats["p50_ms"] <= stats["max_ms"]
    # fps is derived from the mean; images_per_call defaults to 1
    assert stats["fps"] == pytest.approx(1000.0 / stats["mean_ms"])
    assert stats["images_per_sec"] == pytest.approx(stats["fps"])

    batched = benchmark_fn(fn, x, warmup_runs=1, benchmark_iterations=5,
                           images_per_call=32)
    assert batched["images_per_sec"] == pytest.approx(32 * batched["fps"])


def test_benchmark_fn_measures_real_time():
    def slow(x):
        time.sleep(0.01)
        return x

    stats = benchmark_fn(slow, jnp.zeros(()), warmup_runs=0,
                         benchmark_iterations=3)
    assert stats["mean_ms"] >= 10.0


def test_step_timer_math(monkeypatch):
    t = step_timer(window=4)
    assert t.tick(8) == {"steps_per_sec": 0.0, "images_per_sec": 0.0}
    # Deterministic clock: tick() itself must compute 3 steps / 24 images
    # over dt=1.5 s from the fabricated window.
    t._stamps = [(0.0, 0), (0.5, 8), (1.0, 8)]
    monkeypatch.setattr("msid_tpu.utils.profiling.time.perf_counter",
                        lambda: 1.5)
    stats = t.tick(8)
    assert t._stamps == [(0.0, 0), (0.5, 8), (1.0, 8), (1.5, 8)]
    assert stats["steps_per_sec"] == pytest.approx(3 / 1.5)
    assert stats["images_per_sec"] == pytest.approx(24 / 1.5)
    # Window trims the oldest stamp once full (window=4).
    monkeypatch.setattr("msid_tpu.utils.profiling.time.perf_counter",
                        lambda: 2.0)
    stats = t.tick(4)
    assert t._stamps == [(0.5, 8), (1.0, 8), (1.5, 8), (2.0, 4)]
    assert stats["steps_per_sec"] == pytest.approx(3 / 1.5)
    assert stats["images_per_sec"] == pytest.approx(20 / 1.5)


def test_live_memory_contract():
    stats = live_memory()
    assert isinstance(stats, dict)
    # CPU backends may expose no memory_stats — the contract is a dict
    # keyed per device with numeric values when present
    for _, v in stats.items():
        assert isinstance(v, dict)
        for _, n in v.items():
            assert isinstance(n, (int, float))


def test_trace_and_annotate_smoke(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir) as where:
        with annotate("unit-test-region"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert where == logdir
    import os

    # the profiler must have written something under the logdir
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, "profiler trace produced no files"
