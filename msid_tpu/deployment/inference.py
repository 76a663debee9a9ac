"""AOT-compiled inference session with latency benchmarking.

Capability parity with the reference `ONNXInferenceSession`
(`/root/reference/src/deployment/onnx_inference.py:17-146`): a
deploy-ready wrapper exposing `predict` with input validation and a
`benchmark` (configurable warmup + timed iterations → ms stats, FPS,
imgs/sec). TPU-native: the "session" is an AOT-lowered XLA executable
(`jax.jit(...).lower(...).compile()`) — zero Python dispatch overhead in
the timed loop beyond the executable call; a scalar fetch replaces CUDA
stream sync (see benchmark()).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from msid_tpu.deployment.export import load_exported, make_inference_fn

logger = logging.getLogger(__name__)


class InferenceSession:
    """AOT-compiled restoration inference at a fixed batch size."""

    def __init__(
        self,
        model=None,
        variables: Optional[dict] = None,
        artifact_path: Optional[str | Path] = None,
        batch_size: int = 1,
        image_size: int = 192,
        num_bands: int = 13,
        donate_input: bool = False,
    ):
        """Build from a live (model, variables) pair or an exported artifact."""
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_bands = num_bands
        self.input_shape = (batch_size, image_size, image_size, num_bands)

        if artifact_path is not None:
            self._fn = load_exported(artifact_path)
            self._compiled = None
        elif model is not None and variables is not None:
            # Weights are a call argument (never baked as constants) and are
            # bound here after AOT compilation.
            infer = make_inference_fn(model)
            donate = (1,) if donate_input else ()
            jitted = jax.jit(infer, donate_argnums=donate)
            var_shapes = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
            )
            self._compiled = jitted.lower(
                var_shapes, jax.ShapeDtypeStruct(self.input_shape, jnp.float32)
            ).compile()
            variables = jax.device_put(variables)
            self._fn = lambda x: self._compiled(variables, x)
        else:
            raise ValueError("Provide model+variables or artifact_path")

    def predict(self, x: np.ndarray) -> np.ndarray:
        """Restore a noisy NHWC float32 batch; validates rank/dtype/shape
        (reference onnx_inference.py:72-94)."""
        x = np.asarray(x)
        if x.ndim != 4:
            raise ValueError(f"Expected 4D NHWC input, got ndim={x.ndim}")
        if x.shape[1:] != self.input_shape[1:]:
            raise ValueError(f"Expected shape [*,{self.input_shape[1:]}], got {x.shape}")
        if x.dtype != np.float32:
            x = x.astype(np.float32)
        if self._compiled is not None and x.shape[0] != self.batch_size:
            raise ValueError(
                f"AOT session compiled for batch {self.batch_size}, got {x.shape[0]}"
            )
        return np.asarray(self._fn(x))

    def benchmark(
        self, warmup_runs: int = 10, benchmark_iterations: int = 100, seed: int = 0
    ) -> dict:
        """Latency benchmark (reference onnx_inference.py:96-146 protocol:
        default 10 warmup + 100 timed)."""
        x = jax.device_put(
            np.asarray(
                jax.random.uniform(
                    jax.random.PRNGKey(seed), self.input_shape, jnp.float32,
                    minval=-2.0, maxval=2.0,
                )
            )
        )
        def run_and_wait(x):
            # Materialize a scalar instead of block_until_ready: on relayed
            # device transports block_until_ready can return before the
            # execution actually finishes (observed on the axon relay),
            # which would report impossible sub-light latencies.
            y = self._fn(x)
            float(jnp.sum(y))
            return y

        for _ in range(warmup_runs):
            run_and_wait(x)

        times_ms = []
        for _ in range(benchmark_iterations):
            t0 = time.perf_counter()
            run_and_wait(x)
            times_ms.append((time.perf_counter() - t0) * 1e3)

        times_ms = np.asarray(times_ms)
        mean_ms = float(times_ms.mean())
        results = {
            "mean_ms": mean_ms,
            "std_ms": float(times_ms.std()),
            "min_ms": float(times_ms.min()),
            "max_ms": float(times_ms.max()),
            "p50_ms": float(np.percentile(times_ms, 50)),
            "p99_ms": float(np.percentile(times_ms, 99)),
            "fps": 1e3 / mean_ms,
            "images_per_sec": self.batch_size * 1e3 / mean_ms,
            "batch_size": self.batch_size,
            "iterations": benchmark_iterations,
        }
        logger.info(
            "Inference benchmark: %.3f±%.3f ms (min %.3f) → %.1f img/s",
            results["mean_ms"], results["std_ms"], results["min_ms"],
            results["images_per_sec"],
        )
        return results
