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

# Largest batch at which optimize="auto" picks the fastpath. Re-measured
# round 4 (outputs/r4_checks/fastpath_ab.log, two interleaved reps of
# benchmarks/fastpath_ab.py, 200-iteration pipelined loops, v5e): plain
# `model.apply` now wins every small batch (b=1: 1.23 ms vs 1.25 fast_ct /
# 1.35 fast_mm; b=4: 3.28 vs 4.01 hybrid), so the full fastpath is never
# auto-selected (0 = off; the round-1 "1.46 vs 1.80" b=1 edge did not
# survive the toolchain). The hybrid still wins from b=8 up (6.43 vs 6.86;
# b=128: 58.2 vs 61.8), hence HYBRID_AUTO_MIN_BATCH.
FASTPATH_AUTO_MAX_BATCH = 0
# Smallest batch at which optimize="auto" picks the hybrid graph (flax
# encoder + folded-BN conv_transpose decoder). Below it, auto serves
# plain `model.apply` (self.optimized = False).
HYBRID_AUTO_MIN_BATCH = 8


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
        optimize: bool | str = "auto",
        mesh=None,
        tta: int = 1,
    ):
        """Build from a live (model, variables) pair or an exported artifact.

        ``optimize`` selects the inference graph
        (`msid_tpu.deployment.fastpath` — the reference's onnxslim step,
        optimize_model.py:16-75). "auto" (default) picks per batch size,
        falling back to `model.apply` for unsupported model configs:

          * batch < HYBRID_AUTO_MIN_BATCH → plain `model.apply`: the
            round-4 A/B (outputs/r4_checks/fastpath_ab.log) measured it
            fastest at every small batch on v5e (b=1: 1.23 ms vs 1.25
            fastpath / 1.46 hybrid), so `auto` no longer selects the
            full fastpath anywhere (FASTPATH_AUTO_MAX_BATCH = 0).
          * batch >= HYBRID_AUTO_MIN_BATCH → hybrid (flax encoder +
            folded-BN conv_transpose decoder): HBM/MXU-bound regime,
            b=8 6.43 vs 6.86 ms, b=128 58.2 vs 61.8 ms.

        True forces the full fastpath (raises for unsupported configs);
        False always uses `model.apply`. `self.optimized` records the
        choice: "fastpath", "hybrid", or False.

        ``mesh`` (a `jax.sharding.Mesh` with a "data" axis) runs
        data-parallel serving: the batch is sharded over the mesh's data
        axis, weights are replicated, and XLA keeps the whole step on
        ICI — no per-chip Python dispatch. ``batch_size`` must divide
        evenly by the data-axis size. Not supported with
        ``artifact_path`` (a serialized module has no mesh).

        ``tta`` > 1 self-ensembles each prediction over that many
        dihedral views of the input (`msid_tpu.ops.tta`): one fused XLA
        program, ~``tta`` x the FLOPs, a free quality bump on top of any
        graph choice. Needs model+variables (serialized artifacts bake
        their own graph).
        """
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_bands = num_bands
        self.optimized = False
        self.donate_input = bool(donate_input)
        self.input_shape = (batch_size, image_size, image_size, num_bands)

        self._input_sharding = None
        self.tta = int(tta)
        # Fail fast on tta<1 / out-of-range (tta=0 must not silently mean
        # "single view"): the orbit validator raises for anything but 1-8.
        from msid_tpu.ops.tta import orbit_prefix

        orbit_prefix(self.tta, image_size, image_size)
        if artifact_path is not None:
            if mesh is not None:
                raise ValueError("mesh serving needs model+variables, "
                                 "not a serialized artifact")
            if self.tta > 1:
                raise ValueError("tta ensembling needs model+variables, "
                                 "not a serialized artifact")
            self._fn = load_exported(artifact_path)
            self._compiled = None
        elif model is not None and variables is not None:
            # Weights are a call argument (never baked as constants) and are
            # bound here after AOT compilation.
            infer = make_inference_fn(model)
            if optimize is True or optimize == "auto":
                from msid_tpu.deployment.fastpath import (
                    make_fast_inference_fn,
                    make_hybrid_inference_fn,
                    optimize_for_hybrid,
                    optimize_for_inference,
                )

                small = batch_size <= FASTPATH_AUTO_MAX_BATCH
                try:
                    if optimize == "auto" and not small and (
                            batch_size < HYBRID_AUTO_MIN_BATCH):
                        # Measured regime (r4 A/B): plain apply wins below
                        # the hybrid crossover — auto keeps the raw graph.
                        pass
                    elif optimize is True or small:
                        # Upsample lowering: matmul+depth-to-space wins at
                        # small batch for unet_light, but for unet_skip the
                        # conv_transpose form wins at every batch (measured
                        # b=1: 2.06 vs 2.19 ms; b=8: 7.98 vs 8.66 —
                        # benchmarks/fastpath_ab.py --arch unet_skip).
                        mm = model.decoder_arch != "unet_skip"
                        variables = optimize_for_inference(
                            model, variables, dtype=model.dtype,
                            upsample="matmul" if mm else "ct",
                        )
                        infer = make_fast_inference_fn(
                            model, matmul_upsample=mm)
                        self.optimized = "fastpath"
                    else:
                        variables = optimize_for_hybrid(
                            model, variables, dtype=model.dtype
                        )
                        infer = make_hybrid_inference_fn(model)
                        self.optimized = "hybrid"
                except ValueError:
                    if optimize is True:
                        raise
            if self.tta > 1:
                from msid_tpu.ops.tta import wrap_forward

                infer = wrap_forward(infer, self.tta, image_size, image_size)
            donate = (1,) if donate_input else ()
            if mesh is not None:
                from msid_tpu.parallel.mesh import batch_sharded, replicated

                data_size = mesh.shape.get("data", 1)
                if batch_size % max(data_size, 1) != 0:
                    raise ValueError(
                        f"batch_size {batch_size} must divide by the mesh "
                        f"data axis ({data_size})"
                    )
                var_sharding = replicated(mesh)
                self._input_sharding = batch_sharded(mesh)
                jitted = jax.jit(
                    infer,
                    in_shardings=(var_sharding, self._input_sharding),
                    out_shardings=self._input_sharding,
                    donate_argnums=donate,
                )
                var_struct = jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(
                        a.shape, a.dtype, sharding=var_sharding
                    ),
                    variables,
                )
                x_struct = jax.ShapeDtypeStruct(
                    self.input_shape, jnp.float32,
                    sharding=self._input_sharding,
                )
                self._compiled = jitted.lower(var_struct, x_struct).compile()
                variables = jax.device_put(variables, var_sharding)
            else:
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
        if self._input_sharding is not None:
            x = jax.device_put(x, self._input_sharding)
        return np.asarray(self._fn(x))

    def benchmark(
        self,
        warmup_runs: int = 10,
        benchmark_iterations: int = 100,
        seed: int = 0,
        pipelined: bool = False,
    ) -> dict:
        """Latency benchmark (reference onnx_inference.py:96-146 protocol:
        default 10 warmup + 100 timed).

        ``pipelined=True`` times the whole loop with a single trailing sync
        instead of syncing per iteration — the steady-state throughput
        number, free of host↔device round-trip latency (which on relayed
        transports adds ~tens of ms per sync and otherwise dominates)."""
        x_host = np.asarray(
            jax.random.uniform(
                jax.random.PRNGKey(seed), self.input_shape, jnp.float32,
                minval=-2.0, maxval=2.0,
            )
        )

        def place():
            return jax.device_put(x_host, self._input_sharding)

        # With input donation each call invalidates its input buffer, so a
        # single device-resident x cannot be reused — re-place per call
        # (the H2D is then part of the measured loop, as it is in real
        # donated serving).
        x = place()

        def next_x():
            nonlocal x
            if self.donate_input:
                x = place()
            return x

        def run_and_wait(x):
            # Materialize a scalar instead of block_until_ready: on relayed
            # device transports block_until_ready can return before the
            # execution actually finishes (observed on the axon relay),
            # which would report impossible sub-light latencies.
            y = self._fn(x)
            float(jnp.sum(y))
            return y

        for _ in range(warmup_runs):
            run_and_wait(next_x())

        if pipelined:
            t0 = time.perf_counter()
            y = None
            for _ in range(benchmark_iterations):
                y = self._fn(next_x())
            float(jnp.sum(y))
            per_iter = (time.perf_counter() - t0) * 1e3 / benchmark_iterations
            times_ms = np.asarray([per_iter])
        else:
            times_ms = []
            for _ in range(benchmark_iterations):
                t0 = time.perf_counter()
                run_and_wait(next_x())
                times_ms.append((time.perf_counter() - t0) * 1e3)
            times_ms = np.asarray(times_ms)
        mean_ms = float(times_ms.mean())
        results = {
            "mean_ms": mean_ms,
            "fps": 1e3 / mean_ms,
            "images_per_sec": self.batch_size * 1e3 / mean_ms,
            "batch_size": self.batch_size,
            "iterations": benchmark_iterations,
        }
        if pipelined:
            # One trailing sync gives ONE aggregate sample — there is no
            # per-iteration distribution to report; fabricating p50/p99
            # from the mean would let latency-SLO checks silently pass.
            results.update({"std_ms": None, "min_ms": None, "max_ms": None,
                            "p50_ms": None, "p99_ms": None})
            logger.info("Inference benchmark (pipelined): %.3f ms/iter → %.1f img/s",
                        mean_ms, results["images_per_sec"])
        else:
            results.update({
                "std_ms": float(times_ms.std()),
                "min_ms": float(times_ms.min()),
                "max_ms": float(times_ms.max()),
                "p50_ms": float(np.percentile(times_ms, 50)),
                "p99_ms": float(np.percentile(times_ms, 99)),
            })
            logger.info(
                "Inference benchmark: %.3f±%.3f ms (min %.3f) → %.1f img/s",
                results["mean_ms"], results["std_ms"], results["min_ms"],
                results["images_per_sec"],
            )
        return results
