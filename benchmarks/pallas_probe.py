"""Probe harness for the fused decoder ResidualBlock kernel.

Times kernel variants against the XLA eval-mode residual block on the real
chip, one variant per invocation (never two compiles concurrently):

    python benchmarks/pallas_probe.py xla         # XLA reference block
    python benchmarks/pallas_probe.py fused       # committed kernel (as-is)
    python benchmarks/pallas_probe.py fused_bf16  # bf16-dot variant
    ...

Timing follows the relay rules: pipelined loops, value-fetch sync.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import os

_shape = os.environ.get("PROBE_SHAPE", "64,192,192,48")
B, H, W, C = (int(v) for v in _shape.split(","))


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        y = fn(*args)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / iters * 1000


def make_inputs(dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32), dtype)
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32), dtype)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32), dtype)
    aff = jnp.asarray(
        np.stack([
            rng.uniform(0.5, 1.5, C), rng.uniform(-0.1, 0.1, C),
            rng.uniform(0.5, 1.5, C), rng.uniform(-0.1, 0.1, C),
        ]).astype(np.float32)
    )
    return x, w1, w2, aff


def xla_block(x, w1, w2, aff):
    """Eval-mode ResidualBlock with folded BN, XLA conv path (f32 outputs).

    CAUTION: this forces f32 conv outputs + f32 elementwise, which is NOT
    what the shipped decoder runs — it doubles the HBM writes and the
    VPU work. Use ``xla_bf16`` for the honest in-graph reference.
    """
    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    y1 = conv(x, w1) * aff[0] + aff[1]
    y1 = jax.nn.gelu(y1, approximate=True).astype(x.dtype)
    y2 = conv(y1, w2) * aff[2] + aff[3]
    return jax.nn.gelu(y2 + x.astype(jnp.float32), approximate=True).astype(x.dtype)


def xla_bf16_block(x, w1, w2, aff):
    """What `deployment.fastpath._fast_decode` actually runs: pure-bf16
    convs (BN scale folded into the weights, bias added in bf16), bf16
    GELUs. The scale halves of `aff` are baked into w1/w2 by the caller so
    the numerics match `xla_block` up to bf16 rounding."""
    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(v.dtype)
    z = jax.nn.gelu(conv(x, w1 * aff[0], aff[1]))
    z = conv(z, w2 * aff[2], aff[3])
    return jax.nn.gelu(x + z)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "xla"
    x, w1, w2, aff = make_inputs()
    gflop = 2 * 2 * B * H * W * 9 * C * C / 1e9

    if which == "xla":
        fn = jax.jit(xla_block)
        ms = timeit(fn, x, w1, w2, aff)
    elif which == "xla_bf16":
        fn = jax.jit(xla_bf16_block)
        ms = timeit(fn, x, w1, w2, aff)
    elif which == "fused":
        from msid_tpu.ops.pallas_decoder import fused_residual_block
        fn = jax.jit(lambda *a: fused_residual_block(*a))
        ms = timeit(fn, x, w1, w2, aff)
    elif which.startswith("v3"):
        # v3:<row_block>[:noim2col][:f32]
        parts = which.split(":")
        rb = int(parts[1]) if len(parts) > 1 else 16
        im2col = "noim2col" not in parts
        bf16_patches = "f32" not in parts
        pad64 = "pad64" in parts
        from msid_tpu.ops.pallas_decoder import fused_residual_block_v3
        fn = jax.jit(lambda *a: fused_residual_block_v3(
            *a, row_block=rb, im2col=im2col, bf16_patches=bf16_patches,
            pad64=pad64))
        ms = timeit(fn, x, w1, w2, aff)
        ref = jax.jit(xla_block)(x, w1, w2, aff)
        err = float(jnp.max(jnp.abs(fn(x, w1, w2, aff).astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"max|d| vs xla: {err:.4f}")
    elif which.startswith("v2"):
        # v2:<row_block>:<col_block>
        parts = which.split(":")
        rb = int(parts[1]) if len(parts) > 1 else 16
        cb = int(parts[2]) if len(parts) > 2 else 96
        from msid_tpu.ops.pallas_decoder import fused_residual_block_v2
        fn = jax.jit(lambda *a: fused_residual_block_v2(
            *a, row_block=rb, col_block=cb))
        ms = timeit(fn, x, w1, w2, aff)
        ref = jax.jit(xla_block)(x, w1, w2, aff)
        err = float(jnp.max(jnp.abs(fn(x, w1, w2, aff).astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"max|d| vs xla: {err:.4f}")
    elif which == "any_dma":
        # Toolchain gate for the halo-window kernel design (ops/
        # pallas_decoder.py STATUS): a minimal ANY-space input ref +
        # manual async copy into VMEM scratch. If this compiles and runs,
        # the 1-read/1-write fused ResidualBlock with DMA'd overlapping
        # halo windows becomes implementable — re-check once per round.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(x_any, o_ref, scratch, sem):
            cp = pltpu.make_async_copy(x_any, scratch, sem)
            cp.start()
            cp.wait()
            o_ref[...] = scratch[...] * 2.0

        rows = 8
        xs = x[0, :rows].astype(jnp.float32)  # [rows, W, C]
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM(xs.shape, xs.dtype),
                    pltpu.SemaphoreType.DMA,
                ],
            )
            got = jax.jit(fn)(xs)
            ok = bool(jnp.allclose(got, xs * 2.0, atol=1e-6))
            print(f"any_dma: COMPILES AND RUNS, correct={ok} "
                  f"(jax {jax.__version__}) — halo-window kernel design "
                  f"unblocked, revisit ops/pallas_decoder.py STATUS")
        except Exception as e:
            print(f"any_dma: still blocked on jax {jax.__version__}: "
                  f"{type(e).__name__}: {str(e)[:200]}")
        return
    else:
        raise SystemExit(f"unknown probe {which}")

    print(f"{which}: {ms:.2f} ms  ({gflop / ms:.1f} TF/s effective)")


if __name__ == "__main__":
    main()
