#!/usr/bin/env python
"""Headline benchmark: denoised 192x192x13 tiles/sec on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference restores one 192x192x13 tile in
11.7 ms on an RTX 4050 (`/root/reference/README.md:29`) = 85.47 tiles/sec.
``vs_baseline`` is our throughput over that number.

Measures steady-state batched inference through the flagship model
(ViT-Base SatMAE encoder + lightweight decoder, bf16) with the same
warmup-then-timed-loop protocol as the reference's
`ONNXInferenceSession.benchmark` (onnx_inference.py:96-146).
"""

from __future__ import annotations

import json
import time

BASELINE_TILES_PER_SEC = 1000.0 / 11.7  # reference PyTorch, RTX 4050


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msid_tpu.models import SatMAERestoration, init_model

    batch = 128  # throughput saturates at ~128 on v5e (2046 t/s at 256)
    warmup, iters = 3, 20

    model = SatMAERestoration(dtype=jnp.bfloat16, gradient_checkpointing=False)
    variables = init_model(model, jax.random.PRNGKey(0))

    # The large-batch serving graph (flax encoder + folded-BN conv_transpose
    # decoder — deployment/fastpath.py): 58.2 vs 61.8 ms at b=128 measured
    # vs plain model.apply. This is what InferenceSession(optimize="auto")
    # runs at this batch size.
    from msid_tpu.deployment.fastpath import (
        make_hybrid_inference_fn,
        optimize_for_hybrid,
    )

    variables = optimize_for_hybrid(model, variables, dtype=jnp.bfloat16)
    forward = jax.jit(make_hybrid_inference_fn(model))

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 192, 192, 13)),
        jnp.bfloat16,
    )

    for _ in range(warmup):
        # A scalar fetch, not block_until_ready: on relayed/remote device
        # transports block_until_ready can return before execution finishes;
        # materializing a value cannot.
        float(jnp.sum(forward(variables, x)))

    t0 = time.perf_counter()
    for _ in range(iters):
        y = forward(variables, x)
    float(jnp.sum(y))
    dt = time.perf_counter() - t0

    tiles_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "denoise_throughput_192x192x13",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
