"""A/B: make_eval_step forward_impl apply vs hybrid at batch 64.

Measured 2026-08-19 on v5e (two compiles, each impl timed twice with 100
pipelined iters, interleaved, same executables — PSNR sums bit-identical):

    apply  67.8 / 67.8 ms per batch-64   (944 img/s)
    hybrid 83.7 / 83.8 ms per batch-64   (764 img/s)

The in-step BN fold + conv_transpose decoder LOSES 19%% inside the full
eval step (preprocess+corrupt+forward+metrics) even though the hybrid
forward alone wins ~6%% at b=128 — XLA's global layout of the plain graph
beats the rewritten one once the surrounding ops are present (same
lesson as benchmarks/decoder_ablation.py: never extrapolate from
standalone subgraphs on this toolchain). Consequence: eval/validation
"auto" resolves to "apply"; "hybrid" stays opt-in.

Run: PYTHONPATH=.:$AXON_SITE python benchmarks/eval_forward_ab.py
"""
import time, json, sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax, jax.numpy as jnp
from msid_tpu.models import SatMAERestoration, init_model
from msid_tpu.training.train_state import make_eval_step
from msid_tpu.training.losses import LossConfig
from msid_tpu.ops.noise import NoiseConfig

model = SatMAERestoration(dtype=jnp.bfloat16, gradient_checkpointing=False)
variables = init_model(model, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
raw = jnp.asarray(rng.uniform(0, 10000, (64, 64, 64, 13)).astype(np.float32))
key = jax.random.PRNGKey(0)
count = jnp.int32(64)

steps = {}
for impl in ("apply", "hybrid"):
    steps[impl] = make_eval_step(model, LossConfig(), NoiseConfig(),
                                 image_size=192, forward_impl=impl)
    out = steps[impl](variables, raw, key, count)
    print(json.dumps({"compiled": impl, "psnr_sum": float(out["psnr"])}))


def bench(step, iters=100, warmup=5):
    for _ in range(warmup):
        out = step(variables, raw, key, count)
    float(jnp.sum(out["psnr"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, raw, key, count)
    float(jnp.sum(out["psnr"]))  # full-execution sync through the relay
    return (time.perf_counter() - t0) / iters * 1000


for impl in ("apply", "hybrid", "apply", "hybrid"):
    ms = bench(steps[impl])
    print(json.dumps({"impl": impl, "ms_per_batch64": round(ms, 2),
                      "img_per_sec": round(64000 / ms, 1)}), flush=True)
