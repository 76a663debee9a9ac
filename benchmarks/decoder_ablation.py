"""In-graph cost of each decoder stage's residual blocks, by ablation.

The standalone ResidualBlock probe (pallas_probe.py) measures an
unrepresentative number: a lone jitted block at 192x192x48 times at
~11.7 ms (16.7 TF/s) on v5e, while the SAME block inside the full decoder
graph accounts for only ~3-5 ms — XLA's layout assignment across the whole
graph (lane-padded internal layouts that argument arrays don't get) makes
in-graph convs ~3x faster than the single-op probe. Ablation is the honest
measurement: time the full folded-BN conv_transpose decoder, then the same
decoder with one stage's res blocks deleted; the difference is that
stage's true in-graph block cost.

Run:  python benchmarks/decoder_ablation.py [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from msid_tpu.deployment.fastpath import _fast_decode

CHANNELS = (384, 192, 96, 48)
EMBED = 768
GRID = 12
BANDS = 13


def build_tree(rng, dtype=jnp.bfloat16):
    def t(*shape):
        return jnp.asarray(rng.normal(0, 0.04, shape).astype(np.float32), dtype)

    stages = []
    cin = EMBED
    for c in CHANNELS:
        stages.append({
            "up_ct": t(2, 2, cin, c),
            "up_ct_b": t(c),
            "res": [{"k1": t(3, 3, c, c), "b1": t(c),
                     "k2": t(3, 3, c, c), "b2": t(c)} for _ in range(2)],
        })
        cin = c
    return {
        "stages": stages,
        "head_k": t(3, 3, CHANNELS[-1], CHANNELS[-1]),
        "head_b": t(CHANNELS[-1]),
        "out_k": t(1, 1, CHANNELS[-1], BANDS),
        "out_b": t(BANDS),
    }


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        y = fn(*args)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / iters * 1000


def block_gflops(batch: int) -> float:
    """FLOPs of ONE stage's two residual blocks (identical for all stages:
    pixels x C^2 is constant down the pyramid)."""
    h = GRID * 16
    c = CHANNELS[-1]
    return 2 * 2 * 2 * batch * h * h * 9 * c * c / 1e9


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    fp = build_tree(rng)
    tok = jnp.asarray(
        rng.normal(0, 1, (batch, GRID, GRID, EMBED)).astype(np.float32),
        jnp.bfloat16,
    )

    decode = jax.jit(lambda w, x: _fast_decode(w, x, matmul_upsample=False))
    full = timeit(decode, fp, tok)
    print(f"B={batch} decoder full: {full:.2f} ms")

    for s in range(len(CHANNELS)):
        ablated = {**fp, "stages": [
            {**st, "res": []} if i == s else st
            for i, st in enumerate(fp["stages"])
        ]}
        ms = timeit(decode, ablated, tok)
        delta = full - ms
        gf = block_gflops(batch)
        print(f"B={batch} w/o stage-{s + 1} res blocks: {ms:.2f} ms  "
              f"(blocks cost {delta:.2f} ms = {gf / max(delta, 1e-9):.0f} TF/s "
              f"over {gf:.0f} GF)")


if __name__ == "__main__":
    main()
