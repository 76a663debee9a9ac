#!/usr/bin/env python
"""Fastpath A/B microbenchmarks: full-path crossover + lowering variants.

Measures, on the current default device, steady-state (pipelined, single
trailing sync) per-iteration time of:

  * full forward: fastpath(matmul upsample) vs fastpath(conv_transpose
    upsample) vs `model.apply`, across batch sizes — the data behind
    `FASTPATH_AUTO_MAX_BATCH` in deployment/inference.py.
  * decoder-only and encoder-only variants (--parts): upsample lowering,
    patchify lowering, softmax accumulation dtype.

Reference for the role of this file: the reference project benchmarks its
onnxslim-optimized artifact against the raw export the same way
(compare_models in /root/reference/src/deployment/optimize_model.py).

Last measured (v5e, 2026-08): full-path ms/iter
    b=1   fast_mm  1.46 (contiguous-slice QKV; 2.42 before)  fast_ct 4.07
          regular  1.80  (200-iter loops; see DESIGN.md measurement note)
    b=8   fast_mm  7.65   fast_ct  8.76   regular  7.51
    b=32  fast_mm 33.8    fast_ct 31.5    regular 32.1
    b=128 fast_mm 101.7   fast_ct 63.5   hybrid 58.9   regular 62.2
Decoder-only b=128: matmul+d2s 69.1, conv_transpose 30.9 (regular 34).
Encoder-only b=128 (this tool, --parts): flax 30.1; fused_contig 34.6
(fp32 softmax) / 32.3 (bf16); fused_reshape 37.9 / 41.3; split 32.1 /
29.8. The softmax-dtype effect flips with the slicing mode; split+bf16
is a wash with flax, so the hybrid keeps the (parity-tested) flax
encoder + folded-BN conv_transpose decoder for large batch.

Run:  python benchmarks/fastpath_ab.py [--batches 1,8,32] [--parts]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, *args, n=40, warmup=3):
    import jax.numpy as jnp

    for _ in range(warmup):
        float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,32")
    p.add_argument("--parts", action="store_true",
                   help="also A/B decoder/encoder lowering variants at the largest batch")
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--arch", default="unet_light",
                   help="decoder architecture (unet_light / unet_skip) — "
                        "the r3 quality winner unet_skip adds an "
                        "InputPyramid stem + per-stage fuse convs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msid_tpu.deployment import fastpath
    from msid_tpu.deployment.export import make_inference_fn
    from msid_tpu.deployment.fastpath import (
        make_fast_inference_fn,
        optimize_for_inference,
    )
    from msid_tpu.models import SatMAERestoration, init_model

    model = SatMAERestoration(dtype=jnp.bfloat16, gradient_checkpointing=False,
                              decoder_arch=args.arch)
    variables = init_model(model, jax.random.PRNGKey(0))
    fp = optimize_for_inference(model, variables, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    from msid_tpu.deployment.fastpath import (
        make_hybrid_inference_fn,
        optimize_for_hybrid,
    )

    hyb = optimize_for_hybrid(model, variables, dtype=jnp.bfloat16)
    fns = {
        "fast_mm": (jax.jit(make_fast_inference_fn(model, matmul_upsample=True)), fp),
        "fast_ct": (jax.jit(make_fast_inference_fn(model, matmul_upsample=False)), fp),
        "hybrid ": (jax.jit(make_hybrid_inference_fn(model)), hyb),
        "regular": (jax.jit(make_inference_fn(model)), variables),
    }
    batches = [int(b) for b in args.batches.split(",")]
    for b in batches:
        x = jnp.asarray(rng.normal(size=(b, 192, 192, 13)), jnp.float32)
        for name, (fn, weights) in fns.items():
            ms = _timeit(fn, weights, x, n=args.iters)
            print(f"B={b:3d} {name}: {ms:8.3f} ms/iter ({ms / b * 1e3:7.1f} us/img)",
                  flush=True)

    if args.parts and args.arch != "unet_light":
        print("--parts lowering probes are unet_light-only (the skip "
              "decoder's stage inputs depend on the stem); skipping")
    elif args.parts:
        bmax = max(batches)
        grid = model.image_size // model.patch_size
        tok = jnp.asarray(
            rng.normal(size=(bmax, grid, grid, model.embed_dim)), jnp.bfloat16
        )

        # decoder lowering: the production _fast_decode, both upsample forms
        for mu in (True, False):
            f = jax.jit(functools.partial(fastpath._fast_decode, matmul_upsample=mu))
            print(f"B={bmax:3d} decoder matmul_up={mu}: {_timeit(f, fp, tok, n=args.iters):.3f} ms",
                  flush=True)

        # encoder lowering: QKV fusion/slicing strategy x softmax dtype
        xb = jnp.asarray(rng.normal(size=(bmax, 192, 192, 13)), jnp.bfloat16)

        def enc(fpp, x, qkv_mode, sm32):
            pz, heads, D = model.patch_size, model.num_heads, model.embed_dim
            hd = D // heads
            dtype = fpp["patch_w"].dtype
            b, h, w, c = x.shape
            gh, gw = h // pz, w // pz
            n = gh * gw
            x = x.astype(dtype)
            patches = x.reshape(b, gh, pz, gw, pz, c).transpose(0, 1, 3, 2, 4, 5)
            t = patches.reshape(b, n, pz * pz * c) @ fpp["patch_w"] + fpp["patch_b"]
            t = fastpath._layer_norm(t, *fpp["patch_ln"]) + fpp["pos_embed"].astype(dtype)
            for blk in fpp["blocks"]:
                y = fastpath._layer_norm(t, *blk["ln1"])
                if qkv_mode == "fused_reshape":
                    qkv = (y @ blk["wqkv"] + blk["bqkv"]).reshape(b, n, 3, heads, hd)
                    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                elif qkv_mode == "fused_contig":  # the shipped fast_forward form
                    qkv = y @ blk["wqkv"] + blk["bqkv"]
                    q = qkv[..., :D].reshape(b, n, heads, hd)
                    k = qkv[..., D:2 * D].reshape(b, n, heads, hd)
                    v = qkv[..., 2 * D:].reshape(b, n, heads, hd)
                else:  # "split": three matmuls, flax-style
                    q = (y @ blk["wqkv"][:, :D] + blk["bqkv"][:D]).reshape(b, n, heads, hd)
                    k = (y @ blk["wqkv"][:, D:2 * D] + blk["bqkv"][D:2 * D]).reshape(b, n, heads, hd)
                    v = (y @ blk["wqkv"][:, 2 * D:] + blk["bqkv"][2 * D:]).reshape(b, n, heads, hd)
                sc = jnp.einsum("bqhd,bkhd->bhqk", q, k)
                if sm32:
                    a = jax.nn.softmax(sc.astype(jnp.float32), axis=-1).astype(dtype)
                else:
                    a = jax.nn.softmax(sc, axis=-1)
                y = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, D)
                t = t + (y @ blk["wout"] + blk["bout"])
                y = fastpath._layer_norm(t, *blk["ln2"])
                y = jax.nn.gelu(y @ blk["w1"] + blk["b1"])
                t = t + (y @ blk["w2"] + blk["b2"])
            return fastpath._layer_norm(t, *fpp["final_ln"])

        def enc_flax(v, x):
            return model.apply(v, x, train=False,
                               method=lambda m, xx, train: m.encoder(xx, train=train))

        print(f"B={bmax:3d} encoder flax: {_timeit(jax.jit(enc_flax), variables, xb, n=args.iters):.3f} ms",
              flush=True)
        for mode in ("fused_contig", "fused_reshape", "split"):
            for sm32 in (True, False):
                f = jax.jit(functools.partial(enc, qkv_mode=mode, sm32=sm32))
                print(f"B={bmax:3d} encoder {mode} sm32={sm32}: {_timeit(f, fp, xb, n=args.iters):.3f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
