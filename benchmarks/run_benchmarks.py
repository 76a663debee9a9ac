#!/usr/bin/env python
"""Benchmark suite covering the five BASELINE.json configs:

  1. single 13-band 192x192 tile through encoder+decoder (b=1 latency)
  2. batched eval with on-device PSNR/SSIM/SAM reductions
  3. noise-sim + resize input-pipeline throughput (fused on-device)
  4. transfer-learning train step (frozen blocks 0-5, bf16+remat, batch 64)
  5. sliding-window full-scene restoration throughput

Prints one JSON object per line; writes the full report to
benchmarks/results.json. All timings use the value-fetch barrier
(block_until_ready alone can return early on relayed transports).

Run:  python benchmarks/run_benchmarks.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = {  # BASELINE.md (RTX 4050)
    "single_image_ms": 11.7,
    "train_img_per_sec": 17.0,
}


def fetch(y):
    import jax.numpy as jnp

    float(jnp.sum(y if not isinstance(y, (tuple, list, dict)) else
                  next(iter(y.values())) if isinstance(y, dict) else y[0]))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    fetch(y)
    return (time.perf_counter() - t0) / iters * 1000.0


def timeit_spread(fn, *args, iters=20, warmup=3, repeats=3):
    """(mean_ms, std_ms, all_ms): `repeats` back-to-back timeit passes.

    The spread makes session noise visible in the committed report —
    VERDICT r3 flagged a −1.5% cross-round throughput drift that a
    single-pass suite could not distinguish from regression."""
    import statistics

    samples = [timeit(fn, *args, iters=iters, warmup=warmup if r == 0 else 0)
               for r in range(repeats)]
    mean = statistics.fmean(samples)
    std = statistics.stdev(samples) if len(samples) > 1 else 0.0
    return mean, std, samples


def quality_row(repo_root: Path):
    """Fixed-checkpoint 512-protocol quality score (plain, no TTA).

    Picks the strongest on-disk flagship checkpoint from a priority list
    (outputs/ is per-machine state, so a fresh clone records null — the
    row exists to catch QUALITY regressions between rounds on the
    build/bench machine, VERDICT r3 weak #5)."""
    candidates = [
        ("outputs/r4_skip_fill_ext/checkpoints",
         "configs/experiments/eval_fill512.yaml"),
        ("outputs/r4_skip_fill/checkpoints",
         "configs/experiments/eval_fill512.yaml"),
        ("outputs/r4_skip_ext3/checkpoints",
         "configs/experiments/eval_skip512.yaml"),
        ("outputs/r3_skip_ext2/checkpoints",
         "configs/experiments/eval_skip512.yaml"),
    ]
    found = None
    for ckpt, cfg in candidates:
        if (repo_root / ckpt).is_dir() and any((repo_root / ckpt).iterdir()):
            found = (repo_root / ckpt, repo_root / cfg)
            break
    if found is None:
        return {"checkpoint": None,
                "note": "no flagship checkpoint on disk (fresh clone?)"}
    ckpt_dir, cfg_path = found

    import jax
    import jax.numpy as jnp

    from msid_tpu.data import get_dataloaders
    from msid_tpu.models import SatMAERestoration, init_model
    from msid_tpu.ops.noise import NoiseConfig
    from msid_tpu.training import (
        TrainState, build_optimizer_from_config, evaluate_model,
    )
    from msid_tpu.training.losses import LossConfig
    from msid_tpu.utils.checkpointing import CheckpointManager
    from msid_tpu.utils.config import coerce_scheduler_params, load_config

    config = coerce_scheduler_params(load_config(cfg_path))
    config["model"]["encoder"]["pretrained_path"] = None
    config.setdefault("data", {})["root_dir"] = "/nonexistent-forces-synthetic"
    model = SatMAERestoration.from_config(config, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(int(config.get("seed", 42))))
    tx, _ = build_optimizer_from_config(config, variables["params"])
    target = TrainState.create(variables, tx)
    mgr = CheckpointManager(ckpt_dir)
    out = mgr.load_best(target=target) or mgr.load_latest(target=target)
    if out is None:
        return {"checkpoint": str(ckpt_dir), "note": "empty manager dir"}
    state, _, step = out
    _, val_loader = get_dataloaders(config)
    res = evaluate_model(
        model, state.eval_variables, val_loader,
        loss_cfg=LossConfig.from_config(config),
        noise_cfg=NoiseConfig.from_config(config),
        image_size=int(config["data"].get("image_size", 192)),
        verbose=False,
    )
    return {"checkpoint": str(ckpt_dir), "step": int(step),
            "psnr": round(res["psnr"], 3), "ssim": round(res["ssim"], 4),
            "sam_deg": round(res["sam"], 3),
            "num_samples": res["num_samples"]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer iterations")
    p.add_argument("--repeats", type=int, default=3,
                   help="timing passes per row (mean + stddev recorded)")
    args = p.parse_args()
    iters = 5 if args.quick else 20
    repeats = max(1, args.repeats)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from msid_tpu.models import SatMAERestoration, init_model
    from msid_tpu.ops.metrics import batch_metric_sums
    from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise
    from msid_tpu.ops.preprocess import preprocess_tiles
    from msid_tpu.training.losses import LossConfig
    from msid_tpu.training.optim import build_optimizer
    from msid_tpu.training.train_state import TrainState, make_eval_step, make_train_step

    results = {"device": str(jax.devices()[0]), "backend": jax.default_backend()}
    rng = np.random.default_rng(0)

    out_path = Path(__file__).parent / "results.json"

    def flush():
        # Persist after every section so a wall-clock kill (the campaign
        # runners bound this suite with `timeout`) keeps completed rows.
        out_path.write_text(json.dumps(results, indent=2))

    model = SatMAERestoration(dtype=jnp.bfloat16, gradient_checkpointing=False)
    variables = init_model(model, jax.random.PRNGKey(0))
    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))

    # -- 1. single-image latency ---------------------------------------
    # b=1 steps are ~2-4 ms, so the single trailing sync (~tens of ms on a
    # relayed transport) biases small iteration counts; use 10x iters.
    iters1 = iters * 10
    x1 = jnp.asarray(rng.normal(size=(1, 192, 192, 13)), jnp.bfloat16)
    ms, std, _ = timeit_spread(forward, variables, x1, iters=iters1,
                               repeats=repeats)
    results["1_single_image_ms"] = round(ms, 3)
    results["1_single_image_ms_std"] = round(std, 4)
    results["1_vs_reference"] = round(REFERENCE["single_image_ms"] / ms, 2)
    print(json.dumps({"bench": "single_image", "ms": round(ms, 3),
                      "std": round(std, 4),
                      "vs_ref": results["1_vs_reference"]}))
    flush()

    # -- 1b. single-image latency, fastpath (graph-optimized) -----------
    from msid_tpu.deployment.fastpath import (
        make_fast_inference_fn, optimize_for_inference,
    )
    fp = optimize_for_inference(model, variables, dtype=jnp.bfloat16)
    fast1 = jax.jit(make_fast_inference_fn(model))
    ms, std, _ = timeit_spread(fast1, fp, x1, iters=iters1, repeats=repeats)
    results["1b_single_image_fastpath_ms"] = round(ms, 3)
    results["1b_single_image_fastpath_ms_std"] = round(std, 4)
    results["1b_vs_reference"] = round(REFERENCE["single_image_ms"] / ms, 2)
    print(json.dumps({"bench": "single_image_fastpath", "ms": round(ms, 3),
                      "vs_ref": results["1b_vs_reference"]}))
    flush()

    # -- 2. batched eval with on-device metrics --------------------------
    eval_step = make_eval_step(model, LossConfig(), NoiseConfig(), image_size=192)
    raw = jnp.asarray(rng.uniform(0, 10000, (64, 64, 64, 13)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def eval_call(v, b, k):
        return eval_step(v, b, k, jnp.int32(b.shape[0]))

    ms, std, _ = timeit_spread(eval_call, variables, raw, key, iters=iters,
                               repeats=repeats)
    results["2_eval_ms_per_batch64"] = round(ms, 2)
    results["2_eval_ms_per_batch64_std"] = round(std, 3)
    results["2_eval_img_per_sec"] = round(64 * 1000 / ms, 1)
    print(json.dumps({"bench": "batched_eval", "img_per_sec": results["2_eval_img_per_sec"]}))
    flush()

    # -- 3. input pipeline: preprocess + corruption ----------------------
    @jax.jit
    def pipeline(b, k):
        clean = preprocess_tiles(b, 192)
        return apply_sensor_noise(k, clean, NoiseConfig(enable_striping=True))

    ms, std, _ = timeit_spread(pipeline, raw, key, iters=iters,
                               repeats=repeats)
    results["3_pipeline_ms_per_batch64"] = round(ms, 2)
    results["3_pipeline_ms_per_batch64_std"] = round(std, 3)
    results["3_pipeline_img_per_sec"] = round(64 * 1000 / ms, 1)
    print(json.dumps({"bench": "input_pipeline", "img_per_sec": results["3_pipeline_img_per_sec"]}))
    flush()

    # -- 4. transfer-learning train step ---------------------------------
    train_model = SatMAERestoration(dtype=jnp.bfloat16)  # remat on
    tvars = init_model(train_model, jax.random.PRNGKey(0))
    tx = build_optimizer(
        optax.constant_schedule(1e-4), freeze_layers=(0, 1, 2, 3, 4, 5),
        params=tvars["params"],
    )
    state = TrainState.create(tvars, tx)
    # accum=1: the Trainer's auto_accum collapses the reference's 8x
    # accumulation when HBM fits (1.65x faster, same math)
    step = make_train_step(train_model, tx, LossConfig(), NoiseConfig(),
                           accum_steps=1, image_size=192)

    s, m = step(state, raw, key)
    fetch(m["loss"])
    n = max(3, iters // 2)
    samples4 = []
    for _rep in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            s, m = step(s, raw, key)
        fetch(m["loss"])
        samples4.append((time.perf_counter() - t0) / n * 1000)
    ms = sum(samples4) / len(samples4)
    std4 = (max(samples4) - min(samples4)) / 2 if len(samples4) > 1 else 0.0
    if len(samples4) > 2:
        import statistics
        std4 = statistics.stdev(samples4)
    results["4_train_ms_per_step"] = round(ms, 1)
    results["4_train_ms_per_step_std"] = round(std4, 2)
    results["4_train_img_per_sec"] = round(64 * 1000 / ms, 1)
    results["4_vs_reference"] = round(results["4_train_img_per_sec"] / REFERENCE["train_img_per_sec"], 2)
    print(json.dumps({"bench": "train_step", "img_per_sec": results["4_train_img_per_sec"],
                      "vs_ref": results["4_vs_reference"]}))
    flush()

    # -- 5. sliding-window full scene -------------------------------------
    # Two device-side variants, same blend geometry and forward:
    #   5a. whole-scene device assembly (one upload, one download — those
    #       two serial relay transfers dominate end-to-end time);
    #   5b. streamed row bands: uploader/downloader threads overlap H2D,
    #       compute, and D2H; uint16 up, fp16 down (4x fewer relay bytes).
    # The scene is uint16 Sentinel-2 DN — the on-disk format — sized so
    # per-band streaming has something to overlap (640² has 2 bands).
    from msid_tpu.deployment.sliding_window import (
        make_device_scene_step,
        restore_scene,
        restore_scene_streaming,
    )

    side = 1280 if args.quick else 2560
    scene = rng.uniform(0, 10000, (side, side, 13)).astype(np.uint16)
    mpix = scene.shape[0] * scene.shape[1] / 1e6
    scene_step = make_device_scene_step(model, variables, window=64,
                                        model_size=192, overlap=16)
    # warm (compile) at the BENCHED scene shape — the gather/accumulate jit
    # specializes on the scene/accumulator shapes, so a smaller warm scene
    # would leave the compile inside the timed region. Real scenes are
    # ~10980² where this one-time compile amortizes away.
    restore_scene(model, variables, scene, window=64, overlap=16,
                  model_size=192, batch_size=64, device_assembly=True,
                  step=scene_step)
    t0 = time.perf_counter()
    out = restore_scene(model, variables, scene, window=64, overlap=16,
                        model_size=192, batch_size=64, device_assembly=True,
                        step=scene_step)
    dt = time.perf_counter() - t0
    results["5a_scene_device_assembly_mpix_per_sec"] = round(mpix / dt, 3)
    print(json.dumps({"bench": "full_scene_device_assembly",
                      "mpix_per_sec": results["5a_scene_device_assembly_mpix_per_sec"]}))
    flush()

    restore_scene_streaming(model, variables, scene, window=64, overlap=16,
                            model_size=192, batch_size=64, step=scene_step)
    t0 = time.perf_counter()
    out_s = restore_scene_streaming(model, variables, scene, window=64,
                                    overlap=16, model_size=192,
                                    batch_size=64, step=scene_step)
    dt_s = time.perf_counter() - t0
    results["5_scene_mpix_per_sec"] = round(mpix / dt_s, 3)
    results["5_scene_side_px"] = side
    results["5_scene_stream_speedup"] = round(dt / dt_s, 2)
    print(json.dumps({"bench": "full_scene_streaming",
                      "mpix_per_sec": results["5_scene_mpix_per_sec"],
                      "vs_device_assembly": results["5_scene_stream_speedup"]}))

    flush()

    # -- 6. fixed-checkpoint quality (512 protocol) ----------------------
    try:
        results["6_quality_512"] = quality_row(Path(__file__).parent.parent)
    except Exception as exc:  # a missing/incompatible checkpoint must not
        results["6_quality_512"] = {"error": str(exc)}  # kill the perf rows
    print(json.dumps({"bench": "quality_512", **results["6_quality_512"]}))
    flush()
    print(json.dumps({"report": str(out_path)}))


if __name__ == "__main__":
    main()
