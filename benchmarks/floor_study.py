#!/usr/bin/env python
"""Restoration-floor study: turn "the corruption is the limiter" into numbers.

VERDICT r2 item 1: DESIGN.md §9 closed the synthetic quality axis with an
asserted "irreducible corruption floor". This script MEASURES that floor on
the 512-tile protocol (the apples-to-apples benchmark for the 35.50 dB
round-1 number), reproducing the exact eval corruption stream
(PRNGKey(1234), fold_in(uint32(batch)) — training/eval.py:31-46):

1. zero-skill floors  — metrics(noisy, clean) under the full corruption
   and under each noise component in isolation (identity "denoiser").
2. component decomposition — the trained checkpoint evaluated under each
   component in isolation: locates which component owns the quality gap.
3. dead-band oracle bounds — killed bands carry NO information about their
   own content; recovery is bounded by cross-band prediction:
     * oracle_global: clean tile everywhere, dead bands replaced by the
       best linear predictor from the SURVIVING clean bands, fit on the
       TRAIN split (realizable erasure bound: assumes perfect denoising +
       the best train-fit linear spectral fill).
     * oracle_tile: same, but the affine fill is least-squares fit on the
       val tile's own pixels (leaks the erased band into the fit — an
       optimistic cap on any per-band affine reconstruction; the residual
       is the cross-band-unpredictable content, e.g. per-band iid texture).
     * linear_fill: non-learned baseline — the noisy tile with dead bands
       filled by the global predictor applied to the noisy surviving
       bands (what trivial spectral infill achieves with NO model).

Every row is collected PER SAMPLE and aggregated over three subsets:
``all`` tiles, ``has_dead`` (≥1 killed band — where erasure bounds bite)
and ``dead_free`` (pure denoising; the oracle is exact there, so oracle
rows report null for that subset instead of a 1e-20-clamped PSNR).

Noise semantics being bounded is exactly the reference's component
structure (`/root/reference/src/data/transforms.py:70-154`).

Usage:
  python benchmarks/floor_study.py [--config configs/base.yaml]
      [--checkpoint outputs/run/checkpoints] [--device tpu|cpu]
      [--samples 512] [--out outputs/floor_study.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logger = logging.getLogger("floor_study")

METRICS = ("psnr", "ssim", "sam", "rmse")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", default="configs/base.yaml")
    p.add_argument("--checkpoint", default=None,
                   help="Orbax manager root; enables stage 2")
    p.add_argument("--device", default=None, help="jax platform (tpu/cpu)")
    p.add_argument("--samples", type=int, default=512,
                   help="synthetic dataset size (512 = the r1 protocol)")
    p.add_argument("--complexity", default="base",
                   help="synthetic family: base | rich | mixed")
    p.add_argument("--out", default="outputs/floor_study.json")
    p.add_argument("--eval-seed", type=int, default=1234)
    p.add_argument("--tta", type=int, default=1,
                   help="dihedral views for the model rows (1-8)")
    return p.parse_args()


def component_configs(full):
    """The full corruption and each component in isolation (same key-split
    layout, so e.g. dead masks are identical across rows)."""
    from msid_tpu.ops.noise import NoiseConfig

    zero = dict(gaussian_sigma=0.0, speckle_sigma=0.0, dead_band_prob=0.0,
                thermal_scale=0.0, enable_striping=False)
    rows = {"full": full}
    # all-components-off: model(clean) measures the network's pure
    # reconstruction-fidelity cap (identity task — if THIS is ~the full
    # score, the architecture's bottleneck, not the corruption, limits it)
    rows["none"] = NoiseConfig(**zero)
    rows["gaussian_only"] = NoiseConfig(**{**zero, "gaussian_sigma": full.gaussian_sigma})
    rows["speckle_only"] = NoiseConfig(**{**zero, "speckle_sigma": full.speckle_sigma})
    rows["dead_band_only"] = NoiseConfig(**{**zero, "dead_band_prob": full.dead_band_prob})
    rows["thermal_only"] = NoiseConfig(**{**zero, "thermal_scale": full.thermal_scale})
    if full.enable_striping:
        rows["striping_only"] = NoiseConfig(
            **{**zero, "enable_striping": True, "stripe_prob": full.stripe_prob,
               "stripe_sigma": full.stripe_sigma})
    return rows


def per_sample_metrics(pred, target):
    """fp32 [B] arrays for all four protocol metrics (device)."""
    from msid_tpu.ops.metrics import (
        psnr_per_sample, rmse_per_sample, sam_per_sample,
    )
    from msid_tpu.ops.ssim import ssim_per_sample

    return {
        "psnr": psnr_per_sample(pred, target),
        "ssim": ssim_per_sample(pred, target),
        "sam": sam_per_sample(pred, target),
        "rmse": rmse_per_sample(pred, target),
    }


def collect_identity(loader, noise_cfg, image_size, base_key):
    """Per-sample metrics(noisy, clean): the zero-skill floor."""
    import jax
    import jax.numpy as jnp

    from msid_tpu.ops.noise import corrupt
    from msid_tpu.ops.preprocess import preprocess_tiles
    from msid_tpu.training.eval import split_batch_item

    @jax.jit
    def step(batch, key):
        clean = preprocess_tiles(batch, image_size)
        noisy = corrupt(key, clean, noise_cfg)
        return per_sample_metrics(noisy, clean)

    return _run_per_sample(loader, base_key, step, split_batch_item)


def collect_model(model, variables, loader, noise_cfg, image_size, base_key,
                  tta=1):
    """Per-sample metrics(model(noisy), clean) for one noise config."""
    import jax
    import jax.numpy as jnp

    from msid_tpu.ops.noise import corrupt
    from msid_tpu.ops.preprocess import preprocess_tiles
    from msid_tpu.ops.tta import dihedral_ensemble
    from msid_tpu.training.eval import split_batch_item

    compute_dtype = getattr(model, "dtype", jnp.float32)

    @jax.jit
    def step(variables, batch, key):
        clean = preprocess_tiles(batch, image_size)
        noisy = corrupt(key, clean, noise_cfg)

        def forward(z):
            return model.apply(variables, z.astype(compute_dtype), train=False)

        out = dihedral_ensemble(forward, noisy, tta) if tta > 1 else forward(noisy)
        return per_sample_metrics(out.astype(jnp.float32), clean)

    return _run_per_sample(
        loader, base_key, lambda b, k: step(variables, b, k), split_batch_item)


def _run_per_sample(loader, base_key, step, split_batch_item):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rows = {m: [] for m in METRICS}
    for i, item in enumerate(loader):
        batch, count = split_batch_item(item)
        key = jax.random.fold_in(base_key, jnp.uint32(i))
        out = jax.device_get(step(jnp.asarray(batch), key))
        for m in METRICS:
            rows[m].append(np.asarray(out[m])[:count])
    return {m: np.concatenate(v) for m, v in rows.items()}


def collect_dead_masks(loader, noise_cfg, base_key):
    """Per-sample boolean [N, C] alive masks drawn by the eval protocol."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msid_tpu.ops.noise import dead_band_mask
    from msid_tpu.ops.preprocess import preprocess_tiles
    from msid_tpu.training.eval import split_batch_item

    masks = []
    for i, item in enumerate(loader):
        batch, count = split_batch_item(item)
        key = jax.random.fold_in(base_key, jnp.uint32(i))
        shape = (batch.shape[0], 1, 1, batch.shape[-1])
        alive = np.asarray(dead_band_mask(key, shape, noise_cfg))[:, 0, 0, :]
        masks.append(alive[:count])
    return np.concatenate(masks).astype(bool)


def fit_global_gram(loader, image_size):
    """Pixelwise second-moment matrix G = E[z zᵀ], z = [13 bands, 1], over
    CLEAN train tiles in model space."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msid_tpu.ops.preprocess import preprocess_tiles
    from msid_tpu.training.eval import split_batch_item

    @jax.jit
    def gram(batch):
        clean = preprocess_tiles(batch, image_size)
        z = clean.reshape(-1, clean.shape[-1])
        z = jnp.concatenate([z, jnp.ones((z.shape[0], 1), z.dtype)], axis=-1)
        return z.T @ z, jnp.asarray(z.shape[0], jnp.float32)

    total, n = None, 0.0
    for item in loader:
        batch, count = split_batch_item(item)
        g, m = jax.device_get(gram(jnp.asarray(batch)[:count]))
        total = g if total is None else total + g
        n += float(m)
    if total is None:
        raise ValueError("empty train loader — cannot fit the cross-band "
                         "predictor (dataset smaller than one batch?)")
    return total / n


def _solve_fill(gram, alive_c):
    """Weights predicting each dead band from the surviving bands + bias."""
    import numpy as np

    c = len(alive_c)
    surv = [j for j in range(c) if alive_c[j]] + [c]  # + bias column
    out = {}
    for tgt in range(c):
        if alive_c[tgt]:
            continue
        a = gram[np.ix_(surv, surv)]
        b = gram[np.ix_(surv, [tgt])]
        w = np.linalg.solve(a + 1e-6 * np.eye(len(surv)), b)[:, 0]
        out[tgt] = (surv, w)
    return out


def collect_oracles(loader, noise_cfg, image_size, base_key, global_gram):
    """Per-sample metrics for the three dead-band oracle reconstructions."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msid_tpu.ops.noise import corrupt, dead_band_mask
    from msid_tpu.ops.preprocess import preprocess_tiles
    from msid_tpu.training.eval import split_batch_item

    @jax.jit
    def prep(batch, key):
        clean = preprocess_tiles(batch, image_size)
        noisy = corrupt(key, clean, noise_cfg)
        alive = dead_band_mask(key, clean.shape, noise_cfg)[:, 0, 0, :]
        return clean, noisy, alive

    @jax.jit
    def score(pred, clean):
        return per_sample_metrics(pred, clean)

    rows = {name: {m: [] for m in METRICS}
            for name in ("oracle_global", "oracle_tile", "linear_fill")}

    def acc_batch(name, preds, cleans, count, pad_to):
        # One scoring call per oracle per BATCH (a per-sample call would
        # pay the relay dispatch floor ~1500x over the 512 protocol);
        # pad to the loader's static batch so `score` compiles once.
        preds = np.stack(preds)
        cleans = np.stack(cleans)
        if preds.shape[0] < pad_to:
            reps = pad_to - preds.shape[0]
            preds = np.concatenate([preds, np.repeat(preds[:1], reps, 0)])
            cleans = np.concatenate([cleans, np.repeat(cleans[:1], reps, 0)])
        out = jax.device_get(score(jnp.asarray(preds), jnp.asarray(cleans)))
        for m in METRICS:
            rows[name][m].extend(
                float(v) for v in np.asarray(out[m])[:count])

    for i, item in enumerate(loader):
        batch, count = split_batch_item(item)
        key = jax.random.fold_in(base_key, jnp.uint32(i))
        clean, noisy, alive = jax.device_get(prep(jnp.asarray(batch), key))
        og_b, ot_b, lf_b, cl_b = [], [], [], []
        for s_idx in range(count):
            cl, no, al = clean[s_idx], noisy[s_idx], alive[s_idx].astype(bool)
            cl_b.append(cl)
            if al.all():
                # No erasure: the oracles are exact (PSNR unbounded); keep
                # placeholder rows so indices line up, aggregate() drops
                # them from the oracle subsets.
                og_b.append(cl)
                ot_b.append(cl)
                lf_b.append(no)
                continue
            flat = cl.reshape(-1, cl.shape[-1])
            ones = np.ones((flat.shape[0], 1), flat.dtype)
            z_clean = np.concatenate([flat, ones], axis=-1)
            z_noisy = np.concatenate(
                [no.reshape(-1, no.shape[-1]), ones], axis=-1)
            tile_gram = (z_clean.T @ z_clean) / z_clean.shape[0]

            og = flat.copy()
            ot = flat.copy()
            lf = no.reshape(-1, no.shape[-1]).copy()
            for tgt, (surv, w) in _solve_fill(global_gram, al).items():
                og[:, tgt] = z_clean[:, surv] @ w
                lf[:, tgt] = z_noisy[:, surv] @ w
            for tgt, (surv, w) in _solve_fill(tile_gram, al).items():
                ot[:, tgt] = z_clean[:, surv] @ w
            og_b.append(og.reshape(cl.shape))
            ot_b.append(ot.reshape(cl.shape))
            lf_b.append(lf.reshape(cl.shape))
        pad_to = clean.shape[0]
        acc_batch("oracle_global", og_b, cl_b, count, pad_to)
        acc_batch("oracle_tile", ot_b, cl_b, count, pad_to)
        acc_batch("linear_fill", lf_b, cl_b, count, pad_to)

    import numpy as np

    return {name: {m: np.asarray(v) for m, v in per_metric.items()}
            for name, per_metric in rows.items()}


def aggregate(per_sample, has_dead, erasure_only=False):
    """Subset means: all / has_dead / dead_free.

    ``erasure_only`` marks rows whose reconstruction is EXACT on dead-free
    tiles (the oracles, and the identity row under dead_band_only): their
    per-sample PSNR there is a 1e-20-clamp artifact (~215 dB), so the
    ``all`` and ``dead_free`` subsets are reported null.
    """
    import numpy as np

    def agg(sel):
        if not np.any(sel):
            return None
        return {m: round(float(np.mean(per_sample[m][sel])), 4)
                for m in METRICS}

    n = len(has_dead)
    out = {"has_dead": agg(has_dead)}
    if erasure_only:
        out["all"] = None
        out["dead_free"] = None
    else:
        out["all"] = agg(np.ones(n, bool))
        out["dead_free"] = agg(~has_dead)
    return out


def main():
    args = parse_args()
    if args.device:
        import os

        os.environ["JAX_PLATFORMS"] = args.device
        import jax as _jax

        _jax.config.update("jax_platforms", args.device)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")

    import jax
    import numpy as np

    from msid_tpu.data import get_dataloaders
    from msid_tpu.ops.noise import NoiseConfig
    from msid_tpu.utils.config import coerce_scheduler_params, load_config

    config = coerce_scheduler_params(load_config(args.config))
    config["model"]["encoder"]["pretrained_path"] = None
    config.setdefault("data", {})
    config["data"]["root_dir"] = "/nonexistent-forces-synthetic"
    config["data"]["synthetic_samples"] = args.samples
    config["data"]["synthetic_complexity"] = args.complexity
    image_size = int(config["data"].get("image_size", 192))
    full_cfg = NoiseConfig.from_config(config)
    base_key = jax.random.PRNGKey(args.eval_seed)
    _, val_loader = get_dataloaders(config)
    # Gram fit wants EVERY train tile (no drop_last) in a fixed order.
    from msid_tpu.data.dataset import build_dataset
    from msid_tpu.data.pipeline import BatchLoader

    micro = int(config.get("training", {}).get("micro_batch_size", 8))
    accum = int(config.get("training", {}).get("gradient_accumulation_steps", 1))
    gram_loader = BatchLoader(build_dataset(config, "train"),
                              batch_size=micro * accum, shuffle=False,
                              drop_last=False, pad_last=True)

    alive_masks = collect_dead_masks(val_loader, full_cfg, base_key)
    has_dead = ~alive_masks.all(axis=1)
    dead_frac = float((~alive_masks).mean())
    logger.info("val tiles: %d (%d with >=1 dead band); dead-band fraction "
                "%.4f", len(has_dead), int(has_dead.sum()), dead_frac)

    results = {
        "protocol": {
            "samples": args.samples, "complexity": args.complexity,
            "image_size": image_size, "eval_seed": args.eval_seed,
            "val_tiles": int(len(has_dead)),
            "tiles_with_dead_band": int(has_dead.sum()),
            "dead_band_fraction": round(dead_frac, 4),
            "noise": {k: getattr(full_cfg, k) for k in (
                "gaussian_sigma", "speckle_sigma", "dead_band_prob",
                "thermal_scale", "enable_striping")},
        },
        "identity": {}, "model": {}, "oracle": {},
    }

    # ---- stage 1: zero-skill floors ------------------------------------
    for name, cfg in component_configs(full_cfg).items():
        if name == "none":
            continue  # identity(clean, clean) is exact — nothing to measure
        ps = collect_identity(val_loader, cfg, image_size, base_key)
        results["identity"][name] = aggregate(
            ps, has_dead, erasure_only=(name == "dead_band_only"))
        logger.info("identity/%s: %s", name,
                    results["identity"][name]["all"]
                    or results["identity"][name]["has_dead"])

    # ---- stage 3: dead-band oracle bounds ------------------------------
    logger.info("fitting global cross-band predictor on the train split...")
    gram = fit_global_gram(gram_loader, image_size)
    # linear_fill keeps the non-dead-band noise, so it is well-defined on
    # every tile; the two clean-everywhere oracles are exact on dead-free
    # tiles and only report the has_dead subset.
    for name, ps in collect_oracles(
            val_loader, full_cfg, image_size, base_key, gram).items():
        results["oracle"][name] = aggregate(
            ps, has_dead, erasure_only=(name != "linear_fill"))
        logger.info("oracle/%s (has_dead): %s", name,
                    results["oracle"][name]["has_dead"])

    # ---- stage 2: trained model under each component -------------------
    if args.checkpoint:
        import jax.numpy as jnp

        from msid_tpu.models import SatMAERestoration, init_model
        from msid_tpu.training import TrainState, build_optimizer_from_config
        from msid_tpu.utils.checkpointing import CheckpointManager

        compute_dtype = (
            jnp.bfloat16
            if config.get("training", {}).get("mixed_precision", True)
            else jnp.float32)
        model = SatMAERestoration.from_config(config, dtype=compute_dtype)
        variables = init_model(model, jax.random.PRNGKey(int(config.get("seed", 42))))
        tx, _ = build_optimizer_from_config(config, variables["params"])
        mgr = CheckpointManager(args.checkpoint)
        out = (mgr.load_best(target=TrainState.create(variables, tx))
               or mgr.load_latest(target=TrainState.create(variables, tx)))
        if out is None:
            raise FileNotFoundError(f"No checkpoint under {args.checkpoint}")
        state, _, step = out
        variables = state.eval_variables
        results["checkpoint"] = {"path": str(args.checkpoint),
                                 "step": int(step), "tta": args.tta}
        logger.info("Restored checkpoint step %d", step)

        for name, cfg in component_configs(full_cfg).items():
            ps = collect_model(model, variables, val_loader, cfg, image_size,
                               base_key, tta=args.tta)
            results["model"][name] = aggregate(ps, has_dead)
            logger.info("model/%s: %s", name, results["model"][name]["all"])

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(results, indent=2))
    logger.info("wrote %s", out_path)

    # Human-readable summary table
    print("\n=== Restoration floor study ===")
    print(f"{'row':<28}{'all':>8}{'has_dead':>10}{'dead_free':>10}   (PSNR dB)")
    for section in ("identity", "model", "oracle"):
        for name, row in results[section].items():
            cells = []
            for sub in ("all", "has_dead", "dead_free"):
                v = row.get(sub)
                cells.append(f"{v['psnr']:>8.2f}" if v else f"{'—':>8}")
            print(f"{section + '/' + name:<28}{cells[0]}{cells[1]:>10}{cells[2]:>10}")


if __name__ == "__main__":
    main()
