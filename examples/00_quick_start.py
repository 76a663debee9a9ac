#!/usr/bin/env python
"""Quick-start walkthrough (reference notebooks/00_quick_setup_test.ipynb):
environment check, data setup, dataset exploration, forward-pass smoke
test, noise visualization.

Run:  python examples/00_quick_start.py [--device cpu] [--config ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/experiments/tiny_cpu.yaml")
    p.add_argument("--device", default=None)
    p.add_argument("--output-dir", default="outputs/quick_start")
    args = p.parse_args()

    # -- 1. environment ------------------------------------------------
    from msid_tpu.utils.setup_helpers import setup_config, setup_device

    devices = setup_device(args.device)
    print(f"jax devices: {devices}")

    config = setup_config(args.config)
    config.setdefault("data", {})["synthetic_fallback"] = True

    # -- 2. data (downloads EuroSAT-MS if absent, else synthetic) ------
    from msid_tpu.utils.download import verify_downloads

    report = verify_downloads(config)
    print(f"dataset present: {report['dataset_present']} ({report['dataset_path']})")

    from msid_tpu.data import get_dataloaders

    train_loader, val_loader = get_dataloaders(config)
    print(f"train batches: {len(train_loader)}, val batches: {len(val_loader)}")

    batch = next(iter(train_loader))
    print(f"raw tile batch: {batch.shape} {batch.dtype} "
          f"range [{batch.min():.1f}, {batch.max():.1f}]")

    # -- 3. model + forward smoke test ---------------------------------
    import jax
    import jax.numpy as jnp

    from msid_tpu.utils.setup_helpers import create_model_from_config, print_config_summary

    print_config_summary(config)
    model, variables, counts = create_model_from_config(config)
    print(f"params: {counts['total'] / 1e6:.1f}M")

    from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise
    from msid_tpu.ops.preprocess import preprocess_tiles

    image_size = int(config["data"].get("image_size", 192))
    clean = preprocess_tiles(jnp.asarray(batch), image_size)
    noisy = apply_sensor_noise(jax.random.PRNGKey(0), clean, NoiseConfig.from_config(config))
    restored = model.apply(variables, noisy, train=False)
    print(f"forward: {noisy.shape} -> {restored.shape} ({restored.dtype})")

    # -- 4. untrained metrics (sanity floor) ----------------------------
    from msid_tpu.ops.metrics import batch_metric_sums

    sums = jax.device_get(batch_metric_sums(restored.astype(jnp.float32), clean))
    n = float(sums["count"])
    print(f"untrained model: PSNR {sums['psnr']/n:.2f} dB, "
          f"SSIM {sums['ssim']/n:.4f}, SAM {sums['sam']/n:.2f} deg")

    # -- 5. noise visualization -----------------------------------------
    out = Path(args.output_dir)
    from msid_tpu.utils.visualization import plot_restoration_triptych

    plot_restoration_triptych(
        *map(lambda a: jax.device_get(a)[0], (noisy, clean, restored)),
        save_path=out / "noise_preview.png",
    )
    print(f"wrote {out / 'noise_preview.png'}")


if __name__ == "__main__":
    main()
