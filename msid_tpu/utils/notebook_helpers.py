"""Interactive-session helpers (reference `src/utils/notebook_helpers.py`).

Capability parity with the reference's notebook utilities
(notebook_helpers.py:20-663): batch visualizers with per-sample metrics,
live training-progress plotting, dataset exploration/summary printers, and
a noise-level impact visualizer. All device work is batched; one fetch per
figure.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from msid_tpu.utils.visualization import (
    SENTINEL2_WAVELENGTHS,
    _plt,
    extract_rgb,
    plot_training_curves,
)


def visualize_batch(
    model,
    variables,
    batch: np.ndarray,
    noise_cfg=None,
    image_size: int = 192,
    max_samples: int = 4,
    seed: int = 0,
    save_path: Optional[str | Path] = None,
):
    """Noisy | restored | clean grid with per-sample PSNR/SSIM titles
    (reference notebook_helpers.py:20-115)."""
    import jax
    import jax.numpy as jnp

    from msid_tpu.ops.metrics import psnr_per_sample, ssim_per_sample
    from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise
    from msid_tpu.ops.preprocess import preprocess_tiles

    noise_cfg = noise_cfg or NoiseConfig()
    clean = preprocess_tiles(jnp.asarray(batch), image_size)
    noisy = apply_sensor_noise(jax.random.PRNGKey(seed), clean, noise_cfg)
    restored = model.apply(variables, noisy, train=False).astype(jnp.float32)
    psnr = np.asarray(jax.device_get(psnr_per_sample(restored, clean)))
    ssim = np.asarray(jax.device_get(ssim_per_sample(restored, clean)))
    noisy, clean, restored = map(np.asarray, jax.device_get((noisy, clean, restored)))

    n = min(max_samples, clean.shape[0])
    plt = _plt()
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for i in range(n):
        for j, (img, name) in enumerate(
            ((noisy[i], "noisy"), (restored[i], "restored"), (clean[i], "clean"))
        ):
            ax = axes[i][j]
            ax.imshow(extract_rgb(img))
            ax.axis("off")
            if j == 1:
                ax.set_title(
                    f"{name}  PSNR {psnr[i]:.1f} dB  SSIM {ssim[i]:.3f}",
                    fontsize=8,
                )
            elif i == 0:
                ax.set_title(name, fontsize=9)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def visualize_noise_impact(
    batch: np.ndarray,
    sigmas: Sequence[float] = (0.01, 0.05, 0.1),
    image_size: int = 192,
    seed: int = 0,
    save_path: Optional[str | Path] = None,
):
    """One clean tile corrupted at several gaussian levels
    (reference notebook_helpers.py:322-391)."""
    import jax
    import jax.numpy as jnp

    from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise
    from msid_tpu.ops.preprocess import preprocess_tiles

    clean = preprocess_tiles(jnp.asarray(batch[:1]), image_size)
    panels = [("clean", np.asarray(jax.device_get(clean))[0])]
    for s in sigmas:
        cfg = NoiseConfig(gaussian_sigma=float(s))
        noisy = apply_sensor_noise(jax.random.PRNGKey(seed), clean, cfg)
        panels.append((f"σ={s}", np.asarray(jax.device_get(noisy))[0]))

    plt = _plt()
    fig, axes = plt.subplots(1, len(panels), figsize=(3 * len(panels), 3.2))
    for ax, (name, img) in zip(axes, panels):
        ax.imshow(extract_rgb(img))
        ax.set_title(name, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def live_plot_history(history: dict, save_path: Optional[str | Path] = None):
    """Redrawable training-progress figure for interactive loops
    (reference notebook_helpers.py:118-186); same panels as
    plot_training_curves."""
    try:  # clear output when inside IPython
        from IPython import display

        display.clear_output(wait=True)
    except Exception:
        pass
    return plot_training_curves(history, save_path=save_path)


def print_dataset_info(dataset, name: str = "dataset") -> dict:
    """Shape/range/band summary (reference notebook_helpers.py:268-319)."""
    sample = dataset[0]
    info = {
        "name": name,
        "num_samples": len(dataset),
        "tile_shape": tuple(sample.shape),
        "dtype": str(sample.dtype),
        "min": float(sample.min()),
        "max": float(sample.max()),
    }
    print(f"{name}: {info['num_samples']} tiles of {info['tile_shape']} "
          f"({info['dtype']}), range [{info['min']:.1f}, {info['max']:.1f}]")
    return info


def print_evaluation_summary(results: dict) -> None:
    """Pretty metric table (reference notebook_helpers.py:300-319)."""
    print("=" * 44)
    print("Evaluation summary")
    print("-" * 44)
    for key, unit in (("psnr", "dB"), ("ssim", ""), ("sam", "deg"),
                      ("rmse", ""), ("loss", "")):
        if key in results:
            print(f"  {key.upper():<6} {results[key]:.4f} {unit}")
    print("=" * 44)


def explore_dataset(
    dataset,
    num_samples: int = 4,
    save_path: Optional[str | Path] = None,
):
    """RGB grid + per-band statistics of random tiles
    (reference notebook_helpers.py:572-663)."""
    n = min(num_samples, len(dataset))
    tiles = np.stack([np.asarray(dataset[i]) for i in range(n)])
    scale = 10000.0 if tiles.max() > 10 else 1.0

    plt = _plt()
    fig, axes = plt.subplots(2, n, figsize=(3 * n, 6), squeeze=False)
    for i in range(n):
        axes[0][i].imshow(extract_rgb(tiles[i] / scale))
        axes[0][i].set_title(f"tile {i}", fontsize=9)
        axes[0][i].axis("off")
        axes[1][i].plot(SENTINEL2_WAVELENGTHS, tiles[i].mean(axis=(0, 1)), "o-")
        axes[1][i].set_xlabel("wavelength (nm)", fontsize=8)
        axes[1][i].tick_params(labelsize=7)
    axes[1][0].set_ylabel("mean DN")
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
