"""Visualization: RGB composites, restoration triptychs, spectra, curves.

Capability parity with the reference's `src/utils/visualization.py:17-369`
(display normalization, RGB band extraction, sample grids, noisy/clean/
restored triptychs, spectral signatures, training curves, 13-band
comparisons) — reworked for the NHWC/JAX stack: tensors arrive as device
arrays in model range ≈[-2, 2]; all plotting happens on host numpy after
a single device fetch per figure.

Matplotlib is imported lazily so headless training never pays for it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

# Sentinel-2 band centres (nm) + names — reference notebook_helpers.py:188-265
SENTINEL2_WAVELENGTHS = (
    443, 490, 560, 665, 705, 740, 783, 842, 865, 945, 1375, 1610, 2190,
)
SENTINEL2_BAND_NAMES = (
    "B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9", "B10",
    "B11", "B12",
)
# True-color composite: B4 (red), B3 (green), B2 (blue) = indices 3, 2, 1
RGB_BAND_INDICES = (3, 2, 1)


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def normalize_for_display(
    img: np.ndarray, lower: float = 2.0, upper: float = 98.0
) -> np.ndarray:
    """Percentile contrast stretch to [0, 1] (reference visualization.py:17-38)."""
    img = np.asarray(img, dtype=np.float32)
    lo, hi = np.percentile(img, [lower, upper])
    if hi - lo < 1e-8:
        return np.zeros_like(img)
    return np.clip((img - lo) / (hi - lo), 0.0, 1.0)


def extract_rgb(img_hwc: np.ndarray) -> np.ndarray:
    """[H, W, 13] → display-normalized [H, W, 3] true-color composite
    (reference visualization.py:41-55, bands 4/3/2)."""
    img_hwc = np.asarray(img_hwc)
    rgb = img_hwc[..., list(RGB_BAND_INDICES)]
    return normalize_for_display(rgb)


def plot_sample_grid(
    images: np.ndarray,
    save_path: Optional[str | Path] = None,
    max_samples: int = 8,
    title: str = "Samples",
):
    """Grid of RGB composites from an NHWC batch (visualization.py:58-95)."""
    plt = _plt()
    images = np.asarray(images)[:max_samples]
    n = len(images)
    cols = min(4, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(extract_rgb(images[i]))
            ax.set_title(f"sample {i}", fontsize=8)
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def plot_restoration_triptych(
    noisy: np.ndarray,
    clean: np.ndarray,
    restored: np.ndarray,
    save_path: Optional[str | Path] = None,
    metrics: Optional[dict] = None,
):
    """Noisy | restored | clean RGB panels for one sample
    (visualization.py:98-150)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, img, name in zip(
        axes, (noisy, restored, clean), ("noisy input", "restored", "clean target")
    ):
        ax.imshow(extract_rgb(np.asarray(img)))
        ax.set_title(name)
        ax.axis("off")
    if metrics:
        fig.suptitle(
            "  ".join(f"{k}={v:.3f}" for k, v in metrics.items()), fontsize=10
        )
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def plot_spectral_signatures(
    clean: np.ndarray,
    restored: np.ndarray,
    noisy: Optional[np.ndarray] = None,
    pixels: Sequence[tuple] = ((32, 32), (96, 96), (160, 160)),
    save_path: Optional[str | Path] = None,
):
    """Per-pixel 13-band spectra, clean vs restored (visualization.py:153-211)."""
    plt = _plt()
    clean, restored = np.asarray(clean), np.asarray(restored)
    h, w = clean.shape[:2]
    pixels = [(min(y, h - 1), min(x, w - 1)) for y, x in pixels]
    fig, axes = plt.subplots(1, len(pixels), figsize=(4 * len(pixels), 3.2))
    if len(pixels) == 1:
        axes = [axes]
    wl = SENTINEL2_WAVELENGTHS
    for ax, (y, x) in zip(axes, pixels):
        ax.plot(wl, clean[y, x], "o-", label="clean", lw=1.5)
        ax.plot(wl, restored[y, x], "s--", label="restored", lw=1.5)
        if noisy is not None:
            ax.plot(wl, np.asarray(noisy)[y, x], "^:", label="noisy", lw=1, alpha=0.6)
        ax.set_title(f"pixel ({y},{x})", fontsize=9)
        ax.set_xlabel("wavelength (nm)")
        ax.legend(fontsize=7)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def plot_band_comparison(
    clean: np.ndarray,
    restored: np.ndarray,
    save_path: Optional[str | Path] = None,
):
    """All 13 bands side by side, clean vs restored (visualization.py:284-319)."""
    plt = _plt()
    clean, restored = np.asarray(clean), np.asarray(restored)
    fig, axes = plt.subplots(2, 13, figsize=(26, 4.4))
    for c in range(13):
        for row, img, name in ((0, clean, "clean"), (1, restored, "restored")):
            ax = axes[row][c]
            ax.imshow(normalize_for_display(img[..., c]), cmap="gray")
            ax.axis("off")
            if row == 0:
                ax.set_title(SENTINEL2_BAND_NAMES[c], fontsize=8)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def plot_training_curves(
    history: dict, save_path: Optional[str | Path] = None
):
    """2x2 loss/PSNR/SSIM/LR panels from a Trainer history dict
    (visualization.py:214-281)."""
    plt = _plt()
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    epochs = np.arange(1, len(history.get("train_loss", [])) + 1)

    ax = axes[0][0]
    ax.plot(epochs, history.get("train_loss", []), label="train")
    ax.plot(epochs, history.get("val_loss", []), label="val")
    ax.set_title("loss")
    ax.legend()

    ax = axes[0][1]
    ax.plot(epochs, history.get("val_psnr", []), color="tab:green")
    ax.set_title("val PSNR (dB)")

    ax = axes[1][0]
    ax.plot(epochs, history.get("val_ssim", []), color="tab:orange")
    ax.set_title("val SSIM")

    ax = axes[1][1]
    ax.plot(epochs, history.get("lr", []), color="tab:red")
    ax.set_yscale("log")
    ax.set_title("learning rate")

    for row in axes:
        for ax in row:
            ax.set_xlabel("epoch")
            ax.grid(alpha=0.3)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def save_restoration_triptychs(
    model,
    variables,
    loader,
    out_dir: str | Path,
    noise_cfg=None,
    image_size: int = 192,
    num_samples: int = 5,
    eval_seed: int = 1234,
):
    """Run the first val batch through the model and save per-sample
    triptychs + spectra (the `evaluate.py --save_visualizations` path,
    reference evaluate.py:68-80)."""
    import jax
    import jax.numpy as jnp

    from msid_tpu.ops.metrics import psnr_per_sample, ssim_per_sample
    from msid_tpu.ops.noise import NoiseConfig, apply_sensor_noise
    from msid_tpu.ops.preprocess import preprocess_tiles

    noise_cfg = noise_cfg or NoiseConfig()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    from msid_tpu.training.eval import split_batch_item

    # pad_last loaders yield (batch, true_count) — drop the padding.
    batch, count = split_batch_item(next(iter(loader)))
    batch = batch[:count]
    clean = preprocess_tiles(jnp.asarray(batch), image_size)
    noisy = apply_sensor_noise(jax.random.PRNGKey(eval_seed), clean, noise_cfg)
    restored = model.apply(variables, noisy, train=False).astype(jnp.float32)

    psnr = np.asarray(jax.device_get(psnr_per_sample(restored, clean)))
    ssim = np.asarray(jax.device_get(ssim_per_sample(restored, clean)))
    clean_h, noisy_h, restored_h = map(
        np.asarray, jax.device_get((clean, noisy, restored))
    )

    n = min(num_samples, clean_h.shape[0])
    for i in range(n):
        plot_restoration_triptych(
            noisy_h[i], clean_h[i], restored_h[i],
            save_path=out_dir / f"sample_{i:02d}.png",
            metrics={"PSNR": float(psnr[i]), "SSIM": float(ssim[i])},
        )
        plot_spectral_signatures(
            clean_h[i], restored_h[i], noisy_h[i],
            save_path=out_dir / f"sample_{i:02d}_spectra.png",
        )
    return n
