"""Restoration-quality metrics as on-device batched XLA reductions.

Functional parity with the reference metric formulas
(`/root/reference/src/training/metrics.py:19-209`) — PSNR / SSIM / SAM /
RMSE / MAE at data_range 6.0 — but designed TPU-first:

  * every function has a ``*_per_sample`` variant returning fp32 ``[B]`` so
    an entire eval batch reduces on device in one fused kernel;
  * the reference's `MetricsTracker` looped **per sample on the host** with
    an `.item()` sync for each metric (`metrics.py:236-256`). Ours
    accumulates on-device sums and transfers once at `compute()`.

Layout is NHWC ``[B, H, W, C]`` (TPU-native); the semantics are
layout-agnostic since all reductions are over the full image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from msid_tpu.ops.ssim import DEFAULT_DATA_RANGE, ssim, ssim_per_sample

_LN10 = 2.302585092994046


def _flatten_per_sample(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def mse_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = _flatten_per_sample(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(d * d, axis=-1)


def psnr_per_sample(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float = DEFAULT_DATA_RANGE
) -> jnp.ndarray:
    """Per-sample PSNR in dB, fp32 [B]. PSNR = 10·log10(range² / MSE)."""
    mse = mse_per_sample(pred, target)
    return 10.0 * (jnp.log(data_range**2 / jnp.maximum(mse, 1e-20)) / _LN10)


def calculate_psnr(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float = DEFAULT_DATA_RANGE
) -> jnp.ndarray:
    """Scalar PSNR over the whole batch (reference metrics.py:19-46 semantics:
    one MSE over all elements, then dB)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    mse = jnp.mean(d * d)
    return 10.0 * (jnp.log(data_range**2 / jnp.maximum(mse, 1e-20)) / _LN10)


def calculate_ssim(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float = DEFAULT_DATA_RANGE
) -> jnp.ndarray:
    """Scalar mean SSIM (reference metrics.py:49-121)."""
    return ssim(pred, target, data_range)


def sam_per_sample(
    pred: jnp.ndarray, target: jnp.ndarray, epsilon: float = 1e-8
) -> jnp.ndarray:
    """Per-sample mean Spectral Angle Mapper in degrees, fp32 [B].

    Angle between the C-vector spectra at every pixel
    (reference metrics.py:124-172): arccos(x·y / (|x|+ε)(|y|+ε)).
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    dot = jnp.sum(p * t, axis=-1)
    p_norm = jnp.sqrt(jnp.sum(p * p, axis=-1)) + epsilon
    t_norm = jnp.sqrt(jnp.sum(t * t, axis=-1)) + epsilon
    cos_angle = jnp.clip(dot / (p_norm * t_norm), -1.0, 1.0)
    angle_deg = jnp.degrees(jnp.arccos(cos_angle))
    return jnp.mean(angle_deg, axis=(1, 2))


def calculate_sam(pred: jnp.ndarray, target: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Scalar mean SAM in degrees over all pixels in the batch."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    dot = jnp.sum(p * t, axis=-1)
    p_norm = jnp.sqrt(jnp.sum(p * p, axis=-1)) + epsilon
    t_norm = jnp.sqrt(jnp.sum(t * t, axis=-1)) + epsilon
    cos_angle = jnp.clip(dot / (p_norm * t_norm), -1.0, 1.0)
    return jnp.mean(jnp.degrees(jnp.arccos(cos_angle)))


def rmse_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(mse_per_sample(pred, target))


def calculate_rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.sqrt(jnp.mean(d * d))


def mae_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = _flatten_per_sample(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(jnp.abs(d), axis=-1)


def calculate_mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("data_range",))
def batch_metric_sums(
    pred: jnp.ndarray, target: jnp.ndarray,
    data_range: float = DEFAULT_DATA_RANGE,
    mask: jnp.ndarray | None = None,
) -> dict:
    """One fused kernel: per-sample PSNR/SSIM/SAM/RMSE summed over the batch.

    Returns {'psnr','ssim','sam','rmse','count'} as fp32 scalars — the
    on-device accumulation unit for `MetricsTracker`. Matching the reference
    tracker, the averages are means of **per-sample** metrics
    (metrics.py:247-256), not metrics of pooled statistics.

    ``mask`` (fp32 [B], optional) weights each sample's contribution —
    pass 0 for padded samples so a padded-to-static-shape trailing batch
    sums only its real entries; ``count`` becomes ``sum(mask)``.
    """
    if mask is None:
        weigh = jnp.sum
        count = jnp.asarray(pred.shape[0], dtype=jnp.float32)
    else:
        mask = mask.astype(jnp.float32)
        weigh = lambda v: jnp.sum(v * mask)  # noqa: E731
        count = jnp.sum(mask)
    return {
        "psnr": weigh(psnr_per_sample(pred, target, data_range)),
        "ssim": weigh(ssim_per_sample(pred, target, data_range)),
        "sam": weigh(sam_per_sample(pred, target)),
        "rmse": weigh(rmse_per_sample(pred, target)),
        "count": count,
    }


class MetricsTracker:
    """Accumulates metric sums on device; one host transfer at compute().

    Drop-in behavioral replacement for the reference tracker
    (`metrics.py:212-287`) minus its per-sample host syncs.
    """

    def __init__(self, data_range: float = DEFAULT_DATA_RANGE):
        self.data_range = data_range
        self.reset()

    def reset(self) -> None:
        self._sums = None

    def update(self, pred: jnp.ndarray, target: jnp.ndarray) -> None:
        sums = batch_metric_sums(pred, target, self.data_range)
        if self._sums is None:
            self._sums = sums
        else:
            self._sums = jax.tree_util.tree_map(jnp.add, self._sums, sums)

    def compute(self) -> dict:
        if self._sums is None:
            return {"psnr": 0.0, "ssim": 0.0, "sam": 0.0, "rmse": 0.0}
        host = jax.device_get(self._sums)  # the single host sync
        count = max(float(host["count"]), 1.0)
        return {
            "psnr": float(host["psnr"]) / count,
            "ssim": float(host["ssim"]) / count,
            "sam": float(host["sam"]) / count,
            "rmse": float(host["rmse"]) / count,
        }

    def __repr__(self) -> str:
        m = self.compute()
        return (
            f"PSNR: {m['psnr']:.2f} dB, SSIM: {m['ssim']:.4f}, "
            f"SAM: {m['sam']:.2f}°, RMSE: {m['rmse']:.4f}"
        )
