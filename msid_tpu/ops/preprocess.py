"""On-device preprocessing: raw 64×64×13 tiles → normalized 192×192×13.

The reference did all of this **per sample on the host** inside DataLoader
``__getitem__`` (`/root/reference/src/data/dataset.py:160-186`): heuristic
range scaling, bilinear 64→192 upsample, clamp to [0,1], affine
``(x-0.5)/0.25`` → ≈[-2, 2]. Here the host stops at raw tiles; the device
receives 64×64×13 (9× less host→device traffic than shipping 192×192) and
the whole chain runs inside the jitted step, fused by XLA with the noise
simulator downstream.

`jax.image.resize` with ``method='bilinear'`` uses half-pixel sampling —
identical semantics to torch ``interpolate(mode='bilinear',
align_corners=False)`` (dataset.py:170-175).

Layout: NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_raw(x: jnp.ndarray) -> jnp.ndarray:
    """Heuristic range scaling matching reference dataset.py:160-166.

    Raw Sentinel-2 DN (max > 10) → /10000; 8-bit (max > 1.5) → /255;
    already-[0,1] data passes through. The reference applies the heuristic
    per sample (it normalizes in __getitem__) — so the max is per-sample
    here too; a batch-global max would pick one scale for a mixed-scale
    batch and collapse the already-normalized samples. The branch is
    data-dependent but resolves to a `jnp.where` over precomputed
    scales — no host sync.
    """
    x = x.astype(jnp.float32)
    if x.ndim < 3:
        raise ValueError(
            f"normalize_raw expects [..., H, W, C] (got shape {x.shape})"
        )
    # Per-image over the last three axes (H, W, C) — any leading axes are
    # batch-like. Reducing over all-but-first would give an unbatched
    # [H, W, C] tile a per-row scale and silently corrupt it.
    axes = tuple(range(x.ndim - 3, x.ndim))
    m = jnp.max(x, axis=axes, keepdims=True)
    scale = jnp.where(m > 10.0, 1.0 / 10000.0, jnp.where(m > 1.5, 1.0 / 255.0, 1.0))
    return x * scale


def resize_bilinear(x: jnp.ndarray, target_size: int) -> jnp.ndarray:
    """Bilinear resize of NHWC batch to (target_size, target_size)."""
    b, h, w, c = x.shape
    if h == target_size and w == target_size:
        return x
    return jax.image.resize(
        x, (b, target_size, target_size, c), method="bilinear", antialias=False
    )


def to_model_range(x: jnp.ndarray) -> jnp.ndarray:
    """clamp [0,1] then affine (x-0.5)/0.25 → ≈[-2,2] (dataset.py:177-186)."""
    return (jnp.clip(x, 0.0, 1.0) - 0.5) * 4.0


def preprocess_tiles(x: jnp.ndarray, target_size: int = 192) -> jnp.ndarray:
    """Full clean-image preprocessing chain: scale → resize → model range.

    Args:
        x: raw NHWC tiles ``[B, 64, 64, 13]`` (any real dtype).
    Returns:
        fp32 ``[B, target_size, target_size, 13]`` in ≈[-2, 2].
    """
    return to_model_range(resize_bilinear(normalize_raw(x), target_size))


def from_model_range(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse affine back to [0,1] reflectance for visualization/export."""
    return jnp.clip(x.astype(jnp.float32) * 0.25 + 0.5, 0.0, 1.0)


def random_band_permutation(
    key: jax.Array, x: jnp.ndarray, prob: float = 0.5
) -> jnp.ndarray:
    """Spectral-augmentation: permute the band axis of each sample with
    probability ``prob`` (reference `RandomBandPermutation`,
    transforms.py:166-187 — there a single draw per sample; here vectorized
    per batch with explicit keys)."""
    b, _, _, c = x.shape
    k_gate, k_perm = jax.random.split(key)
    gate = jax.random.uniform(k_gate, (b,)) < prob
    perms = jax.vmap(lambda k: jax.random.permutation(k, c))(
        jax.random.split(k_perm, b)
    )
    identity = jnp.arange(c)
    idx = jnp.where(gate[:, None], perms, identity[None, :])  # [B, C]
    return jnp.take_along_axis(x, idx[:, None, None, :], axis=3)


def normalize_spectral(
    x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
) -> jnp.ndarray:
    """Per-band standardization (reference `NormalizeSpectral`,
    transforms.py:190-223). mean/std are [C]."""
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    return (x.astype(jnp.float32) - mean) / jnp.maximum(std, 1e-8)


def denormalize_spectral(
    x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of `normalize_spectral` (transforms.py:214-223)."""
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    return x.astype(jnp.float32) * std + mean
