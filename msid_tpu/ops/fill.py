"""Dead-band detection + cross-band linear infill (on-device, jittable).

Motivation (measured, benchmarks/floor_study.py / docs/DESIGN.md §10):
dead-band erasure owns the zero-skill quality gap of the corruption the
reference simulates (`/root/reference/src/data/transforms.py:98-106`) —
a NO-MODEL baseline that keeps the noisy tile and fills killed bands
with one global linear cross-band predictor scores 46.4 dB on the 512
protocol, ~3 dB above the best round-3 trained model. This module makes
that baseline a differentiable *input stage of the model*
(`SatMAERestoration(input_fill=True)`): detect killed bands from the
input itself (no oracle), replace them with the best linear prediction
from the surviving bands under a train-fit second-moment (Gram) matrix,
and hand the network a tile whose identity mapping already achieves the
zero-skill floor. The network then only has to learn *improvements*
(denoising + better-than-linear infill).

Everything here is exact linear algebra on tiny systems ((C+1)×(C+1)
solves, C=13) — negligible next to one decoder conv — and fully
jit/vmap/grad-compatible (gradients flow through the solve into the
surviving bands; the boolean detection is naturally a stop-gradient).

Detection semantics: a killed band was zeroed in model space (≈[-2, 2],
raw reflectance 0.5 → 0.0) *before* thermal noise, so its content is
pure thermal noise, RMS ≤ ~0.01 at reference noise levels (≤ ~0.025
with striping). A live band's RMS is its signal RMS (≥ gaussian σ even
for a constant band). The per-channel RMS threshold (default 0.05) sits
an order of magnitude above the dead side; the only ambiguity is a
genuinely constant band at exactly 0.5 reflectance, where the linear
fill is near-harmless and the downstream network (which also receives
the detected mask as conditioning) can correct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_RMS_THRESH = 0.05
RIDGE = 1e-6  # matches the floor study's solve regularization


def detect_alive(x: jnp.ndarray, rms_thresh: float = DEFAULT_RMS_THRESH) -> jnp.ndarray:
    """Detect surviving bands of a (possibly corrupted) NHWC batch.

    Returns a float32 ``[B, 1, 1, C]`` mask, 1.0 = band is alive. A band
    counts as dead when its per-sample spatial RMS falls below
    ``rms_thresh`` (see module docstring for why RMS separates cleanly).
    """
    x32 = x.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(x32 * x32, axis=(1, 2), keepdims=True))
    return (rms >= rms_thresh).astype(jnp.float32)


def fill_weights(gram: jnp.ndarray, alive: jnp.ndarray,
                 ridge: float = RIDGE) -> jnp.ndarray:
    """Per-sample cross-band fill weights from a shared Gram matrix.

    Args:
        gram: ``[C+1, C+1]`` second-moment matrix ``E[z zᵀ]`` over clean
            model-space pixels, ``z = [bands..., 1]`` (bias column last).
        alive: ``[B, C]`` float mask (1 = surviving band).
        ridge: Tikhonov term on the surviving block (identical to
            `benchmarks/floor_study.py:_solve_fill`).

    Returns:
        ``[B, C+1, C]`` weights ``W`` such that ``[x·alive, 1] @ W``
        predicts every band from the surviving ones; rows of dead bands
        are exactly zero, so dead inputs never leak into the prediction.

    Equivalence to the restricted solve: masking rows+columns of the
    system to the surviving set and putting identity on the dead
    diagonal yields the same solution as solving only the surviving
    subsystem (the dead rows decouple to ``w_dead = 0``).
    """
    c = gram.shape[0] - 1
    dtype = jnp.float32
    gram = gram.astype(dtype)

    def per_sample(a):
        m = jnp.concatenate([a, jnp.ones((1,), dtype)])  # bias always alive
        sys_a = (gram * jnp.outer(m, m)
                 + jnp.diag(1.0 - m)
                 + ridge * jnp.diag(m))
        rhs = m[:, None] * gram[:, :c]
        return jnp.linalg.solve(sys_a, rhs)

    return jax.vmap(per_sample)(alive.astype(dtype))


def linear_fill(x: jnp.ndarray, alive: jnp.ndarray, gram: jnp.ndarray,
                ridge: float = RIDGE) -> jnp.ndarray:
    """Replace dead bands with their cross-band linear prediction.

    Args:
        x: noisy NHWC batch ``[B, H, W, C]``.
        alive: ``[B, 1, 1, C]`` (or ``[B, C]``) float alive-mask.
        gram: shared ``[C+1, C+1]`` clean-pixel Gram matrix.

    Returns:
        fp32 batch where surviving bands pass through untouched and dead
        bands hold the linear prediction from the surviving bands — the
        floor study's ``linear_fill`` row as an on-device op.
    """
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    a = alive.reshape(b, c).astype(jnp.float32)
    weights = fill_weights(gram, a, ridge)  # [B, C+1, C]
    masked = x32 * a[:, None, None, :]
    z = jnp.concatenate(
        [masked, jnp.ones((b, h, w, 1), jnp.float32)], axis=-1)
    pred = jnp.einsum("bhwk,bkc->bhwc", z, weights)
    return masked + (1.0 - a[:, None, None, :]) * pred


def detect_and_fill(x: jnp.ndarray, gram: jnp.ndarray,
                    rms_thresh: float = DEFAULT_RMS_THRESH,
                    ridge: float = RIDGE) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Detection + fill in one call: ``(filled fp32, alive [B,1,1,C])``."""
    alive = detect_alive(x, rms_thresh)
    return linear_fill(x, alive, gram, ridge), alive


def fit_gram(loader, image_size: int = 192) -> np.ndarray:
    """Fit the clean-pixel Gram matrix ``E[z zᵀ]`` over a train loader.

    ``loader`` yields raw host tiles (optionally ``(batch, count)`` pairs
    from padding loaders); preprocessing to model space happens here so
    the fit matches exactly what the model sees. Returns a host-side
    fp64-accumulated ``[C+1, C+1]`` fp32 matrix.
    """
    from msid_tpu.ops.preprocess import preprocess_tiles
    from msid_tpu.training.eval import split_batch_item

    @jax.jit
    def gram_term(batch):
        clean = preprocess_tiles(batch, image_size)
        z = clean.reshape(-1, clean.shape[-1])
        z = jnp.concatenate([z, jnp.ones((z.shape[0], 1), z.dtype)], axis=-1)
        return z.T @ z, jnp.asarray(z.shape[0], jnp.float32)

    total, n = None, 0.0
    for item in loader:
        batch, count = split_batch_item(item)
        g, m = jax.device_get(gram_term(jnp.asarray(batch)[:count]))
        total = (g.astype(np.float64) if total is None
                 else total + g.astype(np.float64))
        n += float(m)
    if total is None:
        raise ValueError("empty loader — cannot fit the cross-band Gram")
    return (total / n).astype(np.float32)


def fit_gram_from_config(config: dict) -> np.ndarray:
    """Fit the Gram over the config's full train split (fixed order, no
    drop_last — every tile contributes once)."""
    from msid_tpu.data.dataset import build_dataset
    from msid_tpu.data.pipeline import BatchLoader

    training = config.get("training", {})
    micro = int(training.get("micro_batch_size", 8))
    accum = int(training.get("gradient_accumulation_steps", 1))
    loader = BatchLoader(build_dataset(config, "train"),
                         batch_size=micro * accum, shuffle=False,
                         drop_last=False, pad_last=True)
    return fit_gram(loader, int(config.get("data", {}).get("image_size", 192)))
