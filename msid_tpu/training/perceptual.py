"""VGG16 feature-space perceptual loss (reference
`/root/reference/src/training/losses.py:205-277`).

Faithful port of the reference `PerceptualLoss`: VGG16 `.features`
activations after relu1_2 / relu2_2 / relu3_3 / relu4_3 (torchvision
sequential indices 3/8/15/22), MSE between pred/target features on the
first 3 spectral bands, unit layer weights, NO input normalization —
exactly what the reference computes.

Pretrained VGG16 weights cannot be downloaded in this environment, so the
weights are an input: point ``training.loss.perceptual_weights_path`` at a
torchvision ``vgg16`` state_dict (``.pth``, loaded via torch when
available) or an ``.npz`` holding the same ``features.N.weight/bias``
arrays (OIHW), and set ``perceptual_impl: vgg``. Without weights the loss
config falls back to the Sobel edge stand-in
(:func:`msid_tpu.training.losses.edge_perceptual_loss`).

The forward is golden-tested against a plain-torch re-implementation of
the reference extractor with identical random weights
(tests/test_losses.py).
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

logger = logging.getLogger(__name__)

# torchvision vgg16().features conv indices and channel plan through
# relu4_3 (losses.py:233-238 uses layers {3, 8, 15, 22}).
VGG16_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)
VGG16_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512)
# maxpool immediately BEFORE these conv ids
_POOL_BEFORE = frozenset({5, 10, 17})
# relu outputs that feed the loss: conv id -> torchvision relu index
FEATURE_AFTER_CONV = {2: "3", 7: "8", 14: "15", 21: "22"}
DEFAULT_LAYER_WEIGHTS = {"3": 1.0, "8": 1.0, "15": 1.0, "22": 1.0}


def init_vgg16_params(seed: int = 0, dtype=np.float32) -> dict:
    """He-initialized random VGG16-features params (for tests and for
    random-feature perceptual loss when no pretrained weights exist).

    Returns {"features.N.weight": HWIO, "features.N.bias": [O]}.
    """
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    for conv_id, cout in zip(VGG16_CONV_IDS, VGG16_CHANNELS):
        fan_in = 3 * 3 * cin
        w = rng.normal(0, np.sqrt(2.0 / fan_in), (3, 3, cin, cout))
        params[f"features.{conv_id}.weight"] = w.astype(dtype)
        params[f"features.{conv_id}.bias"] = np.zeros(cout, dtype)
        cin = cout
    return params


def load_vgg16_weights(path: str | Path) -> dict:
    """Load torchvision vgg16 ``features.*`` weights from .pth or .npz.

    Torch OIHW conv kernels are transposed to HWIO. Classifier weights (if
    present in the state_dict) are ignored.
    """
    path = Path(path)
    if path.suffix == ".npz":
        raw = dict(np.load(path))
    else:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        raw = {k: v.numpy() for k, v in state.items()}

    params = {}
    for conv_id in VGG16_CONV_IDS:
        wk, bk = f"features.{conv_id}.weight", f"features.{conv_id}.bias"
        if wk not in raw:
            raise KeyError(f"VGG16 weights at {path} miss {wk}")
        w = np.asarray(raw[wk], np.float32)
        if w.ndim != 4:
            raise ValueError(f"{wk}: expected 4-D conv kernel, got {w.shape}")
        if w.shape[0] != 3 or w.shape[1] != 3:  # OIHW from torch
            w = w.transpose(2, 3, 1, 0)
        params[wk] = w
        params[bk] = np.asarray(raw[bk], np.float32)
    logger.info("Loaded VGG16 perceptual weights from %s", path)
    return params


def vgg16_features(params: dict, x: jnp.ndarray) -> dict:
    """{relu_index: activation} for NHWC input (first-3-band RGB), fp32."""
    y = x.astype(jnp.float32)
    feats = {}
    for conv_id in VGG16_CONV_IDS:
        if conv_id in _POOL_BEFORE:
            y = lax.reduce_window(
                y, -jnp.inf, lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
        w = jnp.asarray(params[f"features.{conv_id}.weight"], jnp.float32)
        b = jnp.asarray(params[f"features.{conv_id}.bias"], jnp.float32)
        y = lax.conv_general_dilated(
            y, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b
        y = jnp.maximum(y, 0.0)
        name = FEATURE_AFTER_CONV.get(conv_id)
        if name is not None:
            feats[name] = y
    return feats


def vgg_perceptual_loss(
    params: dict,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    layer_weights: dict | None = None,
) -> jnp.ndarray:
    """Reference PerceptualLoss.forward (losses.py:243-269): feature MSE
    on the first 3 bands, summed over layers with the given weights."""
    lw = layer_weights or DEFAULT_LAYER_WEIGHTS
    fp = vgg16_features(params, pred[..., :3])
    ft = vgg16_features(params, target[..., :3])
    total = jnp.float32(0.0)
    for layer, weight in lw.items():
        d = fp[layer] - ft[layer]
        total = total + jnp.float32(weight) * jnp.mean(d * d)
    return total


def vgg_perceptual_per_sample(
    params: dict,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    layer_weights: dict | None = None,
) -> jnp.ndarray:
    """Per-sample decomposition of :func:`vgg_perceptual_loss`, fp32 [B]
    (mean over it equals the scalar loss — used by the masked eval step)."""
    lw = layer_weights or DEFAULT_LAYER_WEIGHTS
    fp = vgg16_features(params, pred[..., :3])
    ft = vgg16_features(params, target[..., :3])
    total = jnp.zeros((pred.shape[0],), jnp.float32)
    for layer, weight in lw.items():
        d = (fp[layer] - ft[layer]).reshape(pred.shape[0], -1)
        total = total + jnp.float32(weight) * jnp.mean(d * d, axis=-1)
    return total


def resolve_perceptual(loss_config: dict):
    """(impl, vgg_params) from a ``training.loss`` config section.

    impl: 'vgg' when usable VGG weights are configured, else 'edge'.
    ``perceptual_impl: vgg`` without a loadable weights file falls back to
    'edge' with a warning (mirrors the reference's graceful disable when
    torchvision init fails, losses.py:239-241).
    """
    impl = str(loss_config.get("perceptual_impl", "edge")).lower()
    if impl not in ("vgg", "edge"):
        raise ValueError(f"unknown perceptual_impl {impl!r}")
    if impl != "vgg":
        return "edge", None
    path = loss_config.get("perceptual_weights_path")
    if path and Path(path).exists():
        params = load_vgg16_weights(path)
        return "vgg", jax.device_put(params)
    logger.warning(
        "perceptual_impl=vgg but no weights at %r — falling back to the "
        "Sobel edge stand-in", path,
    )
    return "edge", None
