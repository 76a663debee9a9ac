"""Pretrained SatMAE (PyTorch) → msid_tpu (Flax) weight conversion.

Reproduces the reference's pretrained-weight adaptation logic
(`/root/reference/src/models/encoder.py:178-268`) as a one-time offline
converter instead of load-time surgery:

  * patch-embed channel inflation 3→13: RGB kept in bands 0-2, bands 3-12
    copy channel 0 (encoder.py:201-213);
  * CLS-token strip when the checkpoint has exactly one extra pos-embed
    token, bicubic grid interpolation otherwise (encoder.py:215-250);
  * shape-filtered non-strict load — tensors whose shapes still mismatch
    are skipped with a warning (encoder.py:252-263).

Layout conversions torch→flax:
  Conv weight  [O, I, kH, kW] → kernel [kH, kW, I, O]
  Linear weight [O, I]        → kernel [I, O]
  Attention qkv [3D, D]       → query/key/value kernels [D, heads, head_dim]
  Attention proj [D, D]       → out kernel [heads, head_dim, D]

Everything here is pure numpy; torch is only touched inside
`load_torch_checkpoint` (and only if the input is a ``.pth``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_checkpoint(path: str | Path) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {name: numpy array} dict.

    Handles the reference's accepted formats: raw state_dict, or nested
    under 'model' / 'state_dict' (encoder.py:192-197).
    """
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in ckpt.items()
            if hasattr(v, "detach")}


def inflate_patch_embed(weight: np.ndarray, target_channels: int) -> np.ndarray:
    """3→13 channel inflation (encoder.py:201-213). [O, I, kH, kW] in/out."""
    o, i, kh, kw = weight.shape
    if i == target_channels:
        return weight
    new = np.zeros((o, target_channels, kh, kw), weight.dtype)
    keep = min(i, 3)
    new[:, :keep] = weight[:, :keep]
    for c in range(keep, target_channels):
        new[:, c] = weight[:, 0]
    return new


def adapt_pos_embed(pos: np.ndarray, target_tokens: int) -> np.ndarray:
    """CLS strip or bicubic grid interpolation (encoder.py:215-250).

    pos: [1, N(+1), D] → [1, target_tokens, D].
    """
    n = pos.shape[1]
    if n == target_tokens:
        return pos
    if n == target_tokens + 1:
        return pos[:, 1:, :]

    has_cls = int(np.sqrt(n)) ** 2 != n
    grid_pos = pos[:, 1:, :] if has_cls else pos
    src_grid = int(np.sqrt(grid_pos.shape[1]))
    dst_grid = int(np.sqrt(target_tokens))

    import jax
    import jax.numpy as jnp

    src = jnp.asarray(grid_pos.reshape(1, src_grid, src_grid, -1))
    dst = jax.image.resize(
        src, (1, dst_grid, dst_grid, src.shape[-1]), method="bicubic", antialias=False
    )
    return np.asarray(dst).reshape(1, dst_grid * dst_grid, -1)


def convert_satmae_encoder(
    state_dict: Dict[str, np.ndarray],
    target_params: dict,
    target_channels: int = 13,
    num_heads: int = 12,
) -> dict:
    """Produce an encoder params tree from a torch SatMAE state dict.

    ``target_params`` is the freshly-initialized `SatMAEEncoder` params tree
    (provides shapes and fills anything the checkpoint lacks — e.g. the
    patch-embed LayerNorm, which the torch SatMAE has no counterpart for and
    which the reference also left at init via strict=False).
    Returns a NEW tree; frozen dicts are not mutated.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, target_params)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    import copy

    params = copy.deepcopy(jax.device_get(params))

    loaded, skipped = [], []

    def put(path_keys, value, name):
        node = params
        for k in path_keys[:-1]:
            node = node[k]
        want = node[path_keys[-1]].shape
        if tuple(value.shape) != tuple(want):
            skipped.append((name, value.shape, want))
            return
        node[path_keys[-1]] = value.astype(np.float32)
        loaded.append(name)

    # patch embed
    if "patch_embed.proj.weight" in state_dict:
        w = inflate_patch_embed(state_dict["patch_embed.proj.weight"], target_channels)
        put(["patch_embed", "proj", "kernel"], w.transpose(2, 3, 1, 0), "patch_embed.proj.weight")
    if "patch_embed.proj.bias" in state_dict:
        put(["patch_embed", "proj", "bias"], state_dict["patch_embed.proj.bias"], "patch_embed.proj.bias")

    # pos embed
    if "pos_embed" in state_dict:
        target_tokens = params["pos_embed"].shape[1]
        pe = adapt_pos_embed(state_dict["pos_embed"], target_tokens)
        put(["pos_embed"], pe, "pos_embed")

    # transformer blocks
    depth = len([k for k in params if k.startswith("blocks_")])
    for i in range(depth):
        pre = f"blocks.{i}."
        blk = f"blocks_{i}"
        if pre + "norm1.weight" not in state_dict:
            continue
        put([blk, "norm1", "scale"], state_dict[pre + "norm1.weight"], pre + "norm1.weight")
        put([blk, "norm1", "bias"], state_dict[pre + "norm1.bias"], pre + "norm1.bias")
        put([blk, "norm2", "scale"], state_dict[pre + "norm2.weight"], pre + "norm2.weight")
        put([blk, "norm2", "bias"], state_dict[pre + "norm2.bias"], pre + "norm2.bias")

        qkv_w = state_dict[pre + "attn.qkv.weight"]  # [3D, D]
        qkv_b = state_dict.get(pre + "attn.qkv.bias")
        d = qkv_w.shape[1]
        head_dim = d // num_heads
        for j, proj in enumerate(("query", "key", "value")):
            w = qkv_w[j * d : (j + 1) * d, :]  # [D_out, D_in]
            put([blk, "attn", proj, "kernel"],
                w.T.reshape(d, num_heads, head_dim), pre + f"attn.qkv.weight[{proj}]")
            if qkv_b is not None:
                b = qkv_b[j * d : (j + 1) * d]
                put([blk, "attn", proj, "bias"],
                    b.reshape(num_heads, head_dim), pre + f"attn.qkv.bias[{proj}]")

        proj_w = state_dict[pre + "attn.proj.weight"]  # [D, D]
        put([blk, "attn", "out", "kernel"],
            proj_w.T.reshape(num_heads, head_dim, d), pre + "attn.proj.weight")
        if pre + "attn.proj.bias" in state_dict:
            put([blk, "attn", "out", "bias"], state_dict[pre + "attn.proj.bias"], pre + "attn.proj.bias")

        put([blk, "mlp", "fc1", "kernel"], state_dict[pre + "mlp.fc1.weight"].T, pre + "mlp.fc1.weight")
        put([blk, "mlp", "fc1", "bias"], state_dict[pre + "mlp.fc1.bias"], pre + "mlp.fc1.bias")
        put([blk, "mlp", "fc2", "kernel"], state_dict[pre + "mlp.fc2.weight"].T, pre + "mlp.fc2.weight")
        put([blk, "mlp", "fc2", "bias"], state_dict[pre + "mlp.fc2.bias"], pre + "mlp.fc2.bias")

    # final norm
    if "norm.weight" in state_dict:
        put(["norm", "scale"], state_dict["norm.weight"], "norm.weight")
        put(["norm", "bias"], state_dict["norm.bias"], "norm.bias")

    logger.info("Converted %d tensors (%d skipped on shape mismatch)", len(loaded), len(skipped))
    for name, got, want in skipped:
        logger.warning("skipped %s: %s vs %s", name, got, want)
    return params


def load_pretrained_encoder(
    path: str | Path,
    variables: dict,
    target_channels: int = 13,
    num_heads: int = 12,
) -> dict:
    """Full pipeline: torch checkpoint → new variables with converted
    encoder params. Returns a new variables dict."""
    state_dict = load_torch_checkpoint(path)
    new_encoder = convert_satmae_encoder(
        state_dict, variables["params"]["encoder"], target_channels, num_heads
    )
    new_params = dict(variables["params"])
    new_params["encoder"] = new_encoder
    out = dict(variables)
    out["params"] = new_params
    return out
