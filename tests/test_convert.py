"""Weight-conversion fidelity: torch SatMAE state dict → Flax encoder.

The conversion rules (channel inflation, CLS strip, qkv layout) are the
reference's load-time surgery (/root/reference/src/models/encoder.py:178-268).
The decisive check is end-to-end: a torch forward pass re-implemented with
the exact reference math must match our Flax encoder on converted weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msid_tpu.models.convert import (
    adapt_pos_embed,
    convert_satmae_encoder,
    inflate_patch_embed,
)
from msid_tpu.models.encoder import SatMAEEncoder

DIM, HEADS, DEPTH, PATCH, IMG = 64, 4, 2, 16, 64
TOKENS = (IMG // PATCH) ** 2  # 16


def _synthetic_torch_state(rng, with_cls=True, in_chans=3):
    """Random torch-layout SatMAE state dict for a tiny ViT."""
    s = {}
    s["patch_embed.proj.weight"] = rng.normal(0, 0.05, (DIM, in_chans, PATCH, PATCH)).astype(np.float32)
    s["patch_embed.proj.bias"] = rng.normal(0, 0.05, (DIM,)).astype(np.float32)
    n_pos = TOKENS + (1 if with_cls else 0)
    s["pos_embed"] = rng.normal(0, 0.02, (1, n_pos, DIM)).astype(np.float32)
    for i in range(DEPTH):
        p = f"blocks.{i}."
        for norm in ("norm1", "norm2"):
            s[p + norm + ".weight"] = rng.normal(1, 0.02, (DIM,)).astype(np.float32)
            s[p + norm + ".bias"] = rng.normal(0, 0.02, (DIM,)).astype(np.float32)
        s[p + "attn.qkv.weight"] = rng.normal(0, 0.05, (3 * DIM, DIM)).astype(np.float32)
        s[p + "attn.qkv.bias"] = rng.normal(0, 0.02, (3 * DIM,)).astype(np.float32)
        s[p + "attn.proj.weight"] = rng.normal(0, 0.05, (DIM, DIM)).astype(np.float32)
        s[p + "attn.proj.bias"] = rng.normal(0, 0.02, (DIM,)).astype(np.float32)
        s[p + "mlp.fc1.weight"] = rng.normal(0, 0.05, (4 * DIM, DIM)).astype(np.float32)
        s[p + "mlp.fc1.bias"] = rng.normal(0, 0.02, (4 * DIM,)).astype(np.float32)
        s[p + "mlp.fc2.weight"] = rng.normal(0, 0.05, (DIM, 4 * DIM)).astype(np.float32)
        s[p + "mlp.fc2.bias"] = rng.normal(0, 0.02, (DIM,)).astype(np.float32)
    s["norm.weight"] = rng.normal(1, 0.02, (DIM,)).astype(np.float32)
    s["norm.bias"] = rng.normal(0, 0.02, (DIM,)).astype(np.float32)
    return s


def _torch_forward(state, x_rgb):
    """Reference encoder forward in torch (encoder.py:295-324 semantics:
    conv patch embed + LN(init) + pos − CLS + pre-LN blocks + final LN)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = lambda k: torch.from_numpy(state[k])
    x = torch.from_numpy(x_rgb)
    y = F.conv2d(x, t("patch_embed.proj.weight"), t("patch_embed.proj.bias"),
                 stride=PATCH)
    b, d, gh, gw = y.shape
    y = y.flatten(2).transpose(1, 2)  # [B, N, D]
    # reference PatchEmbed LayerNorm stays at init (strict=False load)
    y = F.layer_norm(y, (d,))
    pos = t("pos_embed")
    if pos.shape[1] == TOKENS + 1:
        pos = pos[:, 1:, :]
    y = y + pos

    head_dim = DIM // HEADS
    for i in range(DEPTH):
        p = f"blocks.{i}."
        h = F.layer_norm(y, (d,), t(p + "norm1.weight"), t(p + "norm1.bias"),
                         eps=1e-6)
        qkv = F.linear(h, t(p + "attn.qkv.weight"), t(p + "attn.qkv.bias"))
        q, k, v = qkv.chunk(3, dim=-1)
        def split(z):
            return z.view(b, -1, HEADS, head_dim).transpose(1, 2)
        att = (split(q) @ split(k).transpose(-2, -1)) / head_dim**0.5
        att = att.softmax(dim=-1)
        h = (att @ split(v)).transpose(1, 2).reshape(b, -1, d)
        h = F.linear(h, t(p + "attn.proj.weight"), t(p + "attn.proj.bias"))
        y = y + h
        h = F.layer_norm(y, (d,), t(p + "norm2.weight"), t(p + "norm2.bias"),
                         eps=1e-6)
        h = F.linear(h, t(p + "mlp.fc1.weight"), t(p + "mlp.fc1.bias"))
        h = F.gelu(h)
        h = F.linear(h, t(p + "mlp.fc2.weight"), t(p + "mlp.fc2.bias"))
        y = y + h
    y = F.layer_norm(y, (d,), t("norm.weight"), t("norm.bias"), eps=1e-6)
    return y.numpy()


def test_inflate_patch_embed_rule():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 4, 4)).astype(np.float32)
    out = inflate_patch_embed(w, 13)
    assert out.shape == (8, 13, 4, 4)
    assert np.array_equal(out[:, :3], w)           # RGB kept
    for c in range(3, 13):
        assert np.array_equal(out[:, c], w[:, 0])  # extra bands copy ch 0


def test_adapt_pos_embed_cls_strip_and_interp():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 17, 8)).astype(np.float32)
    out = adapt_pos_embed(pos, 16)
    assert np.array_equal(out, pos[:, 1:, :])  # exact strip

    pos196 = rng.normal(size=(1, 197, 8)).astype(np.float32)  # 14x14 + CLS
    out144 = adapt_pos_embed(pos196, 144)  # → 12x12
    assert out144.shape == (1, 144, 8)
    assert np.isfinite(out144).all()


def test_forward_parity_torch_vs_flax():
    """Converted weights must reproduce the torch forward to float noise.

    The flax encoder takes 13 channels; feeding RGB in bands 0-2 and zeros
    in bands 3-12 makes the inflated conv mathematically identical to the
    3-channel torch conv."""
    rng = np.random.default_rng(1)
    state = _synthetic_torch_state(rng, with_cls=True)

    x_rgb = rng.normal(0, 1, (2, 3, IMG, IMG)).astype(np.float32)
    want = _torch_forward(state, x_rgb)

    enc = SatMAEEncoder(image_size=IMG, patch_size=PATCH, embed_dim=DIM,
                        depth=DEPTH, num_heads=HEADS, gradient_checkpointing=False)
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 13)))
    converted = convert_satmae_encoder(state, init["params"], target_channels=13,
                                       num_heads=HEADS)

    x13 = np.zeros((2, IMG, IMG, 13), np.float32)
    x13[..., :3] = np.transpose(x_rgb, (0, 2, 3, 1))
    got = np.asarray(enc.apply({"params": converted}, jnp.asarray(x13)))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_shape_mismatch_skipped_not_crashed():
    rng = np.random.default_rng(2)
    state = _synthetic_torch_state(rng)
    state["norm.weight"] = np.zeros((999,), np.float32)  # wrong shape

    enc = SatMAEEncoder(image_size=IMG, patch_size=PATCH, embed_dim=DIM,
                        depth=DEPTH, num_heads=HEADS, gradient_checkpointing=False)
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 13)))
    converted = convert_satmae_encoder(state, init["params"], num_heads=HEADS)
    # mismatched tensor keeps its initialization
    assert converted["norm"]["scale"].shape == (DIM,)
