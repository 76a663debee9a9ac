"""SatMAE ViT-Base encoder (Flax linen, NHWC, remat-capable).

Capability parity with the reference encoder
(`/root/reference/src/models/encoder.py:21-335`): 13-channel patch embed
(16x16/16 conv + LayerNorm), learnable pos-embed **without** a CLS token,
12 pre-LN transformer blocks (12 heads, dim 768, mlp 4.0, qkv bias,
LN eps 1e-6), final LayerNorm. TPU-first choices:

  * bf16 compute / fp32 params; attention over the 144-token sequence is
    a single fused XLA dot-product-attention — no FlashAttention needed at
    this length.
  * gradient checkpointing = ``jax.checkpoint`` via ``nn.remat`` per block
    (replaces `torch.utils.checkpoint`, encoder.py:313-317).
  * layer freezing is a *training-time* concern here, handled with optax
    ``multi_transform`` labels (see `msid_tpu.training.optim`) instead of
    ``requires_grad`` mutation.

Pretrained SatMAE weight adaptation (channel inflation, CLS strip,
pos-embed interpolation — encoder.py:178-268) lives in
`msid_tpu.models.convert`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PatchEmbed(nn.Module):
    """Conv(patch, stride=patch) → flatten → LayerNorm (ref encoder.py:21-52)."""

    embed_dim: int = 768
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        y = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)  # [B, H/p, W/p, D]
        b, gh, gw, d = y.shape
        y = y.reshape(b, gh * gw, d)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return y


class MlpBlock(nn.Module):
    features: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y)
        y = nn.Dense(self.features, dtype=self.dtype, name="fc2")(y)
        return y


class ViTBlock(nn.Module):
    """Pre-LN transformer block: x + MHSA(LN(x)); x + MLP(LN(x)).

    Matches timm's `vision_transformer.Block` wiring used by the reference
    (encoder.py:126-134): qkv_bias=True, LN eps 1e-6.
    """

    dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim,
            out_features=self.dim,
            use_bias=True,
            dtype=self.dtype,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MlpBlock(self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp")(y)
        return x + y


class SatMAEEncoder(nn.Module):
    """ViT-Base encoder over 13-band tiles → [B, N, D] patch features."""

    image_size: int = 192
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    gradient_checkpointing: bool = True
    dtype: Dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``cond`` (optional ``[B, embed_dim]``) is added to every token
        after the positional embedding — used by the composite model to
        condition on the detected dead-band mask (`ops/fill.py`). Carries
        no encoder parameters, so pretrained-weight conversion
        (`models/convert.py`) is unaffected."""
        y = PatchEmbed(self.embed_dim, self.patch_size, self.dtype, name="patch_embed")(x)

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, self.num_patches, self.embed_dim),
        )
        y = y + pos_embed.astype(y.dtype)
        if cond is not None:
            y = y + cond[:, None, :].astype(y.dtype)

        block_cls = ViTBlock
        if self.gradient_checkpointing and train:
            # remat trades recompute for activation memory (≈30% saving in
            # the reference's CUDA AMP setup; same idea, compiler-managed).
            block_cls = nn.remat(ViTBlock, prevent_cse=False)

        for i in range(self.depth):
            y = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.dtype,
                name=f"blocks_{i}",
            )(y)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        return y
