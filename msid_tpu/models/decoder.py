"""Progressive-upsampling CNN decoders (Flax linen, NHWC).

Capability parity with the reference decoder family
(`/root/reference/src/models/decoder.py:20-235`):

  * `LightweightDecoder` — 4 stages of [2x upsample + N residual blocks],
    channels 768→[384,192,96,48], head conv3-Norm-GELU-conv1→13
    (decoder.py:54-81). ~4.2M params. 12×12 → 192×192.
  * `UNetDecoder` — upsample + ConvBlock per stage with optional additive
    skip features (decoder.py:125-177).
  * `AttentionDecoder` — upsample + SpatialAttention + ConvBlock per stage
    (decoder.py:180-213; the reference's version was dead code with a
    missing import — implemented properly here).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from msid_tpu.models.blocks import (
    ConvBlock,
    Norm,
    ResidualBlock,
    SpatialAttention,
    UpsampleBlock,
)

Dtype = Any


class LightweightDecoder(nn.Module):
    """Default decoder: progressive 2× upsampling with residual refinement."""

    channels: Sequence[int] = (384, 192, 96, 48)
    out_channels: int = 13
    num_residual_blocks: int = 2
    use_pixel_shuffle: bool = False
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for stage_idx, ch in enumerate(self.channels):
            x = UpsampleBlock(
                ch, self.use_pixel_shuffle, self.norm, self.dtype, self.axis_name,
                name=f"up_{stage_idx}",
            )(x, train)
            for r in range(self.num_residual_blocks):
                x = ResidualBlock(
                    ch, self.norm, self.dtype, self.axis_name,
                    name=f"res_{stage_idx}_{r}",
                )(x, train)

        # Head: conv3 → Norm → GELU → conv1 to spectral bands (decoder.py:76-81)
        x = nn.Conv(
            self.channels[-1], (3, 3), padding="SAME", dtype=self.dtype, name="head_conv"
        )(x)
        x = Norm(self.norm, self.dtype, self.axis_name, name="head_norm")(x, train)
        x = nn.gelu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="head_out")(x)
        return x


class UNetDecoder(nn.Module):
    """U-Net style decoder with optional additive skip connections."""

    channels: Sequence[int] = (384, 192, 96, 48)
    out_channels: int = 13
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip_features: Optional[List[jnp.ndarray]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        for i, ch in enumerate(self.channels):
            x = nn.ConvTranspose(
                ch, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype,
                name=f"up_{i}",
            )(x)
            x = ConvBlock(ch, norm=self.norm, dtype=self.dtype, axis_name=self.axis_name,
                          name=f"conv_{i}")(x, train)
            if skip_features is not None and i < len(skip_features):
                x = x + skip_features[-(i + 1)]
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="head")(x)


class AttentionDecoder(nn.Module):
    """Decoder with a spatial-attention gate per stage."""

    channels: Sequence[int] = (384, 192, 96, 48)
    out_channels: int = 13
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.channels):
            x = UpsampleBlock(ch, False, self.norm, self.dtype, self.axis_name,
                              name=f"up_{i}")(x, train)
            x = SpatialAttention(self.dtype, name=f"sa_{i}")(x)
            x = ConvBlock(ch, norm=self.norm, dtype=self.dtype, axis_name=self.axis_name,
                          name=f"conv_{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="head")(x)


DECODER_REGISTRY = {
    "unet_light": LightweightDecoder,
    "unet": UNetDecoder,
    "attention": AttentionDecoder,
}
