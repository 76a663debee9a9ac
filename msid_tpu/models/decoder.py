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
    # Zero-init the final 1×1 conv so the decoder starts as the exact zero
    # function — set by the composite model under a global residual head,
    # making `output = input (+0)` the true initialization (DnCNN-style).
    zero_init_head: bool = False
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
        head_init = (nn.initializers.zeros if self.zero_init_head
                     else nn.linear.default_kernel_init)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=head_init, name="head_out")(x)
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


class InputPyramid(nn.Module):
    """Multi-scale conv features of the RAW noisy input for skip fusion.

    TPU-build extension (no reference counterpart): the composite model's
    only path from input to output runs through the 12×12×768 token grid —
    a ~4× information bottleneck at 192²×13 that caps reconstruction
    fidelity regardless of denoising skill (measured: benchmarks/
    floor_study.py, docs/DESIGN.md §10). This stem gives the decoder
    direct access to full-resolution detail: one conv at full res, then
    stride-2 convs down to the token-grid resolution. Cost is negligible
    next to the decoder (~0.14 GFLOP/img at width 32).

    Returns features ordered coarse→fine to match the decoder stages
    (stage i consumes the feature at resolution image/2^(n-1-i)).
    """

    num_levels: int = 4
    width: int = 32
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        f = nn.Conv(self.width, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        f = Norm(self.norm, self.dtype, self.axis_name, name="stem_norm")(f, train)
        f = nn.gelu(f)
        feats = [f]
        for i in range(self.num_levels - 1):
            f = nn.Conv(self.width, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False, dtype=self.dtype, name=f"down_{i}")(f)
            f = Norm(self.norm, self.dtype, self.axis_name,
                     name=f"down_norm_{i}")(f, train)
            f = nn.gelu(f)
            feats.append(f)
        return feats[::-1]  # coarse → fine


class SkipDecoder(nn.Module):
    """LightweightDecoder + per-stage fusion of :class:`InputPyramid`
    features (`unet_skip`).

    Each stage: 2× upsample → concat the matching-resolution input feature
    → 1×1 fuse back to the stage width → residual refinement. The final
    stage fuses a FULL-RESOLUTION view of the noisy input, so denoising of
    surviving bands no longer squeezes through the token bottleneck, and
    dead-band infill sees full-res surviving-band context.
    """

    channels: Sequence[int] = (384, 192, 96, 48)
    out_channels: int = 13
    num_residual_blocks: int = 2
    skip_width: int = 32
    norm: str = "batch"
    zero_init_head: bool = False  # see LightweightDecoder.zero_init_head
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Sequence[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        if len(skips) != len(self.channels):
            raise ValueError(
                f"need {len(self.channels)} skip features, got {len(skips)}")
        for stage_idx, ch in enumerate(self.channels):
            x = UpsampleBlock(
                ch, False, self.norm, self.dtype, self.axis_name,
                name=f"up_{stage_idx}",
            )(x, train)
            s = skips[stage_idx]
            if s.shape[1:3] != x.shape[1:3]:
                raise ValueError(
                    f"stage {stage_idx}: skip {s.shape} vs decoder {x.shape}")
            x = jnp.concatenate([x, s.astype(x.dtype)], axis=-1)
            x = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"fuse_{stage_idx}")(x)
            x = Norm(self.norm, self.dtype, self.axis_name,
                     name=f"fuse_norm_{stage_idx}")(x, train)
            x = nn.gelu(x)
            for r in range(self.num_residual_blocks):
                x = ResidualBlock(
                    ch, self.norm, self.dtype, self.axis_name,
                    name=f"res_{stage_idx}_{r}",
                )(x, train)

        x = nn.Conv(
            self.channels[-1], (3, 3), padding="SAME", dtype=self.dtype,
            name="head_conv",
        )(x)
        x = Norm(self.norm, self.dtype, self.axis_name, name="head_norm")(x, train)
        x = nn.gelu(x)
        head_init = (nn.initializers.zeros if self.zero_init_head
                     else nn.linear.default_kernel_init)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=head_init, name="head_out")(x)
        return x


DECODER_REGISTRY = {
    "unet_light": LightweightDecoder,
    "unet": UNetDecoder,
    "attention": AttentionDecoder,
    "unet_skip": SkipDecoder,
}
