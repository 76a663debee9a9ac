"""Reusable convolutional building blocks (Flax linen, NHWC, TPU-native).

Capability parity with the reference block set
(`/root/reference/src/models/blocks.py:12-200`): ConvBlock, ResidualBlock,
UpsampleBlock (transposed-conv or pixel-shuffle), DepthwiseSeparableConv,
SqueezeExcitation — re-designed for XLA:

  * NHWC layout (TPU conv-friendly; XLA tiles channels onto the 128-lane
    minor dimension).
  * bf16 compute / fp32 params via ``dtype`` / ``param_dtype``.
  * Norm is selectable: ``batch`` (reference parity, carries a
    ``batch_stats`` collection, optional ``axis_name`` for cross-replica
    stats under data parallelism) or ``group`` (stateless, DP-friendly).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Norm(nn.Module):
    """Selectable normalization: 'batch' (ref parity) or 'group'."""

    kind: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
        if self.kind == "group":
            num_groups = min(32, x.shape[-1])
            while x.shape[-1] % num_groups != 0:
                num_groups -= 1
            return nn.GroupNorm(num_groups=num_groups, dtype=self.dtype)(x)
        raise ValueError(f"Unknown norm kind: {self.kind}")


class ConvBlock(nn.Module):
    """Conv3x3-Norm-GELU-Conv3x3-Norm + 1x1-skip, GELU out (ref blocks.py:12-63)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = (self.kernel_size, self.kernel_size)
        residual = x
        if x.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(x)
        y = nn.Conv(
            self.features, k, strides=(self.stride, self.stride), padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(x)
        y = Norm(self.norm, self.dtype, self.axis_name)(y, train)
        y = nn.gelu(y)
        y = nn.Conv(self.features, k, padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = Norm(self.norm, self.dtype, self.axis_name)(y, train)
        return nn.gelu(y + residual)


class ResidualBlock(nn.Module):
    """Conv3x3-Norm-GELU-Conv3x3-Norm, residual add, GELU (ref blocks.py:66-85)."""

    features: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = Norm(self.norm, self.dtype, self.axis_name)(y, train)
        y = nn.gelu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = Norm(self.norm, self.dtype, self.axis_name)(y, train)
        return nn.gelu(x + y)


class UpsampleBlock(nn.Module):
    """2× spatial upsample: ConvTranspose(k=2,s=2) or conv+pixel-shuffle,
    then Norm-GELU (ref blocks.py:88-123)."""

    features: int
    use_pixel_shuffle: bool = False
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.use_pixel_shuffle:
            y = nn.Conv(self.features * 4, (3, 3), padding="SAME", dtype=self.dtype)(x)
            b, h, w, c4 = y.shape
            c = c4 // 4
            # depth-to-space, 2x2 blocks (PixelShuffle semantics)
            y = y.reshape(b, h, w, 2, 2, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c)
        else:
            y = nn.ConvTranspose(
                self.features, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype
            )(x)
        y = Norm(self.norm, self.dtype, self.axis_name)(y, train)
        return nn.gelu(y)


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 + Norm + GELU (ref blocks.py:126-169)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "batch"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = (self.kernel_size, self.kernel_size)
        y = nn.Conv(
            in_ch, k, strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=in_ch, use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = Norm(self.norm, self.dtype, self.axis_name)(y, train)
        return nn.gelu(y)


class SqueezeExcitation(nn.Module):
    """Global-pool channel attention (ref blocks.py:172-200)."""

    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        reduced = max(c // self.reduction, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        s = nn.Conv(reduced, (1, 1), dtype=self.dtype)(s)
        s = nn.gelu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s


class SpatialAttention(nn.Module):
    """7x7-conv spatial gate (ref decoder.py:216-235)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = nn.Conv(1, (7, 7), padding="SAME", dtype=self.dtype)(x)
        return x * nn.sigmoid(a)
