"""Fused decoder ResidualBlock kernel: numerics vs the XLA reference.

Runs in Pallas interpret mode on CPU (same math; the TPU-compiled path is
benchmarked separately — see the module docstring for its current status).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from msid_tpu.ops.pallas_decoder import (
    fold_batchnorm,
    fused_residual_block,
    fused_residual_block_v3,
)


def _reference(x, w1, w2, a1, b1, a2, b2):
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    y = jax.nn.gelu(conv(x, w1) * a1 + b1, approximate=True)
    y = conv(y, w2) * a2 + b2
    return jax.nn.gelu(y + x, approximate=True)


def test_fold_batchnorm():
    rng = np.random.default_rng(0)
    scale, bias = rng.normal(1, 0.1, 8), rng.normal(0, 0.1, 8)
    mean, var = rng.normal(0, 0.2, 8), rng.uniform(0.5, 2, 8)
    a, b = fold_batchnorm(scale, bias, mean, var)
    x = rng.normal(0, 1, (4, 8)).astype(np.float32)
    want = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(x * a + b, want, rtol=1e-5)


@pytest.mark.parametrize("shape,row_block", [
    ((2, 16, 16, 8), 8),      # multi-tile rows
    ((1, 8, 8, 8), 8),        # single tile
    ((2, 24, 16, 8), 8),      # 3 row tiles
])
def test_fused_residual_block_matches_xla(shape, row_block):
    rng = np.random.default_rng(1)
    b, h, w, c = shape
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32))
    a1, b1 = fold_batchnorm(
        rng.normal(1, 0.1, c).astype(np.float32), rng.normal(0, 0.1, c).astype(np.float32),
        rng.normal(0, 0.1, c).astype(np.float32), rng.uniform(0.5, 2, c).astype(np.float32),
    )
    a2, b2 = fold_batchnorm(
        rng.normal(1, 0.1, c).astype(np.float32), rng.normal(0, 0.1, c).astype(np.float32),
        rng.normal(0, 0.1, c).astype(np.float32), rng.uniform(0.5, 2, c).astype(np.float32),
    )
    aff = jnp.asarray(np.stack([a1, b1, a2, b2]))

    want = np.asarray(_reference(x, w1, w2, a1, b1, a2, b2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_residual_block(x, w1, w2, aff, row_block=row_block,
                                              col_block=8))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape,row_block,im2col", [
    ((2, 16, 16, 8), 8, True),    # multi-panel rows, single-dot im2col
    ((2, 16, 16, 8), 8, False),   # 9-dot accumulation form
    ((1, 8, 8, 8), 8, True),      # single panel
    ((2, 24, 16, 8), 8, True),    # 3 row panels
])
def test_fused_residual_block_v3_matches_xla(shape, row_block, im2col):
    # v3 computes with bf16 MXU operands (f32 accumulation) by design, so
    # golden parity is against the XLA block run on the same bf16 inputs.
    rng = np.random.default_rng(2)
    b, h, w, c = shape
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(
        rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32), jnp.bfloat16)
    w2 = jnp.asarray(
        rng.normal(0, 0.2, (3, 3, c, c)).astype(np.float32), jnp.bfloat16)
    a1, b1 = fold_batchnorm(
        rng.normal(1, 0.1, c).astype(np.float32), rng.normal(0, 0.1, c).astype(np.float32),
        rng.normal(0, 0.1, c).astype(np.float32), rng.uniform(0.5, 2, c).astype(np.float32),
    )
    a2, b2 = fold_batchnorm(
        rng.normal(1, 0.1, c).astype(np.float32), rng.normal(0, 0.1, c).astype(np.float32),
        rng.normal(0, 0.1, c).astype(np.float32), rng.uniform(0.5, 2, c).astype(np.float32),
    )
    aff = jnp.asarray(np.stack([a1, b1, a2, b2]))

    def bf16_reference(v, k1, k2, aff):
        def conv(u, k):
            return lax.conv_general_dilated(
                u, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        y1 = jax.nn.gelu(conv(v, k1) * aff[0] + aff[1], approximate=True)
        y2 = conv(y1.astype(v.dtype), k2) * aff[2] + aff[3]
        return jax.nn.gelu(y2 + v.astype(jnp.float32), approximate=True)

    want = np.asarray(bf16_reference(x, w1, w2, aff), np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_residual_block_v3(
                x, w1, w2, aff, row_block=row_block, im2col=im2col
            ).astype(jnp.float32))
    # got is bf16-rounded output vs the f32 reference: tolerance is one
    # bf16 ulp (2^-8 relative) plus accumulation-order noise.
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.02)
