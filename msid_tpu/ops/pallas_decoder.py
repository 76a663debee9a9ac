"""Pallas TPU kernel: fused decoder ResidualBlock (inference).

The decoder dominates inference (25 of 38 ms at batch 64 on v5e) and its
late stages are HBM-bound: each 3x3 conv at 192x192x48 reads and writes a
~113 MB activation, and C=48 wastes 62% of the 128-lane tile. This kernel
fuses one whole ResidualBlock

    y = GELU( BN2(conv2( GELU(BN1(conv1(x))) )) + x )

into a single pass: the input tile lives in VMEM, both convs run as 9
shifted [pixels, C] x [C, C] MXU matmuls with fp32 accumulation, the BN
affines (eval-mode running stats folded to scale/shift — `fold_batchnorm`)
and tanh-GELUs fuse on the VPU, and only the final tile is written back —
1 HBM read + 1 write instead of ~6.

Semantics match `msid_tpu.models.blocks.ResidualBlock` in eval mode,
including XLA 'SAME' zero-padding between the two convs: the intermediate
y1 halo that falls outside the image is masked to zero. (The kernel keeps
y1 in fp32 where the XLA path rounds it to bf16 between convs — the fused
result is slightly MORE precise.)

Mosaic constraints that shaped the implementation (this toolchain):
  * halo windows can't be BlockSpec blocks (blocks don't overlap) and
    ANY-space refs + manual DMA ICE the remote compiler — so each tile is
    stitched from 4 adjacent blocks of the same padded array (row/col
    neighbors supply the 4-pixel halo);
  * reshaping sublane-strided slices ICEs — convs use 3-D dot_general;
  * slice extents ≳128 on the sublane axis ICE — hence column tiling.

STATUS — correct but NOT currently faster: the 4-block stitch re-reads
every input tile 4x, which costs more HBM traffic than the 4 fused
elementwise passes it saves; measured 45 ms vs XLA's 16 ms per block at
64x192x192x48 on v5e (row_block 8 / col_block 96, the largest tile this
toolchain compiles). Not wired into the model. The winning design needs
working ANY+DMA halo windows (1 read + 1 write per tile) — revisit when
the Mosaic toolchain stops ICEing on them; the numerics here are already
golden-tested (tests/test_pallas_decoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_batchnorm(scale, bias, mean, var, eps: float = 1e-5):
    """BN eval:  y = (x - mean)/sqrt(var+eps)*scale + bias  →  x*a + b."""
    a = scale / np.sqrt(np.asarray(var) + eps)
    return np.asarray(a, np.float32), np.asarray(bias - mean * a, np.float32)


def _resblock_kernel(
    x11_ref,    # [1, R, Wb, C] rows j,   cols k     of the padded sample
    x12_ref,    # [1, R, Wb, C] rows j,   cols k+1   (right halo)
    x21_ref,    # [1, R, Wb, C] rows j+1, cols k     (bottom halo)
    x22_ref,    # [1, R, Wb, C] rows j+1, cols k+1   (corner halo)
    w1_ref,     # [9, C, C] conv1 taps (ky*3+kx)
    w2_ref,     # [9, C, C] conv2 taps
    aff_ref,    # [4, C]  (a1, b1, a2, b2) folded BN affines
    out_ref,    # [1, R, Wb, C]
    *,
    rows: int,
    cols: int,
    height: int,
    width: int,
):
    c = out_ref.shape[-1]
    r = rows
    w = cols

    top = jnp.concatenate([x11_ref[0], x12_ref[0, :, :4]], axis=1)
    bot = jnp.concatenate([x21_ref[0, :4], x22_ref[0, :4, :4]], axis=1)
    x = jnp.concatenate([top, bot], axis=0).astype(jnp.float32)  # [R+4, Wb+4, C]

    def conv9(src, w_taps, out_rows, out_cols):
        """3x3 'valid' conv via 9 shifted 3-D dot_generals, fp32 accum."""
        acc = jnp.zeros((out_rows, out_cols, c), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = src[ky : ky + out_rows, kx : kx + out_cols, :]
                acc = acc + jax.lax.dot_general(
                    patch,
                    w_taps[ky * 3 + kx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return acc

    # conv1 over the extended region so conv2 has its halo: output spans
    # rows/cols [-1, R+1) x [-1, Wb+1) relative to this tile.
    y1 = conv9(x, w1_ref[:].astype(jnp.float32), r + 2, w + 2)
    y1 = jax.nn.gelu(y1 * aff_ref[0] + aff_ref[1], approximate=True)

    # Zero the y1 halo that lies outside the image: XLA's second conv pads
    # with zeros there, while our y1 halo was computed from padded x.
    row0 = pl.program_id(1) * r - 1  # global image row of y1[0]
    col0 = pl.program_id(2) * w - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r + 2, w + 2, 1), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r + 2, w + 2, 1), 1) + col0
    inside = (
        (row_ids >= 0) & (row_ids < height) & (col_ids >= 0) & (col_ids < width)
    )
    y1 = jnp.where(inside, y1, 0.0)

    y2 = conv9(y1, w2_ref[:].astype(jnp.float32), r, w)
    y2 = y2 * aff_ref[2] + aff_ref[3]

    residual = x[2 : 2 + r, 2 : 2 + w, :]
    out_ref[0] = jax.nn.gelu(y2 + residual, approximate=True).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("row_block", "col_block", "interpret")
)
def fused_residual_block(
    x: jnp.ndarray,          # [B, H, W, C]
    w1: jnp.ndarray,         # [3, 3, C, C] HWIO
    w2: jnp.ndarray,         # [3, 3, C, C]
    affines: jnp.ndarray,    # [4, C] folded (a1, b1, a2, b2)
    row_block: int = 32,
    col_block: int = 96,
    interpret: bool = False,
) -> jnp.ndarray:
    """Eval-mode ResidualBlock, fused. Returns [B, H, W, C] in x.dtype."""
    b, h, w, c = x.shape
    if h % row_block != 0:
        row_block = h
    if w % col_block != 0:
        col_block = w
    # 2-pixel leading halo + enough trailing padding that block j+1 / k+1
    # exists for the last tile (window [jR, jR+R+4) ⊂ (H/R + 1) blocks).
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (2, 2 * row_block - 2),
            (2, 2 * col_block - 2),
            (0, 0),
        ),
    )

    kernel = functools.partial(
        _resblock_kernel, rows=row_block, cols=col_block, height=h, width=w
    )

    def tile_spec(dr: int, dc: int) -> pl.BlockSpec:
        return pl.BlockSpec(
            (1, row_block, col_block, c),
            lambda i, j, k, _dr=dr, _dc=dc: (i, j + _dr, k + _dc, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(b, h // row_block, w // col_block),
        in_specs=[
            tile_spec(0, 0),
            tile_spec(0, 1),
            tile_spec(1, 0),
            tile_spec(1, 1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_block, col_block, c),
            lambda i, j, k: (i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, xp, w1.reshape(9, c, c), w2.reshape(9, c, c), affines)
