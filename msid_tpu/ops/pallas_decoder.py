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

STATUS — correct, golden-tested, and a documented DEAD END on this
toolchain (measured v5e, 2026-08; see benchmarks/pallas_probe.py and
benchmarks/decoder_ablation.py):

  * v1 (this kernel, 4-block halo stitch, fp32 dots): 45 ms per block at
    64x192x192x48 — fp32 matmuls are emulated on the bf16 MXU and the
    stitch re-reads inputs 4x.
  * v3 (row-panel, concat-roll taps, single K=9C im2col bf16 dot): 10.2 ms
    — beats a STANDALONE jitted XLA block (11.7 ms, and the pure-bf16
    variant times the same), which is what earlier rounds compared
    against…
  * …but the standalone number is unrepresentative. Ablating the two
    stage-4 res blocks out of the full decoder graph changes its runtime
    by only 6.8 ms at b=128 (= 1.7 ms per block at the probe's B=64): XLA
    runs the SAME convs ~6x faster in-graph (114 TF/s vs the lone-op's
    16.7) once its global layout assignment applies. The whole folded-BN
    decoder measures ~115 TF/s aggregate (58% of chip peak, stage-1
    blocks at full 197 TF/s), so there is no multiple left for a fused
    block to win — the remaining gap is MXU mapping on the C<=96 stages,
    which this Mosaic toolchain cannot beat XLA at (no ANY+DMA halo
    windows; per-tap VPU canonicalization dominates).

Kept as negative-result documentation + a working example of the
concat-roll/offset-0 Mosaic idioms; NOT wired into the model.

Toolchain re-probe 2026-08-19 (jax 0.9.0, `benchmarks/pallas_probe.py
any_dma`): ANY-space refs + manual async copy now COMPILE AND RUN on
this toolchain — the halo-window-by-DMA design is no longer ICE-blocked.
The economics above still close the case, though: the 4-block stitch
was never the 6x factor (v3 already amortized it and sits at 10.2 ms vs
XLA's ~1.7 ms/block in-graph), so removing the stitch via DMA cannot
recover the gap; the binding constraint remains XLA's global layout
assignment + MXU mapping on C<=96, which no Mosaic variant here has
approached. Re-probe again if a future toolchain changes the in-graph
ablation numbers (`benchmarks/decoder_ablation.py`), not just the gate.
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


def _resblock_kernel_v2(
    x11_ref,    # [1, R, Wb, C] rows j,   cols k     of the padded sample
    x12_ref,    # [1, R, Wb, C] rows j,   cols k+1   (right halo)
    x21_ref,    # [1, R, Wb, C] rows j+1, cols k     (bottom halo)
    x22_ref,    # [1, R, Wb, C] rows j+1, cols k+1   (corner halo)
    w1_ref,     # [9C, C] conv1 im2col weights (HWIO row-major flatten)
    w2_ref,     # [9C, C] conv2 im2col weights
    aff_ref,    # [4, C]  (a1, b1, a2, b2) folded BN affines
    out_ref,    # [1, R, Wb, C]
    *,
    rows: int,
    cols: int,
    height: int,
    width: int,
):
    """v2: bf16 MXU dots with one im2col matmul per conv.

    Two changes vs the v1 kernel, worth ~20x together (measured, see
    module STATUS):
      * operands stay bf16 and only the ACCUMULATION is fp32
        (``preferred_element_type``) — v1 cast everything to fp32, and
        fp32 matmuls are *emulated* on the bf16 MXU at ~6-8x the cost;
      * the 9 shifted taps concatenate channel-wise into one
        [rows, cols, 9C] patch tensor and contract in a single
        dot_general — K=9C=432 streams through the 128-deep array almost
        fully utilized, instead of nine K=48 loads at 37% utilization.
    """
    c = out_ref.shape[-1]
    r = rows
    w = cols

    top = jnp.concatenate([x11_ref[0], x12_ref[0, :, :4]], axis=1)
    bot = jnp.concatenate([x21_ref[0, :4], x22_ref[0, :4, :4]], axis=1)
    x = jnp.concatenate([top, bot], axis=0)  # [R+4, Wb+4, C] bf16

    def conv_im2col(src, w_flat, out_rows, out_cols):
        # 9 shifted bf16 dots with fp32 accumulation. (A true single-dot
        # im2col — concat the taps channel-wise for K=9C — is the better
        # MXU mapping but this Mosaic toolchain rejects lane-concat of
        # sublane-shifted slices: 'result/input offset mismatch on
        # non-concat dimension'.)
        acc = jnp.zeros((out_rows, out_cols, c), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = src[ky : ky + out_rows, kx : kx + out_cols, :]
                acc = acc + jax.lax.dot_general(
                    patch,
                    w_flat[(ky * 3 + kx) * c : (ky * 3 + kx + 1) * c],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return acc

    # conv1 over the extended region so conv2 has its halo.
    y1 = conv_im2col(x, w1_ref[:], r + 2, w + 2)
    y1 = jax.nn.gelu(y1 * aff_ref[0] + aff_ref[1], approximate=True)

    row0 = pl.program_id(1) * r - 1
    col0 = pl.program_id(2) * w - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r + 2, w + 2, 1), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r + 2, w + 2, 1), 1) + col0
    inside = (
        (row_ids >= 0) & (row_ids < height) & (col_ids >= 0) & (col_ids < width)
    )
    y1 = jnp.where(inside, y1, 0.0).astype(x11_ref.dtype)

    y2 = conv_im2col(y1, w2_ref[:], r, w)
    y2 = y2 * aff_ref[2] + aff_ref[3]

    residual = x[2 : 2 + r, 2 : 2 + w, :].astype(jnp.float32)
    out_ref[0] = jax.nn.gelu(y2 + residual, approximate=True).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("row_block", "col_block", "interpret")
)
def fused_residual_block_v2(
    x: jnp.ndarray,          # [B, H, W, C]
    w1: jnp.ndarray,         # [3, 3, C, C] HWIO
    w2: jnp.ndarray,         # [3, 3, C, C]
    affines: jnp.ndarray,    # [4, C] folded (a1, b1, a2, b2)
    row_block: int = 16,
    col_block: int = 96,
    interpret: bool = False,
) -> jnp.ndarray:
    """Eval-mode ResidualBlock, fused (v2 kernel). [B, H, W, C] in x.dtype."""
    b, h, w, c = x.shape
    if h % row_block != 0:
        row_block = h
    if w % col_block != 0:
        col_block = w
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
        _resblock_kernel_v2, rows=row_block, cols=col_block, height=h, width=w
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
    )(xp, xp, xp, xp, w1.reshape(9 * c, c), w2.reshape(9 * c, c), affines)


def _resblock_kernel_v3(
    xr0_ref,    # [1, R, Wp, C] row panel j of the padded sample
    xr1_ref,    # [1, R, Wp, C] row panel j+1 (bottom halo rows)
    w1_ref,     # [9C, C] conv1 im2col weights (HWIO row-major flatten)
    w2_ref,     # [9C, C] conv2 im2col weights
    aff_ref,    # [4, C]  (a1, b1, a2, b2) folded BN affines
    out_ref,    # [1, R, W, C]
    *,
    rows: int,
    height: int,
    width: int,
    im2col: bool,
    bf16_patches: bool,
    pad64: bool,
):
    """v3: full-width row panels, offset-0 layouts, big-M 2-D dots.

    The v2 kernel was MXU-latency-bound: 3-D dot_generals over sliced
    operands lower to one small matmul per sublane row. v3 restructures so
    every dot is a single large 2-D matmul:

      * column shifts use ``pltpu.roll`` + a leading slice — layouts stay
        offset-0, so operands can be reshaped (sublane-merged) legally;
      * conv1 output columns are rounded up to a multiple of 8 so the
        [rows, cols, K] patch tensor flattens to [rows*cols, K] without
        retiling;
      * with ``im2col`` the 9 taps lane-concat into K=9C=432 and contract
        in ONE dot (best MXU array utilization); otherwise 9 separate
        [M, C] x [C, C] dots accumulate in fp32.
    """
    c = out_ref.shape[-1]
    r = rows
    # Working copy: with ``bf16_patches`` the panels stay bf16 end to end
    # (halves all tap/patch VMEM traffic); otherwise fp32, for toolchains
    # where bf16 sublane-offset concat is unsupported — Mosaic's rotate /
    # generic relayout is only implemented for 32-bit data, but the
    # concat-based roll below sidesteps it in either dtype.
    work = jnp.bfloat16 if bf16_patches else jnp.float32
    src = jnp.concatenate(
        [xr0_ref[0], xr1_ref[0, :4]], axis=0
    ).astype(work)  # [R+4, Wp, C]

    c1_cols = width + 8  # conv1 covers image cols [-1, width+7), %8 == 0

    def conv(s, w_flat, out_r, out_c):
        # Column shifts are concat-based rolls: offsets on the CONCAT dim
        # are legal, and the concat materializes a canonical offset-0
        # layout (pltpu.roll folds back into a lazy offset that the later
        # lane-concat then rejects; it is also 32-bit-only). Only TWO
        # rolled copies are built (kx=1,2; kx=0 is s itself) — the ky
        # shifts are outer-dim slices, which are free (a 3-D array tiles
        # its last two dims, so dim-0 slicing carries no layout offset),
        # leaving the 9 taps offset-0 for the lane-concat.
        colroll = [s] + [
            jnp.concatenate([s[:, kx:], s[:, :kx]], axis=1)
            for kx in (1, 2)
        ]
        taps = [
            colroll[kx][ky : ky + out_r, :out_c, :]
            for ky in range(3)
            for kx in range(3)
        ]
        if im2col:
            if pad64:
                # Pad each tap to 64 lanes so tap boundaries align to
                # half 128-lane tiles: the lane-concat then needs only
                # half-tile swaps instead of arbitrary 48-lane shuffles.
                # (w_flat comes pre-padded with matching zero rows.)
                kc = 64
                taps = [
                    jnp.pad(t, ((0, 0), (0, 0), (0, kc - c))) for t in taps
                ]
            else:
                kc = c
            patches = jnp.concatenate(taps, axis=-1)  # [out_r, out_c, 9*kc]
            flat = patches.astype(jnp.bfloat16).reshape(out_r * out_c, 9 * kc)
            y = jax.lax.dot_general(
                flat, w_flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            y = jnp.zeros((out_r * out_c, c), jnp.float32)
            for t, patch in enumerate(taps):
                canon = jnp.concatenate(
                    [patch], axis=-1
                ).astype(jnp.bfloat16)  # force canonical layout (see above)
                y = y + jax.lax.dot_general(
                    canon.reshape(out_r * out_c, c),
                    w_flat[t * c : (t + 1) * c],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return y.reshape(out_r, out_c, c)

    y1 = conv(src, w1_ref[:], r + 2, c1_cols)
    y1 = jax.nn.gelu(y1 * aff_ref[0] + aff_ref[1], approximate=True)

    # Zero y1 outside the image (incl. the rounded-up extra columns):
    # XLA's second conv pads with zeros there.
    row0 = pl.program_id(1) * r - 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r + 2, c1_cols, 1), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r + 2, c1_cols, 1), 1) - 1
    inside = (
        (row_ids >= 0) & (row_ids < height) & (col_ids >= 0) & (col_ids < width)
    )
    y1 = jnp.where(inside, y1, 0.0).astype(work)

    y2 = conv(y1, w2_ref[:], r, width)
    y2 = y2 * aff_ref[2] + aff_ref[3]

    rows2 = src[2 : 2 + r]
    residual = jnp.concatenate(
        [rows2[:, 2:], rows2[:, :2]], axis=1
    )[:, :width, :].astype(jnp.float32)
    out_ref[0] = jax.nn.gelu(y2 + residual, approximate=True).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "row_block", "im2col", "bf16_patches", "pad64", "interpret"
    ),
)
def fused_residual_block_v3(
    x: jnp.ndarray,          # [B, H, W, C]
    w1: jnp.ndarray,         # [3, 3, C, C] HWIO
    w2: jnp.ndarray,         # [3, 3, C, C]
    affines: jnp.ndarray,    # [4, C] folded (a1, b1, a2, b2)
    row_block: int = 16,
    im2col: bool = True,
    bf16_patches: bool = True,
    pad64: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Eval-mode ResidualBlock, fused (v3 kernel). [B, H, W, C] in x.dtype."""
    b, h, w, c = x.shape
    if h % row_block != 0:
        row_block = h
    # cols: 2 leading halo + (w+8 conv1 cols need src up to w+10) → pad 12.
    xp = jnp.pad(
        x,
        ((0, 0), (2, 2 * row_block - 2), (2, 10), (0, 0)),
    )

    kernel = functools.partial(
        _resblock_kernel_v3, rows=row_block, height=h, width=w,
        im2col=im2col, bf16_patches=bf16_patches, pad64=pad64,
    )

    def panel_spec(dr: int) -> pl.BlockSpec:
        return pl.BlockSpec(
            (1, row_block, w + 12, c),
            lambda i, j, _dr=dr: (i, j + _dr, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(b, h // row_block),
        in_specs=[
            panel_spec(0),
            panel_spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_block, w, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, xp, _flat_taps(w1, pad64 and im2col),
      _flat_taps(w2, pad64 and im2col), affines)


def _flat_taps(w: jnp.ndarray, pad64: bool) -> jnp.ndarray:
    """[3,3,C,C] HWIO → [9C, C] (or [9*64, C] with zero rows when pad64)."""
    c = w.shape[-1]
    flat = w.reshape(9 * c, c)
    if not pad64:
        return flat
    return jnp.pad(
        flat.reshape(9, c, c), ((0, 0), (0, 64 - c), (0, 0))
    ).reshape(9 * 64, c)


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
