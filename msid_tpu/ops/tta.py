"""Test-time self-ensemble over the dihedral group (D4).

A quality lever the reference does not ship: average the restorer's
output over rotated/flipped views of the noisy input, inverting each
transform before averaging. Classic for image restoration ("self-ensemble",
Timofte et al. 2016): the denoiser is approximately equivariant to the
dihedral symmetries of the tile grid, so the 8 views act as a free
8-member ensemble at 8x inference FLOPs and zero training cost.

Everything here is jit-friendly: the orbit is a static Python list, so
inside one `jit` the 8 forwards become one fused XLA program (the MXU
work dominates; the rot90/flip relayouts are fused copies).

Ordering is chosen so every prefix is useful and the first four elements
preserve non-square shapes:

  1: identity            2: +hflip        3: +vflip      4: +rot180
  5: +rot90              6: +rot90 hflip  7: +rot270     8: +rot270 hflip
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

# (rot90 quarter-turns, flip-last-spatial-axis) per orbit element; the
# first four are shape-preserving for non-square inputs.
DIHEDRAL_ORBIT: Tuple[Tuple[int, bool], ...] = (
    (0, False),  # identity
    (0, True),   # horizontal flip
    (2, True),   # vertical flip (rot180 . hflip)
    (2, False),  # rot180
    (1, False),
    (1, True),
    (3, False),
    (3, True),
)


def dihedral_transform(x: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    """Apply rot90^k then an optional W-axis flip to an NHWC batch."""
    if k:
        x = jnp.rot90(x, k, axes=(1, 2))
    if flip:
        x = x[:, :, ::-1, :]
    return x


def dihedral_inverse(y: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    """Invert :func:`dihedral_transform` with the same (k, flip)."""
    if flip:
        y = y[:, :, ::-1, :]
    if k:
        y = jnp.rot90(y, -k, axes=(1, 2))
    return y


def orbit_prefix(num_transforms: int, height: int, width: int
                 ) -> Sequence[Tuple[int, bool]]:
    """The first ``num_transforms`` orbit elements, validated for shape."""
    if not 1 <= num_transforms <= len(DIHEDRAL_ORBIT):
        raise ValueError(
            f"num_transforms must be in [1, {len(DIHEDRAL_ORBIT)}], "
            f"got {num_transforms}")
    if height != width and num_transforms > 4:
        raise ValueError(
            f"90-degree rotations need square tiles; got {height}x{width} "
            f"with num_transforms={num_transforms} (max 4 for non-square)")
    return DIHEDRAL_ORBIT[:num_transforms]


def wrap_forward(
    forward: Callable[..., jnp.ndarray],
    num_transforms: int,
    height: int,
    width: int,
) -> Callable[..., jnp.ndarray]:
    """Wrap a ``(variables, x) -> y`` forward in the dihedral self-ensemble.

    Validates the orbit against the spatial shape eagerly (so callers fail
    at build time, not inside jit) and returns the unchanged ``forward``
    when ``num_transforms == 1``. Single home for the wrapper used by the
    inference session, export, scene restoration, and the eval step.
    """
    orbit_prefix(num_transforms, height, width)
    if num_transforms == 1:
        return forward

    def ensembled(variables, x, _base=forward):
        return dihedral_ensemble(lambda z: _base(variables, z), x, num_transforms)

    return ensembled


def dihedral_ensemble(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    num_transforms: int = 8,
) -> jnp.ndarray:
    """Average ``forward`` over the first ``num_transforms`` dihedral views.

    ``forward`` maps an NHWC batch to an NHWC batch of the same spatial
    shape (the restorer). Accumulation is fp32 regardless of the
    forward's compute dtype.
    """
    orbit = orbit_prefix(num_transforms, x.shape[1], x.shape[2])
    if len(orbit) == 1:
        return forward(x)
    acc = None
    for k, flip in orbit:
        y = forward(dihedral_transform(x, k, flip))
        y = dihedral_inverse(y.astype(jnp.float32), k, flip)
        acc = y if acc is None else acc + y
    return acc / jnp.float32(len(orbit))
