"""Periodic box handling: unit cells, wrapping, minimum image.

Mirrors the behaviour of the reference's boundary layer
(/root/reference/src/boundary.jl:7-17 ``wrap_to_box`` and
/root/reference/src/initialization.jl:7-18 ``to_unitcell``) but vectorised
over all particles at once: positions are ``(N, d)`` arrays and the wrap is a
pair of small ``(d, d)`` matmuls, which XLA fuses into the integrator.

Convention: the unit cell is a ``(d, d)`` matrix whose *columns* are the box
vectors, so ``cartesian = cell @ fractional`` — identical to the reference
(``unitcell * frac`` at /root/reference/src/boundary.jl:15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# All position <-> fractional transforms run at HIGHEST matmul precision: the
# TPU MXU's DEFAULT f32 precision truncates inputs to bf16 (8 mantissa bits),
# which for a box of size L injects ~1e-3 * L coordinate noise per wrap —
# catastrophic for MD (overlaps, energy explosion). These are (N, d) @ (d, d)
# matmuls, so full precision costs nothing.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.dot(a, b, precision=_HI)


def to_unitcell(box, dimension: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalise a scalar / vector / matrix box spec into a (d, d) cell matrix.

    Reference: /root/reference/src/initialization.jl:7-18.
    """
    box = np.asarray(box, dtype=np.float64)
    if box.ndim == 0:
        cell = np.eye(dimension) * float(box)
    elif box.ndim == 1:
        if box.shape[0] < dimension:
            raise ValueError(f"box vector of length {box.shape[0]} < dimension {dimension}")
        cell = np.diag(box[:dimension])
    elif box.ndim == 2:
        if box.shape[0] < dimension or box.shape[1] < dimension:
            raise ValueError(
                f"box matrix of shape {box.shape} < dimension {dimension}")
        cell = box[:dimension, :dimension]
    else:
        raise ValueError(f"cannot interpret box of shape {box.shape}")
    return jnp.asarray(cell, dtype=dtype)


def box_volume(cell) -> jnp.ndarray:
    """Volume (area in 2D) = |det(cell)|. Reference: /root/reference/src/simulation.jl:7-9."""
    return jnp.abs(jnp.linalg.det(cell))


def is_orthorhombic(cell) -> bool:
    """Host-side check that the cell is diagonal (no tilt). Used to select the
    cell-list engine (orthorhombic) vs the general triclinic path."""
    c = np.asarray(cell)
    return bool(np.allclose(c, np.diag(np.diag(c))))


def wrap_positions(positions, images, cell, cell_inv):
    """Wrap all positions into the box and update integer image counts.

    positions: (N, d) cartesian. images: (N, d) int32 crossing counts.
    Returns (wrapped_positions, new_images).

    Reference: /root/reference/src/boundary.jl:7-17, applied per-particle in a
    ``@threads`` loop; here a single fused batched op.
    """
    frac = _mm(positions, cell_inv.T)
    n_cross = jnp.floor(frac)
    frac_mod = frac - n_cross
    wrapped = _mm(frac_mod, cell.T)
    new_images = images + n_cross.astype(images.dtype)
    return wrapped, new_images


def wrap_positions_compensated(positions, comp, images, cell, cell_inv):
    """Wrap via a Kahan-compensated delta instead of recomputing coordinates.

    The plain wrap reconstructs x = cell @ (frac - floor(frac)), re-rounding
    every coordinate to ulp(L) each step — a ~L*2^-24 noise injection that
    dominates f32 NVE energy drift (the compensation buffer cannot see it
    because the value is replaced, not incremented). Here the wrap is applied
    as x += (-cell @ k) with integer crossing counts k through the two-sum,
    so the exact residual lands in the compensation buffer: non-crossing
    particles are untouched bit-for-bit, crossing ones lose nothing. For
    orthorhombic cells and |k| <= 1 the delta (-k * L) is exact in f32.

    Returns (positions, comp, images).
    """
    from mdtpu.utils.math import kahan_add

    frac = _mm(positions, cell_inv.T)
    n_cross = jnp.floor(frac)
    delta = -_mm(n_cross, cell.T)
    positions, comp = kahan_add(positions, comp, delta)
    return positions, comp, images + n_cross.astype(images.dtype)


def minimum_image(dr, cell, cell_inv):
    """Apply the minimum-image convention to displacement vectors.

    dr: (..., d) cartesian displacements. Valid when the interaction cutoff is
    less than half the smallest box width (same restriction as cell lists).
    """
    frac = _mm(dr, cell_inv.T)
    frac = frac - jnp.round(frac)
    return _mm(frac, cell.T)


def unwrapped_positions(positions, images, cell):
    """Absolute (unwrapped) coordinates: p + cell @ image.

    Reference: /root/reference/src/io.jl:78-86 ``unwrapped``.
    """
    return positions + _mm(images.astype(positions.dtype), cell.T)
