"""JAX-native random packing (the Packmol replacement).

The reference delegates overlap removal after a uniform random draw to
Packmol.jl's ``pack_monoatomic!`` (/root/reference/src/initialization.jl:20-30)
with a minimum-distance tolerance. Here the same effect is achieved natively on
device: draw uniform positions, then FIRE-minimize a short-range harmonic
overlap energy U = sum_{r_ij < tol} (tol - r_ij)^2 until contacts vanish —
no external packer, fully jitted, works in 2D/3D and any box.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mdtpu.core.box import wrap_positions
from mdtpu.potentials.base import Potential


@struct.dataclass
class OverlapPotential(Potential):
    """Harmonic contact repulsion: u = (tol - r)^2, f = 2 (tol - r) for r < tol."""

    tol: jnp.ndarray = 1.0

    def evaluate(self, r, sigma_i=1.0, sigma_j=1.0):
        tol = jnp.asarray(self.tol, r.dtype)
        overlap = jnp.maximum(tol - r, 0.0)
        return overlap * overlap, 2.0 * overlap


def pack_positions(key, unitcell, n_particles, dimension, *, tol=1.0,
                   dtype=jnp.float32, max_steps=2000, engine=None):
    """Uniform random positions with pairwise distances >= ~tol.

    Returns (N, d) positions inside the box. Equivalent role to
    ``initialize_random`` + Packmol in the reference
    (/root/reference/src/initialization.jl:20-30).
    """
    from mdtpu.minimize.fire import fire_minimize
    from mdtpu.ops import select_engine
    from mdtpu.sim.initialization import build_state_from_arrays
    from mdtpu.core.types import Parameters

    cell = jnp.asarray(unitcell, dtype)
    # Invert the tiny d x d cell on the host: TPU f64 linalg.inv is
    # unsupported (LuDecomposition is f32-only), same policy as
    # build_state_from_arrays.
    cell_inv = jnp.asarray(
        np.linalg.inv(np.asarray(unitcell, np.float64)), dtype)
    frac = jax.random.uniform(key, (n_particles, dimension), dtype=dtype)
    positions = jnp.dot(frac, cell.T, precision=jax.lax.Precision.HIGHEST)

    potential = OverlapPotential(tol=tol)
    if engine is None:
        engine = select_engine(potential, float(tol), None,
                               unitcell=cell, n_particles=n_particles)
    else:
        engine = engine.replace(potential=potential, cutoff=tol)

    params = Parameters(density=n_particles / float(jnp.abs(jnp.linalg.det(cell))),
                        n_particles=n_particles, dt=0.0, potential=potential)
    state = build_state_from_arrays(positions, jnp.ones(n_particles, dtype),
                                    cell, key, dtype=dtype, cutoff=float(tol))
    state, energy, converged, _ = fire_minimize(
        state, params, engine, max_steps=max_steps, tol=1e-10,
        dt_initial=0.01, dt_max=0.15,
    )
    # The overlap energy is exactly zero iff no pair is closer than tol;
    # the Packmol path this replaces fails loudly on non-convergence
    # (/root/reference/src/initialization.jl:20-30), so do the same rather
    # than hand the caller a configuration with residual contacts.
    if not bool(converged) and float(energy) > 1e-8 * n_particles:
        raise RuntimeError(
            f"packing failed: residual overlap energy {float(energy):.3e} "
            f"after {max_steps} FIRE steps — lower the density, reduce tol, "
            f"or raise max_steps")
    out, _ = wrap_positions(state.positions, state.images, cell, cell_inv)
    return out
