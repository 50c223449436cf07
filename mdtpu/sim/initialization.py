"""State construction and velocity initialization.

Reference: /root/reference/src/initialization.jl. The four init modes are
preserved (user arrays / from Extended-XYZ file / user box + random / default
cubic box from density + random), Packmol is replaced by the JAX-native
packer (mdtpu.sim.pack), and the result is a fixed-shape device pytree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import to_unitcell
from mdtpu.core.types import Parameters, SimulationState


def lattice_positions(n_particles, unitcell, dimension=3, dtype=jnp.float32,
                      jitter=0.0, key=None):
    """Simple-cubic (square in 2D) lattice filling the box — an overlap-free
    start for large systems where packing is unnecessary (benchmarks, melts).
    Extension beyond the reference (which only packs randomly or reads files).
    """
    cell = np.asarray(unitcell, dtype=np.float64)
    per_side = int(np.ceil(n_particles ** (1.0 / dimension)))
    idx = np.indices((per_side,) * dimension).reshape(dimension, -1).T[:n_particles]
    frac = (idx + 0.5) / per_side
    pos = frac @ cell.T
    pos = jnp.asarray(pos, dtype)
    if jitter > 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        pos = pos + jitter * jax.random.normal(key, pos.shape, dtype=dtype)
    return pos


def initialize_velocities(ktemp, key, n_particles, dimension, dtype=jnp.float32):
    """Maxwell-Boltzmann velocities at temperature ``ktemp`` with COM motion
    removed and exact rescale to nf = d*(N-1) degrees of freedom.

    Reference: /root/reference/src/initialization.jl:32-47.
    """
    v = jax.random.normal(key, (n_particles, dimension), dtype=dtype)
    v = v - jnp.mean(v, axis=0, keepdims=True)
    sum_v2 = jnp.sum(v * v)
    fs = jnp.sqrt(ktemp / (sum_v2 / ((n_particles - 1) * dimension)))
    return v * fs


def build_state_from_arrays(positions, diameters, unitcell, key, *,
                            velocities=None, dtype=jnp.float32,
                            cutoff: float = 1.5, step: int = 0) -> SimulationState:
    """Assemble a SimulationState pytree from raw arrays (all zeros where the
    reference leaves fields empty: velocities, images, forces)."""
    positions = jnp.asarray(positions, dtype)
    n, dim = positions.shape
    cell = jnp.asarray(unitcell, dtype)
    # Host-side inverse: the cell is static, and TPU lacks f64 LU support.
    cell_inv = jnp.asarray(
        np.linalg.inv(np.asarray(unitcell, dtype=np.float64)), dtype)
    if velocities is None:
        velocities = jnp.zeros_like(positions)
    else:
        velocities = jnp.asarray(velocities, dtype)
    zero = jnp.asarray(0.0, dtype)
    return SimulationState(
        positions=positions,
        velocities=velocities,
        forces=jnp.zeros_like(positions),
        images=jnp.zeros((n, dim), jnp.int32),
        diameters=jnp.asarray(diameters, dtype),
        unitcell=cell,
        unitcell_inv=cell_inv,
        key=key,
        step=jnp.asarray(step, jnp.int32),
        nf=jnp.asarray(dim * (n - 1.0), dtype),
        energy=zero,
        virial=zero,
        temperature=zero,
        pos_comp=jnp.zeros_like(positions),
        vel_comp=jnp.zeros_like(positions),
        nbrs=None,
        virial_accum=zero,
        nprom=jnp.asarray(0, jnp.int32),
        cutoff=float(cutoff),
    )


def initialize_state(
    params: Parameters,
    pathname: str,
    *,
    from_file: str = "",
    dimension: int = 3,
    random_init: bool = False,
    cutoff: float = 1.5,
    key: Optional[jnp.ndarray] = None,
    seed: int = 0,
    unitcell: Any = None,
    positions: Any = None,
    diameters: Any = None,
    dtype=jnp.float32,
    pack_tol: float = 1.0,
) -> SimulationState:
    """Construct the simulation state (reference:
    /root/reference/src/initialization.jl:49-157).

    Modes, in priority order:
      A. user-provided ``positions`` (+ ``diameters``; box inferred from the
         coordinate bounding box if ``unitcell`` is absent)
      B. ``from_file``: read an Extended-XYZ snapshot
      C. user ``unitcell``: random packed positions, unit diameters
      D. default cubic/square box with L = (N / rho)^(1/d): random packed

    ``random_init`` is accepted for signature parity and deliberately
    ignored: in the reference it only gates its own failure mode (with no
    file and random_init=false the Julia code calls ``read_file("")`` and
    errors, /root/reference/src/initialization.jl:77-79); here an empty
    ``from_file`` simply selects the random-packing branch, so the flag has
    nothing left to decide.

    Velocities are left at zero — the user assigns them via
    ``state.replace(velocities=initialize_velocities(...))``, matching the
    reference's workflow (/root/reference/README.md usage). Writes
    ``init.xyz`` into ``pathname``.
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    os.makedirs(pathname, exist_ok=True)

    if positions is not None:
        positions = np.asarray(positions, dtype=np.float64)
        n = positions.shape[0]
        if diameters is None:
            diameters = np.ones(n)
        if unitcell is None:
            span = positions.max(axis=0) - positions.min(axis=0)
            cell = to_unitcell(span, dimension, dtype)
        else:
            cell = to_unitcell(unitcell, dimension, dtype)
    elif from_file:
        cell_np, positions, diameters = _read_xyz(from_file, dimension)
        cell = jnp.asarray(cell_np, dtype)
    else:
        n = params.n_particles
        if unitcell is not None:
            cell = to_unitcell(unitcell, dimension, dtype)
        else:
            boxl = (n / float(params.density)) ** (1.0 / dimension)
            cell = to_unitcell(boxl, dimension, dtype)
        from mdtpu.sim.pack import pack_positions

        key, pack_key = jax.random.split(key)
        positions = pack_positions(pack_key, cell, n, dimension,
                                   tol=pack_tol, dtype=dtype)
        diameters = np.ones(n)

    state = build_state_from_arrays(positions, diameters, cell, key,
                                    dtype=dtype, cutoff=cutoff)

    from mdtpu.io.xyz import write_xyz

    write_xyz(os.path.join(pathname, "init.xyz"), 0, state.unitcell,
              state.positions, state.diameters, mode="w")
    return state


def _read_xyz(path, dimension):
    from mdtpu.io.xyz import read_xyz

    return read_xyz(path, dimension)


def lattice_fluid_state(n_particles, density, temperature, *, dimension=3,
                        dtype=jnp.float32, cutoff=1.5, jitter=0.01,
                        seed=0) -> SimulationState:
    """Jittered-lattice fluid with Maxwell velocities in a cubic rho-box —
    the shared system builder for the bench/gate/validation harnesses and
    the driver entry (previously seven hand copies that had already drifted
    in jitter/rounding details)."""
    L = (n_particles / density) ** (1.0 / dimension)
    # f32-rounded box length in EVERY dtype: the gate harness compares
    # drift across precisions on the same geometry, so f64 runs must use
    # the same (f32-representable) box as f32 runs.
    cell = jnp.eye(dimension, dtype=dtype) * np.float32(L)
    pos = lattice_positions(n_particles, cell, dimension, dtype=dtype,
                            jitter=jitter, key=jax.random.PRNGKey(seed))
    state = build_state_from_arrays(
        pos, jnp.ones(n_particles, dtype), cell,
        jax.random.PRNGKey(seed + 1), dtype=dtype, cutoff=cutoff)
    v = initialize_velocities(temperature, jax.random.PRNGKey(seed + 2),
                              n_particles, dimension, dtype=dtype)
    return state.replace(velocities=v)
