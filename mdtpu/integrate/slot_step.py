"""Slot-space hot loop: the whole simulation state lives in cell-sorted
slot order.

Motivation (measured at the N=65k bench config on TPU v5e): of the 3.6 ms
cell-grid force evaluation, ~1.1 ms is the scatter of particle coordinates
into the padded slot grid and ~1.3 ms the gather of forces back to particle
order — XLA's TPU scatter/gather are serialized and cost more than the whole
pair sweep (~0.9 ms). Keeping positions/velocities/forces in slot order
removes both: the sweep becomes reshape-only, and the integrator simply
processes ~1.6x more rows (vacant slots integrate zeros — cheap dense VPU
work).

Layout contract:
  * all per-particle arrays have n_slots = n_cells * C rows in cell-sorted
    order; vacant rows hold far-pad coordinates, zero velocities/forces,
    unit diameters;
  * ``state.nbrs.occupied`` marks real rows; ``state.nf`` still encodes the
    true particle count, so temperature/thermostat are unchanged;
  * the periodic wrap is masked to occupied rows (vacant far coordinates
    must never be folded into the box) and applied as a compensated delta;
  * when any particle drifts past skin/2 the step re-bins IN-LOOP via
    ``lax.cond``: one argsort + a scatter per array, amortized over the
    rebuild interval.

The role analog in the reference is CellListMap's internally-permuted
particle storage (it also computes on cell-ordered copies,
/root/reference/src/initialization.jl:100-107); here the ENTIRE dynamics
runs in that order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import minimum_image, wrap_positions_compensated
from mdtpu.core.types import NVE, NVT, Brownian, Parameters, SimulationState
from mdtpu.integrate.step import SQRT3, _add
from mdtpu.integrate.thermostat import bussi_rescale, compute_temperature
from mdtpu.ops.cell_grid import (
    _FAR_PAD_BASE,
    _FAR_PAD_SPACING,
    CellGridEngine,
    CellGridState,
)


def _far_template(n_slots, dim, dtype):
    far = _FAR_PAD_BASE + _FAR_PAD_SPACING * jnp.arange(n_slots + 1,
                                                        dtype=dtype)
    return jnp.stack([far] * dim, axis=-1)


def slotify(state: SimulationState, engine: CellGridEngine) -> SimulationState:
    """Convert an (N,) particle state into slot order (n_cells * C rows)."""
    n, dim = state.positions.shape
    cap = engine.cell_capacity
    n_cells = int(np.prod(engine.grid))
    n_slots = n_cells * cap
    dtype = state.positions.dtype

    nbrs = engine.allocate(state.positions, state.diameters, state.unitcell,
                           state.unitcell_inv)
    addr = nbrs.addr  # (N,) slot or trash (= n_slots)

    far = _far_template(n_slots, dim, dtype)

    def put(a, fill):
        if a is None:
            return None
        if fill == "far":
            base = far
        else:
            base = jnp.full((n_slots + 1,) + a.shape[1:], fill, a.dtype)
        return base.at[addr].set(a)[:-1]

    occupied = jnp.zeros((n_slots + 1,), bool).at[addr].set(True)[:-1]
    slot_nbrs = CellGridState(
        addr=jnp.arange(n_slots, dtype=jnp.int32),
        occupied=occupied,
        sorted_comps=nbrs.sorted_comps,
        sorted_diam=put(state.diameters, 1),
        ref_positions=put(state.positions, "far"),
        overflow=nbrs.overflow,
    )
    return state.replace(
        positions=put(state.positions, "far"),
        velocities=put(state.velocities, 0),
        forces=put(state.forces, 0),
        images=put(state.images, 0),
        diameters=put(state.diameters, 1),
        pos_comp=put(state.pos_comp, 0),
        vel_comp=put(state.vel_comp, 0),
        nbrs=slot_nbrs,
    )


def unslotify_arrays(state: SimulationState):
    """(positions, velocities, diameters, images) of the real rows, as numpy
    (row order is the current slot order, not the original particle order)."""
    occ = np.asarray(state.nbrs.occupied)
    return tuple(np.asarray(a)[occ] for a in (
        state.positions, state.velocities, state.diameters, state.images))


def _rebin(state: SimulationState, engine: CellGridEngine) -> SimulationState:
    """Re-sort all slot arrays by current cells (the rebuild). Runs inside
    lax.cond — fixed shapes, one argsort + one scatter per array."""
    dim = state.positions.shape[1]
    cap = engine.cell_capacity
    n_cells = int(np.prod(engine.grid))
    n_slots = n_cells * cap
    dtype = state.positions.dtype
    grid = jnp.asarray(engine.grid, jnp.int32)

    occ = state.nbrs.occupied
    # Wrap valid rows into the box for binning (state positions may be up to
    # skin/2 outside after compensated-delta wraps).
    frac = jnp.dot(state.positions, state.unitcell_inv.T,
                   precision=jax.lax.Precision.HIGHEST)
    frac = frac - jnp.floor(frac)
    coords = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)
    strides = np.concatenate(
        [np.cumprod(np.asarray(engine.grid)[::-1])[-2::-1], [1]]
    ).astype(np.int32)
    cid = jnp.sum(coords * jnp.asarray(strides), axis=1)
    cid = jnp.where(occ, cid, n_cells)

    order = jnp.argsort(cid).astype(jnp.int32)
    cid_sorted = cid[order]
    counts = jnp.zeros((n_cells + 1,), jnp.int32).at[cid].add(jnp.int32(1))
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(n_slots, dtype=jnp.int32) - starts[cid_sorted]
    overflow = jnp.any(counts[:-1] > cap)

    ok = (rank < cap) & (cid_sorted < n_cells)
    addr_sorted = jnp.where(ok, cid_sorted * cap + rank, n_slots)
    addr = jnp.zeros((n_slots,), jnp.int32).at[order].set(addr_sorted)

    far = _far_template(n_slots, dim, dtype)

    def put(a, fill):
        if fill == "far":
            base = far
        else:
            base = jnp.full((n_slots + 1,) + a.shape[1:], fill, a.dtype)
        return base.at[addr].set(a)[:-1]

    positions = put(state.positions, "far")
    occupied = jnp.zeros((n_slots + 1,), bool).at[addr].set(occ)[:-1]
    nbrs = state.nbrs.replace(
        occupied=occupied,
        sorted_diam=put(state.diameters, 1),
        ref_positions=positions,
        overflow=state.nbrs.overflow | overflow,
    )
    return state.replace(
        positions=positions,
        velocities=put(state.velocities, 0),
        forces=put(state.forces, 0),
        images=put(state.images, 0),
        diameters=put(state.diameters, 1),
        pos_comp=put(state.pos_comp, 0),
        vel_comp=put(state.vel_comp, 0),
        nbrs=nbrs,
    )


def make_slot_step(params: Parameters, ensemble, engine: CellGridEngine,
                   compensated: bool = True):
    """Fused step over a slot-ordered state (see module docstring)."""
    is_nvt = isinstance(ensemble, NVT)
    is_brownian = isinstance(ensemble, Brownian)

    def maybe_rebin(state):
        disp = minimum_image(state.positions - state.nbrs.ref_positions,
                             state.unitcell, state.unitcell_inv)
        half_skin = 0.5 * engine.skin
        rebuild = jnp.any(jnp.sum(disp * disp, axis=-1)
                          > half_skin * half_skin)
        return jax.lax.cond(rebuild, lambda s: _rebin(s, engine),
                            lambda s: s, state)

    def masked_wrap(x, xc, images, occ, cell, cell_inv):
        # Vacant far rows must never fold into the box: zero their crossing
        # counts. Same compensated delta wrap as the particle-order step.
        frac = jnp.dot(x, cell_inv.T, precision=jax.lax.Precision.HIGHEST)
        n_cross = jnp.where(occ[:, None], jnp.floor(frac),
                            jnp.zeros_like(frac))
        delta = -jnp.dot(n_cross, cell.T, precision=jax.lax.Precision.HIGHEST)
        from mdtpu.utils.math import kahan_add

        if compensated:
            x, xc = kahan_add(x, xc, delta)
        else:
            x = x + delta
        return x, xc, images + n_cross.astype(images.dtype)

    def step(state: SimulationState) -> SimulationState:
        dtype = state.positions.dtype
        dt = jnp.asarray(params.dt, dtype)
        half = 0.5 * dt
        cell, cell_inv = state.unitcell, state.unitcell_inv

        state = maybe_rebin(state)
        occ = state.nbrs.occupied

        if is_brownian:
            energy, virial, forces, nbrs = engine.compute_slots(
                state.positions, state.diameters, cell, cell_inv, state.nbrs)
            ktemp = jnp.asarray(ensemble.ktemp, dtype)
            key_step = jax.random.fold_in(state.key, state.step)
            u = jax.random.uniform(key_step, state.positions.shape,
                                   dtype=dtype)
            noise = jnp.where(occ[:, None], (2.0 * u - 1.0) * SQRT3, 0.0)
            dx = forces * (dt / ktemp) + noise * jnp.sqrt(2.0 * dt)
            x, xc = _add(state.positions, state.pos_comp, dx, compensated)
            x, xc, images = masked_wrap(x, xc, state.images, occ, cell,
                                        cell_inv)
            take = (state.step % 10) == 0
            return state.replace(
                positions=x, forces=forces, images=images,
                step=state.step + 1, energy=energy, virial=virial,
                temperature=ktemp, pos_comp=xc, nbrs=nbrs,
                virial_accum=state.virial_accum
                + jnp.where(take, virial, 0.0).astype(state.virial_accum.dtype),
                nprom=state.nprom + take.astype(state.nprom.dtype),
            )

        v, vc = _add(state.velocities, state.vel_comp, state.forces * half,
                     compensated)
        x, xc = _add(state.positions, state.pos_comp, v * dt, compensated)
        x, xc, images = masked_wrap(x, xc, state.images, occ, cell, cell_inv)

        energy, virial, forces, nbrs = engine.compute_slots(
            x, state.diameters, cell, cell_inv, state.nbrs)

        v, vc = _add(v, vc, forces * half, compensated)

        step_1indexed = state.step + 1
        if is_nvt:
            ktemp_t = ensemble.ktemp(step_1indexed)
            key_step = jax.random.fold_in(state.key, state.step)
            v = bussi_rescale(key_step, v, ktemp_t, state.nf, dt,
                              ensemble.tau)
            if compensated:
                vc = jnp.zeros_like(vc)
        temperature = compute_temperature(v, state.nf)

        return state.replace(
            positions=x, velocities=v, forces=forces, images=images,
            step=step_1indexed, energy=energy, virial=virial,
            temperature=temperature, pos_comp=xc, vel_comp=vc, nbrs=nbrs,
        )

    return step
