"""Sharded simulation driver: run_simulation over a device mesh.

The multi-chip analog of mdtpu.sim.driver.run_simulation
(/root/reference/src/simulation.jl:40-178's role): the fused
shard_map step (halo-exchange cell-grid engine) advances between output
events, and particle migration (reshard) happens at a fixed cadence of
event boundaries — spatial domain decomposition with deterministic,
collective-free control flow inside the hot loop.

Scope notes vs the single-device driver: thermo output is format-identical
(energy/virial/temperature are replicated scalars); trajectory frames are
written from the *currently valid* rows, whose order changes when particles
migrate between slabs at reshard boundaries (particle identity is not
tracked across reshards yet), so per-particle time series should use the
single-device driver. Checkpointing the padded state round-trips exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import box_volume
from mdtpu.core.types import Brownian, Parameters, SimulationState
from mdtpu.parallel.halo import (
    HaloCellGridEngine,
    allocate_sharded,
    pad_state,
    reshard,
)
from mdtpu.parallel.mesh import make_mesh
from mdtpu.parallel.sharded import make_shard_map_step, shard_state
from mdtpu.sim.driver import THERMO_HEADER, open_files


def run_simulation_sharded(
    state: SimulationState,
    params: Parameters,
    ensemble,
    total_steps: int,
    frequency: int,
    pathname: str,
    *,
    mesh=None,
    engine: Optional[HaloCellGridEngine] = None,
    n_devices: Optional[int] = None,
    reshard_every: Optional[int] = None,
    margin: float = 0.3,
    compensated: bool = True,
    thermo_name: str = "thermo.txt",
) -> SimulationState:
    """Run ``total_steps`` over the mesh; returns the final PADDED state
    (use ``valid_rows`` to extract particles).

    ``reshard_every``: migrate particles to their owner slabs every this many
    steps (default: ``frequency``). Between reshards particles may drift up
    to skin/2 (monitored by the engine's overflow flag, re-checked at every
    event boundary — a flagged segment triggers an immediate reshard and a
    warning, mirroring the single-device capacity-grow recovery).
    """
    if mesh is None:
        mesh = make_mesh(n_devices)
    n = state.n_particles
    if engine is None:
        engine = HaloCellGridEngine.create(
            params.potential, float(state.cutoff), 0.3,
            np.asarray(state.unitcell), n, n_shards=mesh.devices.size)

    _, thermo_file = open_files(pathname, "unused.traj", thermo_name)
    with open(thermo_file, "a") as io:
        io.write(THERMO_HEADER)

    volume = float(box_volume(state.unitcell))
    dim = state.dimension
    density = float(params.density)
    potential = params.potential
    e_lrc = float(potential.energy_lrc(n, volume))
    p_lrc = float(potential.pressure_lrc(n, volume))
    is_brownian = isinstance(ensemble, Brownian)

    def do_reshard(s):
        s, overflow = reshard(s, engine)
        if bool(overflow):
            raise RuntimeError(
                "slab capacity overflow during reshard — increase margin")
        s = allocate_sharded(shard_state(s, mesh), engine, mesh)
        return s

    if state.nbrs is not None and not hasattr(state.nbrs, "addr"):
        state = state.replace(nbrs=None)
    padded = pad_state(state, engine, margin=margin)
    sh = do_reshard(padded)

    # Initial forces (the first half-kick must not use zeros; same deliberate
    # fix as the single-device driver).
    if not is_brownian:
        from jax.sharding import PartitionSpec as P

        ax = engine.axis_name
        forces_fn = jax.jit(jax.shard_map(
            lambda x, d, c, ci, nb: engine.compute(x, d, c, ci, nb)[:3],
            mesh=mesh,
            in_specs=(P(ax), P(ax), P(), P(), engine.nbrs_partition_specs()),
            out_specs=(P(), P(), P(ax)),
            check_vma=False,
        ))
        e0, w0, f0 = forces_fn(sh.positions, sh.diameters, sh.unitcell,
                               sh.unitcell_inv, sh.nbrs)
        sh = sh.replace(forces=f0, energy=e0, virial=w0)

    step = make_shard_map_step(params, ensemble, engine, mesh,
                               compensated=compensated,
                               state_cutoff=float(state.cutoff))

    @jax.jit
    def advance(s, k):
        return jax.lax.fori_loop(0, k, lambda i, x: step(x), s)

    if reshard_every is None:
        reshard_every = frequency

    start_step = int(sh.step)
    end_step = start_step + total_steps
    events = sorted(set(
        list(range(start_step, end_step, frequency))
        + list(range(start_step, end_step, reshard_every))))
    since_reshard = 0

    current = start_step
    for ev in events:
        n_adv = ev - current + 1
        sh = advance(sh, n_adv)
        current = ev + 1
        since_reshard += n_adv
        flagged = bool(sh.nbrs.overflow)
        if flagged or since_reshard >= reshard_every:
            sh = do_reshard(sh)
            since_reshard = 0
            if flagged:
                # Re-establish forces after the emergency rebuild.
                if not is_brownian:
                    e0, w0, f0 = forces_fn(sh.positions, sh.diameters,
                                           sh.unitcell, sh.unitcell_inv,
                                           sh.nbrs)
                    sh = sh.replace(forces=f0, energy=e0, virial=w0)
        if (ev - start_step) % frequency == 0:
            e = float(sh.energy)
            t = float(sh.temperature)
            if is_brownian:
                nprom = max(int(sh.nprom), 1)
                ener = e / n
                pressure = float(sh.virial_accum) / (dim * nprom * volume) \
                    + density * float(ensemble.ktemp)
                t = float(ensemble.ktemp)
            else:
                ener = (e + e_lrc) / n
                pressure = float(sh.virial) / (dim * volume) + density * t \
                    + p_lrc
            with open(thermo_file, "a") as io:
                io.write(f"{ev} {ener:.6f} {t:.6f} {pressure:.6f}\n")

    if current < end_step:
        sh = advance(sh, end_step - current)
    return sh


def valid_rows(state: SimulationState, engine: HaloCellGridEngine):
    """Boolean mask of real (non-pad) rows of a padded sharded state."""
    trash = engine.mx * engine.grid[1] * engine.grid[2] * engine.cell_capacity
    return np.asarray(state.nbrs.addr) < trash
