"""Sharded simulation driver: run_simulation over a device mesh.

The multi-chip analog of mdtpu.sim.driver.run_simulation
(/root/reference/src/simulation.jl:40-178's role), built on the slot-layout
halo engine (:class:`~mdtpu.parallel.halo_slot.HaloSlotEngine`): the ENTIRE
state lives sharded in cell-sorted slot order, migration happens ON DEVICE
at every skin rebuild (exact dynamics, zero host resharding), and the event
loop is the SAME one as the single-device driver
(mdtpu.sim.driver._drive_events — batched thermo events in one scanned
call, packed row pulls, restore-and-rerun overflow recovery,
divergence/particle-loss raises).

Output parity with the single-device driver: thermo rows, LAMMPS trajectory
frames, log-spaced snapshots, final.xyz, optional zstd compression and
checkpoint/resume are all format-identical
(/root/reference/src/simulation.jl:118-171,11-36). Particle identity is
carried through every on-device migration by the ids rows, so trajectory
rows come back in ORIGINAL particle order even as particles cross slabs;
checkpoints and the returned final state are ordinary (N, d) particle-order
states.

The superseded row-layout / all-gather / GSPMD paths live in
:mod:`mdtpu.parallel.experimental` and are not reachable from here.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import box_volume
from mdtpu.core.types import Brownian, Parameters, SimulationState
from mdtpu.parallel.halo_slot import HaloSlotEngine
from mdtpu.parallel.mesh import make_mesh
from mdtpu.sim.driver import finalize_simulation


def run_simulation_sharded(
    state: SimulationState,
    params: Parameters,
    ensemble,
    total_steps: int,
    frequency: int,
    pathname: str,
    *,
    mesh=None,
    engine: Optional[HaloSlotEngine] = None,
    n_devices: Optional[int] = None,
    compensated: bool = True,
    traj_name: str = "trajectory.xyz",
    thermo_name: str = "thermo.txt",
    compress: bool = False,
    log_times: bool = False,
    checkpoint_every: Optional[int] = None,
    precision: str = "auto",
    traj_frequency: Optional[int] = None,
    perf_log: bool = False,
) -> SimulationState:
    """Run ``total_steps`` over the mesh; returns the final state in
    ordinary (N, d) particle order (same contract as ``run_simulation``).

    ``engine``: a :class:`~mdtpu.parallel.halo_slot.HaloSlotEngine` (default
    ``HaloSlotEngine.create_tuned`` over the mesh size, including the
    large-N plane-scan auto-switch). ``precision``: as in
    ``run_simulation`` — 'auto' runs the f32x2 hi/lo pair sweep for f32
    NVE runs."""
    from mdtpu.core.types import NVE
    from mdtpu.parallel.halo_slot import (build_sharded_slot_state,
                                          make_sharded_slot_advance,
                                          unshard_slot_state)
    from mdtpu.sim.driver import (_drive_events, _event_schedule,
                                  _frame_capacity, _make_batch_advance,
                                  prepare_output_files)

    if mesh is None:
        mesh = make_mesh(n_devices)
    n = state.n_particles
    if engine is None:
        engine = HaloSlotEngine.create_tuned(
            params.potential, float(state.cutoff), np.asarray(state.unitcell),
            n, n_shards=mesh.devices.size,
            diameters=np.asarray(state.diameters))
    elif not isinstance(engine, HaloSlotEngine):
        raise TypeError(
            f"run_simulation_sharded drives the slot-layout HaloSlotEngine "
            f"only (got {type(engine).__name__}); the superseded row-layout "
            f"and all-gather engines live in mdtpu.parallel.experimental "
            f"and must be driven manually")
    if precision not in ("auto", "f32x2", "plain"):
        raise ValueError(
            f"precision must be auto/f32x2/plain, got {precision!r}")
    hilo = (precision == "f32x2"
            or (precision == "auto" and isinstance(ensemble, NVE)
                and state.positions.dtype == jnp.float32))

    volume = float(box_volume(state.unitcell))
    dim = state.dimension
    density = float(params.density)
    potential = params.potential
    e_lrc = float(potential.energy_lrc(n, volume))
    p_lrc = float(potential.pressure_lrc(n, volume))
    is_brownian = isinstance(ensemble, Brownian)
    # Run-constant diameters, host-side in original particle order (the
    # state is still particle-ordered here) — row events never transfer them.
    diameters_np = np.asarray(state.diameters)

    if state.nbrs is not None:
        state = state.replace(nbrs=None)

    def build_sharded(particle_state, engine):
        """Global slotify + shard, growing capacity until the binning fits.
        Only CapacityOverflowError triggers a grow — slotify's explanatory
        ValueErrors (uniform-sigma mismatch, far-ramp slot budget) must
        reach the user, and growing makes the budget case strictly worse."""
        from mdtpu.integrate.slot_step import CapacityOverflowError

        for _ in range(8):
            try:
                return build_sharded_slot_state(particle_state, engine,
                                                mesh), engine
            except CapacityOverflowError:
                engine = engine.with_grown_capacity()
        raise RuntimeError("cell capacity still overflowing after 8 grows")

    sh, engine = build_sharded(state, engine)
    spec_state = sh  # pytree structure only (slot_state_specs); any rebuild
    # after a capacity grow has the same structure.

    # Output files open only after everything above that can raise
    # (slotify's uniform-sigma/slot-budget validations inside
    # build_sharded) — a call that never runs a step must not touch a
    # previous run's data.
    trajectory_file, thermo_file, traj_writer, _ = prepare_output_files(
        pathname, traj_name, thermo_name, int(state.step), compress)

    def build_advance(engine):
        # n is part of the key (same rationale as _ADVANCE_CACHE): the
        # batch advance bakes jnp.nonzero(size=n) into its output-row
        # packing, so reusing it across particle counts (same engine for
        # nearby N) would truncate or duplicate trajectory rows.
        key = (params, ensemble, engine, mesh, compensated, hilo,
               is_brownian, n)
        try:
            cached = _SHARDED_ADVANCE_CACHE.get(key)
        except TypeError:
            key, cached = None, None
        if cached is not None:
            return cached
        fn = _make_batch_advance(
            make_sharded_slot_advance(params, ensemble, engine, mesh,
                                      spec_state, compensated=compensated,
                                      hilo=hilo),
            True, is_brownian, n, dim, _frame_capacity(n, dim))
        if key is not None:
            _SHARDED_ADVANCE_CACHE[key] = fn
        return fn

    def grow_engine(engine):
        return engine.with_grown_capacity()

    def restore(seg_start, engine):
        from mdtpu.integrate.slot_step import CapacityOverflowError

        try:
            return build_sharded_slot_state(
                unshard_slot_state(seg_start), engine, mesh)
        except CapacityOverflowError:
            return None  # initial binning still too tight: grow again

    start_step = int(sh.step)
    end_step = start_step + total_steps
    thermo_steps, traj_steps, snap_set = _event_schedule(
        start_step, total_steps, frequency, traj_frequency, log_times,
        pathname)

    sh, engine, _ = _drive_events(
        sh, engine, build_advance(engine),
        build_advance=build_advance,
        grow_engine=grow_engine,
        restore=restore,
        to_particle_state=unshard_slot_state,
        use_slot=True, is_brownian=is_brownian, ensemble=ensemble,
        n=n, dim=dim, volume=volume, density=density,
        e_lrc=e_lrc, p_lrc=p_lrc, diameters_np=diameters_np,
        start_step=start_step, end_step=end_step,
        thermo_steps=thermo_steps, traj_steps=traj_steps, snap_set=snap_set,
        checkpoint_every=checkpoint_every, pathname=pathname,
        thermo_file=thermo_file, traj_writer=traj_writer, perf_log=perf_log,
        # Strict dispatch-complete alternation: queuing a second sharded
        # execution before the first finishes deadlocks CPU-mesh
        # collectives (the 8-virtual-device test envs), and the per-batch
        # host work the lookahead hides is single-chip tunnel physics.
        pipeline=False)

    final = unshard_slot_state(sh)
    finalize_simulation(trajectory_file, pathname, end_step, final,
                        compress=False)
    return final


_SHARDED_ADVANCE_CACHE: dict = {}
