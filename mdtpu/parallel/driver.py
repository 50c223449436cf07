"""Sharded simulation driver: run_simulation over a device mesh.

The multi-chip analog of mdtpu.sim.driver.run_simulation
(/root/reference/src/simulation.jl:40-178's role): the fused
shard_map step (halo-exchange cell-grid engine) advances between output
events, and particle migration (reshard) happens at a fixed cadence of
event boundaries — spatial domain decomposition with deterministic,
collective-free control flow inside the hot loop.

Output parity with the single-device driver: thermo rows, LAMMPS trajectory
frames, log-spaced snapshots, final.xyz, optional zstd compression and
checkpoint/resume are all format-identical
(/root/reference/src/simulation.jl:118-171,11-36). Particle identity is
carried through every reshard by an ``ids`` row (pad_state/reshard in
mdtpu.parallel.halo), so trajectory rows come back in ORIGINAL particle
order even as particles migrate between slabs; checkpoints and the returned
final state are ordinary (N, d) particle-order states (unpad_state).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import box_volume
from mdtpu.core.types import Brownian, Parameters, SimulationState
from mdtpu.io.lammps import write_lammps_frame
from mdtpu.parallel.halo import (
    HaloCellGridEngine,
    allocate_sharded,
    pad_state,
    reshard,
    unpad_state,
)
from mdtpu.parallel.mesh import make_mesh
from mdtpu.parallel.sharded import make_shard_map_step, shard_state
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
    engine=None,
    n_devices: Optional[int] = None,
    reshard_every: Optional[int] = None,
    margin: float = 0.3,
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

    The default engine is the slot-layout halo engine
    (:class:`~mdtpu.parallel.halo_slot.HaloSlotEngine`) — the multi-chip
    production path: migration happens ON DEVICE at every skin rebuild
    (exact dynamics, no host resharding). Pass a
    :class:`~mdtpu.parallel.halo.HaloCellGridEngine` to use the row-layout
    engine with driver-cadence resharding instead (``reshard_every``:
    default ``frequency``; between reshards particles may drift up to
    skin/2, monitored by the overflow flag — a flagged segment triggers an
    emergency reshard and a warning).

    ``precision``: as in ``run_simulation`` — 'auto' runs the f32x2 hi/lo
    pair sweep for f32 NVE runs on the slot engine."""
    from mdtpu.parallel.halo_slot import HaloSlotEngine

    if state.dimension == 2 and engine is not None and \
            not isinstance(engine, HaloSlotEngine):
        raise NotImplementedError(
            "the row-layout HaloCellGridEngine is 3D-only; 2D sharding "
            "runs on the slot-layout HaloSlotEngine (the default)")
    if mesh is None:
        mesh = make_mesh(n_devices)
    n = state.n_particles
    if engine is None:
        engine = HaloSlotEngine.create_tuned(
            params.potential, float(state.cutoff), np.asarray(state.unitcell),
            n, n_shards=mesh.devices.size,
            diameters=np.asarray(state.diameters))
    if isinstance(engine, HaloSlotEngine):
        return _run_sharded_slot(
            state, params, ensemble, total_steps, frequency, pathname,
            mesh=mesh, engine=engine, compensated=compensated,
            traj_name=traj_name, thermo_name=thermo_name, compress=compress,
            log_times=log_times, checkpoint_every=checkpoint_every,
            precision=precision, traj_frequency=traj_frequency,
            perf_log=perf_log)

    # Row-layout legacy path from here down. Fail loudly on options it
    # cannot honor (the slot path above handles them); validate BEFORE
    # the output files are touched.
    if precision not in ("auto", "f32x2", "plain"):
        raise ValueError(
            f"precision must be auto/f32x2/plain, got {precision!r}")
    if precision == "f32x2":
        raise ValueError(
            "precision='f32x2' (the hi/lo pair sweep) requires the "
            "slot-layout halo engine (the default HaloSlotEngine); the "
            "row-layout HaloCellGridEngine has no hi/lo sweep")

    volume = float(box_volume(state.unitcell))
    dim = state.dimension
    density = float(params.density)
    potential = params.potential
    e_lrc = float(potential.energy_lrc(n, volume))
    p_lrc = float(potential.pressure_lrc(n, volume))
    is_brownian = isinstance(ensemble, Brownian)
    trash = engine.mx * engine.grid[1] * engine.grid[2] * engine.cell_capacity

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

    # Jitted programs cached across run calls (rebuilding the closures
    # re-traces and re-compiles the fused sharded program — ~60 s each on
    # the remote TPU tunnel; same rationale as _ADVANCE_CACHE /
    # _SHARDED_ADVANCE_CACHE).
    forces_fn, advance, event_scalars, output_rows = _row_programs(
        params, ensemble, engine, mesh, compensated, float(state.cutoff),
        n, trash)

    # Initial forces (the first half-kick must not use zeros; same deliberate
    # fix as the single-device driver).
    if not is_brownian:
        e0, w0, f0 = forces_fn(sh.positions, sh.diameters, sh.unitcell,
                               sh.unitcell_inv, sh.nbrs)
        sh = sh.replace(forces=f0, energy=e0, virial=w0)

    # Diameters are run-constant: keep them host-side in original particle
    # order, never transfer them per event (same rule as the slot driver).
    diameters_np = np.asarray(state.diameters)

    # Output files are opened only after everything above that can raise
    # (option validation, the initial reshard's slab-overflow check) — a
    # call that never runs a step must not touch a previous run's data.
    from mdtpu.sim.driver import prepare_output_files

    trajectory_file, thermo_file, traj_writer, _ = prepare_output_files(
        pathname, traj_name, thermo_name, int(state.step), compress)

    def host_rows(s):
        """Pull valid rows to the host in original particle order."""
        from mdtpu.integrate.slot_step import join_id_rows

        rows = np.asarray(output_rows(s))    # the ONE row transfer
        if rows.shape[0] == 2 * dim + 2:     # f32 hi/lo id rows
            ids = join_id_rows(rows[2 * dim], rows[2 * dim + 1],
                               out_dtype=np.int64)
        else:
            ids = join_id_rows(rows[2 * dim], out_dtype=np.int64)
        order = np.argsort(ids)
        if ids[order[0]] < 0 or np.unique(ids).size != n:
            raise RuntimeError(
                f"sharded state does not hold all {n} particles — "
                f"slab/capacity overflow recovery failed")
        pos = rows[0:dim].T[order]
        img = rows[dim:2 * dim].T[order].astype(np.int32)
        return pos, img, diameters_np

    if reshard_every is None:
        reshard_every = frequency

    from mdtpu.sim.driver import _event_schedule, _thermo_values

    start_step = int(sh.step)
    end_step = start_step + total_steps
    thermo_steps, traj_steps, snap_set = _event_schedule(
        start_step, total_steps, frequency, traj_frequency, log_times,
        pathname)
    # Checkpoints are their OWN events, not a filter on the output events
    # (same contract as _drive_events: 'ev % checkpoint_every == 0' at
    # existing events silently writes far fewer checkpoints than asked
    # whenever the cadences don't align).
    checkpoint_steps = set()
    if checkpoint_every is not None:
        checkpoint_steps = set(
            range(start_step + (-start_step) % checkpoint_every,
                  end_step, checkpoint_every))
    events = sorted(
        s for s in (thermo_steps | traj_steps | snap_set | checkpoint_steps
                    | set(range(start_step, end_step, reshard_every)))
        if s >= start_step and s < end_step)
    since_reshard = 0

    meter = None
    if perf_log:
        from mdtpu.utils.profiling import StepRateMeter

        meter = StepRateMeter(os.path.join(pathname, "perf.txt"),
                              append=start_step > 0)

    current = start_step
    try:
        for ev in events:
            n_adv = ev - current + 1
            sh = advance(sh, n_adv)
            current = ev + 1
            since_reshard += n_adv
            vec = np.asarray(event_scalars(sh))  # ONE scalar transfer
            if meter is not None:
                meter.tick(ev, n_adv)
            if not bool(vec[6]):
                raise RuntimeError(
                    f"non-finite positions at step {ev}: the run diverged "
                    f"(beyond-cutoff pairs contribute exact zeros, so "
                    f"energies may still read 0.0) — reduce dt")
            if int(vec[7]) != n:
                raise RuntimeError(
                    f"sharded state holds {int(vec[7])} of {n} particles at "
                    f"step {ev} — slab/capacity overflow recovery failed")
            flagged = bool(vec[5])
            if flagged or since_reshard >= reshard_every:
                if flagged:
                    import warnings

                    warnings.warn(
                        f"halo staleness/capacity flag in segment ending "
                        f"step {ev}: emergency reshard (consider a smaller "
                        f"reshard_every or larger skin)")
                sh = do_reshard(sh)
                since_reshard = 0
                if flagged:
                    # Re-establish forces after the emergency rebuild.
                    if not is_brownian:
                        e0, w0, f0 = forces_fn(sh.positions, sh.diameters,
                                               sh.unitcell, sh.unitcell_inv,
                                               sh.nbrs)
                        sh = sh.replace(forces=f0, energy=e0, virial=w0)
            is_thermo = ev in thermo_steps
            wants_rows = ev in traj_steps or ev in snap_set
            if is_thermo:
                ener, t, pressure = _thermo_values(
                    float(vec[0]), float(vec[1]), vec[2], vec[3], vec[4],
                    is_brownian=is_brownian, ensemble=ensemble, n=n, dim=dim,
                    volume=volume, density=density, e_lrc=e_lrc, p_lrc=p_lrc)
                if is_brownian:
                    # Reset accumulators after output
                    # (/root/reference/src/simulation.jl:266).
                    sh = sh.replace(
                        virial_accum=jnp.zeros_like(sh.virial_accum),
                        nprom=jnp.zeros_like(sh.nprom))
                with open(thermo_file, "a") as io:
                    io.write(f"{ev} {ener:.6f} {t:.6f} {pressure:.6f}\n")
            if wants_rows:
                pos, img, diam = host_rows(sh)
                cell_np = np.asarray(sh.unitcell)
                if ev in traj_steps:
                    traj_writer.write_frame(ev, cell_np, pos, img, diam)
                if ev in snap_set:
                    write_lammps_frame(
                        os.path.join(pathname, f"snapshot.{ev}"), ev,
                        cell_np, pos, img, diam, mode="w")
            if ev in checkpoint_steps:
                from mdtpu.io.checkpoint import save_checkpoint

                save_checkpoint(unpad_state(sh, engine),
                                os.path.join(pathname,
                                             f"checkpoint.{ev}.npz"))

        if current < end_step:
            # Tail past the last output event: the same staleness/escape
            # check as every in-loop segment (the final state must not have
            # been integrated with stale slab binning).
            sh = advance(sh, end_step - current)
            if bool(sh.nbrs.overflow):
                import warnings

                warnings.warn(
                    f"halo staleness/capacity flag in the tail segment "
                    f"ending step {end_step}: emergency reshard")
                sh = do_reshard(sh)
    finally:
        # A mid-run raise (divergence, particle loss, reshard overflow) must
        # not lose the frames already buffered in the async writer — they
        # are the trajectory tail one debugs the failure with (same contract
        # as _drive_events).
        import sys

        try:
            traj_writer.close()
        except Exception:
            # Don't mask an in-flight exception with a close failure; with
            # no exception active, a failed disk write must surface.
            if sys.exc_info()[0] is None:
                raise

    final = unpad_state(sh, engine)
    finalize_simulation(trajectory_file, pathname, end_step, final,
                        compress=False)
    return final


def valid_rows(state: SimulationState, engine: HaloCellGridEngine):
    """Boolean mask of real (non-pad) rows of a padded sharded state."""
    trash = engine.mx * engine.grid[1] * engine.grid[2] * engine.cell_capacity
    return np.asarray(state.nbrs.addr) < trash


_ROW_PROGRAM_CACHE: dict = {}


def _row_programs(params, ensemble, engine, mesh, compensated, cutoff,
                  n, trash):
    """(forces_fn, advance, event_scalars, output_rows) for the row-layout
    sharded loop, cached across run_simulation_sharded calls."""
    from jax.sharding import PartitionSpec as P

    key = None
    try:
        key = (params, ensemble, engine, compensated, cutoff, n, trash,
               tuple(d.id for d in mesh.devices.flat))
        cached = _ROW_PROGRAM_CACHE.get(key)
        if cached is not None:
            return cached
    except TypeError:
        key = None  # unhashable potential: rebuild per call

    ax = engine.axis_name
    forces_fn = jax.jit(jax.shard_map(
        lambda x, d, c, ci, nb: engine.compute(x, d, c, ci, nb)[:3],
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(), P(), engine.nbrs_partition_specs()),
        out_specs=(P(), P(), P(ax)),
        check_vma=False,
    ))
    step = make_shard_map_step(params, ensemble, engine, mesh,
                               compensated=compensated,
                               state_cutoff=cutoff)

    @jax.jit
    def advance(s, k):
        return jax.lax.fori_loop(0, k, lambda i, x: step(x), s)

    @jax.jit
    def event_scalars(s):
        """ONE device vector per event (the tunnel charges per transfer):
        energy, temperature, virial, virial_accum, nprom, overflow, finite,
        particle count."""
        dt = s.positions.dtype
        finite = jnp.all(jnp.isfinite(
            jnp.where(s.nbrs.addr[:, None] < trash, s.positions, 0.0)))
        count = jnp.sum((s.nbrs.addr < trash).astype(jnp.int32))
        return jnp.stack([
            s.energy.astype(dt), s.temperature.astype(dt),
            s.virial.astype(dt),
            (s.virial_accum if s.virial_accum is not None
             else jnp.zeros((), dt)).astype(dt),
            (s.nprom if s.nprom is not None
             else jnp.zeros((), dt)).astype(dt),
            s.nbrs.overflow.astype(dt), finite.astype(dt),
            count.astype(dt)])

    @jax.jit
    def output_rows(s):
        """Positions/images/ids of the n real rows, compacted on device:
        one packed gather, ONE transfer (ids exact via hi/lo rows in f32,
        same encoding as the slot driver)."""
        from mdtpu.integrate.slot_step import split_id_rows

        dt = s.positions.dtype
        (idx,) = jnp.nonzero(s.nbrs.addr < trash, size=n,
                             fill_value=s.nbrs.addr.shape[0] - 1)
        rows = jnp.concatenate(
            [s.positions.T, s.images.astype(dt).T]
            + split_id_rows(s.ids, dt), axis=0)
        return jnp.take(rows, idx, axis=1)

    out = (forces_fn, advance, event_scalars, output_rows)
    if key is not None:
        _ROW_PROGRAM_CACHE[key] = out
    return out


_SHARDED_ADVANCE_CACHE: dict = {}


def _run_sharded_slot(
    state: SimulationState,
    params: Parameters,
    ensemble,
    total_steps: int,
    frequency: int,
    pathname: str,
    *,
    mesh,
    engine,
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
    """Sharded driver over the slot-layout halo engine: the SAME event loop
    as the single-device driver (mdtpu.sim.driver._drive_events — batched
    thermo events in one scanned call, packed row pulls, restore-and-rerun
    overflow recovery, divergence/particle-loss raises), with the sharded
    slot advance inside. Migration is on-device (every rebin), so there is
    NO host resharding cadence at all; the per-shard overflow flags are
    max-reduced into the batch scalar vector on device."""
    from mdtpu.core.types import NVE
    from mdtpu.parallel.halo_slot import (build_sharded_slot_state,
                                          make_sharded_slot_advance,
                                          unshard_slot_state)
    from mdtpu.sim.driver import (_drive_events, _event_schedule,
                                  _make_batch_advance)

    n = state.n_particles
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
    from mdtpu.sim.driver import prepare_output_files

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
            True, is_brownian, n)
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
        thermo_file=thermo_file, traj_writer=traj_writer, perf_log=perf_log)

    final = unshard_slot_state(sh)
    finalize_simulation(trajectory_file, pathname, end_step, final,
                        compress=False)
    return final
