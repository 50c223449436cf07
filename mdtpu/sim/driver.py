"""Simulation driver: the analog of the reference's two ``run_simulation!``
methods (/root/reference/src/simulation.jl:40-178 MD, :181-308 Brownian).

TPU-first design — *event-segmented device loop*: the union of output steps
(every ``frequency`` plus optional log-spaced snapshots) is computed on the
host up front; between consecutive events the jitted ``advance(state, n)``
runs ``n`` fused steps under ``lax.fori_loop`` with a *traced* bound, so one
compilation serves every segment length and the device never syncs mid-
segment. Host I/O (thermo rows, LAMMPS frames, snapshots) happens only at
event boundaries: each event's arrays are pulled eagerly from the idle
device (measured faster than overlapping the pull with the next segment on
the remote-TPU tunnel — see the comment at the pull site), while the FILE
writes of the previous event overlap the next segment's compute.

File outputs are format-identical to the reference (thermo ``%d %.6f %.6f
%.6f`` rows, LAMMPS dump frames, final.xyz, optional zstd compression and
new-log-times.txt).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import box_volume
from mdtpu.core.types import Brownian, Parameters, SimulationState
from mdtpu.integrate.step import engine_forces, make_step
from mdtpu.io.lammps import write_lammps_frame
from mdtpu.io.xyz import write_xyz
from mdtpu.io.logtimes import generate_log_times

THERMO_HEADER = "# Step Energy Temperature Pressure\n"


def open_files(pathname, traj_name, thermo_name):
    """Delete stale outputs, return paths
    (/root/reference/src/io.jl:225-239)."""
    os.makedirs(pathname, exist_ok=True)
    trajectory_file = os.path.join(pathname, traj_name)
    thermo_file = os.path.join(pathname, thermo_name)
    for f in (trajectory_file, thermo_file):
        if os.path.isfile(f):
            os.remove(f)
    return trajectory_file, thermo_file


def finalize_simulation(trajectory_file, pathname, total_steps, state,
                        compress=False):
    """Write final.xyz and optionally zstd-compress the trajectory
    (/root/reference/src/simulation.jl:11-36)."""
    write_xyz(os.path.join(pathname, "final.xyz"), total_steps, state.unitcell,
              state.positions, state.diameters, mode="w")
    if compress and os.path.isfile(trajectory_file):
        from mdtpu.io.compress import compress_zstd

        compress_zstd(trajectory_file)


def _event_scalars(state):
    """All per-event output scalars (+ the overflow flag) as ONE device
    vector, computed inside the advance program: device transfers and
    jitted calls each cost a full RPC round trip on the remote tunnel
    (5-50 ms depending on load), so the event loop does exactly one call
    (advance, which also returns this vector) and one transfer per
    thermo-only event."""
    d = state.energy.dtype
    nbrs = state.nbrs
    ovf = (nbrs.overflow.astype(d)
           if nbrs is not None and hasattr(nbrs, "overflow")
           else jnp.zeros((), d))
    va = (state.virial_accum if state.virial_accum is not None
          else jnp.zeros((), d))
    nprom = (state.nprom if state.nprom is not None
             else jnp.zeros((), jnp.int32))
    return jnp.stack([state.energy, state.temperature, state.virial,
                      va.astype(d), nprom.astype(d), ovf])


def _with_scalars(adv):
    """advance(state, k) -> (state, event-scalar vector), one jitted call."""
    @jax.jit
    def advance(state, n_steps):
        out = adv(state, n_steps)
        return out, _event_scalars(out)

    return advance


def _make_advance(step_fn):
    def adv(state, n_steps):
        return jax.lax.fori_loop(0, n_steps, lambda i, s: step_fn(s), state)

    return _with_scalars(adv)


def run_simulation(
    state: SimulationState,
    params: Parameters,
    ensemble,
    total_steps: int,
    frequency: int,
    pathname: str,
    *,
    traj_name: str = "trajectory.xyz",
    thermo_name: str = "thermo.txt",
    compress: bool = False,
    log_times: bool = False,
    engine=None,
    compensated: bool = True,
    checkpoint_every: Optional[int] = None,
    perf_log: bool = False,
    precision: str = "auto",
    traj_frequency: Optional[int] = None,
) -> SimulationState:
    """Run ``total_steps`` of dynamics, writing thermo + trajectory every
    ``frequency`` steps (labels and ordering match the reference: outputs for
    step label ``s`` are written after executing loop iteration ``s``,
    including s = 0). Returns the final state.

    ``precision``: pair-sweep precision on the slot fast path.
      * ``"auto"`` (default): the f32x2 hi/lo pair sweep for f32 NVE runs —
        the mode that passes the NVE drift gate (<1e-4 per 1e6 steps) at
        ~full f32 speed (gates.py 'f32x2', BENCH_NOTES) — plain sweep
        otherwise (NVT/Brownian inject stochastic noise far above the
        coordinate-rounding floor, so the extra precision buys nothing).
      * ``"f32x2"``: force the hi/lo sweep on.
      * ``"plain"``: force it off.
    The reference has exactly ONE user entry point carrying its fidelity
    guarantees (/root/reference/src/simulation.jl:40); this knob keeps the
    gate-passing mode on the same public path.

    ``traj_frequency``: write trajectory frames every this many steps
    (default: ``frequency``, the reference contract where thermo and
    trajectory share a cadence, /root/reference/src/simulation.jl:118-151).
    Setting it larger makes intermediate thermo events pull only the five
    thermo scalars from the device instead of full particle rows — on a
    remote-tunnel TPU that host pull dominates high-frequency output cost."""
    from mdtpu.ops import select_engine

    if engine is None:
        engine = select_engine(params.potential, state.cutoff, state)

    trajectory_file, thermo_file = open_files(pathname, traj_name, thermo_name)
    with open(thermo_file, "a") as io:
        io.write(THERMO_HEADER)

    # Async trajectory writer (C++ background thread when available). With
    # compress=True the zstd stream is written directly — same end state as
    # the reference's compress-then-delete (trajectory.xyz.zst, no plain
    # file), without the 2x disk and post-pass.
    from mdtpu.io.native_writer import open_trajectory_writer

    traj_path = trajectory_file + ".zst" if compress else trajectory_file
    if os.path.isfile(traj_path):
        os.remove(traj_path)
    traj_writer = open_trajectory_writer(traj_path, compress=compress)

    is_brownian = isinstance(ensemble, Brownian)
    potential = params.potential
    volume = float(box_volume(state.unitcell))
    dim = state.dimension
    n = state.n_particles
    density = float(params.density)
    e_lrc = float(potential.energy_lrc(n, volume))
    p_lrc = float(potential.pressure_lrc(n, volume))

    # Slot-space fast path: for the 3D cell-grid engine the whole state runs
    # in cell-sorted component-major slot order (no per-step scatter/gather,
    # rebuild hoisted out of the step, observable-free inner steps) —
    # measured 3.7x the particle-order step at the N=65k bench. Outputs and
    # the returned state are restored to original particle order via the
    # carried ids row.
    from mdtpu.ops.cell_grid import CellGridEngine

    use_slot = (isinstance(engine, CellGridEngine)
                and state.dimension == len(engine.grid)
                and state.dimension in (2, 3)
                and compensated)
    if precision not in ("auto", "f32x2", "plain"):
        raise ValueError(f"precision must be auto/f32x2/plain, got {precision!r}")
    from mdtpu.core.types import NVE

    hilo = use_slot and (
        precision == "f32x2"
        or (precision == "auto" and isinstance(ensemble, NVE)
            and state.positions.dtype == jnp.float32))
    if use_slot:
        from mdtpu.integrate.slot_step import (
            make_slot_advance, slot_forces, slotify, unslotify_state)

        def build_slot(particle_state, engine):
            """Slotify + initial forces, growing capacity until the initial
            binning fits (an overflowing slotify would silently drop rows to
            the trash column — the same loss mode the in-run restore-and-
            rerun below guards against)."""
            for _ in range(8):
                s = slot_forces(slotify(particle_state, engine), engine)
                if not bool(s.nbrs.overflow):
                    return s, engine
                engine = engine.with_grown_capacity()
            raise RuntimeError("cell capacity still overflowing after 8 grows")

        state, engine = build_slot(state, engine)
        advance = _with_scalars(make_slot_advance(params, ensemble, engine,
                                                  compensated=compensated,
                                                  hilo=hilo))
        step_fn = None
    else:
        # Materialise engine state + initial forces (deliberate fix: the
        # reference's first half-kick uses zero forces).
        if state.nbrs is None:
            nbrs = engine.allocate(state.positions, state.diameters,
                                   state.unitcell, state.unitcell_inv)
            state = state.replace(nbrs=nbrs)
        if not is_brownian:
            e0, w0, f0, nbrs = engine_forces(engine, state.positions,
                                             state.diameters, state.unitcell,
                                             state.unitcell_inv, state.nbrs)
            state = state.replace(forces=f0, energy=e0, virial=w0, nbrs=nbrs)

        step_fn = make_step(params, ensemble, engine, compensated=compensated)
        advance = _make_advance(step_fn)

    start_step = int(state.step)

    # --- Event schedule (host-side) -------------------------------------
    snap_set = set()
    if log_times:
        snaps = generate_log_times(save_dir=pathname, max_step=total_steps)
        snap_set = set([0] + [s for s in snaps if s < start_step + total_steps])
    thermo_steps = set(
        s for s in range(start_step, start_step + total_steps) if s % frequency == 0
    )
    if traj_frequency is None:
        traj_frequency = frequency
    traj_steps = set(
        s for s in range(start_step, start_step + total_steps)
        if s % traj_frequency == 0
    )
    # Events strictly below start_step (possible with log_times on a resumed
    # state: snap_set always contains 0 plus log-times below start_step)
    # would rewind `current` and re-execute steps with wrong labels.
    event_steps = sorted(s for s in (thermo_steps | traj_steps | snap_set)
                         if s >= start_step)
    end_step = start_step + total_steps

    pending = None  # (step_label, host-fetch futures) from the previous event

    def flush(pending_item):
        if pending_item is None:
            return
        s, dev = pending_item
        has_rows = "positions" in dev
        if use_slot and has_rows:
            # Compact real rows, restore original particle order, and fold
            # the deferred-wrap residual drift for in-box output rows.
            from mdtpu.integrate.slot_step import _host_wrap

            occ = np.asarray(dev["occupied"])
            if int(occ.sum()) != n:
                # Backstop: the overflow flag + restore-and-rerun should make
                # this unreachable; losing rows silently corrupts the physics.
                raise RuntimeError(
                    f"slot state holds {int(occ.sum())} of {n} particles at "
                    f"step {s} — capacity overflow recovery failed")
            order = np.argsort(np.asarray(dev["ids"])[occ])
            dev = dict(dev)
            for name in ("positions", "images"):
                dev[name] = np.asarray(dev[name]).T[occ][order]
            dev["positions"], dev["images"] = _host_wrap(
                dev["positions"], dev["images"], dev["unitcell"])
            dev["diameters"] = np.asarray(dev["diameters"])[occ][order]
        e = float(dev["energy"])
        t = float(dev["temperature"])
        if is_brownian:
            # /root/reference/src/simulation.jl:259-266 — per-particle energy
            # without LRC, virial averaged over the 10-step samples.
            nprom = max(int(dev["nprom"]), 1)
            ener = e / n
            pressure = float(dev["virial_accum"]) / (dim * nprom * volume) \
                + density * float(ensemble.ktemp)
            t = float(ensemble.ktemp)
        else:
            # /root/reference/src/simulation.jl:118-131
            ener = (e + e_lrc) / n
            pressure = float(dev["virial"]) / (dim * volume) + density * t + p_lrc
        if s in thermo_steps:
            with open(thermo_file, "a") as io:
                io.write(f"{s} {ener:.6f} {t:.6f} {pressure:.6f}\n")
        if s in traj_steps:
            traj_writer.write_frame(s, dev["unitcell"], dev["positions"],
                                    dev["images"], dev["diameters"])
        if s in snap_set:
            write_lammps_frame(os.path.join(pathname, f"snapshot.{s}"), s,
                               dev["unitcell"], dev["positions"], dev["images"],
                               dev["diameters"], mode="w")

    def pull_event(state, vec, ev):
        """ONE packed scalar transfer per event (``vec`` is the device
        vector the advance call itself returned — see _event_scalars);
        particle rows ride along only when a trajectory frame or snapshot
        is actually written (the row pull is ~240 ms at N=65k on the
        tunnel)."""
        vec = np.asarray(vec)
        host = {"energy": vec[0], "temperature": vec[1], "virial": vec[2],
                "virial_accum": vec[3], "nprom": vec[4],
                "overflow": bool(vec[5])}
        if ev in traj_steps or ev in snap_set:
            dev = dict(positions=state.positions, images=state.images,
                       unitcell=state.unitcell, diameters=state.diameters)
            if use_slot:
                dev["occupied"] = state.nbrs.occupied
                dev["ids"] = state.ids
            host.update(jax.device_get(dev))
        return host

    def run_segment(state, engine, advance, step_fn, n_adv, ev):
        """Advance ``n_adv`` steps, pull the event data, and recover from
        engine capacity overflow (the fixed-shape analog of CellListMap's
        dynamic cell lists).

        Slot mode: an overflowing rebin scatters rows past cell capacity to
        the trash column — the particles would be PERMANENTLY lost (position,
        velocity, identity), silently corrupting the run. So the pre-segment
        state is kept, and on overflow the segment is restored and re-run
        with grown capacity; the replay is deterministic (per-step RNG is
        fold_in(key, step)), so no particle is ever lost and the recovered
        trajectory is the one an always-large-enough capacity would have
        produced.

        Particle-order engines (neighbor-list/cell overflow) never drop
        state rows — forces degrade transiently and recover fully on regrow
        — so those keep the cheaper grow-and-continue."""
        seg_start = state
        state, vec = advance(state, n_adv)
        host = pull_event(state, vec, ev)
        if not bool(host.get("overflow", False)):
            return state, engine, advance, step_fn, host
        if use_slot:
            import warnings

            for _ in range(8):
                engine = engine.with_grown_capacity()
                warnings.warn(
                    f"slot capacity overflow in segment ending step "
                    f"{int(state.step)}: restoring pre-segment state and "
                    f"re-running with cell capacity {engine.cell_capacity}")
                restored = slot_forces(
                    slotify(unslotify_state(seg_start), engine), engine)
                if bool(restored.nbrs.overflow):
                    continue  # initial binning still too tight: grow again
                advance = _with_scalars(make_slot_advance(
                    params, ensemble, engine, compensated=compensated,
                    hilo=hilo))
                state, vec = advance(restored, n_adv)
                host = pull_event(state, vec, ev)
                if not bool(host["overflow"]):
                    return state, engine, advance, step_fn, host
            raise RuntimeError(
                "cell capacity still overflowing after 8 grows")
        engine = engine.with_grown_capacity()
        nbrs = engine.allocate(state.positions, state.diameters,
                               state.unitcell, state.unitcell_inv)
        state = state.replace(nbrs=nbrs)
        step_fn = make_step(params, ensemble, engine, compensated=compensated)
        advance = _make_advance(step_fn)
        state, vec = advance(state, 0)
        return state, engine, advance, step_fn, pull_event(state, vec, ev)

    meter = None
    if perf_log:
        from mdtpu.utils.profiling import StepRateMeter

        meter = StepRateMeter(os.path.join(pathname, "perf.txt"))

    current = start_step
    for ev in event_steps:
        # Execute through loop iteration `ev` (i.e. ev - current + 1 steps),
        # pulling the event data in ONE eager device_get (measured faster
        # than overlapping the pull with the next segment's execution on
        # the remote tunnel — transfers contend with the running program's
        # RPC stream).
        n_adv = ev - current + 1
        state, engine, advance, step_fn, host = run_segment(
            state, engine, advance, step_fn, n_adv, ev)
        current = ev + 1
        if meter is not None:
            meter.tick(ev, n_adv)
        if is_brownian and ev in thermo_steps:
            # Reset accumulators after output
            # (/root/reference/src/simulation.jl:266).
            state = state.replace(
                virial_accum=jnp.zeros_like(state.virial_accum),
                nprom=jnp.zeros_like(state.nprom),
            )
        flush(pending)
        pending = (ev, host)
        if checkpoint_every is not None and ev % checkpoint_every == 0:
            from mdtpu.io.checkpoint import save_checkpoint

            ck_state = unslotify_state(state) if use_slot else state
            save_checkpoint(ck_state,
                            os.path.join(pathname, f"checkpoint.{ev}.npz"))

    if current < end_step:
        # The tail (steps past the last output event) runs through
        # run_segment too: a slot-capacity overflow here would otherwise
        # silently drop particles from final.xyz and the returned state.
        # end_step is never in the event sets, so only scalars are pulled
        # and the host dict is discarded.
        state, engine, advance, step_fn, _ = run_segment(
            state, engine, advance, step_fn, end_step - current, end_step)
    flush(pending)
    traj_writer.close()

    if use_slot:
        # Back to the public (N, d) particle-order layout for final.xyz and
        # the returned state (original particle order via ids). Re-allocate
        # particle-order engine state so the returned pytree matches what
        # the non-slot path returns (callers run it straight into jitted
        # loops whose carry structure must not change).
        state = unslotify_state(state)
        state = state.replace(nbrs=engine.allocate(
            state.positions, state.diameters, state.unitcell,
            state.unitcell_inv))

    # Compression already streamed into trajectory.xyz.zst above.
    finalize_simulation(trajectory_file, pathname, end_step, state,
                        compress=False)
    return state
