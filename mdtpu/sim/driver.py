"""Simulation driver: the analog of the reference's two ``run_simulation!``
methods (/root/reference/src/simulation.jl:40-178 MD, :181-308 Brownian).

TPU-first design — *event-batched device loop*: the union of output steps
(every ``frequency`` plus optional log-spaced snapshots) is computed on the
host up front and grouped into batches; one jitted call runs a ``lax.scan``
over the batch's per-event segment lengths (each segment a ``lax.fori_loop``
of fused steps with a *traced* bound, so a handful of bucket-padded
compilations serve every schedule) and returns the whole batch's thermo
scalars as ONE (K, 8) matrix. On the remote-TPU tunnel every jitted call
and every transfer pays a 5-50 ms RPC round trip, so the loop does exactly
one call + one small transfer per group of scalar-only events, and one
extra packed-array transfer at events that write particle rows (trajectory
frames / snapshots — a dict pull would pay one RPC per leaf). File writes
of the previous batch overlap the next batch's device execution; pulls stay
eager-after-block (overlapping transfers with execution measured slower on
the tunnel).

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


def _filter_thermo_rows(thermo_file, state_step):
    """Drop thermo rows labelled >= ``state_step`` in place (they belong to
    a LATER part of a previous invocation — a stale rerun of the same input
    state, or the post-crash tail of the very run now being resumed).
    Header/comment lines are kept."""
    try:
        with open(thermo_file) as f:
            lines = f.readlines()
    except OSError:
        return
    kept, dropped = [], 0
    for line in lines:
        s = line.strip()
        if s and not s.startswith("#"):
            try:
                if int(s.split()[0]) >= state_step:
                    dropped += 1
                    continue
            except ValueError:
                pass
        kept.append(line)
    if dropped:
        with open(thermo_file, "w") as f:
            f.writelines(kept)


def _copy_frames_below(line_iter, write, state_step):
    """Stream LAMMPS-dump lines, writing only frames whose TIMESTEP label is
    below ``state_step``. Returns (frames_kept, frames_dropped)."""
    kept = dropped = 0
    frame, keep, expect_step = [], True, False
    def flush():
        nonlocal kept, dropped
        if frame:
            if keep:
                write("".join(frame))
                kept += 1
            else:
                dropped += 1
    for line in line_iter:
        if line.startswith("ITEM: TIMESTEP"):
            flush()
            frame, keep, expect_step = [line], True, True
            continue
        if expect_step:
            expect_step = False
            try:
                keep = int(line.split()[0]) < state_step
            except (ValueError, IndexError):
                keep = True
        if frame:
            frame.append(line)
        else:
            write(line)
    flush()
    return kept, dropped


def _filter_trajectory_frames(traj_path, state_step, compressed):
    """Drop trajectory frames labelled >= ``state_step`` in place (see
    _filter_thermo_rows). Handles both the plain LAMMPS-dump file and the
    zstd-compressed stream the native writer appends to."""
    tmp = traj_path + ".resume-tmp"
    try:
        if compressed:
            import zstandard as zstd
            import io as _io

            with open(traj_path, "rb") as fin, open(tmp, "wb") as fout:
                reader = zstd.ZstdDecompressor().stream_reader(
                    fin, read_across_frames=True)
                with zstd.ZstdCompressor(level=3).stream_writer(
                        fout, closefd=False) as writer:
                    text = _io.TextIOWrapper(reader, encoding="utf-8",
                                             errors="replace")
                    _, dropped = _copy_frames_below(
                        text, lambda s: writer.write(s.encode()), state_step)
        else:
            with open(traj_path) as fin, open(tmp, "w") as fout:
                _, dropped = _copy_frames_below(fin, fout.write, state_step)
        if dropped:
            os.replace(tmp, traj_path)
        else:
            os.remove(tmp)
    except OSError:
        if os.path.isfile(tmp):
            os.remove(tmp)


def prepare_output_files(pathname, traj_name, thermo_name, state_step,
                         compress):
    """Open the run's thermo/trajectory outputs, reconciled with the state
    being run. A fresh state (step <= 0) truncates like the reference
    (/root/reference/src/io.jl:225-239 — it always starts at step 0). A
    RESUMED state (step > 0) keeps rows/frames labelled BELOW the state's
    step and appends after them: labels >= the step are either a stale
    rerun's duplicates or the post-crash tail of this very run — both are
    superseded by what the resumed run will rewrite — while the earlier
    rows are this run's history and deleting them would leave an
    inconsistent directory (snapshot.* files survive but thermo/trajectory
    restart mid-run).

    Returns (trajectory_file, thermo_file, traj_writer, resumed)."""
    os.makedirs(pathname, exist_ok=True)
    trajectory_file = os.path.join(pathname, traj_name)
    thermo_file = os.path.join(pathname, thermo_name)
    traj_path = trajectory_file + ".zst" if compress else trajectory_file
    step = int(state_step)
    fresh = step <= 0 or not os.path.isfile(thermo_file)
    if fresh:
        for f in {trajectory_file, thermo_file, trajectory_file + ".zst"}:
            if os.path.isfile(f):
                os.remove(f)
        with open(thermo_file, "w") as io_:
            io_.write(THERMO_HEADER)
    else:
        _filter_thermo_rows(thermo_file, step)
        if os.path.isfile(traj_path):
            _filter_trajectory_frames(traj_path, step, compressed=compress)
    from mdtpu.io.native_writer import open_trajectory_writer

    append = not fresh and os.path.isfile(traj_path)
    traj_writer = open_trajectory_writer(traj_path, compress=compress,
                                         append=append)
    return trajectory_file, thermo_file, traj_writer, not fresh


def open_files(pathname, traj_name, thermo_name, resume=False):
    """Return output paths; delete stale outputs unless resuming
    (/root/reference/src/io.jl:225-239 — the reference always starts at
    step 0, so it always truncates; a RESUMED run into the same pathname
    must instead append, or the earlier segment's rows/frames are
    destroyed while the snapshots survive — an inconsistent directory)."""
    os.makedirs(pathname, exist_ok=True)
    trajectory_file = os.path.join(pathname, traj_name)
    thermo_file = os.path.join(pathname, thermo_name)
    if not resume:
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
    """All per-event output scalars (+ health flags) as ONE device vector,
    computed inside the advance program: device transfers and jitted calls
    each cost a full RPC round trip on the remote tunnel (5-50 ms depending
    on load), so the event loop does one call (advance, which also returns
    these vectors) and one transfer per batch of thermo-only events.

    Health flags (fused, ~free reductions):
      * index 5 — engine overflow (capacity recovery trigger);
      * index 6 — non-finite positions: a diverged run (e.g. an
        Euler–Maruyama Brownian step beyond its stability bound on a steep
        potential) otherwise keeps writing plausible-looking rows — beyond
        the cutoff every pair contributes exact zeros, so energy reads 0.0,
        not NaN. The driver raises instead of logging garbage;
      * index 7 — occupied-slot count (slot states; -1 otherwise): catches
        any unflagged particle loss at EVERY event, not just at row pulls."""
    d = state.energy.dtype
    nbrs = state.nbrs
    # .max(): sharded slot states carry a PER-SHARD overflow flag
    # (halo_slot.slot_state_specs) — reduce it to one scalar here so the
    # same vector layout serves the single-device and sharded drivers.
    ovf = (nbrs.overflow.astype(d).max()
           if nbrs is not None and hasattr(nbrs, "overflow")
           else jnp.zeros((), d))
    va = (state.virial_accum if state.virial_accum is not None
          else jnp.zeros((), d))
    nprom = (state.nprom if state.nprom is not None
             else jnp.zeros((), jnp.int32))
    bad = (~jnp.all(jnp.isfinite(state.positions))).astype(d)
    nocc = (nbrs.occupied.sum().astype(d)
            if state.ids is not None and nbrs is not None
            and hasattr(nbrs, "occupied")
            else jnp.full((), -1, d))
    return jnp.stack([state.energy, state.temperature, state.virial,
                      va.astype(d), nprom.astype(d), ovf, bad, nocc])


def _pack_output_rows(state, use_slot, n):
    """Everything a trajectory frame / snapshot needs, packed into ONE device
    array: ``jax.device_get`` of a dict moves one RPC round trip per leaf on
    the remote tunnel (5-50 ms each) — the packed form is one transfer, and
    the row payload itself is the cost floor at trajectory cadence (~19 MB/s
    tunnel bandwidth, BENCH_NOTES), so it is kept minimal:

      * slot states are ORDERED on device: one key sort of the carried ids
        (vacant slots keyed past every real id) yields the slot index of
        particle 0..n-1 directly, and one packed gather compacts + orders
        the rows — so the ids themselves never ride the wire (2 of the
        former 8 rows, −25% payload) and the host does no per-frame argsort.
        States whose ids are not 0..n-1 (artificial test states) come back
        in id-RANK order — the driver's states always carry arange ids.
        Particle loss is caught by the scalar-vector occupied count before
        any row is consumed;
      * run-constant per-particle data never rides along: diameters are kept
        by the driver host-side in original particle order.

    Rows always travel as f32 regardless of the state dtype: the text
    writers print ``%.6f`` (6 decimals), which f32 coordinates satisfy at
    any practical box size, so f64 runs shipping f64 rows would pull 2x
    the bytes their output can express (at trajectory cadence the payload
    IS the throughput floor — measured +70% driver steps/s decoupled,
    BENCH_NOTES). The on-device cast is free; checkpoints (full-precision
    npz of the whole state) are unaffected. Images are integer-exact in
    f32 (< 2^24 crossings). The unitcell is constant for a run and pulled
    once by the driver, not per event. Both layouts return the SAME
    (2·dim, n) particle-ordered array."""
    dt = jnp.float32
    if use_slot:
        s = state.ids.shape[0]
        key = jnp.where(state.ids < 0, jnp.iinfo(jnp.int32).max, state.ids)
        _, perm = jax.lax.sort((key, jnp.arange(s, dtype=jnp.int32)),
                               num_keys=1, is_stable=False)
        rows = jnp.concatenate([
            state.positions.astype(dt),             # (d, S)
            state.images.astype(dt),                # (d, S)
        ], axis=0)
        return jnp.take(rows, perm[:n], axis=1)     # (2d, n), particle order
    return jnp.concatenate([
        state.positions.astype(dt).T,               # (d, N)
        state.images.astype(dt).T,                  # (d, N)
    ], axis=0)


def _unpack_output_rows(rows):
    """Host view of one packed frame (both layouts arrive particle-ordered
    component-major, see :func:`_pack_output_rows`)."""
    rows = np.asarray(rows)
    dim = rows.shape[0] // 2
    return {"positions": rows[0:dim].T,
            "images": rows[dim:2 * dim].T.astype(np.int32)}


# Batched-event advance: scalar-only (thermo) events between two row events
# are served by ONE jitted call + ONE small transfer for the whole group —
# a lax.scan over per-event segment lengths, each event's scalars stacked
# into the (K, 8) result. On the remote tunnel every call/transfer pays the
# per-RPC floor, so grouping K events cuts the event-loop overhead by ~K.
# Group sizes are padded to a few buckets so only a handful of programs
# compile; zero-length pad segments are no-ops (advance(s, 0) == s).
_BATCH_BUCKETS = (1, 2, 4, 8, 16)

# Device frame buffer budget: trajectory/snapshot events no longer close a
# batch — up to k_frames events' packed rows accumulate in a device ring
# buffer written inside the scanned batch, pulled in ONE transfer at the
# batch boundary (round-4 measured the coupled thermo+traj cadence at 340
# steps/s vs 1,141 raw: every frame event paid its own RPC + transfer).
# The budget caps the buffer so a 1M-particle run (25 MB/frame) degrades
# gracefully to one frame per batch (the round-4 behavior).
_FRAME_BUFFER_BYTES = 48 * 2 ** 20


def _frame_capacity(n, dim):
    # MDTPU_FRAME_STACK: "0" forces classic one-frame-per-batch mode, any
    # other integer caps the per-batch frame count — the A/B levers for
    # attributing driver-throughput changes to stacking vs the hour's
    # tunnel conditions (RPC floor and bandwidth swing 5-50 ms /
    # several-x across sessions, BENCH_NOTES). Frame pulls overlap the
    # NEXT batch's device execution, so the LAST batch's pull is always
    # exposed — the default caps the stack at 4 frames: deep enough to
    # amortize the per-batch RPC floor, shallow enough that the exposed
    # tail is one small pull (probe_pull round-5: per-event pull time <
    # per-event compute at trajectory cadences, so any depth overlaps).
    cap = int(os.environ.get("MDTPU_FRAME_STACK", "4") or 4)
    if cap <= 0:
        cap = 1
    frame_bytes = 2 * dim * n * 4  # (2d, n) f32
    return int(max(1, min(cap, _BATCH_BUCKETS[-1],
                          _FRAME_BUFFER_BYTES // frame_bytes)))


def _bucket(k):
    for b in _BATCH_BUCKETS:
        if k <= b:
            return b
    return _BATCH_BUCKETS[-1]


def _make_batch_advance(adv, use_slot, is_brownian, n, dim, k_frames):
    """advance_batch(state, lengths (B,), thermo_flags (B,), row_flags (B,))
    -> (state, per-event scalar vectors (B, 8), packed output rows).

    ``k_frames == 1`` (classic mode): row events close their batch, so only
    the FINAL state needs rows — packed once after the scan ((2d, n)).
    ``k_frames > 1`` (stack mode): each row event's rows are packed inside
    the scan and written at the carried frame cursor into a FLAT
    (k_frames·2d, n) device buffer via ``dynamic_update_slice`` (a slice
    store, cheap — unlike index scatters; flat so the wire sees one
    contiguous 2-D array and the caller can pull just the filled prefix);
    the whole stack travels in ONE transfer. Non-row events skip the pack
    under a ``lax.cond`` whose predicate comes from the scan xs (uniform
    across devices, so GSPMD-legal for the sharded driver too)."""

    @jax.jit
    def advance_batch(state, lengths, thermo_flags, row_flags):
        def body(carry, xs):
            s, buf, j = carry
            n_k, is_thermo, is_row = xs
            s = adv(s, n_k)
            vec = _event_scalars(s)
            if k_frames > 1:
                def put(b):
                    rows = _pack_output_rows(s, use_slot, n)
                    return jax.lax.dynamic_update_slice_in_dim(
                        b, rows, j * (2 * dim), axis=0)

                buf = jax.lax.cond(is_row != 0, put, lambda b: b, buf)
                j = j + is_row
            if is_brownian and s.virial_accum is not None:
                # Reset the virial accumulators after each thermo event
                # (/root/reference/src/simulation.jl:266) on device — the
                # host no longer sees intermediate states of a batch.
                keep = (is_thermo == 0)
                s = s.replace(
                    virial_accum=jnp.where(keep, s.virial_accum, 0),
                    nprom=jnp.where(keep, s.nprom, 0),
                )
            return (s, buf, j), vec

        buf0 = (jnp.zeros((k_frames * 2 * dim, n), jnp.float32)
                if k_frames > 1 else jnp.zeros((0,), jnp.float32))
        (state, buf, _), vecs = jax.lax.scan(
            body, (state, buf0, jnp.int32(0)),
            (lengths, thermo_flags, row_flags))
        if k_frames == 1:
            buf = _pack_output_rows(state, use_slot, n)
        return state, vecs, buf

    return advance_batch


def _make_fori_advance(step_fn):
    def adv(state, n_steps):
        return jax.lax.fori_loop(0, n_steps, lambda i, s: step_fn(s), state)

    return adv


# advance_batch functions cached across run_simulation calls: jax.jit keys
# its trace cache on the function OBJECT, so rebuilding the closure every
# call re-traces the full fused-step program (~2-3 s per bucket size).
# Engines/params/ensembles are frozen flax structs of scalars — hashable —
# so (params, ensemble, engine, flags) identifies the program exactly;
# anything unhashable (e.g. a user potential carrying arrays) skips the
# cache and keeps the old rebuild-per-call behavior.
_ADVANCE_CACHE: dict = {}
_DEV_ARGS_CACHE: dict = {}


def _event_schedule(start_step, total_steps, frequency, traj_frequency,
                    log_times, pathname):
    """Host-side output schedule: thermo/trajectory cadences plus optional
    log-spaced snapshot steps (side-effect file new-log-times.txt, matching
    /root/reference/src/io.jl:17-36). Events strictly below start_step
    (possible with log_times on a resumed state: snap_set always contains 0
    plus log-times below start_step) are dropped — they would rewind the
    loop and re-execute steps with wrong labels."""
    end_step = start_step + total_steps
    snap_set = set()
    if log_times:
        # end_step, not total_steps: a resumed run keeps snapshotting on
        # the original log-time schedule past its restart point (with
        # max_step=total_steps every log time fell below start_step and
        # resumed segments silently wrote no snapshots).
        snaps = generate_log_times(save_dir=pathname, max_step=end_step)
        snap_set = set([0] + [s for s in snaps if s < end_step])
    # Stepped ranges, not per-step scans: O(n_events), so a 1e8-step run
    # doesn't spend host time enumerating every step twice.
    thermo_steps = set(range(start_step + (-start_step) % frequency,
                             end_step, frequency))
    if traj_frequency is None:
        traj_frequency = frequency
    traj_steps = set(range(start_step + (-start_step) % traj_frequency,
                           end_step, traj_frequency))
    return thermo_steps, traj_steps, snap_set


def _thermo_values(e, t, virial, virial_accum, nprom, *, is_brownian,
                   ensemble, n, dim, volume, density, e_lrc, p_lrc):
    """The ONE implementation of the reference's thermo arithmetic
    (/root/reference/src/simulation.jl:118-131 MD path, :259-266 Brownian
    path), shared by the event loop and the row-layout sharded loop.
    Returns ``(energy_per_particle, temperature, pressure)``."""
    if is_brownian:
        # Per-particle energy without LRC; virial averaged over the 10-step
        # samples; T column prints ktemp by construction.
        nprom = max(int(nprom), 1)
        ener = e / n
        pressure = (float(virial_accum) / (dim * nprom * volume)
                    + density * float(ensemble.ktemp))
        t = float(ensemble.ktemp)
    else:
        ener = (e + e_lrc) / n
        pressure = float(virial) / (dim * volume) + density * t + p_lrc
    return ener, t, pressure


def _capacity_msg(engine):
    msg = f"cell capacity {engine.cell_capacity}"
    mc = getattr(engine, "migration_capacity", None)
    if mc is not None:
        msg += f", migration buffer {mc}"
    return msg


def _drive_events(state, engine, advance, *,
                  build_advance, grow_engine, restore, to_particle_state,
                  use_slot, is_brownian, ensemble, n, dim, volume, density,
                  e_lrc, p_lrc, diameters_np, start_step, end_step,
                  thermo_steps, traj_steps, snap_set, checkpoint_every,
                  pathname, thermo_file, traj_writer, perf_log=False,
                  pipeline=True):
    """The event loop shared by the single-device and sharded drivers:
    batch the output schedule, advance through each batch in ONE jitted
    call, pull its scalars in ONE transfer, write files while the next
    batch executes, recover from capacity overflow by restore-and-rerun,
    and raise on divergence or particle loss.

    Engine-specific behavior enters through three callbacks:
      * ``grow_engine(engine)`` — a larger-capacity engine;
      * ``restore(seg_start, engine)`` — rebuild the pre-batch state for the
        grown engine (None = capacity still too small, grow again);
      * ``to_particle_state(state)`` — ordinary (N, d) particle order for
        checkpoints.
    ``build_advance(engine)`` rebuilds the batch-advance after a grow.

    Returns ``(state, engine, advance)``; the caller finalizes."""
    unitcell_np = np.asarray(state.unitcell)  # constant for the run
    k_frames = _frame_capacity(n, dim)

    row_steps = traj_steps | snap_set
    # Checkpoints are their OWN events (batch boundaries), not a filter on
    # the output events — checkpoint_every not aligned with the thermo/traj
    # cadence used to silently produce 10x fewer checkpoints (or only
    # step 0) than requested.
    checkpoint_steps = set()
    if checkpoint_every is not None:
        checkpoint_steps = set(
            range(start_step + (-start_step) % checkpoint_every,
                  end_step, checkpoint_every))
    event_steps = sorted(
        s for s in (thermo_steps | traj_steps | snap_set | checkpoint_steps)
        if s >= start_step and s < end_step)

    # Group events into batches: consecutive events are served by ONE
    # advance_batch call + ONE small scalar transfer for the whole group
    # (each call/transfer pays the tunnel's per-RPC floor). Row events
    # (trajectory/snapshot) accumulate their packed frames in the device
    # buffer and are pulled together at the batch boundary; a batch closes
    # when the frame buffer is full, at a checkpoint event (its exact state
    # must be materialized), or at the bucket cap.
    batches = []  # list of [(event_step, n_steps_to_advance), ...]
    cur = []
    cur_frames = 0
    prev = start_step
    for ev in event_steps:
        cur.append((ev, ev - prev + 1))
        prev = ev + 1
        if ev in row_steps:
            cur_frames += 1
        if (cur_frames == k_frames or ev in checkpoint_steps
                or len(cur) == _BATCH_BUCKETS[-1]):
            batches.append(cur)
            cur = []
            cur_frames = 0
    if cur:
        batches.append(cur)
    if prev < end_step:
        # Tail past the last output event: its own batch so overflow
        # recovery covers it too; end_step is in no output set, so its
        # pseudo-event writes nothing.
        batches.append([(end_step, end_step - prev)])

    def flush(pending_item):
        if pending_item is None:
            return
        s, dev = pending_item
        has_rows = "positions" in dev
        if has_rows:
            dev = dict(dev)
            dev["diameters"] = diameters_np  # run-constant, never transferred
        if use_slot and has_rows:
            # Rows arrive particle-ordered from the device (id-sorted
            # gather in _pack_output_rows); only the deferred-wrap residual
            # drift is folded here. Particle loss was already caught by the
            # scalar-vector occupied count before any row was consumed.
            from mdtpu.integrate.slot_step import _host_wrap

            dev["positions"], dev["images"] = _host_wrap(
                dev["positions"], dev["images"], unitcell_np)
        ener, t, pressure = _thermo_values(
            float(dev["energy"]), float(dev["temperature"]), dev["virial"],
            dev["virial_accum"], dev["nprom"], is_brownian=is_brownian,
            ensemble=ensemble, n=n, dim=dim, volume=volume, density=density,
            e_lrc=e_lrc, p_lrc=p_lrc)
        if s in thermo_steps:
            with open(thermo_file, "a") as io:
                io.write(f"{s} {ener:.6f} {t:.6f} {pressure:.6f}\n")
        if s in traj_steps:
            traj_writer.write_frame(s, unitcell_np, dev["positions"],
                                    dev["images"], dev["diameters"])
        if s in snap_set:
            write_lammps_frame(os.path.join(pathname, f"snapshot.{s}"), s,
                               unitcell_np, dev["positions"], dev["images"],
                               dev["diameters"], mode="w")

    def _dev_args(lengths, flags, row_flags):
        # Batch argument device arrays, cached across runs: passing fresh
        # numpy arrays to a jitted call device_puts them — more RPC round
        # trips per batch. The handful of distinct patterns transfer once
        # per process.
        key = (tuple(lengths), tuple(flags), tuple(row_flags))
        if key not in _DEV_ARGS_CACHE:
            _DEV_ARGS_CACHE[key] = (jnp.asarray(lengths), jnp.asarray(flags),
                                    jnp.asarray(row_flags))
        return _DEV_ARGS_CACHE[key]

    def dispatch_batch(state, engine, advance, batch):
        """Dispatch ONE jitted advance covering every event of ``batch``.
        Purely asynchronous — returns the device handles plus everything
        ``complete_batch`` needs to validate and publish the batch later.
        With pipelining the NEXT batch is dispatched before this one is
        completed, so the device queue never drains between batches (the
        inter-batch dispatch+pull RPCs used to leave the chip idle
        30-60 ms per batch on the tunnel)."""
        K = len(batch)
        # Engines whose advance carries collectives (rebin_unconditional)
        # run their final full step even for a zero-length segment —
        # lax.cond around collectives is not SPMD-safe — so advance(s, 0)
        # != s for them and zero padding would execute REAL extra steps
        # (measured: step count drifted past total_steps). Exact-size
        # batches cost at most a few more compiles (one per distinct K).
        B = K if getattr(engine, "rebin_unconditional", False) else _bucket(K)
        lengths = np.zeros(B, np.int32)
        flags = np.zeros(B, np.int32)
        row_flags = np.zeros(B, np.int32)
        for i, (ev, n_adv) in enumerate(batch):
            lengths[i] = n_adv
            flags[i] = 1 if ev in thermo_steps else 0
            row_flags[i] = 1 if ev in row_steps else 0
        d_args = _dev_args(lengths, flags, row_flags)
        seg_start = state
        out_state, vecs_dev, rows_dev = advance(state, *d_args)
        return {"batch": batch, "K": K, "seg_start": seg_start,
                "state": out_state, "vecs_dev": vecs_dev,
                "rows_dev": rows_dev, "row_flags": row_flags,
                "d_args": d_args, "engine": engine, "advance": advance,
                "n_steps": sum(n_adv for _, n_adv in batch)}

    def complete_batch(h):
        """Pull the dispatched batch's (K, 8) scalar matrix in ONE transfer
        (blocking until the batch finishes on device — any later dispatch
        is already queued behind it), run the health checks, recover from
        engine capacity overflow, pull+attach the frame stack (the big
        transfer overlaps the next batch's execution) and write the files.
        Returns ``(state, engine, advance, recovered)``; ``recovered``
        means the batch was re-run with a grown engine, so any dispatch
        issued from its pre-recovery output state must be replayed.

        Overflow recovery: an overflowing slot rebin scatters rows past
        cell capacity to the trash column — the particles would be
        PERMANENTLY lost (position, velocity, identity), silently
        corrupting the run. So the pre-batch state is kept, and on any
        overflow the batch is restored and re-run with grown capacity; the
        replay is deterministic (per-step RNG is fold_in(key, step)), so
        no particle is ever lost and the recovered trajectory is the one
        an always-large-enough capacity would have produced. Particle-
        order engines never drop rows on overflow, but the same restore-
        and-rerun gives them trajectories free of transiently-degraded
        forces."""
        batch, K = h["batch"], h["K"]
        engine, advance = h["engine"], h["advance"]
        state, vecs_dev, rows_dev = h["state"], h["vecs_dev"], h["rows_dev"]
        row_flags = h["row_flags"]
        d_len, d_flags, d_rows = h["d_args"]
        last_ev = batch[-1][0]
        vecs = np.asarray(vecs_dev)  # ONE scalar transfer for the batch

        def check_diverged(vecs):
            bad = np.flatnonzero(vecs[:K, 6])
            if bad.size:
                raise RuntimeError(
                    f"simulation diverged (non-finite positions) at or "
                    f"before step {batch[int(bad[0])][0]} — the integrator "
                    f"left its stability region. For Brownian/overdamped "
                    f"runs reduce dt (steep potentials need max|f|*dt/kT "
                    f"well below the core scale); for MD check the starting "
                    f"configuration for overlaps (minimize first) or use "
                    f"dtype=float64.")

        # Divergence FIRST: inf positions can trigger a rebin whose clipped
        # binning overflows, so a diverged run may also raise the overflow
        # flag — growing capacity and replaying would diverge identically 8
        # times and then report the wrong error.
        check_diverged(vecs)
        recovered = False
        if bool(vecs[:K, 5].any()):
            import warnings

            for _ in range(8):
                engine = grow_engine(engine)
                warnings.warn(
                    f"engine capacity overflow in batch ending step "
                    f"{last_ev}: restoring pre-batch state and re-running "
                    f"with {_capacity_msg(engine)}")
                restored = restore(h["seg_start"], engine)
                if restored is None:
                    continue  # initial binning still too tight: grow again
                advance = build_advance(engine)
                state, vecs_dev, rows_dev = advance(restored, d_len, d_flags,
                                                    d_rows)
                vecs = np.asarray(vecs_dev)
                recovered = True
                if not bool(vecs[:K, 5].any()):
                    break
            else:
                raise RuntimeError(
                    "engine capacity still overflowing after 8 grows")

        check_diverged(vecs)  # re-check: the grow loop re-ran the batch
        if use_slot:
            lost = np.flatnonzero(vecs[:K, 7] != n)
            if lost.size:
                raise RuntimeError(
                    f"slot state holds {int(vecs[int(lost[0]), 7])} of {n} "
                    f"particles at step {batch[int(lost[0])][0]} — capacity "
                    f"overflow recovery failed")

        outputs = []
        for i, (ev, _) in enumerate(batch):
            outputs.append((ev, {
                "energy": vecs[i, 0], "temperature": vecs[i, 1],
                "virial": vecs[i, 2], "virial_accum": vecs[i, 3],
                "nprom": vecs[i, 4]}))
        if bool(row_flags.any()):
            # ONE transfer for the whole frame stack, pulled while any
            # later-dispatched batch executes (probe_pull: a 25 MB pull
            # during a fused loop costs idle-pull time; only many SMALL
            # interleaved pulls contend). Slice the filled prefix ON
            # DEVICE first (sparse-traj cadences close batches at the
            # bucket cap with a part-filled buffer) — one async dispatch
            # buys skipping the unfilled bytes.
            n_real = int(row_flags.sum())
            rpf = 2 * dim  # rows per frame
            if rows_dev.shape[0] > n_real * rpf:
                rows_dev = rows_dev[:n_real * rpf]
            frames = np.asarray(rows_dev).reshape(n_real, rpf, -1)
            fi = 0
            for i in range(K):
                if row_flags[i]:
                    outputs[i][1].update(_unpack_output_rows(frames[fi]))
                    fi += 1
        # File writes overlap the next batch's device execution.
        for item in outputs:
            flush(item)
        if meter is not None:
            meter.tick(last_ev, h["n_steps"])
        if last_ev in checkpoint_steps:
            from mdtpu.io.checkpoint import save_checkpoint

            save_checkpoint(to_particle_state(state),
                            os.path.join(pathname,
                                         f"checkpoint.{last_ev}.npz"))
        return state, engine, advance, recovered

    meter = None
    if perf_log:
        from mdtpu.utils.profiling import StepRateMeter

        # Append on resume, matching the other outputs' resume contract.
        meter = StepRateMeter(os.path.join(pathname, "perf.txt"),
                              append=start_step > 0)

    # One-batch dispatch-ahead pipeline: batch i+1 is dispatched BEFORE
    # batch i is completed, so the device queue never drains between
    # batches (each complete pays a blocking scalar pull and a dispatch
    # RPC — 30-60 ms of chip idle per batch on the tunnel without the
    # lookahead). If completing batch i recovers from overflow, the
    # already-dispatched batch i+1 consumed i's pre-recovery output state
    # and is simply re-dispatched from the corrected one (advances are
    # pure). ``pipeline=False`` (the sharded driver) keeps strict
    # dispatch-complete alternation: queuing a second sharded execution
    # before the first finishes deadlocks CPU-mesh collectives, and real
    # multi-chip meshes pay per-dispatch collective setup either way.
    pending = None  # dispatched but not yet completed batch handle
    try:
        for batch in batches:
            if not pipeline and pending is not None:
                state, engine, advance, _ = complete_batch(pending)
                pending = None
            h = dispatch_batch(state, engine, advance, batch)
            state = h["state"]
            if pending is not None:
                cstate, engine, advance, recovered = complete_batch(pending)
                if recovered:
                    # h consumed the pre-recovery state — replay it from
                    # the corrected one.
                    h = dispatch_batch(cstate, engine, advance, batch)
                    state = h["state"]
            pending = h
        if pending is not None:
            state, engine, advance, _ = complete_batch(pending)
            pending = None
    finally:
        # A mid-run raise (divergence, capacity-grow exhaustion) must not
        # lose the already-completed frames buffered in the async writer —
        # they are exactly the trajectory tail one debugs the failure with.
        # A still-pending dispatched batch is NOT published: its events
        # follow the failure point.
        import sys

        try:
            traj_writer.close()
        except Exception:
            # Don't mask an in-flight exception with a close failure; with
            # no exception active, a failed disk write must surface.
            if sys.exc_info()[0] is None:
                raise
    return state, engine, advance


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

    # Validate arguments BEFORE the output files are touched — a typo'd
    # precision= must not destroy a previous run's data (prepare_output_files
    # runs after every raising validation below for the same reason).
    if precision not in ("auto", "f32x2", "plain"):
        raise ValueError(f"precision must be auto/f32x2/plain, got {precision!r}")
    if engine is None:
        engine = select_engine(params.potential, state.cutoff, state)

    # Slot-space fast path: for the cell-grid engine the whole state runs
    # in cell-sorted component-major slot order (no per-step scatter/gather,
    # rebuild hoisted out of the step, observable-free inner steps) —
    # measured 3.7x the particle-order step at the N=65k bench. Outputs and
    # the returned state are restored to original particle order via the
    # carried ids row.
    from mdtpu.core.types import NVE
    from mdtpu.ops.cell_grid import CellGridEngine

    use_slot = (isinstance(engine, CellGridEngine)
                and state.dimension == len(engine.grid)
                and state.dimension in (2, 3)
                and compensated)
    hilo = use_slot and (
        precision == "f32x2"
        or (precision == "auto" and isinstance(ensemble, NVE)
            and state.positions.dtype == jnp.float32))
    if precision == "f32x2" and not use_slot:
        # An explicitly forced hi/lo sweep must not silently run plain.
        raise ValueError(
            "precision='f32x2' (the hi/lo pair sweep) requires the slot "
            "fast path: a CellGridEngine matching the state's dimension "
            "and compensated=True — got "
            f"{type(engine).__name__}, dimension={state.dimension}, "
            f"compensated={compensated}. Use precision='auto' to apply it "
            "opportunistically.")

    is_brownian = isinstance(ensemble, Brownian)
    potential = params.potential
    volume = float(box_volume(state.unitcell))
    dim = state.dimension
    n = state.n_particles
    density = float(params.density)
    e_lrc = float(potential.energy_lrc(n, volume))
    p_lrc = float(potential.pressure_lrc(n, volume))
    # Diameters are constant for a run: keep them host-side in original
    # particle order (the state is still particle-ordered here) so row
    # events never transfer them.
    diameters_np = np.asarray(state.diameters)

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

    # Open (and reconcile, for a resumed state) the output files only AFTER
    # every validation that can raise — argument checks above, slotify's
    # uniform-sigma/slot-budget errors and the initial binning inside
    # build_slot — so a call that never runs a step never touches a
    # previous run's data. The trajectory writer is the async C++
    # background thread when available; with compress=True the zstd stream
    # is written directly (same end state as the reference's
    # compress-then-delete: trajectory.xyz.zst, no plain file).
    trajectory_file, thermo_file, traj_writer, _ = prepare_output_files(
        pathname, traj_name, thermo_name, int(state.step), compress)

    def build_advance(engine):
        # n is part of the key: _pack_output_rows bakes the n-row ordered
        # gather into the program, so reusing it across particle counts
        # (same tuned engine geometry for nearby N) would truncate or pad
        # the output rows.
        # k_frames is part of the key: the program bakes the frame-buffer
        # capacity, and MDTPU_FRAME_STACK can change it between calls in
        # one process (the A/B lever) — a cached advance built for a
        # different capacity would disagree with the caller's batching.
        k_frames = _frame_capacity(n, dim)
        key = (params, ensemble, engine, compensated, hilo, use_slot,
               is_brownian, n, k_frames)
        try:
            cached = _ADVANCE_CACHE.get(key)
        except TypeError:
            key, cached = None, None
        if cached is not None:
            return cached
        if use_slot:
            from mdtpu.integrate.slot_step import make_slot_advance

            fn = _make_batch_advance(
                make_slot_advance(params, ensemble, engine,
                                  compensated=compensated, hilo=hilo),
                True, is_brownian, n, dim, k_frames)
        else:
            step_fn = make_step(params, ensemble, engine,
                                compensated=compensated)
            fn = _make_batch_advance(_make_fori_advance(step_fn), False,
                                     is_brownian, n, dim, k_frames)
        if key is not None:
            _ADVANCE_CACHE[key] = fn
        return fn

    advance = build_advance(engine)
    start_step = int(state.step)
    end_step = start_step + total_steps
    thermo_steps, traj_steps, snap_set = _event_schedule(
        start_step, total_steps, frequency, traj_frequency, log_times,
        pathname)

    def restore(seg_start, engine):
        if use_slot:
            restored = slot_forces(
                slotify(unslotify_state(seg_start), engine), engine)
            if bool(restored.nbrs.overflow):
                return None  # initial binning still too tight
            return restored
        return seg_start.replace(nbrs=engine.allocate(
            seg_start.positions, seg_start.diameters,
            seg_start.unitcell, seg_start.unitcell_inv))

    state, engine, advance = _drive_events(
        state, engine, advance,
        build_advance=build_advance,
        grow_engine=lambda e: e.with_grown_capacity(),
        restore=restore,
        to_particle_state=(unslotify_state if use_slot else (lambda s: s)),
        use_slot=use_slot, is_brownian=is_brownian, ensemble=ensemble,
        n=n, dim=dim, volume=volume, density=density,
        e_lrc=e_lrc, p_lrc=p_lrc, diameters_np=diameters_np,
        start_step=start_step, end_step=end_step,
        thermo_steps=thermo_steps, traj_steps=traj_steps, snap_set=snap_set,
        checkpoint_every=checkpoint_every, pathname=pathname,
        thermo_file=thermo_file, traj_writer=traj_writer, perf_log=perf_log)

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
