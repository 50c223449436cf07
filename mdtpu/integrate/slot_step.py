"""Slot-space hot loop: the whole simulation state lives in cell-sorted
slot order, component-major.

Motivation (measured at the N=65k bench config on TPU v5e): of the 3.6 ms
cell-grid force evaluation, ~1.1 ms is the scatter of particle coordinates
into the padded slot grid and ~1.3 ms the gather of forces back to particle
order — XLA's TPU scatter/gather are serialized and cost more than the whole
pair sweep (~0.9 ms). Keeping positions/velocities/forces in slot order
removes both: the sweep becomes reshape-only, and the integrator simply
processes ~1.6x more rows (vacant slots integrate zeros — cheap dense VPU
work). Arrays are component-major (d, n_slots): an (N, 3) array pads its
trailing 3 to 128 lanes on TPU (42x memory), so every integrator op runs on
dense (n_slots,) lane vectors instead.

Layout contract:
  * per-particle arrays have shape (d, n_slots) (diameters: (n_slots,)),
    n_slots = n_cells * C, in cell-sorted order; vacant rows hold far-pad
    coordinates, zero velocities/forces, unit diameters;
  * ``state.nbrs.occupied`` marks real slots; ``state.nf`` still encodes the
    true particle count, so temperature/thermostat are unchanged;
  * the periodic wrap is DEFERRED to rebuild time: between rebuilds
    positions drift unwrapped (bounded by skin/2), so the step pays neither
    the per-step fold nor any per-slot minimum-image work in the sweep; the
    rebuild folds occupied rows through the compensated add and accumulates
    crossing counts into ``images``. Outputs fold the residual drift on the
    host;
  * when any particle drifts past skin/2 the loop re-bins: one key sort,
    per-cell run starts by binary search, and ONE packed (R, n_slots)
    gather moving ALL state rows at once (scatter-free — TPU scatters
    serialize over indices: the earlier packed-scatter form cost 199 ms at
    1.67M slots vs 80 ms for this gather form, probe_sort.py), amortized
    over the rebuild interval. ``make_slot_advance`` hoists the rebuild
    out of the per-step path entirely (nested while_loop).

The role analog in the reference is CellListMap's internally-permuted
particle storage (it also computes on cell-ordered copies,
/root/reference/src/initialization.jl:100-107); here the ENTIRE dynamics
runs in that order.

Measured impact at the N=65k LJ bench on TPU v5e (BENCH_NOTES.md): the
particle-order step ran 3.9 ms; this layout plus the packed rebuild, lean
inner steps, deferred wrap and tuned cell geometry reach 0.93 ms/step
(1,073 steps/s), sustained through the public driver over 100k-step runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.types import Brownian, Parameters, SimulationState
from mdtpu.integrate.step import (_add, brownian_noise,
                                  brownian_virial_sample, md_velocity_finish)
from mdtpu.ops.cell_grid import (
    FAR_RAMP_MAX,
    CellGridEngine,
    CellGridState,
    far_ramp,
)


def _far_row(n_slots, dtype, far_k0=0):
    return far_ramp(n_slots + 1, dtype, k0=far_k0)


def split_id_rows(ids, dtype):
    """Particle ids (int32) as rows that are integer-EXACT in ``dtype``.

    f32 rows hold integers exactly only below 2^24, so ids split into two
    rows (hi = ids >> 12, lo = ids & 0xfff; vacant -1 maps to (-1, 4095)
    and reassembles to -1) — particle identity survives the packed f32
    rebin and the output-row transfer at any supported system size. The
    ONLY encode site; decode with :func:`join_id_rows`, vacant fill values
    from :func:`id_row_fills`."""
    if jnp.dtype(dtype).itemsize == 4:
        return [(ids >> 12).astype(dtype)[None],
                (ids & 0xfff).astype(dtype)[None]]
    return [ids.astype(dtype)[None]]


def id_row_fills(dtype):
    """Vacant-slot fill value per id row of :func:`split_id_rows`."""
    return (-1, 4095) if jnp.dtype(dtype).itemsize == 4 else (-1,)


def join_id_rows(hi, lo=None, out_dtype=jnp.int32):
    """Inverse of :func:`split_id_rows`; works on jnp and np arrays."""
    if lo is None:
        return hi.astype(out_dtype)
    return hi.astype(out_dtype) * 4096 + lo.astype(out_dtype)


def _scatter_rows(a, addr, n_slots, fill):
    """Scatter component-major rows a[k] to slots: out[k, addr[i]] = a[k, i],
    vacant slots filled with `fill` ('far' = the far-pad ramp)."""
    rows = []
    for k in range(a.shape[0]):
        if fill == "far":
            base = _far_row(n_slots, a.dtype)
        else:
            base = jnp.full((n_slots + 1,), fill, a.dtype)
        rows.append(base.at[addr].set(a[k])[:-1])
    return jnp.stack(rows)


def _frac_components(x, cell_inv):
    dim = x.shape[0]
    return [sum(cell_inv[k, j] * x[j] for j in range(dim))
            for k in range(dim)]


class CapacityOverflowError(ValueError):
    """Initial binning overflowed the engine's cell capacity — the caller
    may retry with ``engine.with_grown_capacity()``. A distinct type so
    grow-and-retry loops don't swallow slotify's *explanatory* ValueErrors
    (uniform-sigma mismatch, far-ramp slot budget), which growing capacity
    can never fix."""


def slotify(state: SimulationState, engine: CellGridEngine) -> SimulationState:
    """Convert an (N, d) particle state into component-major slot order."""
    n, dim = state.positions.shape
    cap = engine.cell_capacity
    n_cells = int(np.prod(engine.grid))
    n_slots = n_cells * cap
    if n_slots >= FAR_RAMP_MAX:
        # The far-pad coordinate ramp (mdtpu.ops.cell_grid.far_ramp) keeps
        # vacant slots exactly-representable and >= 4 apart in f32 up to
        # 2^28 indices; ids ride the packed f32 rebin as two exact hi/lo
        # rows (pack_state_rows), so the ramp is the binding budget
        # (~2.7e8 slots ~ 160M particles per slot space).
        raise ValueError(
            f"slot layout needs n_cells*capacity < 2^28 (far-pad ramp "
            f"budget, ~160M particles; got {n_slots}); reduce cell "
            f"capacity or split the system")
    uni = getattr(engine, "uniform_sigma", 0.0)
    if uni and not isinstance(state.diameters, jax.core.Tracer):
        d = np.asarray(state.diameters)
        if d.size and not bool(np.all(d == np.float64(uni))):
            raise ValueError(
                f"engine was created with uniform_sigma={uni} but the state "
                "has non-uniform (or different) diameters — recreate the "
                "engine with diameters=state.diameters")

    nbrs = engine.allocate(state.positions, state.diameters, state.unitcell,
                           state.unitcell_inv)
    addr = nbrs.addr  # (N,) slot or trash (= n_slots)

    def put(a, fill):
        if a is None:
            return None
        return _scatter_rows(a.T, addr, n_slots, fill)

    def put1(a, fill):
        base = jnp.full((n_slots + 1,), fill, a.dtype)
        return base.at[addr].set(a)[:-1]

    occupied = jnp.zeros((n_slots + 1,), bool).at[addr].set(True)[:-1]
    positions = put(state.positions, "far")
    slot_nbrs = CellGridState(
        addr=jnp.arange(n_slots, dtype=jnp.int32),
        occupied=occupied,
        sorted_diam=put1(state.diameters, 1),
        ref_positions=positions,
        overflow=nbrs.overflow,
    )
    return state.replace(
        positions=positions,
        velocities=put(state.velocities, 0),
        forces=put(state.forces, 0),
        images=put(state.images, 0),
        diameters=put1(state.diameters, 1),
        pos_comp=put(state.pos_comp, 0),
        vel_comp=put(state.vel_comp, 0),
        ids=put1(jnp.arange(n, dtype=jnp.int32), -1),
        nbrs=slot_nbrs,
    )


def slot_forces(state: SimulationState, engine: CellGridEngine,
                force_dtype=None) -> SimulationState:
    """Materialise forces/energy/virial on a freshly slotified state."""
    dtype = state.positions.dtype
    if force_dtype is not None and dtype != force_dtype:
        e, w, f, nbrs = engine.compute_slots(
            state.positions.astype(force_dtype),
            state.diameters.astype(force_dtype),
            state.unitcell.astype(force_dtype),
            state.unitcell_inv.astype(force_dtype), state.nbrs)
        e, w, f = e.astype(dtype), w.astype(dtype), f.astype(dtype)
    else:
        e, w, f, nbrs = engine.compute_slots(
            state.positions, state.diameters, state.unitcell,
            state.unitcell_inv, state.nbrs)
    return state.replace(forces=f, energy=e, virial=w, nbrs=nbrs)


def _host_wrap(pos, images, cell):
    """Fold (N, d) positions into the box, accumulating crossing counts
    into images (numpy, f64 arithmetic). Deferred wrap leaves up to skin/2
    of unwrapped drift between rebuilds; outputs and returned states fold
    it here."""
    cell64 = np.asarray(cell, np.float64)
    frac = np.asarray(pos, np.float64) @ np.linalg.inv(cell64).T
    n = np.floor(frac)
    pos = (np.asarray(pos, np.float64) - n @ cell64.T).astype(
        np.asarray(pos).dtype)
    return pos, np.asarray(images) + n.astype(np.asarray(images).dtype)


def unslotify_arrays(state: SimulationState):
    """(positions, velocities, diameters, images) of the real rows as numpy
    (N, d) arrays (row order is the current slot order, not the original
    particle order). Positions are folded into the box (deferred wrap)."""
    occ = np.asarray(state.nbrs.occupied)
    pos = np.asarray(state.positions).T[occ]
    vel = np.asarray(state.velocities).T[occ]
    diam = np.asarray(state.diameters)[occ]
    images = np.asarray(state.images).T[occ]
    pos, images = _host_wrap(pos, images, state.unitcell)
    return pos, vel, diam, images


def unslotify_state(state: SimulationState) -> SimulationState:
    """Restore a slot-layout state to an ordinary (N, d) particle-order
    state, rows sorted back to ORIGINAL particle order via ``state.ids``
    (slot order changes at every rebuild; stable ids are what make
    trajectory rows and resumed runs meaningful). Host-side (numpy): used
    at driver output/checkpoint boundaries and at the end of a run.
    ``nbrs`` is dropped (rebuilt lazily by whichever engine runs next)."""
    occ = np.asarray(state.nbrs.occupied)
    ids = np.asarray(state.ids)[occ]
    order = np.argsort(ids)

    def take2(a):
        return np.asarray(a).T[occ][order]

    def take1(a):
        return jnp.asarray(np.asarray(a)[occ][order])

    # Fold the deferred-wrap residual drift (<= skin/2) into the box. The
    # f32 re-rounding this applies to recently-crossed coordinates is the
    # same class of rounding the per-step wrap used to apply every step;
    # pos_comp keeps its (approximate) low-word role.
    pos, images = _host_wrap(take2(state.positions), take2(state.images),
                             state.unitcell)
    return state.replace(
        positions=jnp.asarray(pos),
        velocities=jnp.asarray(take2(state.velocities)),
        forces=jnp.asarray(take2(state.forces)),
        images=jnp.asarray(images),
        pos_comp=jnp.asarray(take2(state.pos_comp)),
        vel_comp=jnp.asarray(take2(state.vel_comp)),
        diameters=take1(state.diameters),
        ids=None,
        nbrs=None,
    )


def fold_wrap(state: SimulationState):
    """Deferred-wrap fold: bring every occupied position into the box
    through the compensated (Kahan) add, accumulate crossing counts into
    ``images``, and return the in-box fractional components (the rebin's
    binning input). Between rebuilds positions drift unwrapped (saving the
    per-step fold AND the sweep's per-slot MIC); this applies the
    accumulated fold exactly once."""
    from mdtpu.utils.math import kahan_add

    dim = state.positions.shape[0]
    occ = state.nbrs.occupied
    frac = _frac_components(state.positions, state.unitcell_inv)
    n_cross = [jnp.where(occ, jnp.floor(f), jnp.zeros_like(f)) for f in frac]
    delta = jnp.stack([
        -sum(state.unitcell[k, j] * n_cross[j] for j in range(dim))
        for k in range(dim)])
    positions, pos_comp = kahan_add(state.positions, state.pos_comp, delta)
    images = state.images + jnp.stack(n_cross).astype(state.images.dtype)
    state = state.replace(positions=positions, pos_comp=pos_comp,
                          images=images)
    frac = [f - n for f, n in zip(frac, n_cross)]  # fractional, in [0, 1)
    return state, frac


def pack_state_rows(state: SimulationState):
    """All per-slot state rows stacked into one (R, n_slots) array (the
    packed-rebin payload; also the migration-buffer row format — keep the
    two in sync via this single packer)."""
    dtype = state.positions.dtype
    occ = state.nbrs.occupied
    id_rows = [] if state.ids is None else split_id_rows(state.ids, dtype)
    return jnp.concatenate([
        state.positions,                       # dim rows, far-pad fill
        state.velocities,                      # dim rows, 0
        state.forces,                          # dim
        state.pos_comp,                        # dim
        state.vel_comp,                        # dim
        state.images.astype(dtype),            # dim (int counts, f32-exact)
        state.diameters[None],                 # 1, fill 1
        occ.astype(dtype)[None],               # 1, fill 0
    ] + id_rows)


def unpack_state_rows(state: SimulationState, packed, occupied=None,
                      position_fill=None):
    """Inverse of :func:`pack_state_rows` (``packed`` already resorted).

    ``position_fill=(valid, far)``: overwrite vacant slots' positions with
    the far-pad ramp ``far`` (one fused select on ``dim`` rows). This is
    the ONLY per-field select allowed here: applying all vacant fills as
    per-field wheres on slices of the shared gather output made XLA's
    layout assignment flip the (R, n_slots) intermediate per consumer —
    6 transposes + 24 copies of ~37 MB arrays, 26.4 ms vs 10.6 ms for the
    whole resort at 426k slots (probe_rebin_parts7/8.py + HLO dump). All
    constant fills instead ride the gather via :func:`packed_resort`'s
    appended fill column."""
    dim = state.positions.shape[0]
    positions = packed[0:dim]
    if position_fill is not None:
        valid, far = position_fill
        positions = jnp.where(valid[None, :], positions, far[None])
    diameters = packed[6 * dim]
    if occupied is None:
        occupied = packed[6 * dim + 1] != 0
    nbrs = state.nbrs.replace(
        occupied=occupied,
        sorted_diam=diameters,
        ref_positions=positions,
    )
    if state.ids is None:
        ids = None
    elif jnp.dtype(packed.dtype).itemsize == 4:
        ids = join_id_rows(packed[6 * dim + 2], packed[6 * dim + 3])
    else:
        ids = join_id_rows(packed[6 * dim + 2])
    return state.replace(
        positions=positions,
        velocities=packed[dim:2 * dim],
        forces=packed[2 * dim:3 * dim],
        pos_comp=packed[3 * dim:4 * dim],
        vel_comp=packed[4 * dim:5 * dim],
        images=packed[5 * dim:6 * dim].astype(state.images.dtype),
        diameters=diameters,
        ids=ids,
        nbrs=nbrs,
    )


def packed_resort(state: SimulationState, cid, n_cells: int, cap: int,
                  far_offset=None, extra_rows=None, extra_cid=None):
    """Re-sort all slot arrays by target cell id (the rebuild core).

    Fixed shapes, GATHER-formulated: one (m,) key sort carrying the source
    index, per-cell run starts by vectorized binary search over the sorted
    keys, then ONE packed (R, n_slots) gather pulling every state row at
    once — slot ``c*cap + k`` reads source row ``order[starts[c] + k]``.
    The earlier scatter formulation (``base.at[:, addr].set(rows_sorted)``)
    was the rebin bottleneck at scale: TPU scatters serialize over indices
    (probe_sort.py: 53 ms at 426k slots, 199 ms at 1.67M for the 23-row
    packed scatter, vs 5.4/53 ms for the equivalent gather and ~3-5 ms for
    the sort itself), so inverting the permutation analytically and
    gathering is ~3-4x cheaper end-to-end.

    Vacant-slot fills ride the gather itself: ``rows`` is padded with ONE
    fill column holding each row's vacant constant (0 for velocities/
    forces/comps/images/occupancy, 1 for diameters, the id sentinels) and
    invalid slots' source index points at it. Only positions need a
    per-slot value (the far-pad ramp must keep vacant coordinates unique
    and >= 4 apart) — applied as one ``dim``-row select in
    :func:`unpack_state_rows`. Applying ALL fills as per-field selects on
    the gather output instead made XLA layout-flip the shared intermediate
    per consumer (6 transposes + 24 copies: 26.4 ms vs 10.6 ms for this
    form at 426k slots, probe_rebin_parts8.py).

    ``cid``: per-row target cell (= ``n_cells`` for vacant/trash rows).
    ``far_offset``: far-pad ramp INDEX offset (see
    :func:`mdtpu.ops.cell_grid.far_ramp`) — sharded callers pass a
    per-device offset so no two devices' vacant slots coincide (coinciding
    vacants in a ghost exchange would make an r2 = 0 pair).
    ``extra_rows``/``extra_cid``: additional pre-packed rows (the sharded
    migration buffers received from neighbor shards) resorted along with
    the local rows into the same slot space.
    Returns ``(state', overflow)`` with overflow = any row dropped past
    cell capacity."""
    dim = state.positions.shape[0]
    n_slots = n_cells * cap
    dtype = state.positions.dtype

    rows = pack_state_rows(state)
    if extra_rows is not None:
        rows = jnp.concatenate([rows, extra_rows.astype(dtype)], axis=1)
        cid = jnp.concatenate([cid, extra_cid])
    m = rows.shape[1]

    # One sort carrying the identity payload gives sorted keys AND the
    # permutation. is_stable=False: slot order WITHIN a cell is arbitrary
    # (the sweeps are order-independent and unslotify re-sorts by ids) and
    # the unstable network is cheaper.
    iota = jnp.arange(m, dtype=jnp.int32)
    cid_sorted, order = jax.lax.sort((cid, iota), num_keys=1,
                                     is_stable=False)
    # Per-cell run boundaries in the sorted keys: starts[c] = first sorted
    # position with key >= c (length n_cells + 1; starts[n_cells] bounds the
    # last real cell against the trash run). O(n_cells log m) binary-search
    # gathers — noise next to the sort.
    starts = jnp.searchsorted(cid_sorted,
                              jnp.arange(n_cells + 1, dtype=cid.dtype),
                              side="left").astype(jnp.int32)
    counts = starts[1:] - starts[:-1]              # (n_cells,)
    overflow = jnp.any(counts > cap)
    # Target slot c*cap + k sources sorted row starts[c] + k while k is
    # within the cell's run (k < counts[c], k < cap by construction).
    idx = (starts[:-1, None] + jnp.arange(cap, dtype=jnp.int32)[None, :])
    valid = (idx < starts[1:, None]).reshape(-1)   # (n_slots,) occupancy
    src = order[jnp.clip(idx.reshape(-1), 0, m - 1)]

    # Append the vacant fill column and route invalid slots' reads to it —
    # the constant fills come out of the ONE packed gather for free.
    fills = [jnp.zeros((6 * dim, 1), dtype),       # pos/vel/frc/pc/vc/img
             jnp.ones((1, 1), dtype),              # diameters
             jnp.zeros((1, 1), dtype)]             # occupancy flag
    if state.ids is not None:
        fills += [jnp.full((1, 1), f, dtype) for f in id_row_fills(dtype)]
    rows = jnp.concatenate([rows] + [jnp.concatenate(fills, axis=0)], axis=1)
    src = jnp.where(valid, src, m)
    packed = jnp.take(rows, src, axis=1)           # ONE packed gather

    # Positions are the one field whose vacant fill is per-slot: the
    # exactly-representable far-pad ramp (vacant coordinates must stay
    # unique and >= 4 apart so no vacant pair ever hits r2 = 0).
    far = _far_row(n_slots, dtype,
                   far_k0=0 if far_offset is None else far_offset)[:-1]
    return unpack_state_rows(state, packed, occupied=valid,
                             position_fill=(valid, far)), overflow


def _rebin(state: SimulationState, engine: CellGridEngine) -> SimulationState:
    """Re-sort all slot arrays by current cells (the rebuild): deferred-wrap
    fold + cell binning + :func:`packed_resort`."""
    dim = state.positions.shape[0]
    cap = engine.cell_capacity
    n_cells = int(np.prod(engine.grid))
    grid = jnp.asarray(engine.grid, jnp.int32)

    state, frac = fold_wrap(state)
    occ = state.nbrs.occupied
    coords = [jnp.clip((f * grid[k]).astype(jnp.int32), 0, grid[k] - 1)
              for k, f in enumerate(frac)]
    strides = np.concatenate(
        [np.cumprod(np.asarray(engine.grid)[::-1])[-2::-1], [1]]
    ).astype(np.int32)
    cid = sum(coords[k] * int(strides[k]) for k in range(dim))
    cid = jnp.where(occ, cid, n_cells)

    state, overflow = packed_resort(state, cid, n_cells, cap)
    return state.replace(nbrs=state.nbrs.replace(
        overflow=state.nbrs.overflow | overflow))


def slot_needs_rebin(state: SimulationState, engine: CellGridEngine):
    """True when any particle drifted past skin/2 from its binning reference.

    Deferred wrap makes this a PLAIN Cartesian distance: positions never
    fold between rebuilds, so x - ref is the true displacement (no
    fractional minimum-image round trip)."""
    dim = state.positions.shape[0]
    d2 = sum((state.positions[k] - state.nbrs.ref_positions[k]) ** 2
             for k in range(dim))
    half_skin = 0.5 * engine.skin
    return jnp.any(d2 > half_skin * half_skin)


def _engine_rebin(state, engine):
    """Dispatch the rebuild: engines with their own slot-rebin (the sharded
    halo-slot engine's local rebin) override the single-device binning."""
    fn = getattr(engine, "slot_rebin", None)
    return fn(state) if fn is not None else _rebin(state, engine)


def _engine_needs_rebin(state, engine, axis_name=None):
    local = slot_needs_rebin(state, engine)
    if axis_name is not None:
        # Uniform decision across shards: every device must enter the rebin
        # cond together (the rebin itself is local-only, but the while-loop
        # trip counts must agree).
        return jax.lax.psum(local.astype(jnp.int32), axis_name) > 0
    return local


def make_slot_step(params: Parameters, ensemble, engine: CellGridEngine,
                   compensated: bool = True, force_dtype=None,
                   rebin_check: bool = True, observables: bool = True,
                   hilo: bool = False, axis_name: str | None = None):
    """Fused step over a component-major slot-ordered state (see module
    docstring). ``force_dtype``: evaluate the sweep in this dtype (e.g. f64
    for the NVE drift gate — the upcast is exact, see
    mdtpu.integrate.step.make_md_step).

    ``rebin_check=False`` drops the per-step ``lax.cond`` rebin: measured on
    TPU v5e at the N=65k bench, that cond costs 1.12 ms/step — as much as the
    entire pair sweep — while the step body itself is 1.15 ms (probe_slot.py
    variants). Callers must then orchestrate rebuilds themselves; use
    ``make_slot_advance`` which hoists the check into a nested while_loop.

    ``axis_name``: when the step runs inside ``shard_map`` (slot arrays
    sharded over their slot axis — the halo-slot engine), global reductions
    (Bussi kinetic, temperature, the rebin decision) become psums over this
    axis; the engine's ``compute_slots`` is then responsible for its own
    halo collectives. The SAME choreography serves single-chip and sharded
    execution — one slot-physics implementation in the codebase."""
    is_brownian = isinstance(ensemble, Brownian)
    # Brownian accumulates the 10-step-averaged virial in-loop
    # (/root/reference/src/simulation.jl:253-256), so it always observes.
    obs = True if is_brownian else observables
    if hilo and (force_dtype is not None or not compensated):
        raise ValueError("hilo pair sweep needs compensated=True and no "
                         "force_dtype upcast (it IS the precision mechanism)")

    def sweep(x, diameters, cell, cell_inv, nbrs, out_dtype, xc=None):
        if hilo:
            # The Kahan compensation holds the negated low word of the
            # position (true = x - comp): feed (hi, lo) to the sweep so pair
            # displacements carry double-f32 precision (see
            # CellGridEngine.compute_slots pos_lo).
            return engine.compute_slots(x, diameters, cell, cell_inv, nbrs,
                                        observables=obs, pos_lo=-xc)
        if force_dtype is not None and x.dtype != force_dtype:
            e, w, f, nbrs = engine.compute_slots(
                x.astype(force_dtype), diameters.astype(force_dtype),
                cell.astype(force_dtype), cell_inv.astype(force_dtype), nbrs,
                observables=obs)
            return (e.astype(out_dtype), w.astype(out_dtype),
                    f.astype(out_dtype), nbrs)
        return engine.compute_slots(x, diameters, cell, cell_inv, nbrs,
                                    observables=obs)

    def maybe_rebin(state):
        if getattr(engine, "rebin_unconditional", False):
            # Engines whose rebin contains collectives (the sharded
            # halo-slot migration ppermutes) must never rebin under a
            # lax.cond branch — run it unconditionally (exact either way).
            return _engine_rebin(state, engine)
        return jax.lax.cond(_engine_needs_rebin(state, engine, axis_name),
                            lambda s: _engine_rebin(s, engine),
                            lambda s: s, state)

    def step(state: SimulationState) -> SimulationState:
        dtype = state.positions.dtype
        dt = jnp.asarray(params.dt, dtype)
        half = 0.5 * dt
        cell, cell_inv = state.unitcell, state.unitcell_inv

        if rebin_check:
            state = maybe_rebin(state)
        occ = state.nbrs.occupied

        if is_brownian:
            energy, virial, forces, nbrs = sweep(
                state.positions, state.diameters, cell, cell_inv, state.nbrs,
                dtype, xc=state.pos_comp)
            ktemp = jnp.asarray(ensemble.ktemp, dtype)
            noise = jnp.where(
                occ[None, :],
                brownian_noise(state.key, state.step, state.positions.shape,
                               dtype, axis_name),
                0.0)
            dx = forces * (dt / ktemp) + noise * jnp.sqrt(2.0 * dt)
            # Deferred wrap: positions drift unwrapped until the next rebin
            # (which folds them and updates images).
            x, xc = _add(state.positions, state.pos_comp, dx, compensated)
            virial_accum, nprom = brownian_virial_sample(state, virial)
            return state.replace(
                positions=x, forces=forces,
                step=state.step + 1, energy=energy, virial=virial,
                temperature=ktemp, pos_comp=xc, nbrs=nbrs,
                virial_accum=virial_accum, nprom=nprom,
            )

        v, vc = _add(state.velocities, state.vel_comp, state.forces * half,
                     compensated)
        # Deferred wrap: positions drift unwrapped until the next rebin.
        x, xc = _add(state.positions, state.pos_comp, v * dt, compensated)

        energy, virial, forces, nbrs = sweep(
            x, state.diameters, cell, cell_inv, state.nbrs, dtype, xc=xc)
        if not obs:
            # Lean step: scalars weren't accumulated; carry the last observed
            # values (refreshed by the full step at every segment boundary,
            # see make_slot_advance).
            energy, virial = state.energy, state.virial

        v, vc = _add(v, vc, forces * half, compensated)

        # Ensemble logic — the SAME implementation as the particle-order
        # step (mdtpu.integrate.step.md_velocity_finish): slot velocities
        # are (d, S) with zeros in unoccupied slots, so the kinetic
        # reduction is exact.
        v, vc, temperature = md_velocity_finish(ensemble, v, vc, state, dt,
                                                compensated, axis_name)

        return state.replace(
            positions=x, velocities=v, forces=forces,
            step=state.step + 1, energy=energy, virial=virial,
            temperature=temperature, pos_comp=xc, vel_comp=vc, nbrs=nbrs,
        )

    return step


def make_slot_advance(params: Parameters, ensemble, engine: CellGridEngine,
                      compensated: bool = True, force_dtype=None,
                      lean: bool = True, hilo: bool = False,
                      axis_name: str | None = None):
    """``advance(state, k) -> state`` after k fused slot steps, with the skin
    rebuild hoisted OUT of the per-step path and (``lean=True``) the
    energy/virial accumulation skipped on all but the last step.

    The hot loop is an inner ``while_loop`` of plain steps whose predicate
    exits when any particle has drifted past skin/2; the outer loop re-bins
    (cond, amortized over the rebuild interval) and re-enters. Step-for-step
    identical to the per-step cond form: the rebuild happens at the start of
    exactly the same steps, and forces are bitwise identical in lean mode —
    the k-th step always runs the full sweep so ``state.energy``/``virial``
    are fresh wherever the caller can read them (thermo/sample boundaries).

    Role analog: CellListMap's UpdateParticleSystem! rebuild + per-step
    energy accumulation, both of which the reference pays EVERY step
    (/root/reference/src/simulation.jl:100-104); the skin deferral and the
    observable-free steps are this framework's redesign."""
    step = make_slot_step(params, ensemble, engine, compensated=compensated,
                          force_dtype=force_dtype, rebin_check=False,
                          observables=not lean, hilo=hilo,
                          axis_name=axis_name)
    last_step = make_slot_step(params, ensemble, engine,
                               compensated=compensated,
                               force_dtype=force_dtype, rebin_check=True,
                               hilo=hilo, axis_name=axis_name)

    def needs(state):
        return _engine_needs_rebin(state, engine, axis_name)

    def advance(state: SimulationState, k) -> SimulationState:
        k = jnp.asarray(k, jnp.int32)
        n_lean = k - 1 if lean else k

        def outer_cond(carry):
            s, i = carry
            return i < n_lean

        def outer_body(carry):
            s, i = carry
            if getattr(engine, "rebin_unconditional", False):
                s = _engine_rebin(s, engine)
            else:
                s = jax.lax.cond(needs(s),
                                 lambda t: _engine_rebin(t, engine),
                                 lambda t: t, s)

            # The inner predicate must stay a trivial read of a carried
            # scalar: putting the O(n_slots) drift reduction in the while
            # cond (or a lax.cond in the step) costs ~1 ms/step at the 65k
            # bench — XLA runs the cond computation as its own kernel
            # sequence over the full carry. Computed in the BODY instead, it
            # fuses with the step's own elementwise work for free.
            def inner_cond(c):
                s2, j, rebuild = c
                return (j < n_lean) & ~rebuild

            def inner_body(c):
                s2, j, _ = c
                s2 = step(s2)
                return s2, j + 1, needs(s2)

            s, i, _ = jax.lax.while_loop(inner_cond, inner_body,
                                         (s, i, jnp.asarray(False)))
            return s, i

        out, _ = jax.lax.while_loop(outer_cond, outer_body,
                                    (state, jnp.int32(0)))
        if lean:
            # Final full step (rebin + observable sweep): segment
            # boundaries always expose fresh energy/virial.
            if getattr(engine, "rebin_unconditional", False):
                # The sharded step contains collectives, which are not
                # SPMD-safe under lax.cond — run it unconditionally
                # (callers always advance k >= 1 steps; the k = 0 guard
                # only exists for the single-chip path's generality).
                out = last_step(out)
            else:
                out = jax.lax.cond(k > 0, last_step, lambda s: s, out)
        return out

    return advance
