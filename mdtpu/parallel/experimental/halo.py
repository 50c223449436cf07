"""Halo-exchange sharded cell-grid engine — the scalable multi-chip sweep.

Replaces the O(N^2/P) all-gather sweep with true spatial domain
decomposition, the TPU-native analog of CellListMap's threaded cell-list
map-reduce (/root/reference/src/pairwise.jl:17-23, ``parallel=true`` at
/root/reference/src/initialization.jl:106) scaled over a device mesh:

  * the global cell grid (nx, ny, nz) is sharded over x-planes: device p owns
    planes [p*mx, (p+1)*mx), mx = nx/P. Particle rows are sharded to match —
    device p's row slab holds exactly the particles living in its planes
    (established by :func:`reshard`), padded to a fixed per-device capacity
    with far-away pad rows;
  * per step (inside ``shard_map``), each device refreshes its local sorted
    slot grids (same far-pad / ghost-window machinery as the single-device
    engine), then ``ppermute``s ONE boundary plane window over ICI — the +x
    ghost needed by the Newton half stencil — computes the unchanged z-window
    sweep locally, ppermutes the reaction forces on the ghost plane back, and
    ``psum``s the energy/virial scalars;
  * communication per step is O(ny * nz * 3C) — the surface, not the volume.

Particle migration across slab boundaries happens at reshard time (driver
event boundaries / rebuild cadence) through one fixed-shape global scatter;
between reshards particles may drift up to skin/2 (the same staleness
contract as the single-device engine's rebuild). A drift beyond skin/2 or a
slab-capacity overflow raises the ``overflow`` flag for the driver, exactly
like cell-capacity overflow in the single-device engines.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mdtpu.core.types import SimulationState
from mdtpu.ops.cell_grid import (
    FAR_RAMP_MAX,
    FAR_RAMP_MIN,
    far_ramp,
    ghost_z_window,
)
from mdtpu.ops.neighbor_list import _grid_for_box
from mdtpu.parallel.geometry import tuned_sharded_geometry
from mdtpu.parallel.mesh import SHARD_AXIS

# Rows whose coordinate exceeds this are pad/vacant. Derived from the far
# ramp's minimum so the invariant (every far value > threshold > every real
# coordinate) cannot silently break if the ramp changes.
_FAR_THRESHOLD = 0.5 * FAR_RAMP_MIN




@struct.dataclass
class HaloGridState:
    addr: jnp.ndarray           # (n_loc,) local slot address (trash if pad)
    sorted_diam: jnp.ndarray    # (mx*ny*nz*C,) local sorted diameters
    ref_positions: jnp.ndarray  # (n_loc, 3) positions at build time
    overflow: jnp.ndarray       # () bool — capacity overflow or slab escape


@struct.dataclass
class HaloCellGridEngine:
    """Engine-protocol sweep for ``shard_map`` execution (see module doc).

    Static geometry: ``grid`` is the GLOBAL cell grid; ``n_shards`` devices
    each own nx/n_shards x-planes. ``compute``/``allocate`` run on the local
    row slab (n_loc rows = n_pad_total / n_shards).
    """

    potential: Any
    cutoff: float = struct.field(pytree_node=False, default=1.5)
    skin: float = struct.field(pytree_node=False, default=0.3)
    grid: Tuple[int, ...] = struct.field(pytree_node=False, default=(8, 3, 3))
    cell_capacity: int = struct.field(pytree_node=False, default=16)
    n_shards: int = struct.field(pytree_node=False, default=8)
    axis_name: str = struct.field(pytree_node=False, default=SHARD_AXIS)

    @classmethod
    def create(cls, potential, cutoff, skin, unitcell, n_particles, n_shards,
               cell_capacity=None, axis_name=SHARD_AXIS, max_sigma=1.0):
        from mdtpu.potentials.base import check_engine_cutoff

        check_engine_cutoff(potential, cutoff, max_sigma)
        grid = _grid_for_box(unitcell, cutoff, skin)
        if grid is None or len(grid) != 3:
            raise ValueError("halo engine needs a 3D box large enough for a "
                             "cell grid at this cutoff")
        nx = grid[0] - grid[0] % n_shards  # shrink to a multiple of P
        if nx < n_shards:
            raise ValueError(
                f"box too small to shard {grid[0]} x-planes over "
                f"{n_shards} devices")
        grid = (nx, grid[1], grid[2])
        if cell_capacity is None:
            mean_occ = n_particles / int(np.prod(grid))
            cell_capacity = int(math.ceil(mean_occ + 3.5 * math.sqrt(mean_occ)
                                          + 2))
        return cls(potential=potential, cutoff=float(cutoff),
                   skin=float(skin), grid=grid,
                   cell_capacity=int(cell_capacity), n_shards=int(n_shards),
                   axis_name=axis_name)

    @classmethod
    def create_tuned(cls, potential, cutoff, unitcell, n_particles, n_shards,
                     min_skin=0.3, occ_sigma=2.5, axis_name=SHARD_AXIS,
                     max_sigma=1.0):
        """Padded-lane-optimal geometry for the sharded sweep — the same
        cost model as ``CellGridEngine.create_tuned`` (pair blocks are
        (C, 3C) tiles padded to (ceil8(C), ceil128(3C)) vregs; fat cells
        with C ~ 36-40 measured 1.8-2.5x faster than cutoff-sized cells,
        BENCH_NOTES), with nx constrained to a multiple of ``n_shards`` so
        every device owns an equal x-plane slab."""
        from mdtpu.potentials.base import check_engine_cutoff

        check_engine_cutoff(potential, cutoff, max_sigma)
        if np.asarray(unitcell).shape[0] != 3:
            raise ValueError("the row-layout halo engine is 3D-only (the "
                             "slot-layout HaloSlotEngine shards 2D too)")
        grids, cap, skin = tuned_sharded_geometry(
            cutoff, unitcell, n_particles, n_shards,
            min_skin=min_skin, occ_sigma=occ_sigma)
        return cls(potential=potential, cutoff=float(cutoff),
                   skin=float(skin), grid=grids, cell_capacity=cap,
                   n_shards=int(n_shards), axis_name=axis_name)

    def with_grown_capacity(self):
        return self.replace(cell_capacity=int(self.cell_capacity * 1.4 + 4))

    @property
    def mx(self) -> int:
        return self.grid[0] // self.n_shards

    def slab_capacity(self, n_particles: int, margin: float = 0.3) -> int:
        """Fixed per-device row capacity (multiple of 8 for clean layouts)."""
        per = n_particles / self.n_shards * (1.0 + margin)
        return int(-(-per // 8) * 8)

    # ------------------------------------------------------------------ build
    def allocate(self, positions, diameters, cell, cell_inv):
        """Bin the LOCAL row slab into the local (mx, ny, nz) slot grid.

        Runs inside shard_map. Rows are pad rows iff their coordinates are
        far-pad values (set by :func:`reshard`); particles that escaped the
        local slab since the last reshard raise ``overflow``.
        """
        n_loc, dim = positions.shape
        nx, ny, nz = self.grid
        mx = self.mx
        cap = self.cell_capacity
        n_cells_loc = mx * ny * nz
        p = jax.lax.axis_index(self.axis_name)

        grid_arr = jnp.asarray(self.grid, jnp.int32)
        frac = jnp.dot(positions, cell_inv.T,
                       precision=jax.lax.Precision.HIGHEST)
        frac = frac - jnp.floor(frac)
        coords = jnp.clip((frac * grid_arr).astype(jnp.int32), 0,
                          grid_arr - 1)
        valid = positions[:, 0] < _FAR_THRESHOLD

        ix_loc = coords[:, 0] - p * mx
        in_slab = (ix_loc >= 0) & (ix_loc < mx)
        overflow_escape = jnp.any(valid & (~in_slab))

        cid = (ix_loc * ny + coords[:, 1]) * nz + coords[:, 2]
        cid = jnp.where(valid & in_slab, cid, n_cells_loc)  # trash cell

        order = jnp.argsort(cid).astype(jnp.int32)
        cid_sorted = cid[order]
        counts = jnp.zeros((n_cells_loc + 1,), jnp.int32).at[cid].add(
            jnp.int32(1))
        starts = jnp.cumsum(counts) - counts
        rank = jnp.arange(n_loc, dtype=jnp.int32) - starts[cid_sorted]
        overflow_cap = jnp.any(counts[:-1] > cap)

        slot_ok = (rank < cap) & (cid_sorted < n_cells_loc)
        addr_sorted = jnp.where(slot_ok, cid_sorted * cap + rank,
                                n_cells_loc * cap)
        addr = jnp.zeros((n_loc,), jnp.int32).at[order].set(addr_sorted)

        pad = n_cells_loc * cap + 1
        sorted_diam = jnp.ones((pad,), diameters.dtype).at[addr].set(
            diameters)[:-1]

        return HaloGridState(
            addr=addr, sorted_diam=sorted_diam, ref_positions=positions,
            overflow=jax.lax.psum(
                (overflow_escape | overflow_cap).astype(jnp.int32),
                self.axis_name) > 0,
        )

    def needs_rebuild(self, positions, nbrs, cell, cell_inv):
        # Migration/resharding is scheduled by the driver (event boundaries),
        # not by in-loop control flow: collectives inside a lax.cond are not
        # SPMD-safe. Staleness beyond skin/2 is surfaced via the overflow
        # flag in compute() instead. Plain False: engine_forces skips the
        # rebuild cond statically.
        return False

    def nbrs_partition_specs(self):
        """PartitionSpec subtree for HaloGridState under shard_map: local
        per-device arrays sharded over their leading axis, the psum'ed
        overflow flag replicated."""
        from jax.sharding import PartitionSpec as P

        ax = self.axis_name
        return HaloGridState(addr=P(ax), sorted_diam=P(ax),
                             ref_positions=P(ax), overflow=P())

    # ---------------------------------------------------------------- forces
    def compute(self, positions, diameters, cell, cell_inv,
                nbrs: HaloGridState):
        n_loc, dim = positions.shape
        dtype = positions.dtype
        nx, ny, nz = self.grid
        mx = self.mx
        cap = self.cell_capacity
        c3 = 3 * cap
        n_cells_loc = mx * ny * nz
        pad = n_cells_loc * cap + 1
        axis = self.axis_name
        p = jax.lax.axis_index(axis)

        # --- refresh local slot grids over the far-pad base (ref + MIC) ----
        # The far base is offset per device (non-overlapping ranges): a ghost
        # plane's vacant slot must never coincide with a local vacant slot,
        # or their r2 = 0 pair turns into inf - inf = NaN.
        from mdtpu.core.box import minimum_image

        disp = minimum_image(positions - nbrs.ref_positions, cell, cell_inv)
        eff_t = (nbrs.ref_positions + disp).T
        drift2 = jnp.sum(disp * disp, axis=-1)
        if self.n_shards * (pad + 1) > FAR_RAMP_MAX:
            raise ValueError("sharded far-pad ramp budget exceeded")
        far = far_ramp(pad, dtype, k0=p * (pad + 1))
        grids = [far.at[nbrs.addr].set(eff_t[k])[:-1].reshape(mx, ny, nz, cap)
                 for k in range(dim)]
        # Pad rows (trash address) carry meaningless drift — exclude them.
        drift2 = jnp.where(nbrs.addr >= n_cells_loc * cap,
                           jnp.zeros_like(drift2), drift2)
        half_skin = 0.5 * self.skin
        stale = jnp.any(drift2 > half_skin * half_skin)
        diam = nbrs.sorted_diam.reshape(mx, ny, nz, cap)

        # Ghost image shifts are full cell vectors (triclinic-safe; zeros on
        # the off-diagonals for orthorhombic boxes).
        win = [ghost_z_window(grids[k], cell[k, 2]) for k in range(dim)]
        win.append(ghost_z_window(diam))
        win = [w.reshape(mx, ny, nz, c3) for w in win]

        # --- halo exchange: receive the right neighbor's first plane -------
        n_sh = self.n_shards
        fwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]   # i sends to i-1
        ghosts = []
        for k, w in enumerate(win):
            g = jax.lax.ppermute(w[:1], axis, fwd)  # (1, ny, nz, 3C)
            if k < dim:
                # Periodic image: the ghost received by the LAST device is
                # global plane 0 — shift it by the x cell vector.
                g = g + jnp.where(p == n_sh - 1, cell[k, 0],
                                  jnp.zeros((), dtype))
            ghosts.append(g)
        ext = [jnp.concatenate([w, g], axis=0) for w, g in zip(win, ghosts)]

        # --- z-window sweep over the local planes (half stencil) -----------
        cutoff2 = jnp.asarray(self.cutoff * self.cutoff, dtype)
        own = [g.reshape(n_cells_loc, cap, 1) for g in grids]
        own_diam = diam.reshape(n_cells_loc, cap, 1)

        i_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, c3), 0)
        j_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, c3), 1)
        diag_bump = jnp.where(j_ids == i_ids + cap,
                              jnp.asarray(1e30, dtype),
                              jnp.zeros((), dtype))[None]

        def pair_block(wc, wd, exclude_self):
            wc = [w.reshape(n_cells_loc, 1, c3) for w in wc]
            wd = wd.reshape(n_cells_loc, 1, c3)
            d_comps = [own[k] - wc[k] for k in range(dim)]
            r2 = sum(dk * dk for dk in d_comps)
            if exclude_self:
                r2 = r2 + diag_bump
            mask = r2 < cutoff2
            u, f_over_r = self.potential.evaluate_r2(r2, own_diam, wd)
            u = jnp.where(mask, u, jnp.zeros_like(u))
            f_over_r = jnp.where(mask, f_over_r, jnp.zeros_like(f_over_r))
            return u, f_over_r, r2, d_comps

        def view(ox, oy):
            """Neighbor window for in-plane offset (ox, oy) over the
            x-extended arrays, with ghost y shifts baked in."""
            out = []
            for k in range(dim + 1):
                w = ext[k][ox:ox + mx] if ox else win[k]
                if oy == 1:
                    first = w[:, :1] + cell[k, 1] if k < dim else w[:, :1]
                    w = jnp.concatenate([w[:, 1:], first], axis=1)
                elif oy == -1:
                    last = w[:, -1:] - cell[k, 1] if k < dim else w[:, -1:]
                    w = jnp.concatenate([last, w[:, :-1]], axis=1)
                out.append(w)
            return out[:dim], out[dim]

        # Self column.
        u, f_over_r, r2s, d_comps = pair_block(win[:dim], win[dim], True)
        energy = 0.5 * jnp.sum(u)
        virial = 0.5 * jnp.sum(f_over_r * r2s)
        f_own = [jnp.sum(f_over_r * d_comps[k], axis=2) for k in range(dim)]

        def unwindow(reaction, m):
            r = reaction.reshape(m, ny, nz, 3, cap)
            return (jnp.roll(r[..., 0, :], -1, axis=2) + r[..., 1, :]
                    + jnp.roll(r[..., 2, :], 1, axis=2))

        # Reaction accumulator over mx + 1 planes (the +1 receives the
        # reactions destined for the ghost plane / right neighbor).
        react_ext = [jnp.zeros((mx + 1, ny, nz, cap), dtype)
                     for _ in range(dim)]

        for ox, oy in ((0, 1), (1, -1), (1, 0), (1, 1)):
            wc, wd = view(ox, oy)
            u, f_over_r, r2s, d_comps = pair_block(wc, wd, False)
            energy = energy + jnp.sum(u)
            virial = virial + jnp.sum(f_over_r * r2s)
            for k in range(dim):
                f_own[k] = f_own[k] + jnp.sum(f_over_r * d_comps[k], axis=2)
                react = -jnp.sum(f_over_r * d_comps[k], axis=1)
                r = unwindow(react, mx)
                # y roll-back within the plane, then place at x + ox.
                r = jnp.roll(r, oy, axis=1)
                react_ext[k] = react_ext[k].at[ox:ox + mx].add(r)

        # Fold local reactions; send the ghost-plane reactions back to the
        # right neighbor (they own global plane (p+1)*mx).
        bwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        for k in range(dim):
            f_own[k] = f_own[k] + react_ext[k][:mx].reshape(n_cells_loc, cap)
            back = jax.lax.ppermute(react_ext[k][mx:], axis, bwd)
            f_own[k] = f_own[k].reshape(mx, ny, nz, cap).at[:1].add(
                back).reshape(n_cells_loc, cap)

        energy = jax.lax.psum(energy, axis)
        virial = jax.lax.psum(virial, axis)

        # Back to local row order (pad rows hit the zero trash slot).
        forces = jnp.stack(
            [jnp.concatenate([f_own[k].reshape(-1),
                              jnp.zeros((1,), dtype)])[nbrs.addr]
             for k in range(dim)], axis=-1)

        overflow = nbrs.overflow | (jax.lax.psum(
            stale.astype(jnp.int32), axis) > 0)
        return energy, virial, forces, nbrs.replace(overflow=overflow)


# ---------------------------------------------------------------------------
# Global reshard (outside shard_map): migrate rows to their owner slabs.
# ---------------------------------------------------------------------------


def allocate_sharded(state: SimulationState, engine: HaloCellGridEngine,
                     mesh) -> SimulationState:
    """Run the halo engine's allocate under shard_map on a padded, resharded
    state and attach the resulting HaloGridState. Call after :func:`reshard`
    and before building the sharded step (the step's in/out specs then carry
    the nbrs subtree with a stable pytree structure)."""
    from jax.sharding import PartitionSpec as P

    ax = engine.axis_name
    fn = jax.shard_map(
        engine.allocate, mesh=mesh,
        in_specs=(P(ax), P(ax), P(), P()),
        out_specs=engine.nbrs_partition_specs(),
        check_vma=False,
    )
    nbrs = jax.jit(fn)(state.positions, state.diameters, state.unitcell,
                       state.unitcell_inv)
    return state.replace(nbrs=nbrs)


def pad_count(n_particles: int, engine: HaloCellGridEngine,
              margin: float = 0.3) -> int:
    """Total padded row count P * slab_capacity."""
    return engine.n_shards * engine.slab_capacity(n_particles, margin)


def pad_state(state: SimulationState, engine: HaloCellGridEngine,
              margin: float = 0.3) -> SimulationState:
    """Append far-pad rows so each device slab has fixed capacity. The padded
    rows carry far coordinates, zero velocities/forces and unit diameters;
    ``state.nf`` already encodes the true particle count, so all physics
    (temperature, thermostat, outputs) is unchanged.

    An ``ids`` row (original particle index; -1 on pad rows) is attached and
    carried through every :func:`reshard` — particle identity survives
    migration across slabs, so trajectory rows, snapshots and checkpoints
    come back in original particle order exactly like the single-device
    driver's outputs."""
    n = state.positions.shape[0]
    n_pad = pad_count(n, engine, margin)
    extra = n_pad - n
    if extra < 0:
        raise ValueError("padded capacity smaller than particle count")
    dtype = state.positions.dtype
    dim = state.positions.shape[1]

    far = far_ramp(n_pad - n, dtype, k0=n)
    pad_pos = jnp.stack([far] * dim, axis=-1)

    def pad_rows(a, fill):
        if a is None:
            return None
        shape = (extra,) + a.shape[1:]
        return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)], axis=0)

    ids = state.ids
    if ids is None:
        ids = jnp.arange(n, dtype=jnp.int32)
    return state.replace(
        positions=jnp.concatenate([state.positions, pad_pos], axis=0),
        velocities=pad_rows(state.velocities, 0),
        forces=pad_rows(state.forces, 0),
        images=pad_rows(state.images, 0),
        diameters=pad_rows(state.diameters, 1),
        pos_comp=pad_rows(state.pos_comp, 0),
        vel_comp=pad_rows(state.vel_comp, 0),
        ids=pad_rows(ids, -1),
        nbrs=None,
    )


def unpad_state(state: SimulationState,
                engine: HaloCellGridEngine) -> SimulationState:
    """Restore a padded, sharded state to an ordinary (N, d) particle-order
    state, rows sorted back to ORIGINAL particle order via ``state.ids``
    (host-side; the sharded analog of slot_step.unslotify_state). Used at
    driver checkpoint boundaries and for the returned final state."""
    trash = engine.mx * engine.grid[1] * engine.grid[2] * engine.cell_capacity
    valid = np.asarray(state.nbrs.addr) < trash
    ids = np.asarray(state.ids)[valid]
    order = np.argsort(ids)

    def take(a):
        return jnp.asarray(np.asarray(a)[valid][order])

    return state.replace(
        positions=take(state.positions),
        velocities=take(state.velocities),
        forces=take(state.forces),
        images=take(state.images),
        diameters=take(state.diameters),
        pos_comp=take(state.pos_comp),
        vel_comp=take(state.vel_comp),
        ids=None,
        nbrs=None,
    )


def reshard(state: SimulationState, engine: HaloCellGridEngine):
    """Permute rows of a padded state so device p's slab holds exactly the
    particles in its x-planes (fixed shapes; one global scatter, executed as
    cross-device collectives when the arrays are sharded). Returns
    ``(state, overflow)``: the permuted state with ``nbrs=None``
    (re-allocate under shard_map after), and a traced bool that is True iff
    some slab exceeded its fixed row capacity (grow the pad margin and
    retry — the affected particles were replaced by pad rows)."""
    n_pad = state.positions.shape[0]
    dim = state.positions.shape[1]
    dtype = state.positions.dtype
    nx = engine.grid[0]
    mx = engine.mx
    n_loc = n_pad // engine.n_shards

    pos = state.positions
    # Identify pad rows. After the first step, wrap_positions has folded the
    # pad rows' far coordinates into the box, so the coordinate threshold
    # only works on a freshly padded state; on a running state the engine's
    # addr (pad rows sit in the trash slot) is authoritative.
    nbrs = state.nbrs
    if nbrs is not None and hasattr(nbrs, "addr"):
        trash = engine.mx * engine.grid[1] * engine.grid[2] \
            * engine.cell_capacity
        valid = nbrs.addr < trash
    else:
        valid = pos[:, 0] < _FAR_THRESHOLD
    frac = jnp.dot(pos, state.unitcell_inv.T,
                   precision=jax.lax.Precision.HIGHEST)
    frac = frac - jnp.floor(frac)
    ix = jnp.clip((frac[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
    owner = jnp.where(valid, ix // mx, engine.n_shards)

    order = jnp.argsort(owner).astype(jnp.int32)
    owner_sorted = owner[order]
    counts = jnp.zeros((engine.n_shards + 1,), jnp.int32).at[owner].add(
        jnp.int32(1))
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(n_pad, dtype=jnp.int32) - starts[owner_sorted]
    is_real = owner_sorted < engine.n_shards
    slot_ok = (rank < n_loc) & is_real
    row_sorted = jnp.where(slot_ok, owner_sorted * n_loc + rank, n_pad)
    new_row = jnp.zeros((n_pad,), jnp.int32).at[order].set(row_sorted)
    # Slab overflow = a slab holds more particles than its fixed row
    # capacity; the overflowing particles would be silently dropped, so it
    # must be surfaced (grow the margin / re-pad and retry).
    overflow = jnp.any(is_real & (~slot_ok))

    far = far_ramp(n_pad + 1, dtype)

    def permute(a, fill):
        if a is None:
            return None
        shape = (n_pad + 1,) + a.shape[1:]
        if fill == "far":
            base = jnp.stack([far] * dim, axis=-1)
        else:
            base = jnp.full(shape, fill, a.dtype)
        return base.at[new_row].set(a)[:-1]

    return state.replace(
        positions=permute(state.positions, "far"),
        velocities=permute(state.velocities, 0),
        forces=permute(state.forces, 0),
        images=permute(state.images, 0),
        diameters=permute(state.diameters, 1),
        pos_comp=permute(state.pos_comp, 0),
        vel_comp=permute(state.vel_comp, 0),
        ids=permute(state.ids, -1),
        nbrs=None,
    ), overflow
