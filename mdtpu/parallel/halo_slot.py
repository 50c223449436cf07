"""Slot-space sharded halo engine — the multi-chip production hot loop.

Round 2's row-layout halo engine (now
:class:`mdtpu.parallel.experimental.halo.HaloCellGridEngine`) shards the cell
grid but keeps the STATE in particle rows: every step re-scatters positions
into the slot grid and gathers forces back — the two irregular memory ops
the single-chip slot loop was built to eliminate (they cost more than the
whole pair sweep, see mdtpu/integrate/slot_step.py). This engine closes
that generation gap: the ENTIRE sharded state lives in component-major,
cell-sorted slot order, sharded over the slot axis so device p owns exactly
the slots of its x-plane slab (cell ids are x-major, so the global slot
range [p*S_loc, (p+1)*S_loc) IS slab p — a plain :func:`slotify` with the
global grid followed by a device_put produces the sharded layout).

Per step (inside ``shard_map``, driven by the ordinary
``make_slot_step(axis_name=...)`` — ONE slot choreography in the codebase):

  * the sweep reads the local (mx, ny, nz, C) slot grids directly (no
    refresh scatter), ``ppermute``s ONE z-windowed boundary plane
    (ny, nz, 3C) over ICI for the +x half stencil, sends the ghost-plane
    reaction forces back, and ``psum``s energy/virial — O(surface)
    communication, same as the row engine. Dimension-generic: a 2D grid
    (nx, ny) shards over the same x-slabs with y-windows (ny, 3C) and the
    stencil reduced to the single +x column, mirroring the single-chip
    ``_ywindow_sweep``;
  * integration is dense local VPU work (slot layout);
  * the skin rebuild is a LOCAL packed re-sort per shard
    (:func:`~mdtpu.integrate.slot_step.packed_resort` with a per-device
    far-pad offset); particles that drift past their slab boundary are
    clamped into the edge plane — still EXACT while the excursion is
    shallower than one cell (the ghost plane covers it) — and flagged for a
    driver-level reshard once the excursion risks leaving the stencil.

The result is per-chip cost ≈ the single-chip slot loop + one plane
ppermute: measured on a 1-device mesh on the real TPU (bench_halo.py).
Role analog: CellListMap's threaded map-reduce scaled across chips
(/root/reference/src/pairwise.jl:17-23, SURVEY.md 2.14).
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
    CellGridEngine,
    ghost_shift,
    ghost_shift_hilo,
    ghost_z_window,
    ghost_z_window_hilo,
    make_pair_block,
    self_pair_diag_bump,
)
from mdtpu.parallel.mesh import SHARD_AXIS


@struct.dataclass
class HaloSlotEngine:
    """Slot-layout sharded cell-grid engine (see module docstring).

    ``grid`` is the GLOBAL cell grid, nx a multiple of ``n_shards``. Slot
    arrays are (d, n_slots_global) sharded over the slot axis; inside
    shard_map each method sees the local (d, S_loc) block.
    """

    potential: Any
    cutoff: float = struct.field(pytree_node=False, default=1.5)
    skin: float = struct.field(pytree_node=False, default=0.3)
    grid: Tuple[int, ...] = struct.field(pytree_node=False, default=(8, 3, 3))
    cell_capacity: int = struct.field(pytree_node=False, default=16)
    n_shards: int = struct.field(pytree_node=False, default=8)
    axis_name: str = struct.field(pytree_node=False, default=SHARD_AXIS)
    # Max rows migrated per direction per rebin (fixed-shape ppermute
    # buffers). Overflowing rows are clamped into the edge plane and the
    # per-shard flag raised (driver recovers by restore+grow, like cell
    # capacity).
    migration_capacity: int = struct.field(pytree_node=False, default=512)
    # Nonzero when every particle shares this diameter (see
    # mdtpu.ops.cell_grid.uniform_sigma_of): the sweep then skips the
    # diameter windows AND drops the diameter plane from the halo
    # ppermute payload.
    uniform_sigma: float = struct.field(pytree_node=False, default=0.0)
    # Memory-bounded sweep: lax.scan over the LOCAL x-planes instead of one
    # dense (n_cells_loc, C, 3C) computation — same auto-switch as the
    # single-chip ``CellGridEngine.plane_scan`` (dense pair tiles go
    # HBM-bound past ~120 MB and exhaust HBM past ~400 MB), applied to the
    # PER-SHARD tile. The x-slab sharding and the x-plane scan decompose
    # over the same axis: the scan carry's +x reaction plane after the last
    # local plane IS the ghost-plane reaction payload, so the halo
    # choreography (one window ppermute in, one reaction ppermute back) is
    # identical to the dense path. 3D only (2D y-window planes are small).
    plane_scan: bool = struct.field(pytree_node=False, default=False)
    # The rebin contains ppermutes, so it must NEVER run under lax.cond
    # (collectives inside a cond branch are not SPMD-safe); the slot
    # choreography runs it unconditionally per outer (rebin) iteration.
    rebin_unconditional = True

    @classmethod
    def create_tuned(cls, potential, cutoff, unitcell, n_particles, n_shards,
                     min_skin=0.3, occ_sigma=2.5, axis_name=SHARD_AXIS,
                     max_sigma=1.0, diameters=None, workload="dynamics"):
        """Padded-lane-optimal geometry (same cost model as the single-chip
        ``CellGridEngine.create_tuned``; nx constrained to a multiple of
        ``n_shards``). Dimension-generic: 2D boxes shard over x-slabs with
        y-windows exactly as 3D shards with z-windows (the reference is
        dimension-generic throughout, /root/reference/src/types.jl:15-32)."""
        from mdtpu.ops.cell_grid import uniform_sigma_of
        from mdtpu.parallel.geometry import tuned_sharded_geometry
        from mdtpu.potentials.base import check_engine_cutoff

        if diameters is not None:
            max_sigma = max(max_sigma, float(np.max(np.asarray(diameters))))
        check_engine_cutoff(potential, cutoff, max_sigma)
        grid, cap, skin = tuned_sharded_geometry(
            cutoff, unitcell, n_particles, n_shards,
            min_skin=min_skin, occ_sigma=occ_sigma, workload=workload)
        # Migration buffer: boundary-layer population ~ n_loc * skin/slab;
        # 25% of a slab is a generous fixed bound, lane-aligned.
        K = max(128, -(-int(n_particles / n_shards * 0.25) // 128) * 128)
        # Per-SHARD dense pair tiles of (n_cells_loc, C, 3C): beyond ~120 MB
        # the sweep goes HBM-bound and the x-plane scan wins (same measured
        # threshold as CellGridEngine.create_tuned — the sharded regime of
        # >=1M particles per shard sits far past it).
        subl = -(-cap // 8) * 8
        lanes = -(-(3 * cap) // 128) * 128
        n_cells_loc = (grid[0] // n_shards) * int(np.prod(grid[1:]))
        tile_bytes = n_cells_loc * subl * lanes * 4
        return cls(potential=potential, cutoff=float(cutoff),
                   skin=float(skin), grid=grid, cell_capacity=cap,
                   n_shards=n_shards, axis_name=axis_name,
                   migration_capacity=K,
                   plane_scan=bool(len(grid) == 3 and tile_bytes > 1.2e8),
                   uniform_sigma=uniform_sigma_of(diameters))

    def with_grown_capacity(self):
        # Migration pressure correlates with cell-capacity pressure (both
        # flag through the same overflow bit), so grow both together.
        return self.replace(
            cell_capacity=int(self.cell_capacity * 1.4 + 4),
            migration_capacity=self.migration_capacity * 2)

    @property
    def mx(self) -> int:
        return self.grid[0] // self.n_shards

    @property
    def local_slots(self) -> int:
        return self.mx * int(np.prod(self.grid[1:])) * self.cell_capacity

    def as_single_chip(self) -> CellGridEngine:
        """The single-chip engine with the same GLOBAL geometry: used for
        the initial global slotify (cell ids are x-major, so sharding the
        resulting slot arrays over the slot axis lands each slab on its
        device) and for host-side unslotify."""
        return CellGridEngine(
            potential=self.potential, cutoff=self.cutoff, skin=self.skin,
            grid=self.grid, cell_capacity=self.cell_capacity,
            plane_scan=self.plane_scan, uniform_sigma=self.uniform_sigma)

    # ------------------------------------------------------------ rebuild
    def slot_rebin(self, state: SimulationState) -> SimulationState:
        """Migration + LOCAL packed re-sort of this shard's slot block.

        Runs inside shard_map OUTSIDE any lax.cond (``rebin_unconditional``
        — it ppermutes migration buffers): rows whose x-plane left the
        local slab are shipped to the adjacent shard (escapes travel at
        most skin/2 per rebin interval, so the neighbor is always the
        destination), received rows are folded and binned locally, and
        everything re-sorts through ONE packed scatter. Because migration
        happens at EVERY rebin, no live row is ever more than skin/2
        outside its shard at sweep time — the sharded dynamics is exact,
        with zero host involvement (the TPU-native analog of the
        migrate-at-rebuild policy of classic spatial-decomposition MD).

        Rows beyond the fixed ``migration_capacity`` are clamped into the
        edge plane and flag the shard (driver recovers like a capacity
        overflow)."""
        from mdtpu.integrate.slot_step import (_frac_components,
                                               pack_state_rows,
                                               packed_resort)
        from mdtpu.utils.math import kahan_add

        dim = state.positions.shape[0]
        dtype = state.positions.dtype
        nx = self.grid[0]
        mx = self.mx
        cap = self.cell_capacity
        n_cells_loc = mx * int(np.prod(self.grid[1:]))
        n_slots = self.local_slots
        n_sh = self.n_shards
        # top_k requires k <= operand size; a migration buffer bigger than
        # the slab itself is meaningless anyway (small systems / default
        # field values).
        K = min(self.migration_capacity, n_slots)
        axis = self.axis_name
        p = jax.lax.axis_index(axis)
        occ = state.nbrs.occupied

        # --- classify rows by current global x-plane (pre-fold) ----------
        frac = _frac_components(state.positions, state.unitcell_inv)
        n_cross = [jnp.where(occ, jnp.floor(f), jnp.zeros_like(f))
                   for f in frac]
        frac_in = [f - n for f, n in zip(frac, n_cross)]
        gx = jnp.clip((frac_in[0] * nx).astype(jnp.int32), 0, nx - 1)
        ix = gx - p * mx
        if n_sh > 1:
            # Periodic-minimal slab offset (device 0's slab is adjacent to
            # the last device's); adj = matching fold correction along
            # axis 0.
            above = ix > nx // 2
            below = ix < -(nx - nx // 2)
            ix = jnp.where(above, ix - nx, jnp.where(below, ix + nx, ix))
            adj = jnp.where(above, 1.0, jnp.where(below, -1.0, 0.0)) \
                .astype(n_cross[0].dtype)
            esc_right = occ & (ix >= mx)
            esc_left = occ & (ix < 0)
        else:
            # One shard owns the whole box: no escapes, standard fold.
            adj = jnp.zeros_like(n_cross[0])
            esc_right = esc_left = jnp.zeros_like(occ)

        # --- migration buffers: RAW (unfolded) rows, fixed (R, K) shape --
        # Deliberate: the state is packed twice per rebin (here for the
        # migration gather, again post-fold inside packed_resort). Folding
        # on the packed rows would save one (R, n_slots) concat, but rebins
        # amortize to <3% of step cost and the fold is the precision-
        # critical seam (kahan_add + image counts) — clarity wins.
        rows_raw = pack_state_rows(state)
        occ_row_idx = 6 * dim + 1
        iota = jnp.arange(n_slots, dtype=jnp.int32)

        def select(mask):
            vals, idx = jax.lax.top_k(mask.astype(jnp.int32), K)
            got = vals > 0
            buf = rows_raw[:, idx]
            # Unsent columns must read vacant at the receiver.
            buf = buf.at[occ_row_idx].multiply(got.astype(dtype))
            lost = jnp.sum(mask) > jnp.asarray(K, jnp.int32)
            return buf, idx, got, lost

        buf_r, idx_r, got_r, lost_r = select(esc_right)
        buf_l, idx_l, got_l, lost_l = select(esc_left)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        recv_l = jax.lax.ppermute(buf_r, axis, fwd)  # from left neighbor
        recv_r = jax.lax.ppermute(buf_l, axis, bwd)  # from right neighbor
        extra = jnp.concatenate([recv_l, recv_r], axis=1)

        # Remove sent rows locally.
        sent = jnp.zeros((n_slots,), bool)
        sent = sent.at[idx_r].max(got_r).at[idx_l].max(got_l)
        occ = occ & ~sent
        state = state.replace(nbrs=state.nbrs.replace(occupied=occ))

        # --- fold local rows (seam-consistent for clamped leftovers) -----
        n_cross[0] = n_cross[0] + jnp.where(occ, adj, jnp.zeros_like(adj))
        for k in range(dim):
            n_cross[k] = jnp.where(occ, n_cross[k],
                                   jnp.zeros_like(n_cross[k]))
        delta = jnp.stack([
            -sum(state.unitcell[k, j] * n_cross[j] for j in range(dim))
            for k in range(dim)])
        positions, pos_comp = kahan_add(state.positions, state.pos_comp,
                                        delta)
        images = state.images + jnp.stack(n_cross).astype(state.images.dtype)
        state = state.replace(positions=positions, pos_comp=pos_comp,
                              images=images)

        # Leftover escapes (migration_capacity overflow) clamp to the edge
        # plane — exact only transiently; the lost flag forces recovery.
        cid = jnp.clip(ix, 0, mx - 1)
        for k in range(1, dim):
            gk = self.grid[k]
            ck = jnp.clip((frac_in[k] * gk).astype(jnp.int32), 0, gk - 1)
            cid = cid * gk + ck
        cid = jnp.where(occ, cid, n_cells_loc)

        # --- fold + bin the received rows --------------------------------
        extra_occ = extra[occ_row_idx] != 0
        e_pos = extra[0:dim]
        e_comp = extra[3 * dim:4 * dim]
        e_frac = _frac_components(e_pos, state.unitcell_inv)
        e_cross = [jnp.where(extra_occ, jnp.floor(f), jnp.zeros_like(f))
                   for f in e_frac]
        e_frac_in = [f - n for f, n in zip(e_frac, e_cross)]
        e_delta = jnp.stack([
            -sum(state.unitcell[k, j] * e_cross[j] for j in range(dim))
            for k in range(dim)])
        e_pos, e_comp = kahan_add(e_pos, e_comp, e_delta)
        e_img = (extra[5 * dim:6 * dim]
                 + jnp.stack(e_cross).astype(dtype))
        extra = jnp.concatenate([
            e_pos, extra[dim:3 * dim], e_comp, extra[4 * dim:5 * dim],
            e_img, extra[6 * dim:]], axis=0)
        e_gx = jnp.clip((e_frac_in[0] * nx).astype(jnp.int32), 0, nx - 1)
        extra_cid = jnp.clip(e_gx - p * mx, 0, mx - 1)
        for k in range(1, dim):
            gk = self.grid[k]
            e_ck = jnp.clip((e_frac_in[k] * gk).astype(jnp.int32), 0, gk - 1)
            extra_cid = extra_cid * gk + e_ck
        extra_cid = jnp.where(extra_occ, extra_cid, n_cells_loc)

        # Per-device far-pad ramp INDEX offset: vacant slots of different
        # shards must never coincide (a ghost-exchange r2 = 0 pair would
        # NaN). Disjoint index ranges into the global far_ramp sequence.
        far_offset = p * (self.local_slots + 1)
        state, cap_overflow = packed_resort(state, cid, n_cells_loc, cap,
                                            far_offset=far_offset,
                                            extra_rows=extra,
                                            extra_cid=extra_cid)
        return state.replace(nbrs=state.nbrs.replace(
            overflow=(state.nbrs.overflow | cap_overflow | lost_r
                      | lost_l)))

    # ------------------------------------------------------------- sweep
    def compute_slots(self, positions, diameters, cell, cell_inv, nbrs,
                      observables=True, pos_lo=None):
        """Halo-exchange z-window sweep over the LOCAL slot block.

        Same structure as the single-chip ``_zwindow_sweep`` (ghosted
        z-windows, far-pad vacants, diag-bump self exclusion, Newton
        in-plane half stencil, optional hi/lo precision) with the x axis
        extended by ONE ppermuted ghost plane; ghost-plane reactions are
        ppermuted back and energy/virial psum'd."""
        from mdtpu.utils.math import two_sum

        dim = positions.shape[0]
        dtype = positions.dtype
        cap = self.cell_capacity
        mx = self.mx
        if dim == 2:
            # 2D rides the 3D machinery with a size-1 middle axis: the
            # window (last) axis folds y exactly as it folds z in 3D, and
            # the in-plane Newton half stencil reduces to the single +x
            # column (the 9-cell stencil = self + y-window + x+1 column;
            # same collapse as the single-chip _ywindow_sweep).
            nmid, nwin = 1, self.grid[1]
            wcol = 1    # cell column supplying the window-axis ghost shift
            stencil = ((1, 0),)
        else:
            nmid, nwin = self.grid[1], self.grid[2]
            wcol = 2
            stencil = ((0, 1), (1, -1), (1, 0), (1, 1))
        n_cells_loc = mx * nmid * nwin
        axis = self.axis_name
        n_sh = self.n_shards
        p = jax.lax.axis_index(axis)
        hilo = pos_lo is not None

        shape = (mx, nmid, nwin, cap)
        grids = [positions[k].reshape(shape) for k in range(dim)]
        # Uniform sigma: scalar constant — no diameter windows, and the
        # diameter plane drops out of the halo ppermute payload below.
        uni = jnp.ndim(diameters) == 0 or self.uniform_sigma
        diam = (jnp.asarray(self.uniform_sigma or diameters, dtype)
                if uni else diameters.reshape(shape))

        if hilo:
            grids_lo = [pos_lo[k].reshape(shape) for k in range(dim)]
            pairs = [ghost_z_window_hilo(grids[k], grids_lo[k],
                                         cell[k, wcol]) for k in range(dim)]
            win = [q[0] for q in pairs]
            win_lo = [q[1] for q in pairs]
            own_lo = [g.reshape(n_cells_loc, cap, 1) for g in grids_lo]
        else:
            win = [ghost_z_window(grids[k], cell[k, wcol])
                   for k in range(dim)]
            win_lo = own_lo = None
        win_diam = ghost_z_window(diam)  # scalar passthrough when uniform

        # --- halo exchange: receive the right neighbor's first plane ------
        # ONE batched ppermute for all window components (+ lo words + the
        # diameter window, absent when sigma is uniform): per-collective
        # launch overhead dominates the tiny plane payloads, so
        # fewer/bigger messages win on both the runtime and real ICI.
        fwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]   # i sends to i-1
        is_last = p == n_sh - 1
        send = jnp.stack([w[0] for w in win]
                         + ([w[0] for w in win_lo] if hilo else [])
                         + ([] if uni else [win_diam[0]]))  # (B, ny, nz, 3C)
        recv = jax.lax.ppermute(send, axis, fwd)
        ghosts, ghosts_lo = [], []
        for k in range(dim):
            g = recv[k][None]
            if hilo:
                g_lo = recv[dim + k][None]
                # Periodic image: the ghost received by the LAST device is
                # global plane 0 — shift through two_sum, residual to lo.
                s, r = two_sum(g, cell[k, 0])
                g = jnp.where(is_last, s, g)
                g_lo = jnp.where(is_last, g_lo + r, g_lo)
                ghosts_lo.append(g_lo)
            else:
                g = g + jnp.where(is_last, cell[k, 0], jnp.zeros((), dtype))
            ghosts.append(g)
        ext = [jnp.concatenate([w, g], axis=0) for w, g in zip(win, ghosts)]
        if uni:
            ext_diam = win_diam          # scalar
        else:
            ext_diam = jnp.concatenate([win_diam, recv[-1][None]], axis=0)
        if hilo:
            ext_lo = [jnp.concatenate([w, g], axis=0)
                      for w, g in zip(win_lo, ghosts_lo)]

        if self.plane_scan and dim == 3:
            # Pass the local window planes and the ppermuted ghost plane
            # SEPARATELY (never concatenated): the scan over interior
            # planes then depends only on local data, so XLA's async
            # collective-permute can run under it; only the final plane
            # (unrolled after the scan) consumes the ghost.
            energy, virial, f_grid, ghost_react = self._scan_sweep_local(
                grids, grids_lo if hilo else None, win,
                win_lo if hilo else None,
                [g[0] for g in ghosts],
                [g[0] for g in ghosts_lo] if hilo else None,
                diam, win_diam,
                None if uni else recv[-1], uni, cell, observables)
        else:
            energy, virial, f_grid, ghost_react = self._dense_sweep_local(
                grids, grids_lo if hilo else None, win, win_lo, ext,
                ext_lo if hilo else None, diam, win_diam, ext_diam, uni,
                cell, stencil, observables)

        # Send the ghost-plane reactions back to the right neighbor (they
        # own global plane (p+1)*mx) — one batched ppermute for all
        # components; identical for the dense and scan sweeps.
        bwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        back = jax.lax.ppermute(ghost_react, axis, bwd)
        forces = [f_grid[k].at[0].add(back[k]).reshape(-1)
                  for k in range(dim)]
        if observables:
            energy, virial = jax.lax.psum((energy, virial), axis)
        return energy, virial, jnp.stack(forces), nbrs

    def _dense_sweep_local(self, grids, grids_lo, win, win_lo, ext, ext_lo,
                           diam, win_diam, ext_diam, uni, cell, stencil,
                           observables):
        """One dense windowed sweep over ALL local planes at once (the
        original sharded sweep). Returns (energy, virial, f_grid
        [per-component (mx, nmid, nwin, C) local forces, ghost reactions
        NOT yet applied], ghost_react (d, nmid, nwin, C))."""
        dim = len(grids)
        dtype = grids[0].dtype
        cap = self.cell_capacity
        mx = self.mx
        hilo = win_lo is not None
        if dim == 2:
            nmid, nwin = 1, self.grid[1]
        else:
            nmid, nwin = self.grid[1], self.grid[2]
        n_cells_loc = mx * nmid * nwin

        own = [g.reshape(n_cells_loc, cap, 1) for g in grids]
        own_lo = (None if not hilo else
                  [g.reshape(n_cells_loc, cap, 1) for g in grids_lo])
        own_diam3 = diam if uni else diam.reshape(n_cells_loc, cap, 1)

        pair_block = make_pair_block(self.potential, own, own_lo, own_diam3,
                                     self_pair_diag_bump(cap, dtype), cap,
                                     observables)

        # Self column: every pair appears from both sides.
        u, f_over_r, r2s, d_comps = pair_block(win, win_diam, True,
                                               wc_lo=win_lo)
        if observables:
            energy = 0.5 * jnp.sum(u)
            virial = 0.5 * jnp.sum(f_over_r * r2s)
        else:
            energy = virial = jnp.zeros((), dtype)
        f_own = jnp.stack(
            [jnp.sum(f_over_r * d_comps[k], axis=2) for k in range(dim)])

        def unwindow(reaction):
            r = reaction.reshape(mx, nmid, nwin, 3, cap)
            return (jnp.roll(r[..., 0, :], -1, axis=2) + r[..., 1, :]
                    + jnp.roll(r[..., 2, :], 1, axis=2))

        def yshift(w, oy, gy):
            # Window arrays here are (mx, nmid, nwin, 3C): the in-plane
            # shift axis is 1 (a no-op in 2D, where every stencil entry
            # has oy = 0).
            return ghost_shift(w, oy, gy, axis=1)

        def yshift_hilo(w, w_lo, oy, gy):
            return ghost_shift_hilo(w, w_lo, oy, gy, axis=1)

        # Reaction accumulator over mx + 1 planes (the +1 receives the
        # reactions destined for the ghost plane / right neighbor).
        react_ext = [jnp.zeros((mx + 1, nmid, nwin, cap), dtype)
                     for _ in range(dim)]

        for ox, oy in stencil:
            if hilo:
                src = [(ext[k][ox:ox + mx], ext_lo[k][ox:ox + mx])
                       if ox else (win[k], win_lo[k]) for k in range(dim)]
                shifted = [yshift_hilo(s[0], s[1], oy, cell[k, 1])
                           for k, s in enumerate(src)]
                wc = [s[0] for s in shifted]
                wc_lo = [s[1] for s in shifted]
            else:
                wc = [yshift(ext[k][ox:ox + mx] if ox else win[k], oy,
                             cell[k, 1]) for k in range(dim)]
                wc_lo = None
            wd = (ext_diam if uni
                  else yshift(ext_diam[ox:ox + mx] if ox else win_diam, oy,
                              None))
            u, f_over_r, r2s, d_comps = pair_block(wc, wd, False,
                                                   wc_lo=wc_lo)
            if observables:
                energy = energy + jnp.sum(u)
                virial = virial + jnp.sum(f_over_r * r2s)
            for k in range(dim):
                f_own = f_own.at[k].add(
                    jnp.sum(f_over_r * d_comps[k], axis=2))
                react = unwindow(-jnp.sum(f_over_r * d_comps[k], axis=1))
                react = jnp.roll(react, oy, axis=1)
                react_ext[k] = react_ext[k].at[ox:ox + mx].add(react)

        f_grid = [(f_own[k] + react_ext[k][:mx].reshape(n_cells_loc, cap))
                  .reshape(mx, nmid, nwin, cap) for k in range(dim)]
        ghost_react = jnp.stack([react_ext[k][mx] for k in range(dim)])
        return energy, virial, f_grid, ghost_react

    def _scan_sweep_local(self, grids, grids_lo, win, win_lo, ghost,
                          ghost_lo, diam, win_diam, ghost_diam, uni, cell,
                          observables):
        """Memory-bounded sharded sweep: ``lax.scan`` over the LOCAL
        x-planes, carrying the +x reaction plane (the sharded analog of
        ``CellGridEngine._zwindow_sweep_scan`` — same per-plane math, same
        reduction structure). Plane i's half stencil reads window planes i
        and i+1; the LAST local plane's +x stencil reads the ppermuted
        ghost (image-shifted at receive time, so NO wrap branch exists
        here — contrast the single-chip scan's periodic wrap) and is
        UNROLLED AFTER the scan: the scan body then depends only on local
        data, so on real hardware XLA's async collective-permute can run
        under the interior-plane compute instead of gating the whole sweep
        (the plane payload is ~25-60 us of ICI time vs ms of sweep). The
        final plane's reaction output is exactly the ghost-plane reaction
        payload the dense sweep accumulates in ``react_ext[mx]``.
        Intermediates shrink by a factor mx: per-shard dense tiles of
        (n_cells_loc, C, 3C) would exhaust HBM at >=1M particles per shard
        (the regime multi-chip exists for). Returns the same (energy,
        virial, f_grid, ghost_react) contract as
        :meth:`_dense_sweep_local`."""
        dim = len(grids)
        dtype = grids[0].dtype
        cap = self.cell_capacity
        mx = self.mx
        nmid, nwin = self.grid[1], self.grid[2]
        m = nmid * nwin
        hilo = grids_lo is not None

        grids_s = jnp.stack(grids)                  # (d, mx, nmid, nwin, C)
        win_s = jnp.stack(win)                      # (d, mx, nmid, nwin, 3C)
        if hilo:
            lo_s = jnp.stack(grids_lo)
            win_lo_s = jnp.stack(win_lo)
        diag_bump = self_pair_diag_bump(cap, dtype)

        def yshift(w, oy, gy):
            # Plane arrays are (nmid, nwin, 3C): the in-plane shift axis
            # is 0.
            return ghost_shift(w, oy, gy, axis=0)

        def yshift_hilo(w, w_lo, oy, gy):
            return ghost_shift_hilo(w, w_lo, oy, gy, axis=0)

        def unwindow_plane(reaction):
            r = reaction.reshape(nmid, nwin, 3, cap)
            return (jnp.roll(r[:, :, 0, :], -1, axis=1) + r[:, :, 1, :]
                    + jnp.roll(r[:, :, 2, :], 1, axis=1))

        def at_plane(a, i):
            return jax.lax.dynamic_index_in_dim(a, i, 0, False)

        def plane_compute(energy, virial, own, own_lo, own_d, wp, wp_lo, wd,
                          wp1, wp1_lo, wd1):
            """One plane's half-stencil pair work (shared by the scanned
            interior planes and the unrolled ghost-facing final plane).
            Returns (energy, virial, f_own (d, m, C), react_out (d, nmid,
            nwin, C) — the reaction into plane +1, NOT yet applied)."""
            block = make_pair_block(self.potential, own, own_lo, own_d,
                                    diag_bump, cap, observables)

            u, f, r2s, dcs = block(wp, wd, True, wc_lo=wp_lo)
            if observables:
                energy = energy + 0.5 * jnp.sum(u)
                virial = virial + 0.5 * jnp.sum(f * r2s)
            f_own = jnp.stack([jnp.sum(f * dcs[k], axis=2)
                               for k in range(dim)])         # (d, m, C)
            react_out = jnp.zeros((dim, nmid, nwin, cap), dtype)

            for ox, oy in ((0, 1), (1, -1), (1, 0), (1, 1)):
                src = wp1 if ox else wp
                srcd = wd1 if ox else wd
                if hilo:
                    src_lo = wp1_lo if ox else wp_lo
                    shifted = [yshift_hilo(src[k], src_lo[k], oy, cell[k, 1])
                               for k in range(dim)]
                    wc = [s[0] for s in shifted]
                    wc_lo = [s[1] for s in shifted]
                else:
                    wc = [yshift(src[k], oy, cell[k, 1]) for k in range(dim)]
                    wc_lo = None
                wdd = srcd if uni else yshift(srcd, oy, None)
                u, f, r2s, dcs = block(wc, wdd, False, wc_lo=wc_lo)
                if observables:
                    energy = energy + jnp.sum(u)
                    virial = virial + jnp.sum(f * r2s)
                for k in range(dim):
                    f_own = f_own.at[k].add(jnp.sum(f * dcs[k], axis=2))
                    r = unwindow_plane(-jnp.sum(f * dcs[k], axis=1))
                    r = jnp.roll(r, oy, axis=0)
                    if ox:
                        react_out = react_out.at[k].add(r)
                    else:
                        f_own = f_own.at[k].add(r.reshape(m, cap))
            return energy, virial, f_own, react_out

        def plane_inputs(i, at=at_plane):
            own = [at(grids_s[k], i).reshape(m, cap, 1) for k in range(dim)]
            wp = [at(win_s[k], i) for k in range(dim)]
            if uni:                          # uniform sigma: scalar constant
                own_d = wd = win_diam
            else:
                own_d = at(diam, i).reshape(m, cap, 1)
                wd = at(win_diam, i)
            if hilo:
                own_lo = [at(lo_s[k], i).reshape(m, cap, 1)
                          for k in range(dim)]
                wp_lo = [at(win_lo_s[k], i) for k in range(dim)]
            else:
                own_lo = wp_lo = None
            return own, own_lo, own_d, wp, wp_lo, wd

        def body(carry, i):
            energy, virial, react_in = carry
            own, own_lo, own_d, wp, wp_lo, wd = plane_inputs(i)
            wp1 = [at_plane(win_s[k], i + 1) for k in range(dim)]
            wd1 = win_diam if uni else at_plane(win_diam, i + 1)
            wp1_lo = ([at_plane(win_lo_s[k], i + 1) for k in range(dim)]
                      if hilo else None)
            energy, virial, f_own, react_out = plane_compute(
                energy, virial, own, own_lo, own_d, wp, wp_lo, wd,
                wp1, wp1_lo, wd1)
            f_out = f_own + react_in.reshape(dim, m, cap)
            return (energy, virial, react_out), f_out

        zero = jnp.zeros((), dtype)
        (energy, virial, react_last), f_planes = jax.lax.scan(
            body, (zero, zero, jnp.zeros((dim, nmid, nwin, cap), dtype)),
            jnp.arange(mx - 1))

        # Final local plane: +x stencil against the ppermuted ghost — the
        # ONLY consumer of the halo exchange.
        own, own_lo, own_d, wp, wp_lo, wd = plane_inputs(
            mx - 1, at=lambda a, i: a[i])
        energy, virial, f_own, ghost_react = plane_compute(
            energy, virial, own, own_lo, own_d, wp, wp_lo, wd,
            ghost, ghost_lo, win_diam if uni else ghost_diam)
        f_last = f_own + react_last.reshape(dim, m, cap)

        f_planes = jnp.concatenate([f_planes, f_last[None]], axis=0)
        # (mx, d, m, C) -> per-component (mx, nmid, nwin, C)
        f_grid = [f_planes[:, k].reshape(mx, nmid, nwin, cap)
                  for k in range(dim)]
        return energy, virial, f_grid, ghost_react


# ---------------------------------------------------------------------------
# Sharding glue: specs, state construction, the jitted sharded advance.
# ---------------------------------------------------------------------------


def slot_state_specs(engine: HaloSlotEngine, state: SimulationState,
                     cutoff: float) -> SimulationState:
    """PartitionSpec pytree for a slot-layout SimulationState: (d, n_slots)
    arrays sharded over the slot axis (x-major cell ids make slot blocks =
    x-plane slabs), scalars replicated, the overflow flag per-shard."""
    from jax.sharding import PartitionSpec as P

    from mdtpu.ops.cell_grid import CellGridState

    ax = engine.axis_name
    two, one, rep = P(None, ax), P(ax), P()

    def like(val, spec):
        return None if val is None else spec

    nbrs = CellGridState(addr=one, occupied=one, sorted_diam=one,
                         ref_positions=two, overflow=one)
    return SimulationState(
        positions=two, velocities=like(state.velocities, two), forces=two,
        images=two, diameters=one, unitcell=rep, unitcell_inv=rep, key=rep,
        step=rep, nf=rep, energy=rep, virial=rep, temperature=rep,
        pos_comp=two, vel_comp=two, nbrs=nbrs,
        virial_accum=like(state.virial_accum, rep),
        nprom=like(state.nprom, rep), ids=one, cutoff=cutoff)


def build_sharded_slot_state(state: SimulationState, engine: HaloSlotEngine,
                             mesh) -> SimulationState:
    """Global slotify (x-major cell ids → slab-contiguous slots) + shard
    over the mesh + one sharded sweep for the initial forces. The returned
    state runs under :func:`make_sharded_slot_advance`."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdtpu.integrate.slot_step import slotify

    st = slotify(state, engine.as_single_chip())
    if bool(st.nbrs.overflow):
        from mdtpu.integrate.slot_step import CapacityOverflowError

        raise CapacityOverflowError(
            "initial slotify overflowed cell capacity — grow the engine "
            "capacity")
    # Per-shard overflow flag: (n_shards,) sharded -> local (1,).
    st = st.replace(nbrs=st.nbrs.replace(
        overflow=jnp.zeros((engine.n_shards,), bool)))
    specs = slot_state_specs(engine, st, float(st.cutoff))
    st = jax.tree.map(
        lambda leaf, spec: (None if leaf is None else
                            jax.device_put(leaf, NamedSharding(mesh, spec))),
        st, specs,
        is_leaf=lambda x: x is None)

    ax = engine.axis_name
    fn = jax.jit(jax.shard_map(
        lambda pos, d, c, ci, nb: engine.compute_slots(pos, d, c, ci, nb)[:3],
        mesh=mesh,
        in_specs=(P(None, ax), P(ax), P(), P(), specs.nbrs),
        out_specs=(P(), P(), P(None, ax)),
        check_vma=False,
    ))
    e, w, f = fn(st.positions, st.diameters, st.unitcell, st.unitcell_inv,
                 st.nbrs)
    return st.replace(forces=f, energy=e, virial=w)


def make_sharded_slot_advance(params, ensemble, engine: HaloSlotEngine,
                              mesh, state: SimulationState,
                              compensated: bool = True, lean: bool = True,
                              hilo: bool = False):
    """``advance(state, k)`` over the mesh: the ordinary
    ``make_slot_advance`` choreography (nested while, hoisted rebins, lean
    inner steps) under ONE ``shard_map`` — rebin decisions are psum'd so
    trip counts stay uniform, rebins are local re-sorts, the sweep
    ppermutes halo planes, and Bussi/temperature reductions psum."""
    from jax.sharding import PartitionSpec as P

    from mdtpu.integrate.slot_step import make_slot_advance

    adv = make_slot_advance(params, ensemble, engine,
                            compensated=compensated, lean=lean, hilo=hilo,
                            axis_name=engine.axis_name)
    specs = slot_state_specs(engine, state, float(state.cutoff))
    fn = jax.shard_map(adv, mesh=mesh, in_specs=(specs, P()),
                       out_specs=specs, check_vma=False)
    return jax.jit(fn)


def unshard_slot_state(state: SimulationState) -> SimulationState:
    """Host-side: restore a sharded slot state to ordinary (N, d) particle
    order (ids-sorted) — delegates to the single-chip unslotify."""
    from mdtpu.integrate.slot_step import unslotify_state

    occ_any = state.nbrs.replace(overflow=jnp.asarray(
        np.asarray(state.nbrs.overflow).any()))
    return unslotify_state(state.replace(nbrs=occ_any))
