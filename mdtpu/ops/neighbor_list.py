"""Cell-binned Verlet neighbor-list engine — the TPU-native replacement for
CellListMap.jl (consumed by the reference at
/root/reference/src/initialization.jl:100-107 and
/root/reference/src/simulation.jl:100-104).

Design (SURVEY.md section 7, stage 6), fully fixed-shape for XLA:

  *Build* (every ~10-40 steps, triggered by skin displacement): bucketed
  count-sort of particles into an orthorhombic cell grid (one argsort + one
  scatter), then for each particle gather the 3^d-stencil cells' occupants as
  candidates and compact the ones within cutoff+skin into a padded (N, K)
  neighbor index array (sentinel = N).

  *Force evaluation* (every step): a single batched gather of neighbor
  positions + VPU math over (N, K) tiles. Every pair is computed from both
  sides, so there is NO scatter-add at all — forces come from a row reduction,
  and energy/virial are halved. On TPU this trades 2x pair FLOPs (cheap, VPU)
  for perfectly regular memory access (the actual bottleneck) — the idiomatic
  inversion of the reference's Newton's-3rd-law scatter accumulation
  (/root/reference/src/pairwise.jl:34-36).

Capacity overflow (cell occupancy > C or true neighbors > K) cannot resize
under jit; the build sets an ``overflow`` flag that the driver checks at event
boundaries and resolves by rebuilding the engine with grown capacities
(`with_grown_capacity`).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_UNIT_BALL_VOLUME = {1: 2.0, 2: math.pi, 3: 4.0 * math.pi / 3.0}


def estimate_capacities(n_particles: int, unitcell, cutoff: float, skin: float,
                        grid: Tuple[int, ...]):
    """Heuristic (cell capacity C, max neighbors K) with generous headroom for
    density fluctuations; both rounded up for tiling friendliness."""
    dim = len(grid)
    volume = abs(float(np.linalg.det(np.asarray(unitcell, dtype=np.float64))))
    density = n_particles / volume
    cell_volume = volume / int(np.prod(grid))
    avg_cell = density * cell_volume
    c = int(math.ceil(avg_cell * 2.5 + 8))
    r_list = cutoff + skin
    n_ball = density * _UNIT_BALL_VOLUME[dim] * r_list ** dim
    k = int(math.ceil(n_ball * 1.6 + 8))
    k = ((k + 7) // 8) * 8
    return c, k


def _ortho_min_image(d, length):
    """Orthorhombic minimum image (the one place the convention lives)."""
    return d - length * jnp.round(d / length)


def _grid_for_box(unitcell, cutoff: float, skin: float):
    """Cells per axis: floor(h_i / (cutoff + skin)) where h_i is the
    perpendicular distance between the cell's lattice planes along axis i
    (h_i = 1 / ||row_i(cell^-1)||; equals L_i for orthorhombic cells, shrinks
    with tilt). None if the box is too small for a 3-cell-wide grid on any
    axis (caller falls back to naive)."""
    cell = np.asarray(unitcell, dtype=np.float64)
    cell_inv = np.linalg.inv(cell)
    heights = 1.0 / np.linalg.norm(cell_inv, axis=1)
    grid = tuple(int(x) for x in np.floor(heights / (cutoff + skin)))
    if any(g < 3 for g in grid):
        return None
    return grid


@struct.dataclass
class NeighborState:
    idx: jnp.ndarray            # (N, K) int32 neighbor ids, sentinel = N
    ref_positions: jnp.ndarray  # (N, d) positions at build time
    overflow: jnp.ndarray       # () bool — capacities exceeded at build


@struct.dataclass
class NeighborListEngine:
    potential: Any
    cutoff: float = struct.field(pytree_node=False, default=1.5)
    skin: float = struct.field(pytree_node=False, default=0.3)
    grid: Tuple[int, ...] = struct.field(pytree_node=False, default=(3, 3, 3))
    cell_capacity: int = struct.field(pytree_node=False, default=16)
    max_neighbors: int = struct.field(pytree_node=False, default=48)

    @classmethod
    def create(cls, potential, cutoff, skin, unitcell, n_particles,
               cell_capacity=None, max_neighbors=None, max_sigma=1.0):
        from mdtpu.core.box import is_orthorhombic
        from mdtpu.potentials.base import check_engine_cutoff

        check_engine_cutoff(potential, cutoff, max_sigma)
        if not is_orthorhombic(unitcell):
            # This engine's minimum image uses diagonal box lengths only —
            # a tilted cell would get silently wrong displacements across
            # the periodic boundary. The cell-grid engine handles triclinic
            # cells (fractional binning + cell-vector ghost shifts).
            raise ValueError(
                "NeighborListEngine is orthorhombic-only; use CellGridEngine "
                "for tilted (triclinic) cells")
        grid = _grid_for_box(unitcell, cutoff, skin)
        if grid is None:
            raise ValueError(
                "box too small for a cell grid at this cutoff; use NaivePairEngine"
            )
        c_est, k_est = estimate_capacities(n_particles, unitcell, cutoff, skin, grid)
        return cls(
            potential=potential,
            cutoff=float(cutoff),
            skin=float(skin),
            grid=grid,
            cell_capacity=int(cell_capacity or c_est),
            max_neighbors=int(max_neighbors or k_est),
        )

    def with_grown_capacity(self):
        return self.replace(
            cell_capacity=int(self.cell_capacity * 1.5 + 4),
            max_neighbors=((int(self.max_neighbors * 1.5 + 4) + 7) // 8) * 8,
        )

    # -- stencil ----------------------------------------------------------
    def _stencil_offsets(self):
        dim = len(self.grid)
        ranges = [(-1, 0, 1)] * dim
        offsets = np.array(np.meshgrid(*ranges, indexing="ij")).reshape(dim, -1).T
        return jnp.asarray(offsets, jnp.int32)  # (3^d, d)

    # -- build ------------------------------------------------------------
    def allocate(self, positions, diameters, cell, cell_inv):
        n, dim = positions.shape
        grid = jnp.asarray(self.grid, jnp.int32)
        n_cells = int(np.prod(self.grid))
        cap = self.cell_capacity
        k_max = self.max_neighbors
        r_list = self.cutoff + self.skin

        # Cell coordinates from fractional positions (positions are wrapped,
        # but clip defensively against roundoff at the box edge).
        frac = jnp.dot(positions, cell_inv.T,
                       precision=jax.lax.Precision.HIGHEST)
        frac = frac - jnp.floor(frac)
        coords = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)  # (N, d)

        # Ravel to flat cell ids (row-major over grid dims).
        strides = np.concatenate([np.cumprod(self.grid[::-1])[-2::-1], [1]]).astype(np.int32)
        strides = jnp.asarray(strides)
        # Explicit int32: jnp.sum promotes int32 to int64 under x64.
        cid = jnp.sum(coords * strides, axis=1).astype(jnp.int32)  # (N,)

        # Bucketed count-sort into (n_cells, cap).
        order = jnp.argsort(cid).astype(jnp.int32)  # (N,) particle ids sorted by cell
        cid_sorted = cid[order]
        counts = jnp.zeros((n_cells,), jnp.int32).at[cid].add(jnp.int32(1))
        starts = jnp.cumsum(counts) - counts        # exclusive prefix
        rank = jnp.arange(n, dtype=jnp.int32) - starts[cid_sorted]
        slot_ok = rank < cap
        addr = jnp.where(slot_ok, cid_sorted * cap + rank, n_cells * cap)
        cell_buf = jnp.full((n_cells * cap + 1,), n, jnp.int32).at[addr].set(order)
        cell_buf = cell_buf[:-1].reshape(n_cells, cap)
        overflow_cells = jnp.any(counts > cap)

        # Candidate gather over the 3^d stencil.
        offsets = self._stencil_offsets()           # (S, d)
        nbr_coords = (coords[:, None, :] + offsets[None, :, :]) % grid  # (N, S, d)
        nbr_cids = jnp.sum(nbr_coords * strides,
                           axis=-1).astype(jnp.int32)                   # (N, S)
        cand = cell_buf[nbr_cids].reshape(n, -1)                        # (N, S*cap)

        # Distances to candidates — component-wise (N, S*cap) tiles; an
        # (N, S*cap, d) gather would be 42x-padded by TPU tiling.
        lengths = jnp.diag(cell)
        cand_safe = jnp.where(cand < n, cand, 0)
        r2 = jnp.zeros(cand.shape, positions.dtype)
        # (d, N) transpose: component rows are contiguous, so the (N, SC)
        # gathers below are fast. Gathering from a column view of (N, d) is
        # pathological on TPU (padded-lane strided access).
        pos_t = positions.T
        for k in range(dim):
            ck = pos_t[k]
            dk = ck[:, None] - ck[cand_safe]
            lk = lengths[k]
            dk = _ortho_min_image(dk, lk)
            r2 = r2 + dk * dk
        self_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
        valid = (cand < n) & (cand != self_ids) & (r2 < r_list * r_list)

        # Compact valid candidates to the front, keep K — via top_k (the
        # hardware-optimized path; a full (N, S*cap) argsort is ~10x slower
        # on TPU).
        score = jnp.where(valid, -r2, jnp.full_like(r2, -jnp.inf))
        vals, ti = jax.lax.top_k(score, k_max)
        idx = jnp.take_along_axis(cand, ti, axis=1)
        idx = jnp.where(jnp.isfinite(vals), idx, n).astype(jnp.int32)
        overflow_k = jnp.any(jnp.sum(valid, axis=1) > k_max)

        return NeighborState(
            idx=idx,
            ref_positions=positions,
            overflow=overflow_cells | overflow_k,
        )

    # -- rebuild check ------------------------------------------------------
    def needs_rebuild(self, positions, nbrs: NeighborState, cell, cell_inv):
        # Positions are wrapped, so displacements since the build must be
        # minimum-imaged (a particle that crossed the boundary has moved a
        # little, not a box length).
        lengths = jnp.diag(cell)
        disp = positions - nbrs.ref_positions
        disp = _ortho_min_image(disp, lengths)
        half_skin = 0.5 * self.skin
        d2 = jnp.sum(disp * disp, axis=-1)
        return jnp.any(d2 > half_skin * half_skin)

    # -- force evaluation ---------------------------------------------------
    def compute(self, positions, diameters, cell, cell_inv, nbrs: NeighborState):
        """Hot path: per-component (N, K) gathers + VPU math, no scatter.

        This is what runs every step inside the fused jitted step; the build
        above runs only when the skin displacement test fires (every ~10-40
        steps at liquid densities).
        """
        n, dim = positions.shape
        idx = nbrs.idx
        valid = idx < n
        idx_safe = jnp.where(valid, idx, 0)

        lengths = jnp.diag(cell)
        d_comps = []
        r2 = jnp.zeros(idx.shape, positions.dtype)
        pos_t = positions.T                       # contiguous component rows
        for k in range(dim):
            ck = pos_t[k]
            dk = ck[:, None] - ck[idx_safe]       # (N, K)
            lk = lengths[k]
            dk = _ortho_min_image(dk, lk)
            d_comps.append(dk)
            r2 = r2 + dk * dk

        cutoff = jnp.asarray(self.cutoff, positions.dtype)
        mask = valid & (r2 < cutoff * cutoff)

        # Sqrt-free hot path via evaluate_r2 (see mdtpu.potentials.base).
        r2_safe = jnp.where(mask, r2, jnp.ones_like(r2))
        dj = diameters[idx_safe]
        u, f_over_r = self.potential.evaluate_r2(r2_safe, diameters[:, None], dj)
        u = jnp.where(mask, u, jnp.zeros_like(u))
        f_over_r = jnp.where(mask, f_over_r, jnp.zeros_like(f_over_r))

        energy = 0.5 * jnp.sum(u)
        virial = 0.5 * jnp.sum(f_over_r * r2_safe)
        forces = jnp.stack(
            [jnp.sum(f_over_r * dk, axis=1) for dk in d_comps], axis=-1
        )
        return energy, virial, forces, nbrs
