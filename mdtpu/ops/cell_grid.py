"""Roll-stencil cell-grid engine — gather-free pair interactions on TPU.

The (N, K) neighbor-list engine's hot path is dominated by random gathers,
which TPUs execute poorly. This engine removes gathers from the hot path
entirely by exploiting the structure of a cell grid:

  * particles are **sorted by cell** into padded per-component buffers of
    shape (nx, ny, nz, C) (C = cell capacity) at rebuild time — one cheap
    (N,) argsort + (N,) scatters;
  * at every step, the 3^d stencil neighbors of *all* cells simultaneously
    are just **circular rolls** of the padded grid (``jnp.roll`` over the
    grid axes — static permutations, no indices materialised);
  * pair interactions are dense (n_cells, C, C) broadcasts per stencil
    offset — pure VPU work on dense tiles, minimum-imaged per component;
  * forces come out in sorted order and are mapped back with a single (N,)
    gather.

This trades ~10x more pair-slot FLOPs (padding waste: C^2 vs true neighbor
counts) for the complete elimination of (N, K) random gathers and of the
(N, 27C) candidate compaction sort at build time — the classic TPU trade of
dense regular compute for irregular memory access. Replaces the role of
CellListMap.jl (/root/reference/src/initialization.jl:100-107) as the
production engine for large N.

Capacity overflow sets a flag (checked by the driver at event boundaries)
exactly like the neighbor-list engine.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mdtpu.ops.neighbor_list import _grid_for_box

# Far-pad coordinates for vacant capacity slots: mutually > any cutoff apart
# and > any cutoff away from every real particle, so the r2 < rc^2 test
# eliminates them without occupancy masks.
# far_ramp index budget: beyond this the squared far-far displacements
# overflow f32 to inf and 0 * inf = NaN would leak into vacant-slot forces.
FAR_RAMP_MAX = 1 << 28
# Smallest far_ramp value; vacancy thresholds derive from this (halo row
# engine classifies rows as pad when a coordinate exceeds half of it).
FAR_RAMP_MIN = float(1 << 25)


def far_ramp(count, dtype, k0=0):
    """``count`` far-pad coordinates for ramp indices k0..k0+count-1.

    Every value is EXACTLY representable in f32 and consecutive values
    differ by >= 4 (> any practical cutoff) even after f32 rounding, for
    indices up to ``FAR_RAMP_MAX`` (2.7e8 slots): index k maps to
    ``exp2(k >> 23) * (2^25 + 4 * (k mod 2^23))`` — within each 2^23-index
    binade the values are multiples of ``4 * 2^e`` inside
    [2^25 * 2^e, 2^26 * 2^e), which is exactly the f32 ulp there. A plain
    ``base + 4 * k`` ramp collapses adjacent values once ``4 * k`` passes
    2^26 (ulp 8 > spacing 4) — r2 = 0 vacant pairs would put inf/NaN into
    the maskless pair sweep. ``k0`` may be a traced int32 (sharded callers
    pass a per-device offset so no two devices' vacants coincide); static
    callers are budget-checked here."""
    if isinstance(k0, (int, np.integer)) and k0 + count > FAR_RAMP_MAX:
        raise ValueError(
            f"far_ramp budget exceeded: {k0 + count} > {FAR_RAMP_MAX} "
            f"(squared far coordinates would overflow f32)")
    k = jnp.asarray(k0, jnp.int32) + jnp.arange(count, dtype=jnp.int32)
    e = k >> 23
    m = (k & ((1 << 23) - 1)).astype(dtype)
    # 2^e built by bit-casting the f32 exponent field — exact by
    # construction. Not exp2/ldexp/power: XLA lowers those through the
    # approximate exp/log path on TPU (a few ulp off), which would break
    # the exact-representability guarantee this ramp exists for.
    two_e = jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32).astype(dtype)
    return two_e * (jnp.asarray(FAR_RAMP_MIN, dtype) + 4.0 * m)


def refresh_far_grids(positions, nbrs, grid, cap, cell, cell_inv):
    """Scatter current positions into the sorted cell layout over the far-pad
    base. Coordinates are stored as ref + MIC(pos - ref) so every slot sits
    within skin/2 of its home cell (exact ghost-window image shifts); vacant
    slots hold mutually-distant far coordinates (no occupancy masks).
    General (triclinic) cells: the MIC is two (N, d) matmuls.
    Returns per-component grids of shape grid + (cap,)."""
    from mdtpu.core.box import minimum_image

    dim = positions.shape[1]
    dtype = positions.dtype
    n_cells = int(np.prod(grid))
    pad = n_cells * cap + 1
    eff = nbrs.ref_positions + minimum_image(
        positions - nbrs.ref_positions, cell, cell_inv)
    eff_t = eff.T
    far = far_ramp(pad, dtype)
    grids = []
    for k in range(dim):
        g = far.at[nbrs.addr].set(eff_t[k])[:-1]
        grids.append(g.reshape(tuple(grid) + (cap,)))
    return grids


def uniform_sigma_of(diameters):
    """The common diameter value if every particle shares one, else 0.0.

    Engines created with a nonzero ``uniform_sigma`` hoist the
    Lorentz-mixing out of the pair sweep entirely: the diameter windows are
    never built (less gather/concat traffic and, on the sharded engine, a
    smaller ppermute payload) and the potential kernel receives a
    compile-time scalar sigma that XLA constant-folds. The reference mixes
    sigmas per pair unconditionally (/root/reference/src/pairwise.jl:31);
    for the monodisperse systems of its own examples that work is
    loop-invariant."""
    if diameters is None:
        return 0.0
    d = np.asarray(diameters)
    if d.size == 0:
        return 0.0
    v = d.reshape(-1)[0]
    return float(v) if bool(np.all(d == v)) else 0.0


def ghost_z_window(a, ghost_shift=None):
    """Concatenate the z-1 / z / z+1 cell contents into (..., z, 3C) windows;
    win[..., z, w*C + c] = a[..., z + (w - 1), c], periodic in z. For the z
    coordinate component pass ghost_shift = Lz so the wrapped plane carries
    true (image-shifted) coordinates and no per-slot MIC is needed.
    Zero-dim inputs (uniform-sigma scalars) pass through unchanged."""
    if jnp.ndim(a) == 0:
        return a
    if ghost_shift is None:
        zm = jnp.roll(a, 1, axis=2)
        zp = jnp.roll(a, -1, axis=2)
    else:
        zm = jnp.concatenate([a[:, :, -1:] - ghost_shift, a[:, :, :-1]],
                             axis=2)
        zp = jnp.concatenate([a[:, :, 1:], a[:, :, :1] + ghost_shift], axis=2)
    return jnp.concatenate([zm, a, zp], axis=3)


def ghost_z_window_hilo(hi, lo, ghost_shift):
    """Hi/lo (double-f32) z-window pair: the ghost image shift is applied to
    the hi word through an error-free two_sum, its rounding residual folded
    into the lo word — wrapped-plane coordinates stay exact to the two-float
    representation (a plain ``hi +- L`` would inject ~eps*L noise into every
    boundary pair, defeating the hi/lo pair sweep)."""
    from mdtpu.utils.math import two_sum

    sm, rm = two_sum(hi[:, :, -1:], -ghost_shift)
    sp, rp = two_sum(hi[:, :, :1], ghost_shift)
    zm_hi = jnp.concatenate([sm, hi[:, :, :-1]], axis=2)
    zp_hi = jnp.concatenate([hi[:, :, 1:], sp], axis=2)
    zm_lo = jnp.concatenate([lo[:, :, -1:] + rm, lo[:, :, :-1]], axis=2)
    zp_lo = jnp.concatenate([lo[:, :, 1:], lo[:, :, :1] + rp], axis=2)
    return (jnp.concatenate([zm_hi, hi, zp_hi], axis=3),
            jnp.concatenate([zm_lo, lo, zp_lo], axis=3))


def _slice_axis(w, sl, axis):
    return w[(slice(None),) * axis + (sl,)]


def ghost_shift(w, off, ghost, axis=0):
    """Neighbor view of a window array along ``axis`` for stencil offset
    ``off`` in {-1, 0, +1}: rows shift by one with periodic wrap, and the
    wrapped slice carries the true (box-image-shifted) coordinates when
    ``ghost`` is that component's cell vector entry (pass ``None`` for
    diameters; zero-dim uniform-sigma scalars pass through). Ghost shifts
    applied at window-construction time are what make the pair sweeps'
    displacements true displacements with no per-slot minimum-image work."""
    if jnp.ndim(w) == 0 or off == 0:
        return w
    if off == 1:
        first = _slice_axis(w, slice(0, 1), axis)
        if ghost is not None:
            first = first + ghost
        return jnp.concatenate(
            [_slice_axis(w, slice(1, None), axis), first], axis=axis)
    last = _slice_axis(w, slice(-1, None), axis)
    if ghost is not None:
        last = last - ghost
    return jnp.concatenate(
        [last, _slice_axis(w, slice(None, -1), axis)], axis=axis)


def ghost_shift_hilo(w, w_lo, off, ghost, axis=0):
    """`ghost_shift` for a hi/lo (double-f32) pair: the box shift goes
    through an error-free two_sum on the hi word with the rounding residual
    folded into the lo word (same mechanism as ghost_z_window_hilo — a
    plain ``hi ± L`` would inject ~eps*L noise into every boundary pair,
    defeating the hi/lo pair sweep that passes the NVE drift gate)."""
    from mdtpu.utils.math import two_sum

    if off == 0:
        return w, w_lo
    if off == 1:
        first, r = two_sum(_slice_axis(w, slice(0, 1), axis), ghost)
        return (jnp.concatenate(
                    [_slice_axis(w, slice(1, None), axis), first], axis=axis),
                jnp.concatenate(
                    [_slice_axis(w_lo, slice(1, None), axis),
                     _slice_axis(w_lo, slice(0, 1), axis) + r], axis=axis))
    last, r = two_sum(_slice_axis(w, slice(-1, None), axis), -ghost)
    return (jnp.concatenate(
                [last, _slice_axis(w, slice(None, -1), axis)], axis=axis),
            jnp.concatenate(
                [_slice_axis(w_lo, slice(-1, None), axis) + r,
                 _slice_axis(w_lo, slice(None, -1), axis)], axis=axis))


def self_pair_diag_bump(cap, dtype):
    """Self-pair exclusion for the (C, 3C) windowed pair tiles: window
    column ``cap + i`` is own slot ``i``, and adding a huge value to that
    diagonal band pushes self pairs past every cutoff — one add replaces an
    occupancy mask (the potential contract's exact-zero-beyond-cutoff then
    kills them, exactly like the far-pad vacants)."""
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 1)
    return jnp.where(j_ids == i_ids + cap, jnp.asarray(1e30, dtype),
                     jnp.zeros((), dtype))[None, :, :]


def make_pair_block(potential, own, own_lo, own_diam, diag_bump, cap,
                    observables):
    """The ONE windowed pair-block kernel shared by every sweep (2D
    y-window, 3D z-window, x-plane scan, sharded halo): given the stencil's
    neighbor window ``wc`` (a list of per-component (lead, 3C) arrays) and
    its diameters ``wd``, return (energy_per_pair, f_over_r, r2, d_comps)
    against the closure's own-slot coordinates (lead, C, 1).

    This body is the precision-critical heart of the framework — the hi/lo
    branch computes displacements via an error-free two_sum of the hi words
    plus the lo difference (a plain hi difference rounds at ulp(r) ~ 1.2e-7
    and measured 2.8e-4 NVE drift per 1e6 steps, 3x over the gate), and the
    maskless r2 path relies on the potential contract's exact zeros beyond
    cutoff to kill far-pad vacants (~1e12) and the self-pair diag bump
    (~1e30). Keep it in one place.

    No engine-level cutoff mask: the cmp + selects it would need were ~8%
    of the sweep (creation-time validation guarantees the engine reach
    covers the potential's maximum pair cutoff)."""
    from mdtpu.utils.math import two_sum

    dim = len(own)
    lead = own[0].shape[0]

    def pair_block(wc, wd, exclude_self, wc_lo=None):
        wc = [w.reshape(lead, 1, 3 * cap) for w in wc]
        if jnp.ndim(wd):
            wd = wd.reshape(lead, 1, 3 * cap)
        if wc_lo is not None:
            wc_lo = [w.reshape(lead, 1, 3 * cap) for w in wc_lo]
            d_comps = []
            for k in range(dim):
                s, e = two_sum(own[k], -wc[k])
                d_comps.append(s + (e + (own_lo[k] - wc_lo[k])))
        else:
            d_comps = [own[k] - wc[k] for k in range(dim)]
        r2 = sum(dk * dk for dk in d_comps)
        if exclude_self:
            r2 = r2 + diag_bump
        if observables:
            u, f_over_r = potential.evaluate_r2(r2, own_diam, wd)
        else:
            u = None
            f_over_r = potential.force_r2(r2, own_diam, wd)
        return u, f_over_r, r2, d_comps

    return pair_block


# One gather-formulated rebin costs ~this many lean force sweeps at the
# dynamics-tuned geometry (probe_fire, 262k LJ: 15.0 ms vs 5.3 ms). Used by
# the ``workload='minimize'`` tuning profile only — the ratio drifts with
# size/geometry, but the argmin is flat around it (the lever is skin, which
# varies ~4x across candidates while the ratio moves the weighting ~±30%).
_FIRE_REBIN_OVER_SWEEP = 2.8


def _workload_cost(sweep_cost, skin, workload, dmax):
    """Score a candidate geometry for the target workload.

    dynamics: sweep cost alone (thermal rebuild cadence ~25+ steps makes
    the rebin negligible). minimize: FIRE's displacement cap pins per-
    iteration motion at ``dmax``, so rebins fire every ``skin/(2 dmax)``
    iterations; amortize a rebin worth ``_FIRE_REBIN_OVER_SWEEP`` sweeps
    into the per-iteration cost (rebin cost tracks slot count, which
    tracks padded sweep cost across candidates to within lane padding)."""
    if workload == "dynamics":
        return sweep_cost
    if workload != "minimize":
        raise ValueError(f"unknown tuning workload {workload!r}")
    iters_per_rebin = max(skin, 1e-6) / (2.0 * dmax)
    return sweep_cost * (1.0 + _FIRE_REBIN_OVER_SWEEP / iters_per_rebin)


@struct.dataclass
class CellGridState:
    addr: jnp.ndarray           # (N,) slot address of each particle: cid*C + rank
    occupied: jnp.ndarray       # (n_cells*C,) bool slot-occupancy mask
    sorted_diam: jnp.ndarray    # (n_cells*C,) padded sorted diameters
    ref_positions: jnp.ndarray  # (N, d) positions at build time
    overflow: jnp.ndarray       # () bool


@struct.dataclass
class CellGridEngine:
    potential: Any
    cutoff: float = struct.field(pytree_node=False, default=1.5)
    skin: float = struct.field(pytree_node=False, default=0.3)
    grid: Tuple[int, ...] = struct.field(pytree_node=False, default=(3, 3, 3))
    cell_capacity: int = struct.field(pytree_node=False, default=16)
    # Memory-bounded sweep: lax.scan over x-planes instead of one dense
    # (n_cells, C, 3C) computation — FASTER once the dense tile exceeds
    # ~120 MB (the block working set outgrows the on-chip footprint and
    # goes HBM-bound; create_tuned switches automatically), a few %
    # slower below that. Slot path only; composes with the hi/lo sweep.
    # Measured negative result (BENCH_NOTES round 3): chunking INSIDE the
    # plane (inner scan over y-row blocks) is 4-28% slower at 262k-1M —
    # XLA already fuses the pair tile into its reductions, so the tile
    # never materializes and chunking only adds slice/stack copies.
    plane_scan: bool = struct.field(pytree_node=False, default=False)
    # Nonzero when every particle shares this diameter: the sweeps then skip
    # the diameter windows and pass a constant-folded scalar sigma to the
    # potential (see uniform_sigma_of). Set automatically by create /
    # create_tuned when ``diameters`` is supplied.
    uniform_sigma: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, potential, cutoff, skin, unitcell, n_particles,
               cell_capacity=None, max_sigma=1.0, diameters=None):
        from mdtpu.potentials.base import check_engine_cutoff

        if diameters is not None:
            max_sigma = max(max_sigma, float(np.max(np.asarray(diameters))))
        check_engine_cutoff(potential, cutoff, max_sigma)
        grid = _grid_for_box(unitcell, cutoff, skin)
        if grid is None:
            raise ValueError(
                "box too small for a cell grid at this cutoff; use NaivePairEngine"
            )
        if cell_capacity is None:
            # Tight default (mean + 3.5 sigma): smaller C is quadratically
            # cheaper in the (C, 3C) pair tiles; rare overflows are handled
            # by the driver's grown-capacity rebuild.
            volume = abs(float(np.linalg.det(np.asarray(unitcell, np.float64))))
            mean_occ = n_particles / volume * (volume / int(np.prod(grid)))
            cell_capacity = int(math.ceil(mean_occ + 3.5 * math.sqrt(mean_occ) + 2))
        return cls(potential=potential, cutoff=float(cutoff), skin=float(skin),
                   grid=grid, cell_capacity=int(cell_capacity),
                   uniform_sigma=uniform_sigma_of(diameters))

    @classmethod
    def create_tuned(cls, potential, cutoff, unitcell, n_particles,
                     min_skin=0.3, occ_sigma=2.5, max_sigma=1.0,
                     diameters=None, workload="dynamics", dmax=0.1):
        """Pick the (grid, capacity, skin) minimizing padded-lane cost.

        The z-window pair blocks are (C, 3C) tiles padded to (ceil8(C),
        ceil128(3C)) vregs, so the true sweep cost is n_cells * ceil8(C) *
        ceil128(3C) — NOT the naive C^2 count. Small cells (cutoff + min
        skin) give C ~ 15 whose 45-lane window wastes 65% of every vreg;
        fatter cells with C ~ 36-42 fill the 128 lanes and, despite more
        real pair candidates, cost up to ~2x less padded compute AND rebuild
        ~4x less often (skin = cell - cutoff grows). Enumerates every
        feasible cubic grid and takes the argmin.

        ``workload``: ``"dynamics"`` (default) scores candidates by sweep
        cost alone — thermal runs rebuild every ~25+ steps, so the rebin
        amortizes away. ``"minimize"`` scores sweep + amortized rebin:
        FIRE displacements pin at the ``dmax`` cap (0.1 by default), so a
        candidate rebins every ``skin / (2 dmax)`` iterations and one rebin
        costs ~2.8 lean sweeps (probe_fire at 262k: rebin 15.0 ms vs sweep
        5.3 ms — 30-40% of FIRE wall time at the dynamics-tuned skin).
        Minimize-tuned geometry trades a fatter sweep for ~2x the skin.

        The reference's CellListMap always uses cutoff-sized cells
        (/root/reference/src/initialization.jl:100-107) — correct for
        sparse CPU traversal, wrong for dense TPU tiles."""
        from mdtpu.potentials.base import check_engine_cutoff

        if diameters is not None:
            max_sigma = max(max_sigma, float(np.max(np.asarray(diameters))))
        check_engine_cutoff(potential, cutoff, max_sigma)
        u = np.asarray(unitcell, np.float64)
        lengths = [float(np.linalg.norm(u[:, k])) for k in range(u.shape[0])]
        L = min(lengths)
        volume = abs(float(np.linalg.det(u)))
        g_max = int(L / (cutoff + min_skin))
        if g_max < 3:
            raise ValueError(
                "box too small for a cell grid at this cutoff; use NaivePairEngine"
            )
        cands = []
        for g in range(3, g_max + 1):
            # g cells along the shortest box vector; other axes scaled to
            # keep cells near-cubic.
            grids = tuple(max(3, int(g * lengths[k] / L + 1e-9))
                          for k in range(len(lengths)))
            n_cells = int(np.prod(grids))
            mean = n_particles / n_cells
            # mean + 2.5 sigma + 2 tracks measured occupancy maxima
            # (mean 19.4 -> max 29 over melted runs = +2.2 sigma); a fatter
            # margin needlessly crosses sublane-padding boundaries (C=41
            # pads to 48 rows where C<=40 pads to 40 — 17% more compute).
            # The sticky overflow flag + driver grown-capacity rebuild
            # guard the tail.
            cap = int(math.ceil(mean + occ_sigma * math.sqrt(mean) + 2))
            subl = -(-cap // 8) * 8
            lanes = -(-(3 * cap) // 128) * 128
            cost = n_cells * subl * lanes
            skin_g = min(lengths[k] / grids[k]
                         for k in range(len(lengths))) - cutoff
            cost = _workload_cost(cost, skin_g, workload, dmax)
            cands.append((cost, grids, cap))
        best_cost = min(c[0] for c in cands)
        # Near-tie break: the fattest cells (largest skin) — rebuilds are
        # ~2.4 ms each and their frequency falls ~linearly with skin
        # (measured at the 65k pseudo-HS point: grid 14/C40/skin 1.66 beats
        # the equal-cost grid 16/C30/skin 1.26 by 5%).
        _, grids, cap = min((c for c in cands if c[0] <= 1.05 * best_cost),
                            key=lambda c: c[1][0])
        skin = min(lengths[k] / grids[k] for k in range(len(lengths))) - cutoff
        # Dense pair tiles of (n_cells, C, 3C) f32: beyond ~100 MB the
        # sweep goes HBM-bandwidth-bound (block intermediates spill out of
        # VMEM) and the x-plane scan's smaller working set WINS — measured
        # at N=262k (tile 218 MB): scan 4.85 vs dense 6.57 ms/step (-26%),
        # while at N=65k (tile 56 MB) dense wins 1.41 vs 1.96 (probe_ps,
        # BENCH_NOTES round-3 scaling). Beyond ~400 MB the dense tiles
        # additionally exhaust HBM outright.
        subl = -(-cap // 8) * 8
        lanes = -(-(3 * cap) // 128) * 128
        tile_bytes = int(np.prod(grids)) * subl * lanes * 4
        return cls(potential=potential, cutoff=float(cutoff),
                   skin=float(skin), grid=grids, cell_capacity=cap,
                   plane_scan=bool(len(grids) == 3 and tile_bytes > 1.2e8),
                   uniform_sigma=uniform_sigma_of(diameters))

    def with_grown_capacity(self):
        return self.replace(cell_capacity=int(self.cell_capacity * 1.4 + 4))

    def padded_lane_stats(self, ms_per_step=None):
        """Machine-checkable utilization of this geometry (the create_tuned
        cost model, exported so bench JSONs carry it — BENCH_NOTES
        'Roofline'): one sweep processes ``n_cells * ceil8(C) * ceil128(3C)
        * n_blocks`` padded lane-slots, each a pair candidate costing
        ~``OPS_PER_SLOT`` VPU passes (hand count for the lean unshifted-LJ
        block: displacement subs, r^2, sigma mixing, reciprocal, sr powers,
        f_over_r, guard selects, own-force mul+lane-reduce, reaction
        sublane-reduce ~= 32). ``n_blocks`` is the in-plane Newton half
        stencil: self + (3^(d-1)-1)/2 shifted blocks.

        Returns a dict with ``padded_lane_slots_per_step``,
        ``useful_pair_fraction`` (real C x 3C window / its vreg padding),
        and — when ``ms_per_step`` is given — ``lane_utilization``: the
        fraction of the v5e VPU's ~3.9e12 f32 ops/s the measured step
        sustains (the speed-of-light ratio previously hand-derived in
        BENCH_NOTES)."""
        OPS_PER_SLOT = 32.0
        VPU_F32_OPS_PER_SEC = 3.9e12  # TPU v5e, 8 x (8, 128) f32 VPU lanes
        dim = len(self.grid)
        cap = self.cell_capacity
        n_cells = int(np.prod(self.grid))
        subl = -(-cap // 8) * 8
        lanes = -(-(3 * cap) // 128) * 128
        n_blocks = (3 ** (dim - 1) - 1) // 2 + 1
        slots = n_cells * subl * lanes * n_blocks
        stats = {
            "padded_lane_slots_per_step": slots,
            "useful_pair_fraction": round(cap * 3 * cap / (subl * lanes), 4),
        }
        if ms_per_step is not None:
            sol_ms = slots * OPS_PER_SLOT / VPU_F32_OPS_PER_SEC * 1e3
            stats["lane_utilization"] = round(sol_ms / ms_per_step, 4)
            stats["vpu_speed_of_light_ms"] = round(sol_ms, 4)
        return stats

    # ------------------------------------------------------------------ build
    def allocate(self, positions, diameters, cell, cell_inv):
        n, dim = positions.shape
        grid = jnp.asarray(self.grid, jnp.int32)
        n_cells = int(np.prod(self.grid))
        cap = self.cell_capacity

        frac = jnp.dot(positions, cell_inv.T,
                       precision=jax.lax.Precision.HIGHEST)
        frac = frac - jnp.floor(frac)
        coords = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)
        strides = np.concatenate(
            [np.cumprod(self.grid[::-1])[-2::-1], [1]]).astype(np.int32)
        # Explicit int32: jnp.sum promotes int32 to int64 under x64, which
        # would ride into the int32 scatters below (FutureWarning, future
        # error).
        cid = jnp.sum(coords * jnp.asarray(strides), axis=1).astype(jnp.int32)

        order = jnp.argsort(cid).astype(jnp.int32)
        cid_sorted = cid[order]
        counts = jnp.zeros((n_cells,), jnp.int32).at[cid].add(jnp.int32(1))
        starts = jnp.cumsum(counts) - counts
        rank = jnp.arange(n, dtype=jnp.int32) - starts[cid_sorted]
        overflow = jnp.any(counts > cap)

        slot_ok = rank < cap
        addr_sorted = jnp.where(slot_ok, cid_sorted * cap + rank, n_cells * cap)
        # addr per *particle* (invert the sort): addr[order[i]] = addr_sorted[i]
        addr = jnp.zeros((n,), jnp.int32).at[order].set(addr_sorted)

        pad = n_cells * cap + 1  # one trash slot for overflow writes
        occupied = jnp.zeros((pad,), bool).at[addr].set(True)[:-1]

        sorted_diam = jnp.ones((pad,), diameters.dtype).at[addr].set(diameters)[:-1]

        return CellGridState(
            addr=addr, occupied=occupied, sorted_diam=sorted_diam, ref_positions=positions,
            overflow=overflow,
        )

    # ---------------------------------------------------------------- rebuild
    def needs_rebuild(self, positions, nbrs: CellGridState, cell, cell_inv):
        from mdtpu.core.box import minimum_image

        disp = minimum_image(positions - nbrs.ref_positions, cell, cell_inv)
        half_skin = 0.5 * self.skin
        return jnp.any(jnp.sum(disp * disp, axis=-1) > half_skin * half_skin)

    # ---------------------------------------------------------------- forces
    def compute(self, positions, diameters, cell, cell_inv, nbrs: CellGridState):
        if len(self.grid) == 3:
            return self._compute_zwindow(positions, diameters, cell, cell_inv,
                                         nbrs)
        if len(self.grid) == 2:
            return self._compute_ywindow(positions, diameters, cell, cell_inv,
                                         nbrs)
        return self._compute_rolls(positions, diameters, cell, cell_inv, nbrs)

    def _compute_ywindow(self, positions, diameters, cell, cell_inv,
                         nbrs: CellGridState):
        """2D fast path: ghosted y-window sweep (see _ywindow_sweep).
        Triclinic-safe (ghost shifts are full cell vectors), unlike the
        orthorhombic-only roll engine."""
        dim = positions.shape[1]
        cap = self.cell_capacity
        grids = refresh_far_grids(positions, nbrs, self.grid, cap, cell,
                                  cell_inv)
        diam = (jnp.asarray(self.uniform_sigma, positions.dtype)
                if self.uniform_sigma
                else nbrs.sorted_diam.reshape(self.grid + (cap,)))
        energy, virial, f_own = self._ywindow_sweep(grids, diam, cell)
        forces = jnp.stack(
            [f_own[k].reshape(-1)[nbrs.addr] for k in range(dim)], axis=-1)
        return energy, virial, forces, nbrs

    def _ywindow_sweep(self, grids, diam, cell, observables=True,
                       grids_lo=None):
        """Ghosted y-window half-stencil sweep over 2D slot grids — the 2D
        analog of :meth:`_zwindow_sweep` (/root/reference is dimension-
        generic, /root/reference/src/types.jl:15-32; this keeps 2D on the
        same slot fast path as 3D instead of the slower roll engine).

        The 9-cell stencil collapses to 2 pair blocks: the y-1/y/y+1 cell
        contents concatenate into (..., 3C) windows, leaving only the self
        column (every pair seen from both sides, halved scalars) and the
        x+1 Newton half-stencil column (reactions un-windowed by y-rolls
        and rolled back in x). Ghost image shifts are full cell vectors
        (columns of the cell), so tilted 2D cells work identically.
        ``grids_lo`` enables the same hi/lo (double-f32) precision mode as
        the 3D sweep (two_sum ghost shifts, error-free hi differences)."""
        from mdtpu.utils.math import two_sum

        dim = len(grids)
        dtype = grids[0].dtype
        cap = self.cell_capacity
        nx, ny = self.grid
        n_cells = nx * ny
        hilo = grids_lo is not None

        def ywin(a, ghost_shift=None):
            if jnp.ndim(a) == 0:   # uniform-sigma scalar passes through
                return a
            if ghost_shift is None:
                ym = jnp.roll(a, 1, axis=1)
                yp = jnp.roll(a, -1, axis=1)
            else:
                ym = jnp.concatenate([a[:, -1:] - ghost_shift, a[:, :-1]],
                                     axis=1)
                yp = jnp.concatenate([a[:, 1:], a[:, :1] + ghost_shift],
                                     axis=1)
            return jnp.concatenate([ym, a, yp], axis=2)

        def ywin_hilo(hi, lo, ghost):
            sm, rm = two_sum(hi[:, -1:], -ghost)
            sp, rp = two_sum(hi[:, :1], ghost)
            ym = jnp.concatenate([sm, hi[:, :-1]], axis=1)
            yp = jnp.concatenate([hi[:, 1:], sp], axis=1)
            ym_lo = jnp.concatenate([lo[:, -1:] + rm, lo[:, :-1]], axis=1)
            yp_lo = jnp.concatenate([lo[:, 1:], lo[:, :1] + rp], axis=1)
            return (jnp.concatenate([ym, hi, yp], axis=2),
                    jnp.concatenate([ym_lo, lo, yp_lo], axis=2))

        if hilo:
            pairs = [ywin_hilo(grids[k], grids_lo[k], cell[k, 1])
                     for k in range(dim)]
            win = [p[0] for p in pairs]
            win_lo = [p[1] for p in pairs]
            own_lo = [g.reshape(n_cells, cap, 1) for g in grids_lo]
        else:
            win = [ywin(grids[k], cell[k, 1]) for k in range(dim)]
            win_lo = own_lo = None
        win_diam = ywin(diam)
        own = [g.reshape(n_cells, cap, 1) for g in grids]
        own_diam3 = diam if jnp.ndim(diam) == 0 else diam.reshape(n_cells, cap, 1)

        pair_block = make_pair_block(self.potential, own, own_lo, own_diam3,
                                     self_pair_diag_bump(cap, dtype), cap,
                                     observables)

        # Self column (ox = 0): every pair appears from both sides.
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
            r = reaction.reshape(nx, ny, 3, cap)
            return (jnp.roll(r[..., 0, :], -1, axis=1) + r[..., 1, :]
                    + jnp.roll(r[..., 2, :], 1, axis=1))

        # x + 1 Newton half-stencil column.
        if hilo:
            shifted = [ghost_shift_hilo(win[k], win_lo[k], 1, cell[k, 0])
                       for k in range(dim)]
            wc = [s[0] for s in shifted]
            wc_lo = [s[1] for s in shifted]
        else:
            wc = [ghost_shift(win[k], 1, cell[k, 0]) for k in range(dim)]
            wc_lo = None
        wd = ghost_shift(win_diam, 1, None)
        u, f_over_r, r2s, d_comps = pair_block(wc, wd, False, wc_lo=wc_lo)
        if observables:
            energy = energy + jnp.sum(u)
            virial = virial + jnp.sum(f_over_r * r2s)
        for k in range(dim):
            f_own = f_own.at[k].add(jnp.sum(f_over_r * d_comps[k], axis=2))
            react = unwindow(-jnp.sum(f_over_r * d_comps[k], axis=1))
            f_own = f_own.at[k].add(
                jnp.roll(react, 1, axis=0).reshape(n_cells, cap))

        return energy, virial, [f_own[k] for k in range(dim)]

    def _compute_zwindow(self, positions, diameters, cell, cell_inv,
                         nbrs: CellGridState):
        """3D fast path: ghosted z-window formulation.

        The 27-cell stencil is collapsed to the 9 in-plane (x, y) offsets by
        concatenating the z-shifted grids into (..., 3C) windows — every pair
        block is then (C, 3C) with one lane tile instead of 27 (C, C) blocks;
        TPU pads lanes to 128, so this cuts padded compute ~3x. In-plane
        offsets use the Newton half stencil (4 offsets + self) with reactions
        un-windowed by z-rolls and rolled back in-plane — no gathers or
        scatters anywhere.

        Two per-slot-op eliminations (the pair block is pure VPU work, so
        every op per (cell, i, j) slot is ~1.4e8 ops/step at the bench size):

        * **ghost-shifted windows**: wrap-around neighbors get the box length
          added/subtracted at window/roll construction time (O(n_cells * 3C)
          work), so displacements are true displacements — no per-slot
          minimum-image round/mul/sub (9 ops).
        * **far-pad empty slots**: vacant capacity slots hold mutually-distant
          far coordinates instead of zeros, so the r2 < rc^2 test kills them —
          no occupancy masks (2 and-ops + the occupancy loads). Self pairs
          (r2 = 0) are excluded by adding a huge constant to the diagonal
          band of the self column (1 add replaces a mask and). Since all
          surviving r2 are bounded away from 0, the r2_safe select guarding
          the reciprocal is dropped too.
        """
        dim = positions.shape[1]
        cap = self.cell_capacity
        grids = refresh_far_grids(positions, nbrs, self.grid, cap, cell,
                                  cell_inv)
        diam = (jnp.asarray(self.uniform_sigma, positions.dtype)
                if self.uniform_sigma
                else nbrs.sorted_diam.reshape(self.grid + (cap,)))
        # Honor plane_scan here too: create_tuned enables it exactly when
        # the dense (n_cells, C, 3C) tiles would exhaust HBM (or run slower
        # HBM-bound) — the particle-order path must not rebuild them.
        sweep = (self._zwindow_sweep_scan if self.plane_scan
                 else self._zwindow_sweep)
        energy, virial, f_own = sweep(grids, diam, cell)
        # Back to particle order: one (N,) gather per component.
        forces = jnp.stack(
            [f_own[k].reshape(-1)[nbrs.addr] for k in range(dim)], axis=-1)
        return energy, virial, forces, nbrs

    def _zwindow_sweep(self, grids, diam, cell, observables=True,
                       grids_lo=None):
        """Ghosted z-window half-stencil sweep over slot grids.

        grids: per-component (nx, ny, nz, C) slot coordinates (far-pad
        vacants); diam likewise. Returns (energy, virial, f_own) with f_own
        a list of per-component (n_cells, C) slot forces.

        ``observables=False`` skips the energy/virial accumulation passes and
        the energy polynomial inside the potential kernel (returns zeros for
        both scalars) — forces are bitwise identical. Steps whose energy is
        never read (all but the thermo/sample steps; the reference also only
        *writes* thermo every ``frequency`` steps,
        /root/reference/src/simulation.jl:118-136) skip ~20% of the pair
        sweep this way.

        ``grids_lo``: optional low words of a double-f32 (hi+lo) coordinate
        representation. Pair displacements are then computed as
        ``(hi_i - hi_j) + (lo_i - lo_j)``: the hi difference of nearby values
        rounds at ulp(r) ~ 1e-7 instead of carrying the ~eps*L ~ 3e-6
        truncation of single-f32 absolute coordinates — forces become
        near-exact gradients of the true (compensated) state at f32 speed,
        which is what the NVE drift gate needs (see gates.py 'f32x2').
        Ghost image shifts go through error-free two_sums so boundary pairs
        keep the full precision.
        """
        dim = len(grids)
        dtype = grids[0].dtype
        cap = self.cell_capacity
        nx, ny, nz = self.grid
        n_cells = nx * ny * nz


        # Ghost image shifts are full cell vectors (columns of the cell), so
        # tilted (triclinic) cells work identically: wrapping across grid
        # axis a shifts component k by cell[k, a] (zero off-diagonals for
        # orthorhombic boxes — the adds cost nothing on the small windows).
        hilo = grids_lo is not None
        if hilo:
            pairs = [ghost_z_window_hilo(grids[k], grids_lo[k], cell[k, 2])
                     for k in range(dim)]
            win = [p[0] for p in pairs]
            win_lo = [p[1] for p in pairs]
            own_lo = [g.reshape(n_cells, cap, 1) for g in grids_lo]
        else:
            win = [ghost_z_window(grids[k], cell[k, 2]) for k in range(dim)]
            win_lo = own_lo = None
        win_diam = ghost_z_window(diam)  # passes scalars (uniform sigma) through

        own = [g.reshape(n_cells, cap, 1) for g in grids]
        own_diam3 = diam if jnp.ndim(diam) == 0 else diam.reshape(n_cells, cap, 1)

        pair_block = make_pair_block(self.potential, own, own_lo, own_diam3,
                                     self_pair_diag_bump(cap, dtype), cap,
                                     observables)

        # Self column (ox = oy = 0): every pair appears from both sides.
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
            # reaction (n_cells, 3C) in window coords -> (nx, ny, nz, C)
            r = reaction.reshape(nx, ny, nz, 3, cap)
            return (jnp.roll(r[..., 0, :], -1, axis=2)
                    + r[..., 1, :]
                    + jnp.roll(r[..., 2, :], 1, axis=2))

        def plane_shift(w, ox, oy, ghost_x, ghost_y):
            # In-plane offset (ox, oy) = chained per-axis ghost shifts.
            return ghost_shift(ghost_shift(w, ox, ghost_x, axis=0),
                               oy, ghost_y, axis=1)

        def plane_shift_hilo(w, w_lo, ox, oy, gx, gy):
            w, w_lo = ghost_shift_hilo(w, w_lo, ox, gx, axis=0)
            return ghost_shift_hilo(w, w_lo, oy, gy, axis=1)

        # In-plane Newton half stencil.
        for ox, oy in ((0, 1), (1, -1), (1, 0), (1, 1)):
            if hilo:
                shifted = [plane_shift_hilo(win[k], win_lo[k], ox, oy,
                                            cell[k, 0], cell[k, 1])
                           for k in range(dim)]
                wc = [s[0] for s in shifted]
                wc_lo = [s[1] for s in shifted]
            else:
                wc = [plane_shift(win[k], ox, oy, cell[k, 0], cell[k, 1])
                      for k in range(dim)]
                wc_lo = None
            wd = plane_shift(win_diam, ox, oy, None, None)
            u, f_over_r, r2s, d_comps = pair_block(wc, wd, False, wc_lo=wc_lo)
            if observables:
                energy = energy + jnp.sum(u)
                virial = virial + jnp.sum(f_over_r * r2s)
            reacts = []
            for k in range(dim):
                f_own = f_own.at[k].add(jnp.sum(f_over_r * d_comps[k], axis=2))
                reacts.append(-jnp.sum(f_over_r * d_comps[k], axis=1))
            for k in range(dim):
                r = unwindow(reacts[k])
                r = jnp.roll(r, (ox, oy), axis=(0, 1))
                f_own = f_own.at[k].add(r.reshape(n_cells, cap))

        return energy, virial, [f_own[k] for k in range(dim)]

    def _zwindow_sweep_scan(self, grids, diam, cell, observables=True,
                            grids_lo=None):
        """Memory-bounded variant of the z-window sweep: lax.scan over
        x-planes, carrying the +x reaction plane.

        The dense sweep materializes (n_cells, C, 3C) pair tiles — ~880 MB
        each at N = 1M, which exhausts v5e HBM. Scanning one x-plane at a
        time shrinks every intermediate by a factor nx (25 MB at 1M): plane
        i's half-stencil needs only window planes i and i+1, and the ox=1
        reactions flow forward through the scan carry (the periodic wrap's
        reaction for plane 0 is the final carry). Same math, same
        reduction structure per plane; energy order differs only across
        planes.

        ``grids_lo``: optional low words for the hi/lo (double-f32) pair
        sweep — same mechanism as :meth:`_zwindow_sweep` (two_sum ghost
        shifts, error-free hi differences), so the NVE drift gate's f32x2
        precision mode composes with the >0.5M-particle scan capacity."""
        from mdtpu.utils.math import two_sum

        dim = len(grids)
        dtype = grids[0].dtype
        cap = self.cell_capacity
        nx, ny, nz = self.grid
        m = ny * nz
        hilo = grids_lo is not None

        if hilo:
            pairs = [ghost_z_window_hilo(grids[k], grids_lo[k], cell[k, 2])
                     for k in range(dim)]
            win = jnp.stack([p[0] for p in pairs])      # (3, nx, ny, nz, 3C)
            win_lo = jnp.stack([p[1] for p in pairs])
            lo_s = jnp.stack(grids_lo)                  # (3, nx, ny, nz, C)
        else:
            win = jnp.stack([ghost_z_window(grids[k], cell[k, 2])
                             for k in range(dim)])      # (3, nx, ny, nz, 3C)
            win_lo = lo_s = None
        win_diam = ghost_z_window(diam)                 # (nx, ny, nz, 3C)
        grids_s = jnp.stack(grids)                      # (3, nx, ny, nz, C)

        diag_bump = self_pair_diag_bump(cap, dtype)

        def yshift(w, oy, ghost_y):
            # w (ny, nz, W): the plane's y axis is axis 0.
            return ghost_shift(w, oy, ghost_y, axis=0)

        def yshift_hilo(w, w_lo, oy, gy):
            return ghost_shift_hilo(w, w_lo, oy, gy, axis=0)

        def unwindow_plane(reaction):
            # (m, 3C) window coords -> (ny, nz, C)
            r = reaction.reshape(ny, nz, 3, cap)
            return (jnp.roll(r[:, :, 0, :], -1, axis=1) + r[:, :, 1, :]
                    + jnp.roll(r[:, :, 2, :], 1, axis=1))

        def body(carry, i):
            energy, virial, react_in = carry
            own = [jax.lax.dynamic_index_in_dim(grids_s[k], i, 0, False)
                   .reshape(m, cap, 1) for k in range(dim)]
            wp = [jax.lax.dynamic_index_in_dim(win[k], i, 0, False)
                  for k in range(dim)]                      # (ny, nz, 3C)
            ip1 = (i + 1) % nx
            wrap = (i == nx - 1)
            if jnp.ndim(diam) == 0:     # uniform sigma: constant scalar
                own_d = wd = wd1 = diam
            else:
                own_d = jax.lax.dynamic_index_in_dim(diam, i, 0, False) \
                    .reshape(m, cap, 1)
                wd = jax.lax.dynamic_index_in_dim(win_diam, i, 0, False)
                wd1 = jax.lax.dynamic_index_in_dim(win_diam, ip1, 0, False)
            if hilo:
                own_lo = [jax.lax.dynamic_index_in_dim(lo_s[k], i, 0, False)
                          .reshape(m, cap, 1) for k in range(dim)]
                wp_lo = [jax.lax.dynamic_index_in_dim(win_lo[k], i, 0, False)
                         for k in range(dim)]
                # Periodic +x ghost shift through two_sum, applied only on
                # the wrap plane (residual folded into the lo word).
                wp1, wp1_lo = [], []
                for k in range(dim):
                    h = jax.lax.dynamic_index_in_dim(win[k], ip1, 0, False)
                    lo = jax.lax.dynamic_index_in_dim(win_lo[k], ip1, 0,
                                                      False)
                    s, r = two_sum(h, cell[k, 0])
                    wp1.append(jnp.where(wrap, s, h))
                    wp1_lo.append(jnp.where(wrap, lo + r, lo))
            else:
                own_lo = wp_lo = wp1_lo = None
                wp1 = [jax.lax.dynamic_index_in_dim(win[k], ip1, 0, False)
                       + jnp.where(wrap, cell[k, 0], jnp.zeros((), dtype))
                       for k in range(dim)]

            block = make_pair_block(self.potential, own, own_lo, own_d,
                                    diag_bump, cap, observables)

            u, f, r2s, dcs = block(wp, wd, True, wc_lo=wp_lo)
            if observables:
                energy = energy + 0.5 * jnp.sum(u)
                virial = virial + 0.5 * jnp.sum(f * r2s)
            f_own = jnp.stack([jnp.sum(f * dcs[k], axis=2)
                               for k in range(dim)])        # (3, m, C)
            react_out = jnp.zeros((dim, ny, nz, cap), dtype)

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
                wdd = yshift(srcd, oy, None)
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

            f_out = f_own + react_in.reshape(dim, m, cap)
            return (energy, virial, react_out), f_out

        zero = jnp.zeros((), dtype)
        (energy, virial, react_final), f_planes = jax.lax.scan(
            body, (zero, zero, jnp.zeros((dim, ny, nz, cap), dtype)),
            jnp.arange(nx))
        # Periodic wrap: plane nx-1's +x reactions belong to plane 0.
        f_planes = f_planes.at[0].add(react_final.reshape(dim, m, cap))
        # (nx, 3, m, C) -> per-comp (n_cells, C)
        f_own = [f_planes[:, k].reshape(nx * m, cap) for k in range(dim)]
        return energy, virial, f_own

    def compute_slots(self, positions, diameters, cell, cell_inv,
                      nbrs: CellGridState, observables=True, pos_lo=None):
        """Slot-space sweep: positions are ALREADY in cell-sorted slot order
        and component-major — shape (d, n_cells * C) with far-pad vacants —
        so there is no per-step scatter into the grid and no gather back; on
        TPU those two irregular memory ops cost more than the entire pair
        computation (measured 2.4 of 3.6 ms at the N=65k bench). The
        component-major layout also keeps every row a dense lane vector (an
        (N, 3) array pads its trailing 3 to 128 lanes — 42x memory on TPU).
        Used by mdtpu.integrate.slot_step, which keeps the whole simulation
        state in this layout and re-bins only at skin rebuilds."""
        dim = positions.shape[0]
        cap = self.cell_capacity
        shape = tuple(self.grid) + (cap,)
        # Contract (deferred wrap): positions are UNWRAPPED drift from the
        # binning reference — the slot step folds into the box only at
        # rebuild time, so every slot coordinate sits within skin/2 of its
        # home cell with NO per-slot minimum-image work here (vacant slots
        # hold far-pad values). The per-step MIC preamble this replaces was
        # ~20 VPU ops per slot.
        diam = (jnp.asarray(self.uniform_sigma, positions.dtype)
                if self.uniform_sigma else diameters.reshape(shape))
        grids = [positions[k].reshape(shape) for k in range(dim)]
        # Hi/lo (double-f32): the Kahan compensation's negated low word
        # rides along unchanged (deferred wrap keeps the pair coherent;
        # rebuild applies its fold through kahan_add).
        grids_lo = (None if pos_lo is None
                    else [pos_lo[k].reshape(shape) for k in range(dim)])
        if dim == 2:
            energy, virial, f_own = self._ywindow_sweep(
                grids, diam, cell, observables=observables,
                grids_lo=grids_lo)
        elif self.plane_scan and dim == 3:
            energy, virial, f_own = self._zwindow_sweep_scan(
                grids, diam, cell, observables=observables,
                grids_lo=grids_lo)
        else:
            energy, virial, f_own = self._zwindow_sweep(
                grids, diam, cell, observables=observables,
                grids_lo=grids_lo)
        forces = jnp.stack([f.reshape(-1) for f in f_own])
        return energy, virial, forces, nbrs

    def _compute_rolls(self, positions, diameters, cell, cell_inv,
                       nbrs: CellGridState):
        n, dim = positions.shape
        dtype = positions.dtype
        cap = self.cell_capacity
        n_cells = int(np.prod(self.grid))
        pad = n_cells * cap + 1
        lengths_np = [cell[k, k] for k in range(dim)]

        # Refresh padded coordinates at current positions (scatter via the
        # build-time addresses — positions moved less than skin/2 since).
        comp_grids = []
        pos_t = positions.T   # contiguous component rows for the scatters
        for k in range(dim):
            g = jnp.zeros((pad,), dtype).at[nbrs.addr].set(pos_t[k])[:-1]
            comp_grids.append(g.reshape(self.grid + (cap,)))
        occ = nbrs.occupied.reshape(self.grid + (cap,))
        diam_grid = nbrs.sorted_diam.reshape(self.grid + (cap,))

        grid_axes = tuple(range(dim))
        cutoff2 = jnp.asarray(self.cutoff * self.cutoff, dtype)
        lengths = jnp.stack([jnp.asarray(x, dtype) for x in lengths_np])

        own_comps = jnp.stack([c.reshape(n_cells, cap) for c in comp_grids])
        own_occ = occ.reshape(n_cells, cap)
        own_diam = diam_grid.reshape(n_cells, cap)

        eye = jnp.eye(cap, dtype=bool)[None, :, :]

        # Newton's-third-law half stencil: the self offset plus the 13 (4 in
        # 2D) lexicographically-positive offsets. Each cell pair is visited
        # once; the reaction forces on the neighbor cell's particles are
        # accumulated in the *rolled* frame and rolled back at the end —
        # Newton's third law without any scatter.
        all_offsets = np.array(np.meshgrid(*([(-1, 0, 1)] * dim),
                                           indexing="ij")).reshape(dim, -1).T
        half_offsets = [tuple(int(x) for x in off) for off in all_offsets
                        if tuple(off) > (0,) * dim]

        def pair_block(nbr_comps, nbr_occ, nbr_diam, self_mask):
            """nbr_comps (dim, nc, cap) vs own -> (u, f_over_r, r2_safe,
            d_comps) over (nc, cap, cap) pair tiles."""
            r2 = jnp.zeros((n_cells, cap, cap), dtype)
            d_comps = []
            for k in range(dim):
                dk = own_comps[k][:, :, None] - nbr_comps[k][:, None, :]
                dk = dk - lengths[k] * jnp.round(dk / lengths[k])
                d_comps.append(dk)
                r2 = r2 + dk * dk
            mask = own_occ[:, :, None] & nbr_occ[:, None, :] & (r2 < cutoff2)
            if self_mask:
                mask = mask & (~eye)
            r2_safe = jnp.where(mask, r2, jnp.ones_like(r2))
            u, f_over_r = self.potential.evaluate_r2(
                r2_safe, own_diam[:, :, None], nbr_diam[:, None, :])
            u = jnp.where(mask, u, jnp.zeros_like(u))
            f_over_r = jnp.where(mask, f_over_r, jnp.zeros_like(f_over_r))
            return u, f_over_r, r2_safe, d_comps

        # Self cell: full CxC both directions, halved scalars.
        u, f_over_r, r2s, d_comps = pair_block(own_comps, own_occ, own_diam, True)
        energy = 0.5 * jnp.sum(u)
        virial = 0.5 * jnp.sum(f_over_r * r2s)
        f_own = jnp.stack(
            [jnp.sum(f_over_r * d_comps[k], axis=2) for k in range(dim)]
        )  # (dim, nc, cap)

        # Stack the 13 pre-rolled neighbor views and scan over them: one
        # pair-block in the compiled graph instead of 13 (compile time).
        nbr_comps_stack = jnp.stack([
            jnp.stack([
                jnp.roll(comp_grids[k], tuple(-o for o in off),
                         axis=grid_axes).reshape(n_cells, cap)
                for k in range(dim)
            ]) for off in half_offsets
        ])  # (S, dim, nc, cap)
        nbr_occ_stack = jnp.stack([
            jnp.roll(occ, tuple(-o for o in off), axis=grid_axes).reshape(
                n_cells, cap) for off in half_offsets
        ])
        nbr_diam_stack = jnp.stack([
            jnp.roll(diam_grid, tuple(-o for o in off), axis=grid_axes).reshape(
                n_cells, cap) for off in half_offsets
        ])

        def body(carry, inputs):
            energy, virial, f_own = carry
            nbr_c, nbr_o, nbr_d = inputs
            u, f_over_r, r2s, d_comps = pair_block(nbr_c, nbr_o, nbr_d, False)
            energy = energy + jnp.sum(u)
            virial = virial + jnp.sum(f_over_r * r2s)
            f_own = f_own + jnp.stack(
                [jnp.sum(f_over_r * d_comps[k], axis=2) for k in range(dim)])
            reaction = -jnp.stack(
                [jnp.sum(f_over_r * d_comps[k], axis=1) for k in range(dim)])
            return (energy, virial, f_own), reaction

        (energy, virial, f_own), reactions = jax.lax.scan(
            body, (energy, virial, f_own),
            (nbr_comps_stack, nbr_occ_stack, nbr_diam_stack))

        # Roll the reaction partials back to their home cells and accumulate.
        for s, off in enumerate(half_offsets):
            r = reactions[s].reshape((dim,) + self.grid + (cap,))
            r = jnp.roll(r, off, axis=tuple(a + 1 for a in grid_axes))
            f_own = f_own + r.reshape(dim, n_cells, cap)

        # Back to particle order: one (N,) gather per component.
        forces = jnp.stack(
            [f_own[k].reshape(-1)[nbrs.addr] for k in range(dim)], axis=-1
        )
        return energy, virial, forces, nbrs
