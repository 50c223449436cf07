"""Sharded cell geometry: padded-lane-optimal grids under the x-slab
constraint (shared by the production slot-layout halo engine and the
demoted experimental row-layout engine)."""

from __future__ import annotations

import math

import numpy as np


def tuned_sharded_geometry(cutoff, unitcell, n_particles, n_shards,
                           min_skin=0.3, occ_sigma=2.5,
                           workload="dynamics", dmax=0.1):
    """Padded-lane-optimal sharded cell geometry (dimension-generic).

    The same cost model as ``CellGridEngine.create_tuned`` — pair blocks
    are (C, 3C) tiles padded to (ceil8(C), ceil128(3C)) vregs, so fat
    cells beat cutoff-sized cells 1.8-2.5x (BENCH_NOTES) — with nx
    constrained to a multiple of ``n_shards`` so every device owns an
    equal x-plane slab. Works for 2D and 3D boxes (the x-slab domain
    decomposition is dimension-generic; only the window axis differs).
    ``workload='minimize'`` amortizes FIRE's rebin cadence into the score
    exactly like the single-chip tuner (see ``_workload_cost``).
    Returns ``(grid, cell_capacity, skin)``."""
    from mdtpu.ops.cell_grid import _workload_cost

    u = np.asarray(unitcell, np.float64)
    dim = u.shape[0]
    lengths = [float(np.linalg.norm(u[:, k])) for k in range(dim)]
    g_max = [int(lengths[k] / (cutoff + min_skin)) for k in range(dim)]
    if g_max[0] < n_shards or min(g_max[1:]) < 3:
        raise ValueError(
            f"box too small to shard {g_max[0]} feasible x-planes over "
            f"{n_shards} devices at this cutoff")
    cands = []
    for gx in range(n_shards, g_max[0] + 1, n_shards):
        # Near-cubic cells: match the other axes to the x cell size.
        cx = lengths[0] / gx
        grids = (gx,) + tuple(
            min(g_max[k], max(3, int(round(lengths[k] / cx))))
            for k in range(1, dim))
        n_cells = int(np.prod(grids))
        mean = n_particles / n_cells
        cap = int(math.ceil(mean + occ_sigma * math.sqrt(mean) + 2))
        subl = -(-cap // 8) * 8
        lanes = -(-(3 * cap) // 128) * 128
        skin_g = min(lengths[k] / grids[k] for k in range(dim)) - cutoff
        cost = _workload_cost(n_cells * subl * lanes, skin_g, workload, dmax)
        cands.append((cost, grids, cap))
    best_cost = min(c[0] for c in cands)
    _, grids, cap = min((c for c in cands if c[0] <= 1.05 * best_cost),
                        key=lambda c: c[1][0])
    skin = min(lengths[k] / grids[k] for k in range(dim)) - cutoff
    return grids, cap, skin
