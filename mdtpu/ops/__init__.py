"""Pair-interaction engines (the performance heart; replaces CellListMap).

Engines implement the protocol documented in mdtpu.ops.naive:
  allocate / compute / needs_rebuild with fixed shapes throughout.

Three engines, one protocol:
  * NaivePairEngine   — O(N^2) all-pairs oracle; small N and triclinic cells.
  * NeighborListEngine — (N, K) padded Verlet lists; fast on CPU where random
    gathers are cheap.
  * CellGridEngine    — roll-stencil sorted-cell engine; gather-free hot path,
    the production engine on TPU.
"""

from __future__ import annotations

import jax
import numpy as np

from mdtpu.ops.naive import NaivePairEngine

# The O(N^2) engine wins below this size.
_NAIVE_MAX_N = 2048


def select_engine(potential, cutoff, state=None, *, unitcell=None,
                  n_particles=None, skin=0.3, prefer=None,
                  workload="dynamics"):
    """Pick the best engine for the system.

    prefer: None (auto) | "naive" | "neighbor" | "cellgrid".
    Auto: naive for small N; on TPU the gather-free CellGridEngine (which
    handles triclinic cells via fractional binning + ghost cell-vector
    shifts); on CPU the (N, K) NeighborListEngine for orthorhombic boxes and
    the cell grid for tilted ones.

    workload: "dynamics" (default) or "minimize" — forwarded to
    ``CellGridEngine.create_tuned``; minimize-tuned geometry amortizes
    FIRE's displacement-capped rebin cadence into the padded-lane score
    (fatter cells, ~2x skin). The public :func:`mdtpu.minimize.minimize`
    passes "minimize" when it auto-selects.
    """
    from mdtpu.core.box import is_orthorhombic
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.ops.neighbor_list import NeighborListEngine, _grid_for_box

    from mdtpu.potentials.base import check_engine_cutoff

    max_sigma = 1.0
    diameters = None
    if state is not None:
        unitcell = state.unitcell
        n_particles = state.n_particles
        diameters = np.asarray(state.diameters)
        max_sigma = float(np.max(diameters))
    check_engine_cutoff(potential, cutoff, max_sigma)

    if prefer == "naive":
        return NaivePairEngine(potential=potential, cutoff=cutoff)

    ortho = unitcell is not None and is_orthorhombic(unitcell)
    # The window sweeps handle triclinic cells in 2D and 3D (ghost shifts
    # are full cell vectors).
    grid_ok = (unitcell is not None
               and _grid_for_box(np.asarray(unitcell), float(cutoff),
                                 float(skin)) is not None)
    if (prefer is None and (n_particles is None
                            or n_particles <= _NAIVE_MAX_N)) or not grid_ok:
        _warn_if_half_box_exceeded(unitcell, cutoff)
        return NaivePairEngine(potential=potential, cutoff=cutoff)

    if prefer == "neighbor":
        return NeighborListEngine.create(
            potential=potential, cutoff=float(cutoff), skin=float(skin),
            unitcell=np.asarray(unitcell), n_particles=int(n_particles),
            max_sigma=max_sigma)
    if prefer == "cellgrid":
        return CellGridEngine.create_tuned(
            potential, float(cutoff), np.asarray(unitcell), int(n_particles),
            min_skin=float(skin), max_sigma=max_sigma, diameters=diameters,
            workload=workload)

    if jax.default_backend() == "cpu" and ortho:
        return NeighborListEngine.create(
            potential=potential, cutoff=float(cutoff), skin=float(skin),
            unitcell=np.asarray(unitcell), n_particles=int(n_particles),
            max_sigma=max_sigma)
    # Padded-lane-optimal geometry (fat cells, C ~ 30-40): measured up to
    # 2.5x faster than cutoff-sized cells and ~4x fewer rebuilds.
    return CellGridEngine.create_tuned(
        potential, float(cutoff), np.asarray(unitcell), int(n_particles),
        min_skin=float(skin), max_sigma=max_sigma, diameters=diameters,
        workload=workload)


def _warn_if_half_box_exceeded(unitcell, cutoff):
    """Minimum-image engines only see the NEAREST periodic image: with a
    box narrower than 2*cutoff a pair can also interact through a second
    image, which is silently missed (the reference's CellListMap replicates
    images instead). Warn rather than raise — tiny test boxes use the
    minimum-image convention deliberately."""
    if unitcell is None:
        return
    u = np.asarray(unitcell, np.float64)
    inv = np.linalg.inv(u)
    # Perpendicular width along lattice direction k = 1/||row k of cell^-1||
    # (frac_k = sum_j inv[k, j] x_j).
    widths = 1.0 / np.linalg.norm(inv, axis=1)
    if float(widths.min()) < 2.0 * float(cutoff):
        import warnings

        warnings.warn(
            f"box width {widths.min():.3g} < 2*cutoff = {2 * float(cutoff):.3g}: "
            "the minimum-image pair sweep misses second-image interactions "
            "for this system (use a larger box for true periodic physics)")


__all__ = ["NaivePairEngine", "select_engine"]
