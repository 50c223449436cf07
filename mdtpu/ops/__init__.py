"""Pair-interaction engines (the performance heart; replaces CellListMap).

Engines implement the protocol documented in mdtpu.ops.naive:
  allocate / compute / needs_rebuild with fixed shapes throughout.
"""

from __future__ import annotations

import numpy as np

from mdtpu.ops.naive import NaivePairEngine

# The O(N^2) engine wins below this size; the cell-binned neighbor-list
# engine wins above it (measured on TPU v5e, see BENCH notes).
_NAIVE_MAX_N = 2048


def select_engine(potential, cutoff, state=None, *, unitcell=None,
                  n_particles=None, skin=0.3, prefer=None):
    """Pick the best engine for the system.

    prefer: None (auto) | "naive" | "neighbor".
    Triclinic (non-orthorhombic) cells currently use the naive engine.
    """
    from mdtpu.core.box import is_orthorhombic
    from mdtpu.ops.neighbor_list import NeighborListEngine, estimate_capacities

    if state is not None:
        unitcell = state.unitcell
        n_particles = state.n_particles

    if prefer == "naive":
        return NaivePairEngine(potential=potential, cutoff=cutoff)

    ortho = unitcell is not None and is_orthorhombic(unitcell)
    if prefer != "neighbor" and (n_particles is None or n_particles <= _NAIVE_MAX_N):
        return NaivePairEngine(potential=potential, cutoff=cutoff)
    if not ortho:
        return NaivePairEngine(potential=potential, cutoff=cutoff)

    return NeighborListEngine.create(
        potential=potential, cutoff=float(cutoff), skin=float(skin),
        unitcell=np.asarray(unitcell), n_particles=int(n_particles),
    )


__all__ = ["NaivePairEngine", "select_engine"]
