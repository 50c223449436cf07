"""Energy minimization (FIRE)."""

from __future__ import annotations

import os

from mdtpu.minimize.fire import (fire_minimize, fire_minimize_sharded,
                                 fire_minimize_slots)


def minimize(state, params, pathname, dimension=None, *, engine=None,
             method="FIRE", save_config="minimized.xyz", **kwargs):
    """Minimize and save the final configuration — API parity with the
    reference's ``minimize!`` (/root/reference/src/minimize.jl:166-197).

    Returns ``(state, energy, converged, n_steps)``.
    """
    from mdtpu.io.xyz import write_xyz
    from mdtpu.ops import select_engine

    if method not in ("FIRE", ":FIRE"):
        raise ValueError(f"unknown minimization method: {method}")
    if dimension is not None and int(dimension) != int(state.dimension):
        # The state, not this argument, controls dimensionality (kept for
        # signature parity with /root/reference/src/minimize.jl:166) — a
        # mismatch is a caller bug, not a silent no-op.
        raise ValueError(
            f"dimension={dimension} does not match state.dimension="
            f"{int(state.dimension)}")
    if engine is None:
        # Minimize-tuned geometry: FIRE's dmax-capped displacements rebin
        # every ~skin/(2 dmax) iterations and one rebin costs ~3 lean
        # sweeps, so the tuner trades a fatter sweep for ~2x the skin
        # (CellGridEngine.create_tuned workload='minimize').
        engine = select_engine(params.potential, state.cutoff, state,
                               workload="minimize")

    state, energy, converged, n_steps = fire_minimize(state, params, engine, **kwargs)

    write_xyz(
        os.path.join(pathname, save_config),
        0,
        state.unitcell,
        state.positions,
        state.diameters,
        mode="w",
    )
    return state, energy, converged, n_steps


__all__ = ["minimize", "fire_minimize", "fire_minimize_sharded",
           "fire_minimize_slots"]
