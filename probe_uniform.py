"""A/B probe: uniform-sigma fast path vs array-diameter sweep at the 65k
headline geometry (same engine, flag toggled). Run on the real TPU;
prints one JSON line per arm. Protocol: fused-loop timing, best of 3."""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def time_arm(uniform, n=65536):
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                           slotify)
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.sim.initialization import lattice_fluid_state

    rho, temp = 0.8, 1.0
    state = lattice_fluid_state(n, rho, temp, dtype=jnp.float32, cutoff=2.5,
                                jitter=0.01)
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    engine = CellGridEngine.create_tuned(
        pot, 2.5, np.asarray(state.unitcell), n,
        diameters=np.ones(n, np.float32) if uniform else None)
    state = slot_forces(slotify(state, engine), engine)
    advance = jax.jit(make_slot_advance(params, NVT(temp, 0.4), engine))
    state = advance(state, 400)
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = advance(state, 600)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)
    assert not bool(state.nbrs.overflow)
    rate = 600 / best
    print(json.dumps({
        "arm": "uniform_sigma" if uniform else "array_diameters",
        "steps_per_sec": round(rate, 1),
        "ms_per_step": round(best / 600 * 1e3, 4),
    }), flush=True)
    return rate


if __name__ == "__main__":
    a = time_arm(False)
    b = time_arm(True)
    print(json.dumps({"uniform_speedup": round(b / a, 4)}))
