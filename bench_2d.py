"""2D throughput on the real TPU: the y-window slot fast path (round 3)
vs the naive all-pairs engine at a 2D fluid config (the BASELINE 2D
polydisperse family, scaled up). Prints one JSON line."""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def build(n=65536, rho=0.7, temp=1.0, dtype=jnp.float32, poly=0.2):
    from mdtpu.core.types import Parameters
    from mdtpu.potentials.pseudo_hs import PseudoHS
    from mdtpu.sim.initialization import (
        build_state_from_arrays, initialize_velocities, lattice_positions)

    d = 2
    L = (n / rho) ** 0.5
    cell = jnp.eye(d, dtype=dtype) * np.float32(L)
    pos = lattice_positions(n, cell, d, dtype=dtype, jitter=0.01,
                            key=jax.random.PRNGKey(0))
    # Polydisperse diameters (uniform 1 +- poly/2): exercises the
    # sigma-scaled pseudo-HS mixing in the 2D sweep.
    diam = 1.0 + poly * (jax.random.uniform(jax.random.PRNGKey(3), (n,),
                                            dtype=dtype) - 0.5)
    cutoff = float(1.021 * (1.0 + poly / 2) + 0.2)
    state = build_state_from_arrays(pos, diam, cell, jax.random.PRNGKey(1),
                                    dtype=dtype, cutoff=cutoff)
    state = state.replace(velocities=initialize_velocities(
        temp, jax.random.PRNGKey(2), n, d, dtype=dtype))
    pot = PseudoHS()
    params = Parameters(density=rho, n_particles=n, dt=0.001, potential=pot)
    return state, params, pot, cutoff


def main(n=65536):
    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                           slotify)
    from mdtpu.ops.cell_grid import CellGridEngine

    state, params, pot, cutoff = build(n=n)
    eng = CellGridEngine.create_tuned(
        pot, cutoff, np.asarray(state.unitcell), n,
        max_sigma=float(np.max(np.asarray(state.diameters))))
    assert len(eng.grid) == 2
    st = slot_forces(slotify(state, eng), eng)
    advance = jax.jit(make_slot_advance(params, NVT(1.0, 0.1), eng))

    st = advance(st, 200)
    jax.block_until_ready(st.positions)
    n_steps = 600
    t0 = time.perf_counter()
    st = advance(st, n_steps)
    jax.block_until_ready(st.positions)
    elapsed = time.perf_counter() - t0
    assert bool(jnp.isfinite(st.temperature))
    assert not bool(st.nbrs.overflow)
    rate = n_steps / elapsed
    print(json.dumps({
        "metric": f"2D steps/sec, N={n} polydisperse pseudo-HS NVT "
                  f"(rho=0.7, f32, y-window slot engine)",
        "value": round(rate, 2),
        "unit": "steps/sec",
        "ms_per_step": round(elapsed / n_steps * 1e3, 4),
        "particle_steps_per_sec": round(rate * n, 0),
        "grid": list(eng.grid),
        "cell_capacity": eng.cell_capacity,
    }))


if __name__ == "__main__":
    import sys

    main(n=int(sys.argv[1]) if len(sys.argv) > 1 else 65536)
