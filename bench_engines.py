"""Engine shoot-out on the real TPU at the bench config (N=65k LJ).

Compares the XLA z-window CellGridEngine against the Pallas plane kernel:
correctness (vs each other on the same state) and fused-loop speed.
Prints one JSON line per engine.
"""

import json
import sys
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from bench import build


def main(n=65536, cap=None):
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate.step import make_step
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.ops.experimental.pallas_plane import PallasPlaneEngine
    from mdtpu.potentials.lennard_jones import LennardJones

    rho, temp = 0.8, 1.0
    state, advance = build(n=n)
    state = advance(state, 200)   # melt
    jax.block_until_ready(state)

    pot = LennardJones(r_cut=2.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    cell_np = np.asarray(state.unitcell)
    kwargs = {"cell_capacity": cap} if cap else {"cell_capacity": 29}

    engines = {
        "xla_zwindow": CellGridEngine.create(pot, 2.5, 0.3, cell_np, n, **kwargs),
        "pallas_plane": PallasPlaneEngine.create(pot, 2.5, 0.3, cell_np, n, **kwargs),
    }

    results = {}
    for name, eng in engines.items():
        nbrs = eng.allocate(state.positions, state.diameters, state.unitcell,
                            state.unitcell_inv)
        e, w, f, nbrs2 = jax.jit(eng.compute)(
            state.positions, state.diameters, state.unitcell,
            state.unitcell_inv, nbrs)
        jax.block_until_ready(f)
        results[name] = (float(e), float(w), np.asarray(f))

        s = state.replace(nbrs=nbrs, forces=f, energy=e, virial=w)
        step = make_step(params, NVT(temp, 0.4), eng)
        adv = jax.jit(lambda st, k: jax.lax.fori_loop(
            0, k, lambda i, x: step(x), st))
        s2 = adv(s, 50)
        jax.block_until_ready(s2)
        n_steps = 600
        t0 = time.perf_counter()
        s2 = adv(s2, n_steps)
        jax.block_until_ready(s2)
        dt = time.perf_counter() - t0
        assert bool(jnp.isfinite(s2.temperature)), name + " diverged"
        print(json.dumps({
            "engine": name, "steps_per_sec": round(n_steps / dt, 2),
            "ms_per_step": round(dt / n_steps * 1e3, 4),
            "energy_per_N": round(results[name][0] / n, 6),
        }), flush=True)

    e_x, w_x, f_x = results["xla_zwindow"]
    e_p, w_p, f_p = results["pallas_plane"]
    rel_f = float(np.abs(f_p - f_x).max() / (np.abs(f_x).max() + 1e-12))
    print(json.dumps({
        "check": "pallas_vs_xla", "d_energy_rel": abs(e_p - e_x) / abs(e_x),
        "d_virial_rel": abs(w_p - w_x) / abs(w_x), "d_force_relmax": rel_f,
    }), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else None
    main(n=n, cap=cap)
