"""FIRE minimization throughput on the real TPU: slot-space loop (round 4)
vs the round-3 particle-order loop, at the 262k size the quench workflow
cares about (/root/reference/src/minimize.jl:31-135 is the role analog;
BASELINE config 5 is the quench example).

Both variants run a FIXED number of FIRE iterations (tol=0 equivalent) so
the measurement is iterations/sec of the same minimization math, not a
convergence race. Prints one JSON line.
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def _system(n, rho=0.8, dtype=jnp.float32):
    from mdtpu.core.types import Parameters
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.sim.initialization import lattice_fluid_state

    state = lattice_fluid_state(n, rho, 1.0, dtype=dtype, cutoff=2.5,
                                jitter=0.05)
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    return state, params, pot


def bench_particle_order_fire(n, iters=200, reps=3):
    from mdtpu.minimize.fire import _fire_once
    from mdtpu.ops.cell_grid import CellGridEngine

    state, params, pot = _system(n)
    eng = CellGridEngine.create_tuned(pot, 2.5, np.asarray(state.unitcell),
                                      n)
    kw = dict(max_steps=iters, tol=0.0, dt_initial=0.01, dt_max=0.1,
              alpha0=0.1, f_inc=1.2, f_dec=0.2, n_min=5, dmax=0.1)
    run = jax.jit(lambda s: _fire_once(s, params, eng, **kw)[0].positions)
    jax.block_until_ready(run(state))          # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        best = min(best, time.perf_counter() - t0)
    return iters / best


def bench_slot_fire(n, iters=200, reps=3, workload="dynamics"):
    from mdtpu.integrate.slot_step import slot_forces, slotify
    from mdtpu.minimize.fire import make_slot_fire
    from mdtpu.ops.cell_grid import CellGridEngine

    state, params, pot = _system(n)
    eng = CellGridEngine.create_tuned(pot, 2.5, np.asarray(state.unitcell),
                                      n, workload=workload)
    st = slot_forces(slotify(state, eng), eng)
    run = jax.jit(make_slot_fire(eng, max_steps=iters, tol=0.0))
    out = run(st)
    jax.block_until_ready(out[0].positions)    # compile + warm
    assert not bool(np.asarray(out[4]).any()), "capacity overflow in bench"
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(st)[0].positions)
        best = min(best, time.perf_counter() - t0)
    geom = (f"grid={eng.grid} C={eng.cell_capacity} skin={eng.skin:.2f}"
            f" scan={int(eng.plane_scan)}")
    return iters / best, geom


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    iters = 100 if n > 500_000 else 200
    slot, geom_dyn = bench_slot_fire(n, iters=iters)
    slot_min, geom_min = bench_slot_fire(n, iters=iters, workload="minimize")
    out = {
        "metric": f"FIRE iterations/sec, N={n} LJ rho=0.8 rc=2.5 f32",
        "slot_fire": round(slot, 1),
        "slot_fire_geometry": geom_dyn,
        "slot_fire_minimize_tuned": round(slot_min, 1),
        "minimize_tuned_geometry": geom_min,
        "minimize_tuning_speedup": round(slot_min / slot, 2),
    }
    if "--no-particle" not in sys.argv and n <= 500_000:
        particle = bench_particle_order_fire(n, iters=iters)
        out["particle_order_fire"] = round(particle, 1)
        out["speedup"] = round(max(slot, slot_min) / particle, 2)
    print(json.dumps(out))
