"""Scaling sweep: steps/sec vs N (BASELINE.json metric: N = 1k - 262k,
pseudo-HS fluid). Prints one JSON line per size. Run on the TPU chip."""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def run_size(n, rho=0.76, temp=1.4737, dt=0.001, steps=400):
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate.step import make_step
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.ops.naive import NaivePairEngine
    from mdtpu.potentials.pseudo_hs import PseudoHS
    from mdtpu.sim.initialization import lattice_fluid_state

    dtype = jnp.float32
    state = lattice_fluid_state(n, rho, temp, dtype=dtype, cutoff=1.5,
                                jitter=0.01)
    cell = state.unitcell
    pot = PseudoHS()
    params = Parameters(density=rho, n_particles=n, dt=dt, potential=pot)
    try:
        # Padded-lane-optimal geometry: fat cells (C ~ 30-40, 3C lanes ~
        # full 128-lane vregs) instead of cutoff-sized cells — up to 1.8x
        # less padded compute at 262k and ~5x fewer rebuilds.
        engine = CellGridEngine.create_tuned(pot, 1.5, np.asarray(cell), n,
                                             diameters=np.ones(n, np.float32))
        kind = (f"slot-cellgrid grid={engine.grid} C={engine.cell_capacity}"
                f" skin={engine.skin:.2f} scan={int(engine.plane_scan)}")
        slot = True
    except ValueError:
        engine = NaivePairEngine(potential=pot, cutoff=1.5)
        kind = "naive"
        slot = False

    if slot:
        from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                               slotify)

        state = slot_forces(slotify(state, engine), engine)
        advance = jax.jit(make_slot_advance(params, NVT(temp, 100 * dt),
                                            engine))
    else:
        nbrs = engine.allocate(state.positions, state.diameters,
                               state.unitcell, state.unitcell_inv)
        e, w, f, nbrs = engine.compute(state.positions, state.diameters,
                                       state.unitcell, state.unitcell_inv,
                                       nbrs)
        state = state.replace(nbrs=nbrs, forces=f, energy=e, virial=w)
        step = make_step(params, NVT(temp, 100 * dt), engine)
        advance = jax.jit(
            lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: step(x), s))
    state = advance(state, 100)  # warm + melt
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = advance(state, steps)
    jax.block_until_ready(state)
    rate = steps / (time.perf_counter() - t0)
    util = (engine.padded_lane_stats(ms_per_step=1e3 / rate)
            if slot else {})
    ok = bool(jnp.isfinite(state.temperature))
    # A capacity overflow silently drops particles (less pair work) and
    # would inflate the published rate — surface it in the JSON and fail.
    over = bool(getattr(state.nbrs, "overflow",
                        jnp.zeros((), bool)).max()) if state.nbrs is not None \
        else False
    print(json.dumps({
        "N": n, "steps_per_sec": round(rate, 1),
        "particle_steps_per_sec": round(rate * n, 0),
        "engine": kind, "finite": ok, "overflow": over,
        "T": round(float(state.temperature), 3),
        **util,
    }), flush=True)
    assert not over, "cell capacity overflow: rate measured on a truncated system"



if __name__ == "__main__":
    import sys

    sizes = (1024, 4096, 16384, 65536, 262144)
    if "--big" in sys.argv:
        sizes = sizes + (1048576,)
    if "--huge" in sys.argv:
        # Single-chip capacity plateau (BENCH_NOTES): 2M/4M/8M via the
        # x-plane-scan sweep; ~10M is the n_slots < 2^24 address cap.
        sizes = sizes + (2097152, 4194304, 8388608)
    for n in sizes:
        run_size(n, steps=200 if n > 1048576 else 400)
