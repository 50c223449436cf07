"""Diagnose the large-N throughput sag (BENCH_NOTES scaling table:
54.9e6 particle-steps/s at 65k -> 31.8e6 at 1M).

Per N: lean-step time (raw fused loop, no rebins), rebin time, rebuild
interval, and the padded-lane throughput (padded lane-slots swept per
second) — if the padded rate is flat across N the sweep is compute-bound
and the sag is rebins/geometry; if it falls, the sweep has gone
HBM-bandwidth-bound. Prints one JSON line per N. Run on the real TPU.
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def profile(n, rho=0.76, temp=1.4737):
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate.slot_step import (_rebin, make_slot_advance,
                                           make_slot_step, slot_forces,
                                           slotify)
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.pseudo_hs import PseudoHS
    from mdtpu.sim.initialization import (
        build_state_from_arrays, initialize_velocities, lattice_positions)

    dtype = jnp.float32
    d = 3
    L = (n / rho) ** (1.0 / d)
    cell = jnp.eye(d, dtype=dtype) * np.float32(L)
    pos = lattice_positions(n, cell, d, dtype=dtype, jitter=0.01,
                            key=jax.random.PRNGKey(0))
    state = build_state_from_arrays(pos, jnp.ones(n, dtype), cell,
                                    jax.random.PRNGKey(1), dtype=dtype,
                                    cutoff=1.5)
    state = state.replace(velocities=initialize_velocities(
        temp, jax.random.PRNGKey(2), n, d, dtype=dtype))
    pot = PseudoHS()
    params = Parameters(density=rho, n_particles=n, dt=0.001, potential=pot)
    eng = CellGridEngine.create_tuned(pot, 1.5, np.asarray(cell), n)

    st = slot_forces(slotify(state, eng), eng)
    adv = jax.jit(make_slot_advance(params, NVT(temp, 0.1), eng))
    # melt
    st = adv(st, 300)
    jax.block_until_ready(st.positions)

    # (a) raw lean steps, no rebins
    step = make_slot_step(params, NVT(temp, 0.1), eng, rebin_check=False,
                          observables=False)
    k = 100
    raw = jax.jit(lambda s: jax.lax.fori_loop(0, k, lambda i, x: step(x), s))
    out = raw(st)
    jax.block_until_ready(out.positions)
    best_raw = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = raw(st)
        jax.block_until_ready(out.positions)
        best_raw = min(best_raw, (time.perf_counter() - t0) / k)

    # (b) rebin
    reb = jax.jit(lambda s: _rebin(s, eng))
    r = reb(st)
    jax.block_until_ready(r.positions)
    best_reb = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = reb(st)
        jax.block_until_ready(r.positions)
        best_reb = min(best_reb, time.perf_counter() - t0)

    # (c) rebuild interval over a 400-step melted window
    from mdtpu.integrate.slot_step import slot_needs_rebin

    count_adv = adv  # rebins are internal; estimate interval from drift rate
    # measure steps to first rebin need after a fresh rebin
    s2 = reb(st)
    need = jax.jit(lambda s: slot_needs_rebin(s, eng))
    one = jax.jit(lambda s: step(s))
    steps_to_rebin = 0
    while steps_to_rebin < 200 and not bool(need(s2)):
        s2 = one(s2)
        steps_to_rebin += 1

    subl = -(-eng.cell_capacity // 8) * 8
    lanes = -(-(3 * eng.cell_capacity) // 128) * 128
    n_cells = int(np.prod(eng.grid))
    padded = n_cells * subl * lanes * 5  # 5 half-stencil blocks
    amortized = best_raw + best_reb / max(steps_to_rebin, 1)
    print(json.dumps({
        "n": n, "grid": list(eng.grid), "cap": eng.cell_capacity,
        "plane_scan": eng.plane_scan,
        "lean_step_ms": round(best_raw * 1e3, 4),
        "rebin_ms": round(best_reb * 1e3, 3),
        "steps_between_rebins": steps_to_rebin,
        "amortized_ms_per_step": round(amortized * 1e3, 4),
        "particle_steps_per_sec": round(n / amortized, 0),
        "padded_lane_slots_per_sec": round(padded / best_raw, 0),
        "padded_slots_per_particle": round(padded / n, 1),
    }), flush=True)


if __name__ == "__main__":
    import sys

    sizes = [65536, 262144, 1048576]
    if len(sys.argv) > 1:
        sizes = [int(x) for x in sys.argv[1:]]
    for n in sizes:
        profile(n)
