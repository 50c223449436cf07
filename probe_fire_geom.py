"""FIRE cell-geometry sweep at 262k (VERDICT r5 item 3): measure slot-FIRE
iters/s across FORCED geometries, including candidates the padded-lane cost
model rejects (the 3C > 128 lane cliff pins the tuner to the dynamics
geometry at this size — this probe checks whether the model's sweep-cost
weighting holds for the rebin-bound FIRE workload, or whether fatter cells
with ~2x skin win despite doubled window lanes).

Each candidate runs a FIXED 200 iterations of make_slot_fire (tol=0) —
the same measurement as bench_fire.py — plus a one-shot rebin timing so
the (sweep, rebin, cadence) attribution is visible per geometry.
"""

import json
import time

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def main(n=262144, rho=0.8, iters=200):
    from mdtpu.core.types import Parameters
    from mdtpu.integrate.slot_step import _rebin, slot_forces, slotify
    from mdtpu.minimize.fire import make_slot_fire
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.sim.initialization import lattice_fluid_state

    state = lattice_fluid_state(n, rho, 1.0, dtype=jnp.float32, cutoff=2.5,
                                jitter=0.05)
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    L = float(np.asarray(state.unitcell)[0, 0])
    base = CellGridEngine.create_tuned(pot, 2.5, np.asarray(state.unitcell),
                                       n)

    # (grid, capacity): tuned first; then the lane-cliff boundary (C=42
    # just fits 3C <= 128 with thinner occupancy margin — FIRE's
    # overflow-retry makes a riskier capacity acceptable); then fat cells
    # at 256 window lanes with up to ~2.3x the tuned skin.
    mean_occ = lambda g: n / g ** 3
    cands = [("tuned_dyn", base.grid[0], base.cell_capacity)]
    for g in (21, 20, 18, 16):
        occ = mean_occ(g)
        cap = int(np.ceil(occ + 2.5 * np.sqrt(occ) + 2))
        cands.append((f"g{g}_c{cap}", g, cap))
    cands.append(("g21_lane_edge", 21, 42))  # 3C = 126 <= 128, ~2.0 sigma

    for name, g, cap in cands:
        skin = L / g - 2.5
        if skin <= 0:
            continue
        eng = base.replace(grid=(g, g, g), cell_capacity=cap, skin=skin,
                           plane_scan=True)
        try:
            st = slot_forces(slotify(state, eng), eng)
        except Exception as e:  # initial overflow at risky capacity
            print(json.dumps({"cand": name, "error": str(e)[:120]}),
                  flush=True)
            continue
        run = jax.jit(make_slot_fire(eng, max_steps=iters, tol=0.0))
        out = run(st)
        jax.block_until_ready(out[0].positions)
        if bool(np.asarray(out[4]).any()):
            print(json.dumps({"cand": name, "overflow": True}), flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(st)[0].positions)
            best = min(best, time.perf_counter() - t0)
        reb = jax.jit(lambda s, e=eng: _rebin(s, e))
        jax.block_until_ready(reb(st))
        t0 = time.perf_counter()
        jax.block_until_ready(reb(st))
        t_reb = time.perf_counter() - t0
        print(json.dumps({
            "cand": name, "grid": g, "cap": cap, "skin": round(skin, 3),
            "fire_iters_per_sec": round(iters / best, 1),
            "rebin_ms": round(t_reb * 1e3, 2),
            "est_iters_per_rebin": round(skin / 0.2, 1),
        }), flush=True)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 262144)
