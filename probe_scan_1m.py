"""Why is the 1M plane-scan step 7.6x the 262k step when its padded-lane
work is only 4.0x? Isolates: the bare sweep (no advance machinery), the
rebin, and the full advance at both sizes. One JSON line."""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from bench_fire import _system


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import (_rebin, make_slot_advance,
                                           slot_forces, slotify)
    from mdtpu.ops.cell_grid import CellGridEngine

    res = {}
    for n in (262144, 1048576):
        state, params, pot = _system(n)
        eng = CellGridEngine.create_tuned(pot, 2.5,
                                          np.asarray(state.unitcell), n)
        st = slot_forces(slotify(state, eng), eng)
        subl = -(-eng.cell_capacity // 8) * 8
        lanes = -(-(3 * eng.cell_capacity) // 128) * 128
        work = int(np.prod(eng.grid)) * subl * lanes

        sweep = jax.jit(lambda s: eng.compute_slots(
            s.positions, s.diameters, s.unitcell, s.unitcell_inv, s.nbrs,
            observables=False)[2])
        sweep_obs = jax.jit(lambda s: eng.compute_slots(
            s.positions, s.diameters, s.unitcell, s.unitcell_inv,
            s.nbrs)[2])
        reb = jax.jit(lambda s: _rebin(s, eng))
        adv = jax.jit(make_slot_advance(params, NVT(1.0, 0.4), eng))
        a = adv(st, 50)          # melt a little + compile
        jax.block_until_ready(a.positions)
        t0 = time.perf_counter()
        a = adv(a, 100)
        jax.block_until_ready(a.positions)
        res[n] = {
            "geometry": [list(eng.grid), eng.cell_capacity],
            "padded_lane_work": work,
            "lean_sweep_ms": round(timeit(sweep, st), 3),
            "obs_sweep_ms": round(timeit(sweep_obs, st), 3),
            "rebin_ms": round(timeit(reb, st, reps=5), 3),
            "advance_ms_per_step": round((time.perf_counter() - t0) / 100
                                         * 1e3, 3),
        }
    res["work_ratio"] = round(res[1048576]["padded_lane_work"]
                              / res[262144]["padded_lane_work"], 2)
    res["sweep_ratio"] = round(res[1048576]["lean_sweep_ms"]
                               / res[262144]["lean_sweep_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
