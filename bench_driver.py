"""End-to-end PRODUCTION throughput: the public run_simulation driver at the
headline config (N=65,536 LJ fluid), including thermo/trajectory output every
100 steps through the async C++ writer, event segmentation, rebuild/overflow
handling — everything a real run pays. Complements bench.py (raw fused-loop
steps/s). Prints ONE JSON line.
"""

import json
import shutil
import tempfile
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def main(n=65536, rho=0.8, temp=1.0, steps=3000, frequency=100,
         f64=False):
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.sim.driver import run_simulation
    from mdtpu.sim.initialization import lattice_fluid_state

    dtype = jnp.float64 if f64 else jnp.float32
    state = lattice_fluid_state(n, rho, temp, dtype=dtype, cutoff=2.5,
                                jitter=0.01)
    cell = state.unitcell
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    engine = CellGridEngine.create(pot, 2.5, 0.6, np.asarray(cell), n,
                                   cell_capacity=36)

    out = tempfile.mkdtemp(prefix="bench_driver_")
    try:
        # Warm the compile caches + melt with a short run.
        state = run_simulation(state, params, NVT(temp, 0.4), 200, 100, out,
                               engine=engine)
        # Longer run at sparse output so the per-call setup (retrace of the
        # freshly-closed-over advance, ~2-3 s) amortizes out of the
        # steady-state number.
        # (frequency, traj_frequency, steps): None = coupled (reference
        # contract); the thermo-dense/traj-sparse case shows the lean
        # scalar-only event pulls (thermo needs 5 scalars; the full-row
        # pull is ~240 ms on the remote tunnel).
        cases = ((frequency, None, steps),) if f64 else (
            (frequency, None, steps),
            (frequency, 1000, steps),
            (1000, None, 10_000))
        for freq, tfreq, n_steps in cases:
            # Warm this cadence's batch-bucket programs (a new bucket size
            # compiles a new scan program, ~60-90 s on the remote compile
            # service the first time; cached persistently after).
            run_simulation(state, params, NVT(temp, 0.4), min(n_steps, 2000),
                           freq, out, engine=engine, traj_frequency=tfreq)
            t0 = time.perf_counter()
            state = run_simulation(state, params, NVT(temp, 0.4), n_steps,
                                   freq, out, engine=engine,
                                   traj_frequency=tfreq)
            elapsed = time.perf_counter() - t0
            rate = n_steps / elapsed
            print(json.dumps({
                "metric": (f"driver steps/sec, N={n} LJ NVT "
                           f"({'f64' if f64 else 'f32'}) through "
                           f"run_simulation (thermo every {freq}, "
                           f"trajectory every {tfreq or freq} steps, "
                           "async writer)"),
                "value": round(rate, 2),
                "unit": "steps/sec",
                "ms_per_step": round(elapsed / n_steps * 1e3, 4),
                "particle_steps_per_sec": round(rate * n, 0),
            }), flush=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    import sys

    # --f64: the coupled-cadence case in f64 — measures the on-device f32
    # cast of output rows (round-4: f64 rows used to ship 2x the bytes
    # their %.6f text output can express).
    if "--f64" in sys.argv:
        jax.config.update("jax_enable_x64", True)
    main(f64="--f64" in sys.argv)
