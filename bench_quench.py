"""End-to-end quench pipeline wall-clock (VERDICT r5 item 7): BASELINE
config 5 — exponential temperature-ramp NVT run + FIRE minimization through
the PUBLIC API (run_simulation + minimize), the workflow whose cost is
dominated by FIRE's rebin cadence and the driver's event loop. Role match:
/root/reference/src/temperature_ramps.jl + /root/reference/src/minimize.jl
(examples/04_quench_fire.py is the small-N form).

Prints one JSON line: ramp seconds, minimize seconds (+iterations), total.
"""

import json
import shutil
import tempfile
import time

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax

import jax.numpy as jnp
import numpy as np


def main(n=65536, rho=0.9, ramp_steps=20_000, frequency=1000):
    from mdtpu import (ExponentialRamp, NVT, Parameters, PseudoHS,
                       initial_temperature_for_velocities,
                       initialize_velocities, minimize, run_simulation)
    from mdtpu.sim.initialization import lattice_fluid_state

    params = Parameters(density=rho, n_particles=n, dt=0.001,
                        potential=PseudoHS())
    ramp = ExponentialRamp(1.5, 0.01, ramp_steps)
    state = lattice_fluid_state(n, rho, 1.5, dtype=jnp.float32, cutoff=1.5,
                                jitter=0.01, seed=3)
    t0v = initial_temperature_for_velocities(ramp)
    state = state.replace(velocities=initialize_velocities(
        t0v, jax.random.PRNGKey(4), n, 3))

    out = tempfile.mkdtemp(prefix="bench_quench_")
    try:
        # Warm the compile caches with short slices of the IDENTICAL
        # programs: the ramp's n_steps is a STATIC pytree field (a
        # different schedule length compiles a different program), and the
        # timed run's event batching uses the bucket-16, bucket-4 and
        # tail bucket-1 scan programs — cover all of them with two short
        # runs of the same ramp object at denser frequencies.
        run_simulation(state, params, NVT(ramp, 0.1), 2000, 125, out)
        run_simulation(state, params, NVT(ramp, 0.1), 2000, 500, out)

        t0 = time.perf_counter()
        st = run_simulation(state, params, NVT(ramp, 0.1), ramp_steps,
                            frequency, out)
        t_ramp = time.perf_counter() - t0

        # First call compiles the minimize-tuned FIRE programs; the timed
        # second call re-runs the identical deterministic minimization.
        minimize(st, params, out, 3, tol=1e-4)
        t0 = time.perf_counter()
        st2, energy, converged, n_steps = minimize(st, params, out, 3,
                                                   tol=1e-4)
        t_min = time.perf_counter() - t0
        e_n = float(energy) / n
        print(json.dumps({
            "metric": f"quench pipeline (BASELINE config 5), N={n} "
                      f"pseudo-HS rho={rho}: {ramp_steps}-step exp ramp "
                      "1.5->0.01 + FIRE to tol=1e-4, public API, f32",
            "ramp_seconds": round(t_ramp, 2),
            "ramp_steps_per_sec": round(ramp_steps / t_ramp, 1),
            "fire_seconds": round(t_min, 2),
            "fire_iterations": int(n_steps),
            "fire_iters_per_sec": round(int(n_steps) / t_min, 1),
            "fire_converged": bool(converged),
            "total_seconds": round(t_ramp + t_min, 2),
            "final_E_per_N": round(e_n, 6),
        }), flush=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    main(n=n)
