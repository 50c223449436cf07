"""BASELINE config 5: temperature-ramp quench + FIRE minimization
(/root/reference/src/temperature_ramps.jl, /root/reference/src/minimize.jl)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # remote TPU compiles cost ~60 s/program uncached

import jax

from mdtpu import (ExponentialRamp, NVT, Parameters, PseudoHS,
                   initial_temperature_for_velocities, initialize_state,
                   initialize_velocities, minimize, run_simulation)


def main(n_particles=512, ramp_steps=20_000, out="./out_quench"):
    params = Parameters(density=0.9, n_particles=n_particles, dt=0.001,
                        potential=PseudoHS())
    ramp = ExponentialRamp(1.5, 0.01, ramp_steps)

    state = initialize_state(params, out, dimension=3, cutoff=1.5, seed=3)
    t0 = initial_temperature_for_velocities(ramp)
    state = state.replace(velocities=initialize_velocities(
        t0, jax.random.PRNGKey(4), n_particles, 3))

    state = run_simulation(state, params, NVT(ramp, 0.1), ramp_steps, 1000, out)
    state, energy, converged, n_steps = minimize(state, params, out, 3, tol=1e-6)
    print(f"quench done: E/N = {float(energy) / n_particles:.6f}, "
          f"FIRE converged={bool(converged)} in {int(n_steps)} steps")
    return state


if __name__ == "__main__":
    main()
