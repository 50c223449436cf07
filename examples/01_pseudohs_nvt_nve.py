"""BASELINE config 1 + 2: the reference README workflow
(/root/reference/README.md:11-66) — N=1024 monodisperse pseudo-hard-sphere
fluid in 3D, NVT equilibration at kT=1.4737 (tau = 100 dt), then NVE
production from the equilibrated state."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # remote TPU compiles cost ~60 s/program uncached

import jax
import jax.numpy as jnp

from mdtpu import (NVE, NVT, Parameters, PseudoHS, initialize_state,
                   initialize_velocities, run_simulation)


def main(n_particles=1024, nvt_steps=10_000, nve_steps=10_000, out="./out_phs"):
    ktemp = 1.4737
    params = Parameters(density=0.76, n_particles=n_particles, dt=0.001,
                        potential=PseudoHS())

    state = initialize_state(params, out, dimension=3, cutoff=1.5, seed=0)
    state = state.replace(velocities=initialize_velocities(
        ktemp, jax.random.PRNGKey(1), n_particles, 3))

    ensemble = NVT(ktemp, 100 * 0.001)
    state = run_simulation(state, params, ensemble, nvt_steps, 100, out)
    print(f"NVT done: T = {float(state.temperature):.4f}")

    state = run_simulation(state, params, NVE(), nve_steps, 100,
                           out + "_nve", compress=True)
    print(f"NVE done: E/N = {float(state.energy) / n_particles:.6f}")
    return state


if __name__ == "__main__":
    main()
