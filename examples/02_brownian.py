"""BASELINE config 3: overdamped Brownian dynamics
(/root/reference/src/simulation.jl:181-308 intended behaviour)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # remote TPU compiles cost ~60 s/program uncached

import jax

from mdtpu import Brownian, Parameters, PseudoHS, initialize_state, run_simulation


def main(n_particles=1024, steps=20_000, out="./out_brownian"):
    # dt: the Euler–Maruyama step is only conditionally stable on the steep
    # pseudo-HS core — measured stable at dt <= 2e-5 at this state point,
    # divergent at 5e-5+ (the driver raises on divergence rather than
    # writing garbage). The reference's own Brownian driver is unrunnable
    # as written (state.boxl, SURVEY quirk 1), so no reference dt exists.
    params = Parameters(density=0.5, n_particles=n_particles, dt=1e-5,
                        potential=PseudoHS())
    state = initialize_state(params, out, dimension=3, cutoff=1.5, seed=2)
    state = run_simulation(state, params, Brownian(1.0), steps, 500, out,
                           log_times=True)
    print(f"Brownian done at step {int(state.step)}")
    return state


if __name__ == "__main__":
    main()
