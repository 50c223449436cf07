"""BASELINE config 4: 2D non-additive polydisperse mixture with a custom
``evaluate`` overload, N=1200, initialized from an XYZ snapshot
(/root/reference/README.md:147-178 pattern)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# This example packs a RANDOM overlapping 2D start for a steep (r^-50-like)
# potential: f64 is required or the first energies overflow (the repo's
# gotcha list). Must be set before first jax use.
jax.config.update("jax_enable_x64", True)

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # remote TPU compiles cost ~60 s/program uncached

import jax.numpy as jnp
import numpy as np
from flax import struct

from mdtpu import (NVT, Parameters, Potential, initialize_state,
                   initialize_velocities, minimize, run_simulation)
from mdtpu.io.xyz import write_xyz


@struct.dataclass
class NonAdditivePHS(Potential):
    """Pseudo-HS-style repulsion with non-additive cross diameters
    sigma_ij = 0.5 (s_i + s_j)(1 - 0.2 |s_i - s_j|)."""

    lam: int = struct.field(pytree_node=False, default=12)

    def evaluate(self, r, sigma_i, sigma_j):
        from mdtpu.utils.math import ipow

        sigma = 0.5 * (sigma_i + sigma_j) * (1.0 - 0.2 * jnp.abs(sigma_i - sigma_j))
        cutoff = 1.25 * sigma
        inside = r < cutoff
        r_safe = jnp.where(inside, r, jnp.ones_like(r))
        sr = sigma / r_safe
        u_raw = ipow(sr, self.lam)
        f_raw = self.lam * u_raw / r_safe
        # Energy- AND force-shift so both reach zero smoothly at the
        # cutoff: u -> u - u(rc) - (r - rc) u'(rc). A bare truncation
        # injects an energy jump at every cutoff crossing (visible NVE
        # drift and a discontinuous landscape for FIRE).
        u_c = ipow(jnp.asarray(1 / 1.25, r.dtype), self.lam)
        f_c = self.lam * u_c / cutoff
        u = u_raw - u_c + (r_safe - cutoff) * f_c
        f = f_raw - f_c
        zero = jnp.zeros_like(u)
        return jnp.where(inside, u, zero), jnp.where(inside, f, zero)


def main(n_particles=1200, steps=5_000, out="./out_poly2d"):
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    # Write a polydisperse snapshot, then init from file (config 4 workflow).
    density = 0.9
    L = (n_particles / density) ** 0.5
    diam = rng.uniform(0.8, 1.2, n_particles)
    pos = rng.uniform(0, L, (n_particles, 2))
    snap = os.path.join(out, "start.xyz")
    write_xyz(snap, 0, np.eye(2) * L, pos, diam, mode="w")

    params = Parameters(density=density, n_particles=n_particles, dt=1e-4,
                        potential=NonAdditivePHS())
    state = initialize_state(params, out, from_file=snap, dimension=2,
                             cutoff=1.8, dtype=jnp.float64)
    state, e, conv, _ = minimize(state, params, out, 2, tol=1e-4)
    state = state.replace(velocities=initialize_velocities(
        0.5, jax.random.PRNGKey(1), n_particles, 2, jnp.float64))
    state = run_simulation(state, params, NVT(0.5, 0.01), steps, 200, out)
    print(f"2D polydisperse done: T = {float(state.temperature):.4f}")
    return state


if __name__ == "__main__":
    main()
