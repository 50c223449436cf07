"""Multi-chip (sharded) simulation through run_simulation_sharded — the
slot-layout halo engine: spatial domain decomposition over a device mesh
with on-device particle migration (see mdtpu/parallel/halo_slot.py).

On a machine without multiple accelerators, fake an 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/05_sharded_multichip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # remote TPU compiles cost ~60 s/program uncached

import jax

# Demo default: an 8-virtual-device CPU mesh (works everywhere). On a real
# multi-accelerator host run with MDTPU_REAL_MESH=1 to use the hardware
# mesh. (Backend configs must be set before any JAX operation.)
if not os.environ.get("MDTPU_REAL_MESH"):
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        # A backend is already live (e.g. the test conftest, which itself
        # forces an 8-virtual-device CPU platform) — keep whatever mesh the
        # host process set up.
        pass

import jax.numpy as jnp

from mdtpu import (NVT, Parameters, PseudoHS, initialize_state,
                   initialize_velocities)
from mdtpu.parallel.driver import run_simulation_sharded


def main(n_particles=4096, steps=2_000, out="./out_sharded"):
    ktemp = 1.4737
    params = Parameters(density=0.4, n_particles=n_particles, dt=0.001,
                        potential=PseudoHS())
    state = initialize_state(params, out, dimension=3, cutoff=1.5,
                             dtype=jnp.float32, seed=0)
    state = state.replace(velocities=initialize_velocities(
        ktemp, jax.random.PRNGKey(1), n_particles, 3, dtype=jnp.float32))

    # Default engine = HaloSlotEngine over all devices; outputs (thermo,
    # trajectory, final.xyz) are identical in format and particle order to
    # the single-device driver.
    final = run_simulation_sharded(state, params, NVT(ktemp, 100 * params.dt),
                                   total_steps=steps, frequency=500,
                                   pathname=out)
    print(f"done: {final.n_particles} particles over "
          f"{len(jax.devices())} devices, T = {float(final.temperature):.4f}")


if __name__ == "__main__":
    main()
