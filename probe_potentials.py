"""All built-in potentials at the 65k bench geometry + a 100k-step driver soak."""
import json, time, sys, tempfile, shutil
sys.path.insert(0, "/root/repo")
import jax
from mdtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from mdtpu.core.types import NVT, Parameters
from mdtpu.ops.cell_grid import CellGridEngine
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from mdtpu.potentials.xplor import LennardJonesXPLOR
from mdtpu.sim.initialization import (build_state_from_arrays,
                                      initialize_velocities, lattice_positions)
from mdtpu.integrate.slot_step import make_slot_advance, slot_forces, slotify

n = 65536
for name, pot, rc, rho, temp in (
        ("LJ", LennardJones(r_cut=2.5), 2.5, 0.8, 1.0),
        ("PseudoHS", PseudoHS(), 1.5, 0.76, 1.4737),
        ("LJ-XPLOR", LennardJonesXPLOR(r_cut=2.5), 2.5, 0.8, 1.0)):
    dtype = jnp.float32
    L = (n / rho) ** (1.0 / 3)
    cell = jnp.eye(3, dtype=dtype) * np.float32(L)
    pos = lattice_positions(n, cell, 3, dtype=dtype, jitter=0.01,
                            key=jax.random.PRNGKey(0))
    state = build_state_from_arrays(pos, jnp.ones(n, dtype), cell,
                                    jax.random.PRNGKey(1), dtype=dtype,
                                    cutoff=rc)
    state = state.replace(velocities=initialize_velocities(
        temp, jax.random.PRNGKey(2), n, 3, dtype=dtype))
    params = Parameters(density=rho, n_particles=n, dt=0.001, potential=pot)
    eng = CellGridEngine.create_tuned(pot, rc, np.asarray(cell), n)
    st = slot_forces(slotify(state, eng), eng)
    adv = jax.jit(make_slot_advance(params, NVT(temp, 0.4), eng))
    st = adv(st, 200)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    st = adv(st, 600)
    jax.block_until_ready(st)
    r = 600 / (time.perf_counter() - t0)
    print(json.dumps({"potential": name, "steps_per_sec": round(r, 1),
                      "grid": eng.grid, "C": eng.cell_capacity,
                      "overflow": bool(st.nbrs.overflow),
                      "T": round(float(st.temperature), 3)}), flush=True)

# 100k-step driver soak (LJ 65k)
from mdtpu.sim.driver import run_simulation
pot = LennardJones(r_cut=2.5)
dtype = jnp.float32
rho, temp = 0.8, 1.0
L = (n / rho) ** (1.0 / 3)
cell = jnp.eye(3, dtype=dtype) * np.float32(L)
pos = lattice_positions(n, cell, 3, dtype=dtype, jitter=0.01,
                        key=jax.random.PRNGKey(0))
state = build_state_from_arrays(pos, jnp.ones(n, dtype), cell,
                                jax.random.PRNGKey(1), dtype=dtype, cutoff=2.5)
state = state.replace(velocities=initialize_velocities(
    temp, jax.random.PRNGKey(2), n, 3, dtype=dtype))
params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
eng = CellGridEngine.create(pot, 2.5, 0.6, np.asarray(cell), n,
                            cell_capacity=36)
out = tempfile.mkdtemp(prefix="soak_")
t0 = time.perf_counter()
state = run_simulation(state, params, NVT(temp, 0.4), 100_000, 5_000, out,
                       engine=eng)
el = time.perf_counter() - t0
import os
rows = open(os.path.join(out, "thermo.txt")).read().splitlines()
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"soak": "100k-step NVT N=65k through run_simulation",
                  "steps_per_sec": round(100000 / el, 1),
                  "thermo_rows": len(rows) - 1,
                  "final_T": round(float(state.temperature), 4),
                  "finite": bool(jnp.all(jnp.isfinite(state.positions)))}),
      flush=True)
