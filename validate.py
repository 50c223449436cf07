"""Physics validation on the chip: runs an LJ fluid near the triple point
(rho=0.84, kT=0.75 — the classic state point) through the full public-API
driver, then checks the RDF structure and thermo consistency. The analog of
the reference's wiki validation against LAMMPS/NIST
(/root/reference/README.md:189). Prints one JSON line.
"""

import json
import os

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def main(n=4096, rho=0.84, temp=0.75, steps=30_000, out="/tmp/validate_run"):
    from mdtpu import (NVT, Parameters, LennardJones, initialize_velocities,
                       run_simulation)
    from mdtpu.observables import read_thermo, rdf_histogram, rdf_normalize
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.sim.initialization import lattice_fluid_state

    dtype = jnp.float32
    state = lattice_fluid_state(n, rho, temp, dtype=dtype, cutoff=2.5,
                                jitter=0.01)
    cell = state.unitcell

    pot = LennardJones(r_cut=2.5, tail_correction=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    engine = CellGridEngine.create(pot, 2.5, 0.3, np.asarray(cell), n,
                                   diameters=np.ones(n, np.float32))

    state = run_simulation(state, params, NVT(temp, 0.2), steps, 1_000, out,
                           engine=engine, perf_log=True)

    # RDF from final configuration + a few decorrelated snapshots.
    counts = np.zeros(200, np.int64)
    frames = 0
    from mdtpu.integrate.step import make_step
    # The driver may have returned nbrs from a GROWN-capacity engine
    # (overflow recovery) whose shapes don't match this engine's grid —
    # re-allocate with the engine the sampling step is built around.
    state = state.replace(nbrs=engine.allocate(
        state.positions, state.diameters, state.unitcell,
        state.unitcell_inv))
    step = make_step(params, NVT(temp, 0.2), engine)
    adv = jax.jit(lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: step(x), s))
    for _ in range(10):
        state = adv(state, 200)
        counts += np.asarray(rdf_histogram(state.positions, state.unitcell,
                                           state.unitcell_inv, 3.0, 200))
        frames += 1
    volume = float(abs(np.linalg.det(np.asarray(cell, np.float64))))
    centers, g = rdf_normalize(counts, n, volume, 3.0,
                               n_frames=frames, dim=3)

    peak_idx = int(np.argmax(g))
    peak_r = float(centers[peak_idx])
    peak_g = float(g[peak_idx])

    thermo = read_thermo(os.path.join(out, "thermo.txt"))
    half = len(thermo["temperature"]) // 2
    mean_t = float(thermo["temperature"][half:].mean())
    mean_p = float(thermo["pressure"][half:].mean())
    mean_e = float(thermo["energy"][half:].mean())

    checks = {
        # dense LJ liquid: first RDF peak at ~1.05-1.15 sigma, height ~2.5-3.5
        "rdf_peak_r_in_range": bool(1.0 < peak_r < 1.2),
        "rdf_peak_height_in_range": bool(2.2 < peak_g < 4.0),
        "temperature_on_target": bool(abs(mean_t - temp) < 0.03),
        # LJ at rho=0.84, T=0.75 (with tail corr): U/N ~ -6.1, P ~ 0 (+-1)
        "energy_per_particle_plausible": bool(-6.8 < mean_e < -5.4),
        "pressure_plausible": bool(-1.5 < mean_p < 1.5),
    }
    print(json.dumps({
        "config": f"LJ N={n} rho={rho} kT={temp} rc=2.5 (tail-corrected)",
        "rdf_peak_r": round(peak_r, 3), "rdf_peak_g": round(peak_g, 2),
        "mean_T": round(mean_t, 4), "mean_P": round(mean_p, 3),
        "mean_E_per_N": round(mean_e, 3),
        "checks": checks, "pass": all(checks.values()),
    }))


if __name__ == "__main__":
    main()
