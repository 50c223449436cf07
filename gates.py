"""Fidelity gates (BASELINE.json): NVE energy drift and thermo sanity.

Runs the reference README configuration (N=1024 pseudo-hard-sphere fluid,
rho=0.76, kT=1.4737 — /root/reference/README.md:15-46): NVT equilibration,
then a long NVE production run sampling total energy; reports the linear-fit
drift per 1e6 steps (gate: < 1e-4 per particle) plus mean temperature /
pressure. Prints one JSON line.
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def main(n=1024, rho=0.76, temp=1.4737, dt=0.001, nve_steps=1_000_000,
         sample_every=2_000, dtype=None, force_dtype=None,
         engine_kind="cell", hilo=False):
    from mdtpu.core.types import NVE, NVT, Parameters
    from mdtpu.integrate.step import make_step, engine_forces
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.ops.naive import NaivePairEngine
    from mdtpu.potentials.pseudo_hs import PseudoHS
    from mdtpu.sim.initialization import lattice_fluid_state

    if dtype is None:
        dtype = jnp.float32
    state = lattice_fluid_state(n, rho, temp, dtype=dtype, cutoff=1.5,
                                jitter=0.01)
    cell = state.unitcell

    pot = PseudoHS()
    params = Parameters(density=rho, n_particles=n, dt=dt, potential=pot)
    if engine_kind == "naive":
        # At gate size (N=1024) the dense all-pairs block can beat the cell
        # grid: fewer padded slots, no rebuild/refresh machinery.
        engine = NaivePairEngine(potential=pot, cutoff=1.5)
    else:
        # Padded-lane-optimal geometry; ALSO the capacity-margin fix: the
        # cutoff-sized grid's C=15 (mean occupancy 4.7) overflowed once in
        # a 1M-step run, silently dropping a particle into the trash slot —
        # the energy jumped 0.27/particle and the "drift" gate read 0.38.
        # Overflow is now reported below so this can never masquerade as
        # integrator drift again.
        engine = CellGridEngine.create_tuned(pot, 1.5, np.asarray(cell), n,
                                             diameters=np.ones(n, np.float32))

    if engine_kind == "naive":
        e, w, f, nbrs = engine_forces(engine, state.positions,
                                      state.diameters, state.unitcell,
                                      state.unitcell_inv, None,
                                      force_dtype=force_dtype)
        state = state.replace(nbrs=nbrs, forces=f.astype(dtype),
                              energy=e.astype(dtype), virial=w.astype(dtype))
        nvt = make_step(params, NVT(temp, 100 * dt), engine,
                        force_dtype=force_dtype)
        nve = make_step(params, NVE(), engine, force_dtype=force_dtype)
    else:
        # Slot-space hot loop (no per-step scatter/gather, rebin hoisted
        # out of the step).
        from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                               slotify)

        state = slot_forces(slotify(state, engine), engine,
                            force_dtype=force_dtype)
        nvt_adv = make_slot_advance(params, NVT(temp, 100 * dt), engine,
                                    force_dtype=force_dtype, hilo=hilo)
        nve_adv = make_slot_advance(params, NVE(), engine,
                                    force_dtype=force_dtype, hilo=hilo)

    if engine_kind == "naive":
        nvt_adv = lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: nvt(x), s)
        nve_adv = lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: nve(x), s)

    adv_nvt = jax.jit(nvt_adv)
    state = adv_nvt(state, 20_000)
    jax.block_until_ready(state)

    @jax.jit
    def segment(s):
        s = nve_adv(s, sample_every)
        kin = 0.5 * jnp.sum(s.velocities.astype(jnp.float64) ** 2)
        return s, s.energy.astype(jnp.float64) + kin, s.temperature, s.virial

    n_seg = nve_steps // sample_every
    energies = np.zeros(n_seg)
    temps = np.zeros(n_seg)
    virials = np.zeros(n_seg)
    t0 = time.perf_counter()
    for i in range(n_seg):
        state, e_tot, t_i, w_i = segment(state)
        energies[i] = float(e_tot)
        temps[i] = float(t_i)
        virials[i] = float(w_i)
    elapsed = time.perf_counter() - t0

    steps = (np.arange(n_seg) + 1) * sample_every
    slope = np.polyfit(steps, energies / n, 1)[0]       # dE/N per step
    drift_per_1e6 = abs(slope) * 1e6

    volume = float(np.abs(np.linalg.det(np.asarray(cell))))
    pressure = virials.mean() / (3 * volume) + rho * temps.mean()
    mode = jnp.dtype(dtype).name
    if force_dtype is not None:
        mode += f"+{jnp.dtype(force_dtype).name}-forces"
    if hilo:
        mode += "+hilo-pairs"
    overflow = False
    n_final = n
    if engine_kind != "naive":
        overflow = bool(state.nbrs.overflow)
        n_final = int(np.asarray(state.nbrs.occupied).sum())
    print(json.dumps({
        "gate": f"NVE drift per 1e6 steps (E/N, {mode}, dt={dt}, pseudo-HS N={n})",
        "drift_per_1e6_steps": float(drift_per_1e6),
        "target": 1e-4,
        "pass": bool(drift_per_1e6 < 1e-4) and not overflow and n_final == n,
        "nve_steps": int(nve_steps),
        "steps_per_sec": round(nve_steps / elapsed, 1),
        "mean_T": round(float(temps.mean()), 4),
        "mean_P": round(float(pressure), 4),
        "energy_span": [float(energies[0] / n), float(energies[-1] / n)],
        "overflow": overflow,
        "n_particles_final": n_final,
    }))


def main_driver(n=1024, rho=0.76, temp=1.4737, dt=0.001,
                nve_steps=1_000_000, sample_every=2_000):
    """Driver-level NVE gate: the SAME fidelity measurement as main(), but
    executed entirely through the PUBLIC run_simulation entry point with its
    default precision='auto' (the f32x2 hi/lo sweep for f32 NVE) and the
    drift computed from the thermo.txt rows the driver writes — proving the
    gate-passing mode lives on the public path, not in a side harness
    (reference contract: one run_simulation! carries the physics guarantees,
    /root/reference/src/simulation.jl:40)."""
    import os
    import tempfile

    from mdtpu.core.types import NVE, NVT, Parameters
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.pseudo_hs import PseudoHS
    from mdtpu.sim.driver import run_simulation
    from mdtpu.sim.initialization import lattice_fluid_state

    dtype = jnp.float32
    state = lattice_fluid_state(n, rho, temp, dtype=dtype, cutoff=1.5,
                                jitter=0.01)
    cell = state.unitcell
    pot = PseudoHS()
    params = Parameters(density=rho, n_particles=n, dt=dt, potential=pot)
    engine = CellGridEngine.create_tuned(pot, 1.5, np.asarray(cell), n,
                                         diameters=np.ones(n, np.float32))

    tmp = tempfile.mkdtemp(prefix="gate_driver_")
    # NVT equilibration through the driver, then the NVE production run.
    state = run_simulation(state, params, NVT(temp, 100 * dt), 20_000,
                           20_000, os.path.join(tmp, "eq"), engine=engine,
                           traj_frequency=10 ** 9)
    t0 = time.perf_counter()
    state = run_simulation(state, params, NVE(), nve_steps, sample_every,
                           os.path.join(tmp, "nve"), engine=engine,
                           traj_frequency=10 ** 9)
    elapsed = time.perf_counter() - t0

    rows = np.loadtxt(os.path.join(tmp, "nve", "thermo.txt"))
    steps, ener, temps = rows[:, 0], rows[:, 1], rows[:, 2]
    nf = 3 * (n - 1)
    etot = ener + 0.5 * nf * temps / n  # per-particle total energy
    slope = np.polyfit(steps, etot, 1)[0]
    drift_per_1e6 = abs(slope) * 1e6
    print(json.dumps({
        "gate": f"DRIVER NVE drift per 1e6 steps (public run_simulation, "
                f"precision=auto, f32, dt={dt}, pseudo-HS N={n})",
        "drift_per_1e6_steps": float(drift_per_1e6),
        "target": 1e-4,
        "pass": bool(drift_per_1e6 < 1e-4),
        "nve_steps": int(nve_steps),
        "steps_per_sec": round(nve_steps / elapsed, 1),
        "mean_T": round(float(temps.mean()), 4),
        "energy_span": [float(etot[0]), float(etot[-1])],
    }))


if __name__ == "__main__":
    import sys
    dt = float(sys.argv[1]) if len(sys.argv) > 1 else 0.001
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    kind = sys.argv[3] if len(sys.argv) > 3 else "f32"
    if kind == "driver":
        main_driver(dt=dt, nve_steps=steps)
        sys.exit(0)
    # x64 on for EVERY kind: the drift fit's energy accounting casts to
    # f64 (segment()), which silently stayed f32 for the default f32/f32x2
    # gates — a hidden ~f32-ulp noise floor under the very measurement the
    # cast exists for. The simulation dtype is still set per kind below.
    jax.config.update("jax_enable_x64", True)
    # "f32x2": pure-f32 pipeline with the pair sweep consuming the Kahan
    # (hi, lo) position words — displacements are (hi_i-hi_j)+(lo_i-lo_j),
    # ~16x less coordinate rounding noise than single-f32 absolute positions
    # at ~15% sweep cost (vs ~10x cost for the emulated-f64 sweep).
    # "f32+f64f": f32 state (fast compensated integration + delta wrap) with
    # the pair sweep in f64 — the f32->f64 cast is exact, so forces are
    # near-exact gradients of the true state and the f32 force-rounding
    # random walk (the dominant f32 NVE drift source) disappears, while the
    # O(N) integration stays at f32 speed.
    # "mixed" (f64 state + f32 forces) is kept as a documented NEGATIVE
    # result: forces evaluated at f32-rounded copies of f64 positions inject
    # delta_x * |f'| noise and drift WORSE than pure f32.
    dtype = {"f32": jnp.float32, "f64": jnp.float64, "mixed": jnp.float64,
             "f32+f64f": jnp.float32, "f32x2": jnp.float32}[kind]
    force_dtype = {"mixed": jnp.float32, "f32+f64f": jnp.float64}.get(kind)
    engine_kind = sys.argv[4] if len(sys.argv) > 4 else "cell"
    main(dt=dt, nve_steps=steps, dtype=dtype, force_dtype=force_dtype,
         engine_kind=engine_kind, hilo=(kind == "f32x2"))
