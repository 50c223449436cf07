"""Dynamics integration tests: NVE energy conservation, NVT temperature
control, Brownian diffusion, FIRE minimization, packing
(SURVEY.md section 4, integration tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVE, NVT, Brownian, Parameters
from mdtpu.integrate.step import engine_forces, make_step
from mdtpu.integrate.thermostat import compute_temperature
from mdtpu.minimize.fire import fire_minimize
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from mdtpu.sim.initialization import build_state_from_arrays, initialize_velocities
from mdtpu.sim.pack import pack_positions


def make_fluid_state(n=128, rho=0.5, d=3, temp=1.0, dtype=jnp.float64, seed=0,
                     cutoff=2.5):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    L = (n / rho) ** (1.0 / d)
    cell = jnp.eye(d, dtype=dtype) * L
    pos = pack_positions(k1, cell, n, d, tol=1.0, dtype=dtype)
    state = build_state_from_arrays(pos, jnp.ones(n, dtype), cell, k3,
                                    dtype=dtype, cutoff=cutoff)
    v = initialize_velocities(temp, k2, n, d, dtype=dtype)
    return state.replace(velocities=v)


def run_steps(state, step_fn, n):
    body = jax.jit(lambda s: step_fn(s))
    for _ in range(n):
        state = body(state)
    return state


def _with_forces(state, engine):
    e, w, f, nbrs = engine_forces(
        engine, state.positions, state.diameters, state.unitcell,
        state.unitcell_inv,
        state.nbrs if state.nbrs is not None
        else engine.allocate(state.positions, state.diameters, state.unitcell,
                             state.unitcell_inv),
    )
    return state.replace(forces=f, energy=e, virial=w, nbrs=nbrs)


def test_nve_energy_conservation_f64():
    # Force-shifted LJ: smooth at the cutoff, so total energy is conserved up
    # to the bounded Verlet oscillation (truncation discontinuities would
    # otherwise dominate any roundoff effect).
    state = make_fluid_state(n=64, rho=0.4, temp=0.75, dtype=jnp.float64)
    pot = LennardJones(r_cut=2.5, force_shift=True)
    params = Parameters(density=0.4, n_particles=64, dt=0.002, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=2.5)
    state = _with_forces(state, engine)

    # Equilibrate briefly with NVT, then measure NVE drift.
    nvt_step = make_step(params, NVT(0.75, 0.2), engine)
    state = run_steps(state, nvt_step, 200)

    nve_step = make_step(params, NVE(), engine)
    state = _with_forces(state, engine)

    def total_energy(s):
        kin = 0.5 * float(jnp.sum(s.velocities ** 2))
        return float(s.energy) + kin

    # Compare window-averaged energies (pointwise samples alias the bounded
    # Verlet oscillation; the secular drift is what matters).
    def window_mean(s, n_samples=20, stride=10):
        es = []
        for _ in range(n_samples):
            s = run_steps(s, nve_step, stride)
            es.append(total_energy(s))
        return s, float(np.mean(es))

    state, e0 = window_mean(state)
    state = run_steps(state, nve_step, 2000)
    state, e1 = window_mean(state)
    drift = abs(e1 - e0) / 64
    assert drift < 5e-5, f"NVE drift per particle too large: {drift}"


def test_nvt_reaches_target_temperature():
    target = 1.4737
    state = make_fluid_state(n=128, rho=0.5, temp=0.5, dtype=jnp.float64,
                             cutoff=1.5)
    pot = PseudoHS()
    params = Parameters(density=0.5, n_particles=128, dt=0.001, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=1.5)
    state = _with_forces(state, engine)
    step = make_step(params, NVT(target, 100 * 0.001), engine)

    state = run_steps(state, step, 300)
    temps = []
    for _ in range(50):
        state = run_steps(state, step, 10)
        temps.append(float(state.temperature))
    assert abs(np.mean(temps) - target) < 0.1 * target


def test_nve_momentum_conservation():
    state = make_fluid_state(n=64, rho=0.4, temp=1.0, dtype=jnp.float64)
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=0.4, n_particles=64, dt=0.002, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=2.5)
    state = _with_forces(state, engine)
    step = make_step(params, NVE(), engine)
    p0 = np.asarray(jnp.sum(state.velocities, axis=0))
    state = run_steps(state, step, 500)
    p1 = np.asarray(jnp.sum(state.velocities, axis=0))
    np.testing.assert_allclose(p1, p0, atol=1e-9)


def test_brownian_free_diffusion():
    # With no interactions, MSD per dimension = 2 t (sigma^2 = 2 dt per step).
    n, d = 1024, 3
    dtype = jnp.float64
    key = jax.random.PRNGKey(3)
    L = 200.0
    cell = jnp.eye(d, dtype=dtype) * L
    pos = jax.random.uniform(key, (n, d), dtype=dtype) * L
    state = build_state_from_arrays(pos, jnp.ones(n, dtype), cell, key,
                                    dtype=dtype, cutoff=1.0)

    pot = LennardJones(epsilon=0.0, r_cut=0.5)
    params = Parameters(density=n / L ** 3, n_particles=n, dt=0.01, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=0.5)
    step = make_step(params, Brownian(1.0), engine)

    start_unwrapped = np.asarray(pos)
    nsteps = 200
    state = run_steps(state, step, nsteps)
    from mdtpu.core.box import unwrapped_positions

    end = np.asarray(unwrapped_positions(state.positions, state.images, cell))
    msd = np.mean(np.sum((end - start_unwrapped) ** 2, axis=1))
    expected = 2 * d * params.dt * nsteps
    assert abs(msd - expected) / expected < 0.1


def test_brownian_accumulates_virial_every_10():
    state = make_fluid_state(n=64, rho=0.4, temp=1.0, dtype=jnp.float64,
                             cutoff=1.5)
    pot = PseudoHS()
    params = Parameters(density=0.4, n_particles=64, dt=1e-5, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=1.5)
    step = make_step(params, Brownian(1.0), engine)
    state = run_steps(state, step, 25)
    assert int(state.nprom) == 3  # steps 0, 10, 20


def test_fire_minimizes_to_local_minimum():
    # Two LJ particles starting off-minimum must relax to r = 2^(1/6).
    dtype = jnp.float64
    cell = jnp.eye(3, dtype=dtype) * 10.0
    pos = jnp.asarray([[4.0, 5.0, 5.0], [5.4, 5.0, 5.0]], dtype)
    key = jax.random.PRNGKey(0)
    state = build_state_from_arrays(pos, jnp.ones(2, dtype), cell, key,
                                    dtype=dtype, cutoff=3.0)
    pot = LennardJones(r_cut=3.0)
    params = Parameters(density=0.01, n_particles=2, dt=0.001, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=3.0)

    state2, energy, converged, n_steps = fire_minimize(
        state, params, engine, tol=1e-8, max_steps=5000
    )
    assert bool(converged)
    r = float(jnp.linalg.norm(state2.positions[0] - state2.positions[1]))
    np.testing.assert_allclose(r, 2 ** (1 / 6), rtol=1e-5)
    np.testing.assert_allclose(energy, -1.0, rtol=1e-5)


def test_fire_minimizes_dense_fluid():
    state = make_fluid_state(n=96, rho=0.6, temp=1.0, dtype=jnp.float64,
                             cutoff=1.5, seed=5)
    pot = PseudoHS()
    params = Parameters(density=0.6, n_particles=96, dt=0.001, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=1.5)
    e_before = float(engine.compute(state.positions, state.diameters,
                                    state.unitcell, state.unitcell_inv, ())[0])
    state2, energy, converged, _ = fire_minimize(state, params, engine,
                                                 tol=1e-6, max_steps=3000)
    assert float(energy) <= e_before + 1e-9
    f_rms = float(jnp.linalg.norm(state2.forces)) / np.sqrt(3 * 95)
    assert bool(converged) or f_rms < 1e-4


def test_fire_grow_does_not_leak_mismatched_nbrs():
    """When FIRE retries on engine capacity overflow it grows a PRIVATE
    engine copy; the returned state must not carry that grown engine's
    neighbor arrays (the caller's original engine would read the wrong
    static capacity / mismatch shapes on the next compute)."""
    from mdtpu.ops.cell_grid import CellGridEngine

    state = make_fluid_state(n=96, rho=0.6, temp=1.0, dtype=jnp.float64,
                             cutoff=1.5, seed=5)
    pot = PseudoHS()
    params = Parameters(density=0.6, n_particles=96, dt=0.001, potential=pot)
    tight = CellGridEngine.create(pot, 1.5, 0.3,
                                  np.asarray(state.unitcell), 96,
                                  cell_capacity=1)  # guaranteed overflow
    state2, energy, converged, _ = fire_minimize(state, params, tight,
                                                 tol=1e-6, max_steps=500)
    assert state2.nbrs is None
    assert bool(jnp.isfinite(state2.positions).all())


def test_pack_positions_removes_overlaps():
    key = jax.random.PRNGKey(7)
    n, d = 256, 3
    rho = 0.5
    L = (n / rho) ** (1 / d)
    cell = jnp.eye(d, dtype=jnp.float64) * L
    pos = pack_positions(key, cell, n, d, tol=1.0, dtype=jnp.float64)
    pos_np = np.asarray(pos)
    # minimum pair distance >= ~tol
    dr = pos_np[:, None, :] - pos_np[None, :, :]
    dr -= L * np.round(dr / L)
    r = np.sqrt((dr ** 2).sum(-1) + np.eye(n) * 1e6)
    assert r.min() > 0.97
    # inside the box
    assert pos_np.min() >= -1e-9 and pos_np.max() <= L + 1e-9


def test_kahan_compensation_improves_f32_drift():
    # The compensated integrator must not be *worse* than plain f32 and should
    # keep NVE drift small in f32 over thousands of steps.
    state = make_fluid_state(n=64, rho=0.4, temp=0.75, dtype=jnp.float32)
    pot = LennardJones(r_cut=2.5, force_shift=True)
    params = Parameters(density=0.4, n_particles=64, dt=0.002, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=2.5)

    nvt = make_step(params, NVT(0.75, 0.2), engine)
    state = _with_forces(state, engine)
    state = run_steps(state, nvt, 200)

    def drift_of(compensated):
        s = _with_forces(state, engine)
        step = make_step(params, NVE(), engine, compensated=compensated)
        s = run_steps(s, step, 1)
        e0 = float(s.energy) + 0.5 * float(jnp.sum(s.velocities ** 2))
        s = run_steps(s, step, 3000)
        e1 = float(s.energy) + 0.5 * float(jnp.sum(s.velocities ** 2))
        return abs(e1 - e0) / 64

    d_comp = drift_of(True)
    assert d_comp < 2e-4, f"f32 compensated drift too large: {d_comp}"


def test_mixed_precision_nve():
    """f64 state + f32 forces (force_dtype): trajectory stays within the f32
    force-error envelope of the all-f64 run, and energy is conserved far
    better than all-f32 (the gate mode: f32-speed sweep, f64 integration)."""
    from mdtpu.ops.cell_grid import CellGridEngine

    n = 256
    state = make_fluid_state(n=n, rho=0.5, temp=1.0, dtype=jnp.float64,
                             cutoff=1.5)
    pot = PseudoHS()
    params = Parameters(density=0.5, n_particles=n, dt=0.001, potential=pot)
    engine = CellGridEngine.create(pot, 1.5, 0.3,
                                   np.asarray(state.unitcell), n)
    s64 = _with_forces(state, engine)

    # Mixed state: the engine's neighbor buffers live at force dtype.
    e, w, f, nbrs = engine_forces(engine, state.positions, state.diameters,
                                  state.unitcell, state.unitcell_inv, None,
                                  force_dtype=jnp.float32)
    smx = state.replace(forces=f.astype(jnp.float64),
                        energy=e.astype(jnp.float64),
                        virial=w.astype(jnp.float64), nbrs=nbrs)

    step64 = jax.jit(make_step(params, NVE(), engine))
    stepmx = jax.jit(make_step(params, NVE(), engine,
                               force_dtype=jnp.float32))
    for _ in range(100):
        s64 = step64(s64)
        smx = stepmx(smx)

    assert np.all(np.isfinite(np.asarray(smx.positions)))
    np.testing.assert_allclose(np.asarray(smx.positions),
                               np.asarray(s64.positions),
                               rtol=0, atol=5e-4)
    # total energy drift of the mixed run vs its own start
    def etot(s):
        kin = 0.5 * float(jnp.sum(s.velocities ** 2))
        return float(s.energy) + kin
    np.testing.assert_allclose(etot(smx), etot(s64), rtol=1e-4)


def test_fire_survives_norm_overflow():
    """Steep-potential overlaps give |F| ~ 1e20+; naive ||F||^2 / sum(v*F)
    overflow to inf in f32 (and in TPU-emulated f64, which keeps the f32
    exponent range) — FIRE then stalls with scale = inf/inf = nan. The
    max-scaled norms must keep minimizing."""
    from mdtpu.minimize.fire import fire_minimize
    from mdtpu.ops.naive import NaivePairEngine
    from mdtpu.potentials.pseudo_hs import PseudoHS

    state = make_fluid_state(n=128, rho=0.4, temp=0.0, dtype=jnp.float32,
                             cutoff=1.5)
    # Plant a deep overlap: r = 0.4 -> pair energy ~ (2.5)^50 ~ 6e19 and
    # |F| ~ 1e22, whose square overflows f32.
    pos = np.array(state.positions)
    pos[1] = pos[0] + np.array([0.4, 0.0, 0.0], np.float32)
    state = state.replace(positions=jnp.asarray(pos))

    pot = PseudoHS()
    params = Parameters(density=0.4, n_particles=128, dt=0.001, potential=pot)
    eng = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, _, f0, _ = eng.compute(state.positions, state.diameters,
                               state.unitcell, state.unitcell_inv, ())
    assert not np.isfinite(float(jnp.sum(f0 * f0)))  # the overflow is real
    out, e, conv, steps = fire_minimize(state, params, eng, max_steps=2000,
                                        tol=1e-4)
    assert np.isfinite(float(e))
    assert float(e) < float(e0) * 1e-6  # overlap resolved
    assert bool(jnp.all(jnp.isfinite(out.positions)))
