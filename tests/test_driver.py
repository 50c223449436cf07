"""End-to-end run_simulation: file outputs, formats, resume, Brownian path,
log-spaced snapshots, compression — the analog of exercising the reference's
README workflow (/root/reference/README.md:11-66)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVE, NVT, Brownian, Parameters
from mdtpu.io.xyz import read_xyz
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.potentials.pseudo_hs import PseudoHS
from mdtpu.sim.driver import run_simulation
from mdtpu.sim.initialization import initialize_state, initialize_velocities


@pytest.fixture()
def small_system(tmp_path):
    pot = PseudoHS()
    params = Parameters(density=0.5, n_particles=64, dt=0.001, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=3, cutoff=1.5,
                             dtype=jnp.float64, seed=1)
    v = initialize_velocities(1.0, jax.random.PRNGKey(2), 64, 3, dtype=jnp.float64)
    state = state.replace(velocities=v)
    return state, params, str(tmp_path)


def test_initialize_state_writes_init_xyz(small_system):
    state, params, path = small_system
    assert os.path.isfile(os.path.join(path, "init.xyz"))
    cell, pos, diam = read_xyz(os.path.join(path, "init.xyz"), 3)
    assert pos.shape == (64, 3)
    np.testing.assert_allclose(diam, np.ones(64), atol=1e-6)


def test_run_simulation_nvt_outputs(small_system):
    state, params, path = small_system
    final = run_simulation(state, params, NVT(1.0, 0.1), total_steps=50,
                           frequency=10, pathname=path)
    assert int(final.step) == 50

    thermo = os.path.join(path, "thermo.txt")
    lines = open(thermo).read().splitlines()
    assert lines[0] == "# Step Energy Temperature Pressure"
    rows = [l.split() for l in lines[1:]]
    assert [r[0] for r in rows] == ["0", "10", "20", "30", "40"]
    for r in rows:
        assert len(r) == 4
        float(r[1]), float(r[2]), float(r[3])

    traj = open(os.path.join(path, "trajectory.xyz")).read()
    assert traj.count("ITEM: TIMESTEP") == 5
    assert "ITEM: ATOMS id type radius x y z xu yu zu" in traj
    assert os.path.isfile(os.path.join(path, "final.xyz"))
    cell, pos, diam = read_xyz(os.path.join(path, "final.xyz"), 3)
    np.testing.assert_allclose(pos, np.asarray(final.positions), atol=1e-6)


def test_run_simulation_nve_and_temperature_sane(small_system):
    state, params, path = small_system
    final = run_simulation(state, params, NVE(), total_steps=30, frequency=15,
                           pathname=path)
    temps = [float(l.split()[2]) for l in
             open(os.path.join(path, "thermo.txt")).read().splitlines()[1:]]
    assert all(0.1 < t < 3.0 for t in temps)


def test_run_simulation_brownian(small_system):
    state, params, path = small_system
    # Euler–Maruyama needs a much smaller dt than MD on the steep pseudo-HS
    # core (measured stable <= 2e-5; the driver raises on divergence).
    params = params.replace(dt=1e-5)
    final = run_simulation(state, params, Brownian(1.2), total_steps=40,
                           frequency=20, pathname=path)
    lines = open(os.path.join(path, "thermo.txt")).read().splitlines()[1:]
    assert len(lines) == 2
    for l in lines:
        step, e, t, p = l.split()
        assert float(t) == pytest.approx(1.2)  # Brownian writes ktemp as T
    # accumulators were reset after each output
    assert int(final.nprom) < 4


def test_run_simulation_compress(small_system):
    state, params, path = small_system
    run_simulation(state, params, NVE(), total_steps=10, frequency=5,
                   pathname=path, compress=True)
    assert os.path.isfile(os.path.join(path, "trajectory.xyz.zst"))
    assert not os.path.isfile(os.path.join(path, "trajectory.xyz"))


def test_run_simulation_log_times(small_system):
    state, params, path = small_system
    run_simulation(state, params, NVE(), total_steps=20, frequency=100,
                   pathname=path, log_times=True)
    snaps = [f for f in os.listdir(path) if f.startswith("snapshot.")]
    # log times within 20 steps: 0, 1, 2, 3, 4, 6, 8, 11, 15
    assert "snapshot.0" in snaps and "snapshot.1" in snaps
    assert len(snaps) >= 5
    assert os.path.isfile(os.path.join(path, "new-log-times.txt"))


def test_resume_from_final_xyz(small_system, tmp_path):
    # The reference's resume path: re-read the written configuration
    # (/root/reference/src/initialization.jl:77-80).
    state, params, path = small_system
    run_simulation(state, params, NVT(1.0, 0.1), total_steps=20, frequency=10,
                   pathname=path)
    state2 = initialize_state(params, str(tmp_path) + "/resume",
                              from_file=os.path.join(path, "final.xyz"),
                              dimension=3, dtype=jnp.float64)
    assert state2.n_particles == 64
    v = initialize_velocities(1.0, jax.random.PRNGKey(3), 64, 3, jnp.float64)
    state2 = state2.replace(velocities=v)
    final2 = run_simulation(state2, params, NVT(1.0, 0.1), total_steps=10,
                            frequency=5, pathname=str(tmp_path) + "/resume")
    assert int(final2.step) == 10


def test_exact_checkpoint_resume(small_system):
    # Full-state checkpoint/resume reproduces the NVE trajectory exactly.
    from mdtpu.io.checkpoint import load_checkpoint, save_checkpoint

    state, params, path = small_system
    mid = run_simulation(state, params, NVE(), total_steps=10, frequency=5,
                         pathname=path)
    ck = os.path.join(path, "state.npz")
    save_checkpoint(mid, ck)
    end_a = run_simulation(mid, params, NVE(), total_steps=10, frequency=5,
                           pathname=path + "/a")
    restored = load_checkpoint(ck, state)
    end_b = run_simulation(restored, params, NVE(), total_steps=10, frequency=5,
                           pathname=path + "/b")
    np.testing.assert_array_equal(np.asarray(end_a.positions),
                                  np.asarray(end_b.positions))
    np.testing.assert_array_equal(np.asarray(end_a.velocities),
                                  np.asarray(end_b.velocities))


def test_log_times_resume_does_not_rewind(small_system):
    """With log_times=True on a resumed state (start_step > 0), events below
    start_step (snap 0 and early log-times) must be dropped — previously they
    rewound the segment counter, executing extra steps under wrong labels."""
    state, params, path = small_system
    mid = run_simulation(state, params, NVE(), total_steps=40, frequency=20,
                         pathname=path)
    assert int(mid.step) == 40
    end = run_simulation(mid, params, NVE(), total_steps=40, frequency=20,
                         pathname=path + "/resumed", log_times=True)
    assert int(end.step) == 80
    # Reference run without log_times from the same state: trajectories match.
    end_ref = run_simulation(mid, params, NVE(), total_steps=40, frequency=20,
                             pathname=path + "/plain")
    np.testing.assert_array_equal(np.asarray(end.positions),
                                  np.asarray(end_ref.positions))
    # thermo rows carry resumed-range labels only
    lines = open(os.path.join(path, "resumed", "thermo.txt")).read().splitlines()
    labels = [int(l.split()[0]) for l in lines[1:]]
    assert labels == [40, 60]
    # ...but the ORIGINAL log-time schedule continues past the restart
    # point: snapshots in [start_step, end_step) are written (regression:
    # max_step=total_steps generated only times below start_step, so
    # resumed segments silently wrote no snapshots at all).
    from mdtpu.io.logtimes import generate_log_times

    expected = [t for t in generate_log_times(max_step=80) if 40 <= t < 80]
    assert expected  # the schedule does place snapshots in this window
    for t in expected:
        assert os.path.isfile(os.path.join(path, "resumed", f"snapshot.{t}"))


def test_driver_slot_fast_path_matches_naive(tmp_path):
    """A cell-grid engine routes the driver through the slot-space fast path
    (component-major state, hoisted rebuilds, lean inner steps). Outputs and
    the returned state must come back in ORIGINAL particle order and match
    the naive-engine particle-order run to summation-rounding tolerance."""
    from mdtpu.ops.cell_grid import CellGridEngine

    pot = PseudoHS()
    n = 500
    params = Parameters(density=0.5, n_particles=n, dt=0.001, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=3, cutoff=1.5,
                             dtype=jnp.float64, seed=3)
    v = initialize_velocities(1.0, jax.random.PRNGKey(4), n, 3,
                              dtype=jnp.float64)
    state = state.replace(velocities=v)

    eng = CellGridEngine.create(pot, 1.5, 0.15, np.asarray(state.unitcell), n)
    p_slot, p_ref = str(tmp_path / "slot"), str(tmp_path / "ref")
    out_slot = run_simulation(state, params, NVT(1.0, 0.1), 60, 20, p_slot,
                              engine=eng)
    out_ref = run_simulation(state, params, NVT(1.0, 0.1), 60, 20, p_ref,
                             engine=NaivePairEngine(potential=pot, cutoff=1.5))

    assert out_slot.ids is None and out_slot.positions.shape == (n, 3)
    np.testing.assert_allclose(np.asarray(out_slot.positions),
                               np.asarray(out_ref.positions),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out_slot.velocities),
                               np.asarray(out_ref.velocities),
                               rtol=1e-7, atol=1e-9)
    # thermo rows match to f64 reduction tolerance
    rows_s = np.loadtxt(os.path.join(p_slot, "thermo.txt"))
    rows_r = np.loadtxt(os.path.join(p_ref, "thermo.txt"))
    np.testing.assert_allclose(rows_s, rows_r, rtol=1e-6, atol=1e-7)
    # Unwrapped-coordinate invariant: pos + cell @ images must agree too —
    # validates the deferred wrap's image bookkeeping through rebuilds and
    # the host-side fold.
    cell_T = np.asarray(state.unitcell).T
    unwrap_s = np.asarray(out_slot.positions) + np.asarray(out_slot.images) @ cell_T
    unwrap_r = np.asarray(out_ref.positions) + np.asarray(out_ref.images) @ cell_T
    np.testing.assert_allclose(unwrap_s, unwrap_r, rtol=1e-8, atol=1e-8)
    # trajectory frames parse with stable per-particle rows
    traj = open(os.path.join(p_slot, "trajectory.xyz")).read()
    assert traj.count("ITEM: TIMESTEP") == 3


def test_driver_slot_brownian(tmp_path):
    """Brownian dynamics through the slot fast path. The noise stream is
    drawn per slot, so realizations differ from the particle-order engines
    (statistically equivalent, not pathwise); the driver plumbing —
    particle-order outputs, in-box positions, ktemp-as-temperature rows,
    accumulator resets — must all hold."""
    from mdtpu.ops.cell_grid import CellGridEngine

    pot = PseudoHS()
    n = 500
    params = Parameters(density=0.5, n_particles=n, dt=1e-5, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=3, cutoff=1.5,
                             dtype=jnp.float64, seed=9)

    eng = CellGridEngine.create(pot, 1.5, 0.2, np.asarray(state.unitcell), n)
    p_slot = str(tmp_path / "slot")
    out = run_simulation(state, params, Brownian(1.0), 40, 20, p_slot,
                         engine=eng)
    assert out.ids is None and out.positions.shape == (n, 3)
    assert int(out.step) == 40
    pos = np.asarray(out.positions)
    L = float(state.unitcell[0, 0])
    assert (pos >= 0).all() and (pos <= L).all()
    # Positions moved only slightly at this dt (no teleporting through slots).
    d = np.abs(pos - np.asarray(state.positions))
    d = np.minimum(d, L - d)
    assert float(d.max()) < 0.1
    lines = open(os.path.join(p_slot, "thermo.txt")).read().splitlines()[1:]
    assert len(lines) == 2
    for l in lines:
        assert float(l.split()[2]) == pytest.approx(1.0)  # T == ktemp
    assert int(out.nprom) < 4  # reset after each output


def test_slot_driver_checkpoint_resume(tmp_path):
    """Checkpoints written mid-run on the slot fast path are particle-order
    full states; loading one and continuing produces physically consistent
    dynamics (slot-mode summation order is layout-dependent, so resume is
    exact-physics, not bitwise — the naive-engine path keeps the bitwise
    guarantee, test_exact_checkpoint_resume)."""
    from mdtpu.io.checkpoint import load_checkpoint
    from mdtpu.ops.cell_grid import CellGridEngine

    pot = PseudoHS()
    n = 500
    params = Parameters(density=0.5, n_particles=n, dt=0.001, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=3, cutoff=1.5,
                             dtype=jnp.float64, seed=5)
    state = state.replace(velocities=initialize_velocities(
        1.0, jax.random.PRNGKey(6), n, 3, dtype=jnp.float64))
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell), n)

    p = str(tmp_path / "run")
    out = run_simulation(state, params, NVE(), 40, 20, p, engine=eng,
                         checkpoint_every=20)
    ck = os.path.join(p, "checkpoint.20.npz")
    assert os.path.isfile(ck)
    restored = load_checkpoint(ck, state)
    assert int(restored.step) == 21  # event at step-label 20 = 21 executed
    assert restored.positions.shape == (n, 3)
    cont = run_simulation(restored, params, NVE(), 19, 19,
                          str(tmp_path / "cont"), engine=eng)
    assert int(cont.step) == 40
    # Energy conservation across the resume splice (NVE, f64).
    e0 = float(out.energy) + 0.5 * float(jnp.sum(out.velocities ** 2))
    e1 = float(cont.energy) + 0.5 * float(jnp.sum(cont.velocities ** 2))
    assert abs(e1 - e0) / abs(e0) < 1e-6


def _f32_cell_system(tmp_path, n=500, seed=21):
    from mdtpu.ops.cell_grid import CellGridEngine

    pot = PseudoHS()
    params = Parameters(density=0.5, n_particles=n, dt=0.001, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=3, cutoff=1.5,
                             dtype=jnp.float32, seed=seed)
    state = state.replace(velocities=initialize_velocities(
        1.0, jax.random.PRNGKey(seed + 1), n, 3, dtype=jnp.float32))
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell), n)
    return state, params, eng


def test_driver_precision_f32x2_matches_slot_hilo_bitwise(tmp_path):
    """The public driver's precision='f32x2' must run EXACTLY the hi/lo slot
    loop that passes the NVE drift gate (gates.py 'f32x2') — same advance,
    same segmentation, bit-for-bit final state. The gate-passing mode lives
    on the one public path, like the reference's single run_simulation!
    (/root/reference/src/simulation.jl:40)."""
    from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                           slotify, unslotify_state)

    state, params, eng = _f32_cell_system(tmp_path)
    out = run_simulation(state, params, NVE(), 40, 10,
                         str(tmp_path / "drv"), engine=eng,
                         precision="f32x2")

    # Replicate the driver's event segmentation by hand on the slot loop.
    s = slot_forces(slotify(state, eng), eng)
    adv = jax.jit(make_slot_advance(params, NVE(), eng, hilo=True))
    for ev_prev, ev in zip([-1, 0, 10, 20, 30], [0, 10, 20, 30, 39]):
        s = adv(s, ev - ev_prev)
    manual = unslotify_state(s)
    np.testing.assert_array_equal(np.asarray(out.positions),
                                  np.asarray(manual.positions))
    np.testing.assert_array_equal(np.asarray(out.velocities),
                                  np.asarray(manual.velocities))


def test_driver_precision_auto_defaults_to_hilo_for_f32_nve(tmp_path):
    state, params, eng = _f32_cell_system(tmp_path)
    out_auto = run_simulation(state, params, NVE(), 40, 40,
                              str(tmp_path / "auto"), engine=eng)
    out_hilo = run_simulation(state, params, NVE(), 40, 40,
                              str(tmp_path / "hilo"), engine=eng,
                              precision="f32x2")
    out_plain = run_simulation(state, params, NVE(), 40, 40,
                               str(tmp_path / "plain"), engine=eng,
                               precision="plain")
    np.testing.assert_array_equal(np.asarray(out_auto.positions),
                                  np.asarray(out_hilo.positions))
    # The plain sweep's coordinate rounding diverges within a few steps.
    assert not np.array_equal(np.asarray(out_auto.positions),
                              np.asarray(out_plain.positions))


def test_traj_frequency_decouples_trajectory_from_thermo(tmp_path):
    state, params, eng = _f32_cell_system(tmp_path)
    p = str(tmp_path / "run")
    run_simulation(state, params, NVT(1.0, 0.1), 40, 5, p, engine=eng,
                   traj_frequency=20)
    rows = np.loadtxt(os.path.join(p, "thermo.txt"))
    np.testing.assert_array_equal(rows[:, 0], np.arange(0, 40, 5))
    traj = open(os.path.join(p, "trajectory.xyz")).read()
    assert traj.count("ITEM: TIMESTEP") == 2  # frames at 0 and 20 only
    # Physics identical to the coupled-cadence run (pull size is the only
    # difference).
    p2 = str(tmp_path / "ref")
    run_simulation(state, params, NVT(1.0, 0.1), 40, 5, p2, engine=eng)
    rows2 = np.loadtxt(os.path.join(p2, "thermo.txt"))
    np.testing.assert_array_equal(rows, rows2)


def _tight_overflow_setup(tmp_path, seed=31):
    """A state + capacity-exact engine where one aimed particle overflows
    the fullest cell after ~n_steps: the particle nearest to (but outside)
    the fullest cell walks into its center at moderate speed (per-step
    displacement ~0.02 resolves core collisions — a fast insertion would
    deposit unbounded energy); the skin rebins catch it inside, pushing
    occupancy past the exact capacity."""
    state, params, eng = _f32_cell_system(tmp_path, seed=seed)
    nbrs = eng.allocate(state.positions, state.diameters, state.unitcell,
                        state.unitcell_inv)
    cap = eng.cell_capacity
    addr = np.asarray(nbrs.addr)
    n_cells = int(np.prod(eng.grid))
    cid = addr // cap
    counts = np.bincount(cid[cid < n_cells], minlength=n_cells)
    c_star = int(counts.argmax())
    tight = eng.replace(cell_capacity=int(counts.max()))

    nx, ny, nz = eng.grid
    cix, ciy, ciz = c_star // (ny * nz), (c_star // nz) % ny, c_star % nz
    L = np.diag(np.asarray(state.unitcell))
    center = (np.asarray([cix, ciy, ciz]) + 0.5) / np.asarray([nx, ny, nz]) * L
    pos = np.asarray(state.positions)
    d = np.linalg.norm(pos - center, axis=1)
    d[cid == c_star] = np.inf
    j = int(d.argmin())
    v_aim = (center - pos[j]) / np.linalg.norm(center - pos[j]) * 20.0
    state = state.replace(velocities=state.velocities.at[j].set(
        jnp.asarray(v_aim, jnp.float32)))
    n_steps = int(np.linalg.norm(center - pos[j]) / (20.0 * 0.001)) + 60
    return state, params, tight, n_steps


def test_slot_overflow_restores_and_reruns_without_particle_loss(tmp_path):
    """Capacity overflow on the slot path must never lose particles
    (previously an overflowing rebin silently scattered rows to the trash
    column, permanently deleting them): the driver restores the pre-segment
    state and re-runs with grown capacity."""
    state, params, tight, n_steps = _tight_overflow_setup(tmp_path)
    n = state.n_particles

    with pytest.warns(UserWarning, match="capacity overflow"):
        out = run_simulation(state, params, NVE(), n_steps, 40,
                             str(tmp_path / "tight"), engine=tight)
    # All N particles present and finite (the flush backstop would have
    # raised on any loss).
    assert out.positions.shape == (n, 3)
    assert np.isfinite(np.asarray(out.positions)).all()
    v_out = np.asarray(out.velocities)
    assert np.isfinite(v_out).all()
    # Dynamics stayed physical (no f32 force blowup from the insertion).
    assert float(np.abs(v_out).max()) < 1e3
    rows = np.loadtxt(os.path.join(tmp_path, "tight", "thermo.txt"))
    assert np.isfinite(rows).all()


def test_driver_raises_on_divergence(tmp_path):
    """A diverged run must RAISE, not keep writing plausible-looking rows.
    Beyond the cutoff every pair contributes exact zeros, so non-finite
    positions read as energy 0.0 and pressure rho*kT — the round-2 Brownian
    example silently wrote 19,500 such garbage rows. Euler–Maruyama on the
    pseudo-HS core is divergent at dt = 1e-4 (measured stable <= 2e-5)."""
    pot = PseudoHS()
    pb = Parameters(density=0.5, n_particles=128, dt=1e-4, potential=pot)
    state = initialize_state(pb, str(tmp_path), dimension=3, cutoff=1.5,
                             seed=0, dtype=jnp.float32)
    with pytest.raises(RuntimeError, match="diverged"):
        run_simulation(state, pb, Brownian(1.0), 600, 100,
                       str(tmp_path / "bad"))


def test_brownian_stable_dt_writes_real_energies(tmp_path):
    """At a stable dt the Brownian driver writes finite, NON-ZERO energies
    (regression: a divergence upstream made every thermo row '0.000000')."""
    pot = PseudoHS()
    pb = Parameters(density=0.5, n_particles=128, dt=1e-5, potential=pot)
    state = initialize_state(pb, str(tmp_path), dimension=3, cutoff=1.5,
                             seed=0, dtype=jnp.float32)
    out = run_simulation(state, pb, Brownian(1.0), 400, 100,
                         str(tmp_path / "ok"))
    assert bool(jnp.isfinite(out.positions).all())
    rows = np.loadtxt(os.path.join(tmp_path, "ok", "thermo.txt"))
    assert np.isfinite(rows).all()
    assert (rows[1:, 1] > 0).all()  # energies after step 0 are real


def test_slot_overflow_in_tail_segment_recovers(tmp_path):
    """Overflow in the TAIL segment (steps past the last output event) must
    also restore-and-rerun: previously the tail bypassed run_segment, so an
    overflow there silently dropped particles from final.xyz and the
    returned state. frequency > n_steps leaves only the step-0 event, so the
    aimed particle overflows mid-tail."""
    state, params, tight, n_steps = _tight_overflow_setup(tmp_path, seed=31)
    n = state.n_particles

    with pytest.warns(UserWarning, match="capacity overflow"):
        out = run_simulation(state, params, NVE(), n_steps, 10 * n_steps,
                             str(tmp_path / "tail"), engine=tight)
    assert out.positions.shape == (n, 3)
    assert np.isfinite(np.asarray(out.positions)).all()
    # final.xyz carries all N rows too.
    _, final_pos, _ = read_xyz(os.path.join(tmp_path, "tail", "final.xyz"))
    assert final_pos.shape == (n, 3)


def test_driver_2d_slot_fast_path_matches_naive(tmp_path):
    """2D runs ride the same slot fast path as 3D (y-window sweep) through
    the public driver — previously 2D fell back to slower engines. Physics
    must match the naive-engine particle-order run."""
    from mdtpu.ops.cell_grid import CellGridEngine

    pot = PseudoHS()
    n = 600
    params = Parameters(density=0.6, n_particles=n, dt=0.001, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=2, cutoff=1.5,
                             dtype=jnp.float64, seed=13)
    state = state.replace(velocities=initialize_velocities(
        1.0, jax.random.PRNGKey(14), n, 2, dtype=jnp.float64))

    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell), n)
    assert len(eng.grid) == 2
    p_slot, p_ref = str(tmp_path / "slot"), str(tmp_path / "ref")
    out_slot = run_simulation(state, params, NVT(1.0, 0.1), 60, 20, p_slot,
                              engine=eng)
    out_ref = run_simulation(state, params, NVT(1.0, 0.1), 60, 20, p_ref,
                             engine=NaivePairEngine(potential=pot, cutoff=1.5))
    assert out_slot.ids is None and out_slot.positions.shape == (n, 2)
    np.testing.assert_allclose(np.asarray(out_slot.positions),
                               np.asarray(out_ref.positions),
                               rtol=1e-8, atol=1e-9)
    rows_s = np.loadtxt(os.path.join(p_slot, "thermo.txt"))
    rows_r = np.loadtxt(os.path.join(p_ref, "thermo.txt"))
    np.testing.assert_allclose(rows_s, rows_r, rtol=1e-6, atol=1e-7)


def test_driver_slot_log_times_and_compress(tmp_path):
    """log-spaced snapshots and zstd compression through the slot fast path:
    snapshot files appear at the log times with in-box particle-order rows,
    and the compressed trajectory replaces the plain one."""
    from mdtpu.ops.cell_grid import CellGridEngine

    pot = PseudoHS()
    n = 500
    params = Parameters(density=0.5, n_particles=n, dt=0.001, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=3, cutoff=1.5,
                             dtype=jnp.float64, seed=11)
    state = state.replace(velocities=initialize_velocities(
        1.0, jax.random.PRNGKey(12), n, 3, dtype=jnp.float64))
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell), n)
    p = str(tmp_path / "run")
    out = run_simulation(state, params, NVE(), 20, 100, p, engine=eng,
                         log_times=True, compress=True)
    assert int(out.step) == 20
    snaps = sorted(f for f in os.listdir(p) if f.startswith("snapshot."))
    assert "snapshot.0" in snaps and len(snaps) >= 5
    # snapshot rows are (N, d), in-box
    txt = open(os.path.join(p, "snapshot.0")).read()
    assert txt.count("\n") > n
    assert os.path.isfile(os.path.join(p, "trajectory.xyz.zst"))
    assert not os.path.isfile(os.path.join(p, "trajectory.xyz"))


def test_pack_output_rows_roundtrip_slot():
    """The trajectory-event row transfer compacts AND particle-orders the
    padded slot state on device (one id-key sort + one packed gather; ids
    and run-constant diameters never ride the wire). Pinned here: the
    device-ordered rows reproduce the unslotified particle-order state
    bit-for-bit."""
    from mdtpu.integrate.slot_step import (_host_wrap, slot_forces, slotify,
                                           unslotify_state)
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.sim.driver import _pack_output_rows, _unpack_output_rows

    pot = PseudoHS()
    n = 321  # deliberately not a lane multiple: plenty of vacant slots
    params = Parameters(density=0.4, n_particles=n, dt=0.001, potential=pot)
    state = initialize_state(params, "/tmp/pack_rt", dimension=3, cutoff=1.5,
                             dtype=jnp.float32, seed=3)
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell), n)
    sl = slot_forces(slotify(state, eng), eng)
    assert int(sl.nbrs.occupied.sum()) == n
    assert sl.positions.shape[1] > n  # padded slot space

    rows = jax.jit(lambda s: _pack_output_rows(s, True, n))(sl)
    assert rows.shape == (2 * 3, n)  # no id rows: ordered on device
    dev = _unpack_output_rows(rows)

    # The packed rows are unwrapped (deferred wrap); fold like the driver
    # does, then compare against the particle-order unslotified state.
    pos, img = _host_wrap(dev["positions"], dev["images"], sl.unitcell)
    ref = unslotify_state(sl)
    np.testing.assert_array_equal(pos, np.asarray(ref.positions))
    np.testing.assert_array_equal(img, np.asarray(ref.images))


def test_resume_into_same_pathname_appends(small_system):
    """A resumed state (step > 0) APPENDS to the run directory's outputs:
    truncating (the fresh-run behavior, reference parity io.jl:225-239)
    would destroy the first segment's thermo rows and trajectory frames
    while its snapshots survive."""
    state, params, path = small_system
    mid = run_simulation(state, params, NVE(), total_steps=20, frequency=10,
                         pathname=path)
    end = run_simulation(mid, params, NVE(), total_steps=20, frequency=10,
                         pathname=path)
    assert int(end.step) == 40
    lines = open(os.path.join(path, "thermo.txt")).read().splitlines()
    assert lines[0] == "# Step Energy Temperature Pressure"
    labels = [int(l.split()[0]) for l in lines[1:]]
    assert labels == [0, 10, 20, 30]   # both segments, one header
    traj = open(os.path.join(path, "trajectory.xyz")).read()
    assert traj.count("ITEM: TIMESTEP") == 4


def test_crash_resume_keeps_pre_checkpoint_rows(small_system):
    """Resuming from a mid-run checkpoint after a crash keeps the thermo
    rows / trajectory frames written BEFORE the checkpoint and drops only
    the post-checkpoint tail (which the resumed run rewrites). Previously
    any label >= the state's step truncated the WHOLE file, permanently
    destroying the pre-checkpoint history this resume can never rewrite."""
    from mdtpu.io.checkpoint import load_checkpoint

    state, params, path = small_system
    run_simulation(state, params, NVE(), total_steps=40, frequency=10,
                   pathname=path, checkpoint_every=20)
    thermo = os.path.join(path, "thermo.txt")
    traj = os.path.join(path, "trajectory.xyz")
    before_thermo = open(thermo).read()
    before_traj = open(traj).read()
    # "Crash after step 30, resume from the step-20 checkpoint": the
    # directory holds rows/frames 0..30; the restored state is at step 21.
    mid = load_checkpoint(os.path.join(path, "checkpoint.20.npz"), state)
    assert int(mid.step) == 21
    run_simulation(mid, params, NVE(), total_steps=19, frequency=10,
                   pathname=path)
    # The resumed run replays 21..39 exactly (NVE checkpoints are exact),
    # so the directory ends up byte-identical to the uninterrupted run.
    assert open(thermo).read() == before_thermo
    assert open(traj).read() == before_traj


def test_crash_resume_filters_compressed_trajectory(small_system):
    """The selective resume truncation handles the zstd-compressed
    trajectory stream too (decompress-filter-recompress)."""
    from mdtpu.io.checkpoint import load_checkpoint
    from mdtpu.io.compress import decompress_zstd

    state, params, path = small_system
    run = os.path.join(path, "zst")
    run_simulation(state, params, NVE(), total_steps=40, frequency=10,
                   pathname=run, checkpoint_every=20, compress=True)
    mid = load_checkpoint(os.path.join(run, "checkpoint.20.npz"), state)
    run_simulation(mid, params, NVE(), total_steps=19, frequency=10,
                   pathname=run, compress=True)
    plain = decompress_zstd(os.path.join(run, "trajectory.xyz.zst"))
    text = open(plain).read()
    steps = [int(l) for prev, l in zip(text.splitlines(), text.splitlines()[1:])
             if prev.startswith("ITEM: TIMESTEP")]
    assert steps == [0, 10, 20, 30]


def test_failed_validation_preserves_previous_outputs(tmp_path):
    """A run_simulation call that raises during setup (here: slotify's
    uniform-sigma mismatch) must not have touched the directory's outputs —
    previously the files were truncated before the validation ran."""
    from mdtpu.ops.cell_grid import CellGridEngine

    path = str(tmp_path)
    pot = PseudoHS()
    params = Parameters(density=0.5, n_particles=256, dt=0.001, potential=pot)
    state = initialize_state(params, path, dimension=3, cutoff=1.5,
                             dtype=jnp.float64, seed=1)
    v = initialize_velocities(1.0, jax.random.PRNGKey(2), 256, 3,
                              dtype=jnp.float64)
    state = state.replace(velocities=v)
    run_simulation(state, params, NVE(), total_steps=20, frequency=10,
                   pathname=path)
    thermo = os.path.join(path, "thermo.txt")
    traj = os.path.join(path, "trajectory.xyz")
    before_thermo = open(thermo).read()
    before_traj = open(traj).read()

    n = state.n_particles
    eng = CellGridEngine.create(params.potential, 1.5, 0.6,
                                np.asarray(state.unitcell), n,
                                diameters=np.ones(n))
    poly = state.replace(diameters=jnp.linspace(0.8, 1.2, n,
                                                dtype=state.diameters.dtype))
    with pytest.raises(ValueError, match="uniform_sigma"):
        run_simulation(poly, params, NVE(), total_steps=10, frequency=10,
                       pathname=path, engine=eng)
    assert open(thermo).read() == before_thermo
    assert open(traj).read() == before_traj


def test_nve_divergence_raises(tmp_path):
    """The divergence raise covers MD (velocity-Verlet kinetic explosion),
    not just the Brownian path. The driver checks the divergence flag
    BEFORE the overflow flag: inf positions can trigger a rebin whose
    clipped binning overflows, and growing capacity 8 times and replaying
    would report the wrong error."""
    pot = PseudoHS()
    # f32 + a dt far past the Verlet stability bound: forces overflow to
    # inf within a few steps and positions go non-finite.
    params = Parameters(density=0.5, n_particles=128, dt=0.05, potential=pot)
    state = initialize_state(params, str(tmp_path), dimension=3, cutoff=1.5,
                             seed=3, dtype=jnp.float32)
    v = initialize_velocities(50.0, jax.random.PRNGKey(4), 128, 3,
                              dtype=jnp.float32)
    state = state.replace(velocities=v)
    with pytest.raises(RuntimeError, match="diverged"):
        run_simulation(state, params, NVE(), total_steps=400, frequency=100,
                       pathname=str(tmp_path / "boom"))


def test_checkpoint_every_not_quantized_to_output_cadence(small_system):
    """checkpoint_every misaligned with the thermo cadence still writes
    checkpoints at its own steps (they are events of their own; previously
    only event steps divisible by checkpoint_every got one)."""
    state, params, path = small_system
    run_simulation(state, params, NVE(), total_steps=40, frequency=25,
                   pathname=path, checkpoint_every=15)
    for s in (0, 15, 30):
        assert os.path.isfile(os.path.join(path, f"checkpoint.{s}.npz")), s


def test_stale_outputs_truncated_not_appended(small_system):
    """Re-running a script whose input state always reaches the same step
    (labels in the directory >= the state's step) must truncate like a
    fresh run — only a TRUE continuation (labels < state.step) appends."""
    state, params, path = small_system
    mid = run_simulation(state, params, NVE(), total_steps=20, frequency=10,
                         pathname=path)
    # Same mid-state into the same directory twice: the second invocation
    # sees labels 20, 30 >= mid.step=20 -> truncate, no duplicates.
    run_simulation(mid, params, NVE(), total_steps=20, frequency=10,
                   pathname=path + "/seg2")
    run_simulation(mid, params, NVE(), total_steps=20, frequency=10,
                   pathname=path + "/seg2")
    lines = open(os.path.join(path, "seg2", "thermo.txt")).read().splitlines()
    labels = [int(l.split()[0]) for l in lines[1:]]
    assert labels == [20, 30]
    traj = open(os.path.join(path, "seg2", "trajectory.xyz")).read()
    assert traj.count("ITEM: TIMESTEP") == 2


def test_driver_rejects_forced_f32x2_off_slot_path(small_system, tmp_path):
    """precision='f32x2' forced with an engine that cannot take the slot
    fast path must raise (before any output truncation), not silently run
    the plain sweep."""
    state, params, _ = small_system
    eng = NaivePairEngine(potential=params.potential, cutoff=1.5)
    with pytest.raises(ValueError, match="f32x2"):
        run_simulation(state, params, NVE(), 10, 10, str(tmp_path / "r"),
                       engine=eng, precision="f32x2")


def test_output_rows_travel_as_f32(small_system):
    """Trajectory/snapshot row payloads are cast to f32 on device for EVERY
    state dtype: the text writers print %.6f, so f64 rows would ship twice
    the bytes their output can express (the payload is the event-loop
    throughput floor on the remote tunnel). Round-trip accuracy stays
    within the f32/%.6f contract."""
    from mdtpu.integrate.slot_step import slot_forces, slotify
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.pseudo_hs import PseudoHS
    from mdtpu.sim.driver import _pack_output_rows, _unpack_output_rows

    from mdtpu.sim.initialization import lattice_fluid_state

    n = 512  # big enough box for a cell grid at cutoff 1.5
    state = lattice_fluid_state(n, 0.3, 1.0, dtype=jnp.float64, cutoff=1.5)
    assert state.positions.dtype == jnp.float64

    rows = _pack_output_rows(state, False, n)
    assert rows.dtype == jnp.float32
    out = _unpack_output_rows(rows)
    np.testing.assert_allclose(out["positions"],
                               np.asarray(state.positions), atol=1e-5)
    np.testing.assert_array_equal(out["images"], np.asarray(state.images))

    eng = CellGridEngine.create(PseudoHS(), 1.5, 0.3,
                                np.asarray(state.unitcell), n)
    st = slot_forces(slotify(state, eng), eng)
    rows = _pack_output_rows(st, True, n)
    assert rows.dtype == jnp.float32
    assert rows.shape == (2 * 3, n)  # particle-ordered on device, no ids
    out = _unpack_output_rows(rows)
    np.testing.assert_allclose(out["positions"],
                               np.asarray(state.positions), atol=1e-5)


def test_slot_overflow_recovery_with_pipelined_lookahead(tmp_path):
    """Overflow detected while the NEXT batch is already dispatched (the
    driver's one-batch dispatch-ahead): completing the overflowing batch
    re-runs it with grown capacity and the stale next-batch dispatch is
    replayed from the corrected state — thermo rows must stay continuous
    (each label exactly once, in order) and no particle may be lost."""
    state, params, tight, n_steps = _tight_overflow_setup(tmp_path)
    n = state.n_particles
    total = n_steps + 600  # several batches beyond the overflow point
    with pytest.warns(UserWarning, match="capacity overflow"):
        out = run_simulation(state, params, NVE(), total, 40,
                             str(tmp_path / "look"), engine=tight)
    assert out.positions.shape == (n, 3)
    assert np.isfinite(np.asarray(out.positions)).all()
    rows = np.loadtxt(os.path.join(tmp_path, "look", "thermo.txt"))
    assert np.isfinite(rows).all()
    assert list(rows[:, 0].astype(int)) == list(range(0, total, 40))
