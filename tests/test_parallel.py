"""Sharded (multi-device) path vs single-device path on an 8-virtual-device
CPU mesh — the substitute for the reference's threads-vs-serial equivalence
(SURVEY.md section 4, item 3).

The production sharded path (slot-layout halo engine) is exercised in
tests/test_halo_slot.py; this file covers the public sharded DRIVER
contracts plus one regression test per superseded engine in
mdtpu.parallel.experimental (the record of the paths the slot engine
replaced — see that package's docstring for the measured reasons)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVE, NVT, Brownian, Parameters
from mdtpu.integrate.step import make_step
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.parallel.experimental import (
    make_shard_map_step,
    make_sharded_step,
    shard_state,
)
from mdtpu.parallel.mesh import make_mesh
from mdtpu.potentials.lennard_jones import LennardJones
from tests.test_dynamics import _with_forces, make_fluid_state


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(8)


def _base(n=128):
    state = make_fluid_state(n=n, rho=0.4, temp=0.75, dtype=jnp.float64)
    pot = LennardJones(r_cut=2.5, force_shift=True)
    params = Parameters(density=0.4, n_particles=n, dt=0.002, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=2.5)
    return _with_forces(state, engine), params, engine


# ------------------------------------------------------------------ driver
# run_simulation_sharded is slot-only; these tests pin its public contracts
# (the slot engine's physics itself is pinned in test_halo_slot.py).


def _read_lammps_frames(path):
    """Parse a LAMMPS dump file into a list of (step, atoms-array) with the
    atom rows sorted by id column."""
    frames = []
    blocks = open(path).read().split("ITEM: TIMESTEP\n")[1:]
    for b in blocks:
        lines = b.splitlines()
        step = int(lines[0])
        i = next(k for k, l in enumerate(lines) if l.startswith("ITEM: ATOMS"))
        rows = np.asarray([[float(x) for x in l.split()]
                           for l in lines[i + 1:] if l.strip()])
        frames.append((step, rows[np.argsort(rows[:, 0])]))
    return frames


def test_run_simulation_sharded_default_engine(mesh, tmp_path):
    """End-to-end sharded driver with NO engine argument (the default
    tuned slot engine) vs the single-device driver: thermo rows,
    ids-ordered LAMMPS trajectory frames, final.xyz and the returned
    particle-order state must all match (output parity, the contract of
    /root/reference/src/simulation.jl:118-171)."""
    import os

    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.sim.driver import run_simulation

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    cell_np = np.asarray(state.unitcell)

    ref_eng = CellGridEngine.create(pot, 1.5, 0.3, cell_np, n)
    ref_final = run_simulation(state, params, NVE(), total_steps=30,
                               frequency=10, pathname=str(tmp_path / "ref"),
                               engine=ref_eng)

    final = run_simulation_sharded(
        state, params, NVE(), total_steps=30, frequency=10,
        pathname=str(tmp_path / "sh"), mesh=mesh)

    ref_rows = open(tmp_path / "ref" / "thermo.txt").read().splitlines()[1:]
    sh_rows = open(tmp_path / "sh" / "thermo.txt").read().splitlines()[1:]
    assert len(sh_rows) == len(ref_rows) == 3
    for a, b in zip(sh_rows, ref_rows):
        fa, fb = [float(x) for x in a.split()], [float(x) for x in b.split()]
        assert fa[0] == fb[0]
        np.testing.assert_allclose(fa[1:], fb[1:], rtol=2e-5, atol=2e-5)

    # Trajectory frames: same steps, same per-particle rows (original
    # particle order survives migration via the carried ids).
    ref_frames = _read_lammps_frames(tmp_path / "ref" / "trajectory.xyz")
    sh_frames = _read_lammps_frames(tmp_path / "sh" / "trajectory.xyz")
    assert [s for s, _ in sh_frames] == [s for s, _ in ref_frames] == [0, 10, 20]
    for (_, a), (_, b) in zip(sh_frames, ref_frames):
        np.testing.assert_array_equal(a[:, 0], b[:, 0])  # ids
        np.testing.assert_allclose(a[:, 1:], b[:, 1:], rtol=1e-5, atol=1e-5)

    # Returned state: particle order, same contract as run_simulation.
    assert final.positions.shape == (n, 3) and final.ids is None
    np.testing.assert_allclose(np.asarray(final.positions),
                               np.asarray(ref_final.positions),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(final.velocities),
                               np.asarray(ref_final.velocities),
                               rtol=1e-7, atol=1e-8)
    assert os.path.isfile(tmp_path / "sh" / "final.xyz")


def test_run_simulation_sharded_nvt_and_brownian(mesh, tmp_path):
    """NVT (psum'd Bussi kinetic across slabs) and Brownian through the
    sharded driver end-to-end."""
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.sim.driver import run_simulation

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    cell_np = np.asarray(state.unitcell)
    ref_eng = CellGridEngine.create(pot, 1.5, 0.3, cell_np, n)

    # NVT: same physics as the single-device driver (replicated key -> same
    # Bussi noise; kinetic reduction via psum) to reduction tolerance.
    run_simulation(state, params, NVT(0.75, 0.2), 30, 10,
                   str(tmp_path / "nvt_ref"), engine=ref_eng)
    run_simulation_sharded(state, params, NVT(0.75, 0.2), 30, 10,
                           str(tmp_path / "nvt_sh"), mesh=mesh)
    ref = np.loadtxt(tmp_path / "nvt_ref" / "thermo.txt")
    sh = np.loadtxt(tmp_path / "nvt_sh" / "thermo.txt")
    np.testing.assert_allclose(sh, ref, rtol=2e-5, atol=2e-5)

    # Brownian: noise is drawn per shard slab (different realization from
    # single-device; the statistical gate is
    # test_halo_slot.py::test_sharded_brownian_msd_matches_diffusion), so
    # assert the driver contract: T == ktemp rows, finite thermo, all
    # particles present, small displacements.
    bp = str(tmp_path / "brownian")
    params_b = Parameters(density=rho, n_particles=n, dt=1e-5, potential=pot)
    outb = run_simulation_sharded(state, params_b, Brownian(1.0), 30, 10, bp,
                                  mesh=mesh)
    rows = np.loadtxt(bp + "/thermo.txt")
    assert np.isfinite(rows).all()
    np.testing.assert_allclose(rows[:, 2], 1.0)
    assert outb.positions.shape == (n, 3)
    d = np.abs(np.asarray(outb.positions) - np.asarray(state.positions))
    L = float(state.unitcell[0, 0])
    d = np.minimum(d, L - d)
    assert float(d.max()) < 0.5


def test_sharded_decoupled_cadence_no_extra_steps(mesh, tmp_path):
    """Batches of thermo events between trajectory events do NOT pad to
    bucket sizes for collective-bearing engines: a zero-length pad segment
    would run the (unconditional) final full step and silently advance the
    physics past the host's step bookkeeping (regression: 65-step run came
    back at step 67). Also pins thermo step labels and row-for-row parity
    vs the single-device driver at the same decoupled cadence."""
    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.sim.driver import run_simulation
    from mdtpu.ops.cell_grid import CellGridEngine

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)

    # frequency=10, traj_frequency=30, total=65: the (10, 20, 30) and
    # (40, 50, 60) event groups are K=3 batches (bucket 4 would pad).
    out = run_simulation_sharded(state, params, NVE(), 65, 10,
                                 str(tmp_path / "sh"), mesh=mesh,
                                 traj_frequency=30)
    assert int(out.step) == 65

    ref_eng = CellGridEngine.create(pot, 1.5, 0.3,
                                    np.asarray(state.unitcell), n)
    run_simulation(state, params, NVE(), 65, 10, str(tmp_path / "ref"),
                   engine=ref_eng, traj_frequency=30, precision="plain")
    sh = np.loadtxt(tmp_path / "sh" / "thermo.txt")
    ref = np.loadtxt(tmp_path / "ref" / "thermo.txt")
    np.testing.assert_array_equal(sh[:, 0], ref[:, 0])  # step labels
    np.testing.assert_allclose(sh[:, 1:], ref[:, 1:], rtol=2e-5, atol=2e-5)


def test_sharded_checkpoints_unaligned_cadence(mesh, tmp_path):
    """checkpoint_every not aligned with the thermo cadence must still write
    every requested checkpoint (checkpoints are their own events, same
    contract as _drive_events), and perf_log must produce perf.txt instead
    of being silently ignored."""
    import os

    from mdtpu.parallel.driver import run_simulation_sharded

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    p = str(tmp_path / "run")
    run_simulation_sharded(state, params, NVE(), 30, 10, p, mesh=mesh,
                           checkpoint_every=7, perf_log=True)
    for s in (0, 7, 14, 21, 28):
        assert os.path.isfile(os.path.join(p, f"checkpoint.{s}.npz")), s
    assert os.path.isfile(os.path.join(p, "perf.txt"))


def test_sharded_driver_rejects_experimental_engines(mesh, tmp_path):
    """The public sharded driver is slot-only: passing a superseded
    experimental engine must raise loudly (pointing at the experimental
    package), not silently fall back."""
    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.parallel.experimental import HaloCellGridEngine

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    halo = HaloCellGridEngine.create(pot, 1.5, 0.3,
                                     np.asarray(state.unitcell), n,
                                     n_shards=8)
    with pytest.raises(TypeError, match="experimental"):
        run_simulation_sharded(state, params, NVE(), 10, 10,
                               str(tmp_path / "r"), mesh=mesh, engine=halo)


def test_sharded_uniform_sigma_mismatch_reaches_user(mesh, tmp_path):
    """A uniform-sigma engine driven with polydisperse diameters must raise
    slotify's explanatory error, not burn 8 capacity grows and report
    'cell capacity still overflowing' (grow-and-retry catches only
    CapacityOverflowError now)."""
    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.parallel.halo_slot import HaloSlotEngine

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      n, n_shards=8,
                                      diameters=np.ones(n))
    poly = state.replace(diameters=jnp.full(n, 1.1, jnp.float64))
    with pytest.raises(ValueError, match="uniform_sigma"):
        run_simulation_sharded(poly, params, NVE(), 10, 10,
                               str(tmp_path / "r"), mesh=mesh, engine=eng)


# ------------------------------------------------------- experimental record
# One regression test per superseded engine (mdtpu.parallel.experimental):
# the paths the slot-layout halo engine replaced stay correct as long as
# they stay in the tree.


def test_gspmd_sharded_step_matches_single_device(mesh):
    state, params, engine = _base()
    ref_step = jax.jit(make_step(params, NVE(), engine))
    ref = state
    for _ in range(20):
        ref = ref_step(ref)

    sh = shard_state(state, mesh)
    sh_step = make_sharded_step(params, NVE(), engine, mesh, donate=False)
    for _ in range(20):
        sh = sh_step(sh)

    np.testing.assert_allclose(np.asarray(sh.positions), np.asarray(ref.positions),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy), rtol=1e-12)


def test_shard_map_step_matches_single_device_nve(mesh):
    state, params, engine = _base()
    ref_step = jax.jit(make_step(params, NVE(), engine))
    ref = state
    for _ in range(20):
        ref = ref_step(ref)

    sh = shard_state(state.replace(nbrs=None), mesh)
    sm_step = make_shard_map_step(params, NVE(), engine, mesh)
    for _ in range(20):
        sh = sm_step(sh)
        jax.block_until_ready(sh)  # 1-core CPU collectives: avoid deep async queues

    np.testing.assert_allclose(np.asarray(sh.positions), np.asarray(ref.positions),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-9)
    np.testing.assert_allclose(float(sh.virial), float(ref.virial), rtol=1e-9)


def test_halo_cell_grid_matches_single_device(mesh):
    """Row-layout HaloCellGridEngine (x-plane domain decomposition +
    ppermute halos, HOST resharding cadence) vs the single-device cell-grid
    engine: identical NVE physics. Kept as the experimental record — the
    production sharded engine is the slot-layout HaloSlotEngine."""
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.parallel.experimental.halo import (HaloCellGridEngine,
                                                  allocate_sharded,
                                                  pad_state, reshard)

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)

    cell_np = np.asarray(state.unitcell)
    ref_eng = CellGridEngine.create(pot, 1.5, 0.3, cell_np, n)
    ref_state = _with_forces(state, ref_eng)
    ref_step = jax.jit(make_step(params, NVE(), ref_eng))
    ref = ref_state
    ref_energies = []
    for _ in range(10):
        ref = ref_step(ref)
        ref_energies.append(float(ref.energy))

    halo = HaloCellGridEngine.create(pot, 1.5, 0.3, cell_np, n, n_shards=8)
    assert halo.grid[0] % 8 == 0
    # same initial forces as the reference run (the first half-kick uses them)
    padded, ovf = reshard(pad_state(ref_state.replace(nbrs=None), halo), halo)
    assert not bool(ovf)
    sh = allocate_sharded(shard_state(padded, mesh), halo, mesh)
    sm_step = make_shard_map_step(params, NVE(), halo, mesh,
                                  state_cutoff=1.5)
    energies = []
    for _ in range(10):
        sh = sm_step(sh)
        jax.block_until_ready(sh)
        energies.append(float(sh.energy))

    assert not bool(sh.nbrs.overflow)
    np.testing.assert_allclose(energies, ref_energies, rtol=1e-9)
    np.testing.assert_allclose(float(sh.virial), float(ref.virial), rtol=1e-9)
    np.testing.assert_allclose(float(sh.temperature), float(ref.temperature),
                               rtol=1e-9)
    # Per-particle forces agree after matching rows by position. Pad rows
    # are identified by their trash slot address (their coordinates get
    # wrapped into the box by the integrator).
    trash = halo.mx * halo.grid[1] * halo.grid[2] * halo.cell_capacity
    real = np.asarray(sh.nbrs.addr) < trash
    pos_sh = np.asarray(sh.positions)[real]
    f_sh = np.asarray(sh.forces)[real]
    pos_ref = np.asarray(ref.positions)
    f_ref = np.asarray(ref.forces)
    order_sh = np.lexsort(pos_sh.T)
    order_ref = np.lexsort(pos_ref.T)
    np.testing.assert_allclose(pos_sh[order_sh], pos_ref[order_ref],
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(f_sh[order_sh], f_ref[order_ref],
                               rtol=1e-7, atol=1e-9)


def test_halo_reshard_roundtrip(mesh):
    """reshard places every particle in its owner slab and preserves the
    particle set; pad rows stay far."""
    from mdtpu.parallel.experimental.halo import (HaloCellGridEngine,
                                                  pad_state, reshard,
                                                  _FAR_THRESHOLD)

    n, rho = 900, 0.3
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    halo = HaloCellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell),
                                     n, n_shards=8)
    padded = pad_state(state, halo)
    out, ovf = reshard(padded, halo)
    assert not bool(ovf)
    pos = np.asarray(out.positions)
    valid = pos[:, 0] < _FAR_THRESHOLD
    assert valid.sum() == n
    # particle multiset preserved
    a = np.sort(np.asarray(state.positions), axis=0)
    b = np.sort(pos[valid], axis=0)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    # each slab's particles are in its x-plane range
    n_loc = out.positions.shape[0] // 8
    nx, mx = halo.grid[0], halo.mx
    L = float(state.unitcell[0, 0])
    for p in range(8):
        rows = slice(p * n_loc, (p + 1) * n_loc)
        v = valid[rows]
        ix = np.clip((pos[rows][v][:, 0] / L * nx).astype(int), 0, nx - 1)
        assert ((ix // mx) == p).all()
