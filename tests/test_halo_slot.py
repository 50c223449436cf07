"""Slot-space sharded halo engine vs the single-chip slot loop on the
8-virtual-device CPU mesh: the multi-chip production path must be the SAME
physics as the single-chip slot fast path (one choreography,
make_slot_step(axis_name=...))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVE, NVT, Brownian, Parameters
from mdtpu.integrate.slot_step import (
    make_slot_advance,
    slot_forces,
    slotify,
    unslotify_state,
)
from mdtpu.parallel.halo_slot import (
    HaloSlotEngine,
    build_sharded_slot_state,
    make_sharded_slot_advance,
    unshard_slot_state,
)
from mdtpu.parallel.mesh import make_mesh
from mdtpu.potentials.lennard_jones import LennardJones
from tests.test_dynamics import make_fluid_state


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def _system(n=1200, rho=0.4, temp=0.75):
    state = make_fluid_state(n=n, rho=rho, temp=temp, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    return state, params, pot


def test_halo_slot_geometry_matches_single_chip():
    state, params, pot = _system()
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    assert eng.grid[0] % 8 == 0
    single = eng.as_single_chip()
    assert single.grid == eng.grid
    assert single.cell_capacity == eng.cell_capacity


@pytest.mark.parametrize("ens_name", ["nve", "nvt"])
def test_halo_slot_advance_matches_single_chip(mesh, ens_name):
    """Sharded slot advance == single-chip slot advance with the SAME
    global geometry, through rebins (40 steps at liquid T always rebins),
    to reduction-order tolerance."""
    state, params, pot = _system()
    ens = NVE() if ens_name == "nve" else NVT(0.75, 0.2)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    single = eng.as_single_chip()

    ref = slot_forces(slotify(state, single), single)
    ref_adv = jax.jit(make_slot_advance(params, ens, single))
    ref = ref_adv(ref, 40)
    ref_out = unslotify_state(ref)

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, ens, eng, mesh, sh)
    sh = adv(sh, 40)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)

    assert int(sh.step) == 40
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.velocities),
                               np.asarray(ref_out.velocities),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-10)
    np.testing.assert_allclose(float(sh.virial), float(ref.virial),
                               rtol=1e-10)
    np.testing.assert_allclose(float(sh.temperature),
                               float(ref.temperature), rtol=1e-10)


def test_halo_slot_brownian_runs(mesh):
    state, params, pot = _system()
    params = Parameters(density=0.4, n_particles=state.n_particles, dt=1e-5,
                        potential=params.potential)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, Brownian(1.0), eng, mesh, sh)
    sh = adv(sh, 25)
    jax.block_until_ready(sh.positions)
    assert int(sh.step) == 25
    assert int(sh.nprom) == 3  # steps 0, 10, 20
    out = unshard_slot_state(sh)
    assert out.positions.shape == (state.n_particles, 3)
    assert np.isfinite(np.asarray(out.positions)).all()


def test_halo_slot_migration_stays_exact(mesh):
    """Rows migrate to the adjacent shard at every rebin (ppermute
    buffers), so a particle crossing slab boundaries — even drifting
    through SEVERAL slabs — keeps the sharded trajectory exact vs the
    single-chip slot loop, with no flag and no host reshard."""
    state, params, pot = _system(n=1200, rho=0.4)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    single = eng.as_single_chip()
    L = float(state.unitcell[0, 0])

    # Aim particle 0 along +x fast enough to traverse ~2 slabs over the
    # run (but gently enough for exact integration at this dt).
    v = np.array(state.velocities)
    v[0] = [2.2 * (L / 8) / (200 * 0.002), 0.0, 0.0]
    state = state.replace(velocities=jnp.asarray(v))

    ref = slot_forces(slotify(state, single), single)
    ref_adv = jax.jit(make_slot_advance(params, NVE(), single))
    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVE(), eng, mesh, sh)

    ref = ref_adv(ref, 200)
    sh = adv(sh, 200)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    ref_out = unslotify_state(ref)
    out = unshard_slot_state(sh)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=1e-8, atol=1e-8)
    # The walker actually crossed slabs.
    dx = (np.asarray(out.images)[0, 0] * L + np.asarray(out.positions)[0, 0]
          - float(state.positions[0, 0]))
    assert dx > L / 8


def test_run_simulation_sharded_slot_engine_output_parity(mesh, tmp_path):
    """run_simulation_sharded with the (default) slot-layout halo engine:
    thermo rows, ids-ordered trajectory frames, final state — all matching
    the single-device driver, with zero host resharding."""
    import os

    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.sim.driver import run_simulation
    from mdtpu.ops.cell_grid import CellGridEngine
    from tests.test_parallel import _read_lammps_frames

    n, rho = 1200, 0.4
    state = make_fluid_state(n=n, rho=rho, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    cell_np = np.asarray(state.unitcell)

    eng = HaloSlotEngine.create_tuned(pot, 1.5, cell_np, n, n_shards=8)
    ref_eng = eng.as_single_chip()
    ref_final = run_simulation(state, params, NVE(), 40, 20,
                               str(tmp_path / "ref"), engine=ref_eng)
    final = run_simulation_sharded(state, params, NVE(), 40, 20,
                                   str(tmp_path / "sh"), mesh=mesh,
                                   engine=eng, checkpoint_every=20)

    ref_rows = np.loadtxt(tmp_path / "ref" / "thermo.txt")
    sh_rows = np.loadtxt(tmp_path / "sh" / "thermo.txt")
    np.testing.assert_allclose(sh_rows, ref_rows, rtol=1e-7, atol=1e-7)

    ref_frames = _read_lammps_frames(tmp_path / "ref" / "trajectory.xyz")
    sh_frames = _read_lammps_frames(tmp_path / "sh" / "trajectory.xyz")
    assert [s for s, _ in sh_frames] == [s for s, _ in ref_frames]
    for (_, a), (_, b) in zip(sh_frames, ref_frames):
        np.testing.assert_array_equal(a[:, 0], b[:, 0])
        np.testing.assert_allclose(a[:, 1:], b[:, 1:], rtol=1e-5, atol=1e-5)

    assert final.positions.shape == (n, 3) and final.ids is None
    np.testing.assert_allclose(np.asarray(final.positions),
                               np.asarray(ref_final.positions),
                               rtol=1e-8, atol=1e-8)
    assert os.path.isfile(tmp_path / "sh" / "final.xyz")
    assert os.path.isfile(tmp_path / "sh" / "checkpoint.20.npz")

    # Checkpoint-resume splice through the sharded slot driver.
    from mdtpu.io.checkpoint import load_checkpoint

    restored = load_checkpoint(str(tmp_path / "sh" / "checkpoint.20.npz"),
                               state)
    cont = run_simulation_sharded(restored, params, NVE(), 19, 19,
                                  str(tmp_path / "cont"), mesh=mesh,
                                  engine=eng)
    assert int(cont.step) == 40
    e0 = float(final.energy) + 0.5 * float(jnp.sum(final.velocities ** 2))
    e1 = float(cont.energy) + 0.5 * float(jnp.sum(cont.velocities ** 2))
    assert abs(e1 - e0) / abs(e0) < 1e-6


def test_halo_slot_migration_capacity_overflow_flags(mesh):
    """More escapes than the fixed migration buffer holds must raise the
    per-shard flag (rows clamp to the edge plane, never dropped)."""
    state, params, pot = _system(n=1200, rho=0.4)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    eng = eng.replace(migration_capacity=1)  # absurdly tight
    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVT(0.75, 0.2), eng, mesh, sh)
    sh = adv(sh, 120)  # plenty of rebins; >1 boundary crosser guaranteed
    jax.block_until_ready(sh.positions)
    assert bool(np.asarray(sh.nbrs.overflow).any())
    # Nothing lost: every particle still present.
    occ = np.asarray(sh.nbrs.occupied)
    assert int(occ.sum()) == state.n_particles


def test_halo_slot_hilo_advance_matches_single_chip(mesh):
    """The f32x2 hi/lo pair sweep through the SHARDED engine (two_sum ghost
    shifts across the ppermute seam, hilo window exchange) matches the
    single-chip hilo slot advance. f32 forces at slab-boundary cells sum in
    a slightly different order (reaction planes arrive via ppermute), so
    equality is to f32 reduction-order tolerance, not bitwise."""
    state, params, pot = _system()
    state = jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype")
        and x.dtype == jnp.float64 else x, state)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    single = eng.as_single_chip()

    ref = slot_forces(slotify(state, single), single)
    ref_adv = jax.jit(make_slot_advance(params, NVE(), single, hilo=True))
    ref = ref_adv(ref, 40)
    ref_out = unslotify_state(ref)

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVE(), eng, mesh, sh, hilo=True)
    sh = adv(sh, 40)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)

    assert int(sh.step) == 40
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-4)


def test_sharded_brownian_msd_matches_diffusion(mesh, tmp_path):
    """Statistical gate for sharded Brownian dynamics: noise is keyed per
    (step, shard) and drawn per slot, so sharded-vs-single exactness is
    impossible BY DESIGN — instead the physics is pinned: free Brownian
    particles (epsilon = 0) through run_simulation_sharded must diffuse
    with MSD = 2 d D t (D = 1 in the reference's Ermak-McCammon units,
    sigma^2 = 2 dt per step, /root/reference/src/integrate.jl:66-83 +
    src/simulation.jl:212), across slab migrations."""
    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.core.box import unwrapped_positions
    from mdtpu.sim.initialization import build_state_from_arrays

    n, d, L = 2048, 3, 24.0
    dtype = jnp.float64
    key = jax.random.PRNGKey(11)
    cell = jnp.eye(d, dtype=dtype) * L
    pos = jax.random.uniform(key, (n, d), dtype=dtype) * L
    state = build_state_from_arrays(pos, jnp.ones(n, dtype), cell, key,
                                    dtype=dtype, cutoff=1.5)
    pot = LennardJones(epsilon=0.0, r_cut=1.5)
    params = Parameters(density=n / L ** 3, n_particles=n, dt=0.01,
                        potential=pot)
    nsteps = 200
    # Pre-grown capacity: free diffusion (no repulsion) produces Poisson
    # occupancy spikes the tuned estimate is deliberately tight against;
    # the driver WOULD recover (restore-and-rerun) but the suite stays
    # warning-free with the headroom.
    eng = HaloSlotEngine.create_tuned(
        pot, 1.5, np.asarray(cell), n, n_shards=8,
        diameters=np.ones(n)).with_grown_capacity()
    out = run_simulation_sharded(state, params, Brownian(1.0), nsteps, 100,
                                 str(tmp_path / "b"), mesh=mesh, engine=eng)
    end = np.asarray(unwrapped_positions(out.positions, out.images, cell))
    msd = np.mean(np.sum((end - np.asarray(pos)) ** 2, axis=1))
    expected = 2 * d * params.dt * nsteps
    assert abs(msd - expected) / expected < 0.05
    # The walkers really cross slabs (sqrt(2 D t) = 2.0 vs slab width 3.0).
    slab0 = np.clip(np.asarray(pos)[:, 0] / L * 8, 0, 7.999).astype(int)
    wrapped = np.asarray(out.positions)
    slab1 = np.clip(wrapped[:, 0] / L * 8, 0, 7.999).astype(int)
    assert int((slab0 != slab1).sum()) > n // 10


def test_halo_slot_triclinic_advance_matches_single_chip(mesh):
    """Sharded NVE in a TILTED (triclinic) box == the single-chip slot
    advance: the ghost image shifts on both ppermute seams use full cell
    vectors (halo_slot window exchange and the migration fold), so tilted
    cells must work identically — proven here, not by inspection
    (/root/reference/src/boundary.jl:7-17 is the general-cell wrap this
    generalizes)."""
    from mdtpu.sim.initialization import (build_state_from_arrays,
                                          initialize_velocities)

    key = jax.random.PRNGKey(31)
    n = 4096
    L = 24.0
    cell = jnp.asarray([[L, 3.0, 2.0],
                        [0.0, L, 4.0],
                        [0.0, 0.0, L]], jnp.float64)
    # Jittered FRACTIONAL lattice mapped through the tilted cell: overlap-
    # free start (uniform random draws overlap and blow up the dynamics).
    m = 16
    g = (jnp.arange(m, dtype=jnp.float64) + 0.5) / m
    frac = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"),
                     axis=-1).reshape(-1, 3)[:n]
    frac = frac + 0.02 / m * jax.random.uniform(
        key, (n, 3), dtype=jnp.float64, minval=-1.0, maxval=1.0)
    pos = frac @ cell.T
    state = build_state_from_arrays(pos, jnp.ones(n, jnp.float64), cell,
                                    jax.random.PRNGKey(1),
                                    dtype=jnp.float64, cutoff=1.5)
    state = state.replace(velocities=initialize_velocities(
        0.4, jax.random.PRNGKey(2), n, 3, dtype=jnp.float64))
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=n / float(jnp.linalg.det(cell)),
                        n_particles=n, dt=0.002, potential=pot)

    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(cell), n,
                                      n_shards=8)
    single = eng.as_single_chip()

    ref = slot_forces(slotify(state, single), single)
    ref_adv = jax.jit(make_slot_advance(params, NVE(), single))
    ref = ref_adv(ref, 40)
    ref_out = unslotify_state(ref)

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVE(), eng, mesh, sh)
    sh = adv(sh, 40)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)

    assert int(sh.step) == 40
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-10)
    np.testing.assert_allclose(float(sh.virial), float(ref.virial),
                               rtol=1e-10)


# ---------------------------------------------------------------- plane scan
# Large-N mode of the sharded engine: lax.scan over the LOCAL x-planes with
# the same halo ppermutes (the scan carry's final +x reaction plane IS the
# ghost payload). Must be the same physics as the single-chip plane-scan
# slot sweep (cell_grid.CellGridEngine.plane_scan), which is itself
# oracle-verified against the dense sweep.


def _scan_system(n=9600, rho=0.4, temp=0.75, dtype=jnp.float64):
    # Big enough box for a 16-plane grid, so each of the 8 shards owns
    # mx = 2 local planes (mx = 1 would degenerate the scan to a single
    # step and test nothing).
    state = make_fluid_state(n=n, rho=rho, temp=temp, dtype=dtype,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    return state, params, pot


def _scan_engine(pot, state, diameters=None):
    """Forced 16-plane geometry (the tuned cost model prefers fat 8-plane
    cells at this N, which would leave mx = 1) + plane_scan on."""
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8,
                                      diameters=diameters)
    L = float(state.unitcell[0, 0])
    eng = eng.replace(grid=(16, 16, 16), cell_capacity=8,
                      skin=L / 16 - 1.5, plane_scan=True)
    assert eng.mx == 2
    return eng


def test_halo_slot_plane_scan_matches_single_chip(mesh):
    """Sharded plane-scan advance == single-chip plane-scan slot advance
    (same global geometry) through rebins and migrations."""
    state, params, pot = _scan_system()
    eng = _scan_engine(pot, state)
    single = eng.as_single_chip()
    assert single.plane_scan

    ref = slot_forces(slotify(state, single), single)
    ref_adv = jax.jit(make_slot_advance(params, NVT(0.75, 0.2), single))
    ref = ref_adv(ref, 30)
    ref_out = unslotify_state(ref)

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVT(0.75, 0.2), eng, mesh, sh)
    sh = adv(sh, 30)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)

    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-10)
    np.testing.assert_allclose(float(sh.virial), float(ref.virial),
                               rtol=1e-10)


def test_halo_slot_plane_scan_hilo_matches_single_chip(mesh):
    """f32x2 hi/lo pair sweep composes with the sharded plane scan (the
    ghost plane's lo words ride the window ppermute; the scan applies no
    wrap shift of its own)."""
    state, params, pot = _scan_system(dtype=jnp.float32)
    eng = _scan_engine(pot, state)
    single = eng.as_single_chip()

    ref = slot_forces(slotify(state, single), single)
    ref = jax.jit(make_slot_advance(params, NVE(), single, hilo=True))(ref, 30)
    ref_out = unslotify_state(ref)

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVE(), eng, mesh, sh, hilo=True)
    sh = adv(sh, 30)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-4)


def test_halo_slot_plane_scan_polydisperse_forces_match(mesh):
    """Non-uniform diameters exercise the scan's own/window diameter plane
    indexing (the diameter window rides the halo ppermute payload)."""
    state, params, pot = _scan_system()
    key = jax.random.PRNGKey(7)
    diam = 1.0 + 0.1 * jax.random.uniform(key, (state.n_particles,),
                                          dtype=jnp.float64)
    state = state.replace(diameters=diam)
    eng = _scan_engine(pot, state, diameters=np.asarray(diam))
    assert eng.uniform_sigma == 0.0
    single = eng.as_single_chip()

    ref = slot_forces(slotify(state, single), single)
    sh = build_sharded_slot_state(state, eng, mesh)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-10)
    out = unshard_slot_state(sh)
    ref_out = unslotify_state(ref)
    np.testing.assert_allclose(np.asarray(out.forces),
                               np.asarray(ref_out.forces),
                               rtol=1e-9, atol=1e-9)


def test_halo_slot_create_tuned_auto_switches_to_scan():
    """Per-shard dense tiles past ~120 MB must select the plane scan at
    creation time (the >=1M-particles-per-shard regime multi-chip exists
    for; same threshold as the single-chip create_tuned)."""
    from mdtpu.potentials.lennard_jones import LennardJones

    pot = LennardJones(r_cut=2.5)
    n = 8_000_000
    L = (n / 0.8) ** (1.0 / 3.0)
    eng = HaloSlotEngine.create_tuned(pot, 2.5, np.eye(3) * L, n, n_shards=8)
    assert eng.plane_scan
    assert eng.as_single_chip().plane_scan
    # Small systems stay dense.
    small = HaloSlotEngine.create_tuned(
        LennardJones(r_cut=1.5), 1.5, np.eye(3) * 14.42, 1200, n_shards=8)
    assert not small.plane_scan


# ----------------------------------------------------------------------- 2D
# The slot halo engine is dimension-generic (x-slab decomposition with
# y-windows; the reference is dimension-generic throughout,
# /root/reference/src/types.jl:15-32).


def _system2d(n=1200, rho=0.4, temp=0.75, dtype=jnp.float64):
    state = make_fluid_state(n=n, rho=rho, d=2, temp=temp, dtype=dtype,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    return state, params, pot


@pytest.mark.parametrize("ens_name", ["nve", "nvt"])
def test_halo_slot_2d_advance_matches_single_chip(mesh, ens_name):
    """2D sharded slot advance == single-chip 2D slot advance (same global
    geometry) through rebins, to reduction-order tolerance."""
    state, params, pot = _system2d()
    ens = NVE() if ens_name == "nve" else NVT(0.75, 0.2)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    assert len(eng.grid) == 2 and eng.grid[0] % 8 == 0
    single = eng.as_single_chip()

    ref = slot_forces(slotify(state, single), single)
    ref = jax.jit(make_slot_advance(params, ens, single))(ref, 40)
    ref_out = unslotify_state(ref)

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, ens, eng, mesh, sh)
    sh = adv(sh, 40)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)

    assert int(sh.step) == 40
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-10)
    np.testing.assert_allclose(float(sh.temperature),
                               float(ref.temperature), rtol=1e-10)


def test_halo_slot_2d_migration_stays_exact(mesh):
    """A 2D walker crossing several x-slab boundaries keeps the sharded
    trajectory exact vs the single-chip loop (on-device ppermute
    migration at every rebin, no flag, no host reshard)."""
    state, params, pot = _system2d()
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    single = eng.as_single_chip()
    L = float(state.unitcell[0, 0])
    slabw = L / 8

    # The 2D box is much wider than the 3D one at equal N, so collisions
    # stop a full-slab traverse; launch the particle sitting closest below
    # a slab boundary instead and require an actual boundary crossing.
    i0 = int(np.argmax(np.asarray(state.positions)[:, 0] % slabw))
    x0 = float(state.positions[i0, 0])
    v = np.array(state.velocities)
    v[i0] = [2.2 * slabw / (200 * 0.002), 0.0]
    state = state.replace(velocities=jnp.asarray(v))

    ref = slot_forces(slotify(state, single), single)
    ref = jax.jit(make_slot_advance(params, NVE(), single))(ref, 200)
    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVE(), eng, mesh, sh)
    sh = adv(sh, 200)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    ref_out = unslotify_state(ref)
    out = unshard_slot_state(sh)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=1e-8, atol=1e-8)
    xf = (np.asarray(out.images)[i0, 0] * L
          + np.asarray(out.positions)[i0, 0])
    assert np.floor(xf / slabw) != np.floor(x0 / slabw)


def test_halo_slot_2d_hilo_advance_matches_single_chip(mesh):
    """The f32x2 hi/lo sweep through the 2D sharded engine (two_sum ghost
    shifts across the ppermute seam) matches the single-chip 2D hilo
    advance to f32 reduction-order tolerance."""
    state, params, pot = _system2d()
    state = jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype")
        and x.dtype == jnp.float64 else x, state)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=8)
    single = eng.as_single_chip()

    ref = slot_forces(slotify(state, single), single)
    ref = jax.jit(make_slot_advance(params, NVE(), single, hilo=True))(ref, 40)
    ref_out = unslotify_state(ref)

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVE(), eng, mesh, sh, hilo=True)
    sh = adv(sh, 40)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-4)


def test_run_simulation_sharded_2d_output_parity(mesh, tmp_path):
    """The sharded driver accepts 2D states (default slot engine): thermo
    rows and ids-ordered trajectory frames match the single-device
    driver."""
    from mdtpu.parallel.driver import run_simulation_sharded
    from mdtpu.sim.driver import run_simulation
    from tests.test_parallel import _read_lammps_frames

    state, params, pot = _system2d()
    cell_np = np.asarray(state.unitcell)
    eng = HaloSlotEngine.create_tuned(pot, 1.5, cell_np, state.n_particles,
                                      n_shards=8)
    ref_final = run_simulation(state, params, NVE(), 40, 20,
                               str(tmp_path / "ref"),
                               engine=eng.as_single_chip())
    final = run_simulation_sharded(state, params, NVE(), 40, 20,
                                   str(tmp_path / "sh"), mesh=mesh,
                                   engine=eng)
    ref_rows = np.loadtxt(tmp_path / "ref" / "thermo.txt")
    sh_rows = np.loadtxt(tmp_path / "sh" / "thermo.txt")
    np.testing.assert_allclose(sh_rows, ref_rows, rtol=1e-7, atol=1e-7)
    ref_frames = _read_lammps_frames(tmp_path / "ref" / "trajectory.xyz")
    sh_frames = _read_lammps_frames(tmp_path / "sh" / "trajectory.xyz")
    assert [s for s, _ in sh_frames] == [s for s, _ in ref_frames]
    for (_, a), (_, b) in zip(sh_frames, ref_frames):
        np.testing.assert_array_equal(a[:, 0], b[:, 0])
        np.testing.assert_allclose(a[:, 1:], b[:, 1:], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final.positions),
                               np.asarray(ref_final.positions),
                               rtol=1e-8, atol=1e-8)
