"""Sharded (multi-device) path vs single-device path on an 8-virtual-device
CPU mesh — the substitute for the reference's threads-vs-serial equivalence
(SURVEY.md section 4, item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVE, NVT, Brownian, Parameters
from mdtpu.integrate.step import engine_forces, make_step
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.parallel.mesh import make_mesh
from mdtpu.parallel.sharded import (
    make_shard_map_step,
    make_sharded_step,
    shard_state,
)
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


def test_shard_map_step_nvt_controls_temperature(mesh):
    state, params, engine = _base()
    sm_step = make_shard_map_step(params, NVT(0.75, 0.2), engine, mesh)
    sh = shard_state(state.replace(nbrs=None), mesh)
    for _ in range(100):
        sh = sm_step(sh)
        jax.block_until_ready(sh)
    assert abs(float(sh.temperature) - 0.75) < 0.3


def test_shard_map_step_brownian_runs(mesh):
    state, params, engine = _base()
    sm_step = make_shard_map_step(params, Brownian(1.0), engine, mesh)
    sh = shard_state(state.replace(nbrs=None), mesh)
    for _ in range(15):
        sh = sm_step(sh)
        jax.block_until_ready(sh)
    assert int(sh.step) == 15
    assert int(sh.nprom) == 2  # steps 0 and 10
    assert np.all(np.isfinite(np.asarray(sh.positions)))


def test_shard_map_step_nvt_matches_single_device(mesh):
    """The sharded NVT step must be the SAME physics as the single-device
    step — one Bussi implementation, global kinetic via psum, identical
    (replicated-key) noise draws — so trajectories agree to reduction-order
    tolerance. Much stronger than a mean-temperature band."""
    state, params, engine = _base()
    ref_step = jax.jit(make_step(params, NVT(0.75, 0.2), engine))
    ref = state
    for _ in range(30):
        ref = ref_step(ref)

    sh = shard_state(state.replace(nbrs=None), mesh)
    sm_step = make_shard_map_step(params, NVT(0.75, 0.2), engine, mesh)
    for _ in range(30):
        sh = sm_step(sh)
        jax.block_until_ready(sh)

    np.testing.assert_allclose(np.asarray(sh.velocities),
                               np.asarray(ref.velocities),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(sh.temperature), float(ref.temperature),
                               rtol=1e-9)
