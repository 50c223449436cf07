"""Uniform-sigma fast path: engines created with ``diameters=`` on a
monodisperse system hoist the Lorentz mixing out of the pair sweep (no
diameter windows, scalar constant sigma). Must be numerically identical
to the array-diameter path in every sweep — the reference mixes sigmas
per pair unconditionally (/root/reference/src/pairwise.jl:31), so this
is a pure implementation freedom with no physics latitude."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVE, NVT, Parameters
from mdtpu.integrate.slot_step import (
    make_slot_advance,
    slot_forces,
    slotify,
    unslotify_state,
)
from mdtpu.ops.cell_grid import CellGridEngine, uniform_sigma_of
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from tests.test_dynamics import make_fluid_state
from tests.test_engines import random_fluid


def test_uniform_sigma_of():
    assert uniform_sigma_of(None) == 0.0
    assert uniform_sigma_of(np.ones(7)) == 1.0
    assert uniform_sigma_of(np.full(5, 1.3)) == pytest.approx(1.3)
    assert uniform_sigma_of(np.array([1.0, 1.1])) == 0.0
    assert uniform_sigma_of(np.array([])) == 0.0


def test_create_detects_uniform_diameters():
    cell = np.eye(3) * 12.0
    pot = LennardJones(r_cut=1.5)
    eng = CellGridEngine.create(pot, 1.5, 0.3, cell, 500,
                                diameters=np.ones(500))
    assert eng.uniform_sigma == 1.0
    eng = CellGridEngine.create_tuned(pot, 1.5, cell, 500,
                                      diameters=np.ones(500) * 1.2)
    # max_sigma widened from the diameters: cutoff check must have used 1.2
    assert eng.uniform_sigma == pytest.approx(1.2)
    poly = np.linspace(0.8, 1.2, 500)
    eng = CellGridEngine.create(pot, 1.5, 0.3, cell, 500, diameters=poly)
    assert eng.uniform_sigma == 0.0


@pytest.mark.parametrize("d,pot", [
    (3, LennardJones(r_cut=1.5)),
    (3, PseudoHS()),
    (2, LennardJones(r_cut=1.5)),
])
def test_row_compute_matches_array_diameters(d, pot):
    key = jax.random.PRNGKey(5)
    n = 420
    pos, cell = random_fluid(key, n, 0.5, d)
    diam = jnp.ones(n, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)

    plain = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n)
    uni = plain.replace(uniform_sigma=1.0)
    nbrs = plain.allocate(pos, diam, cell, cell_inv)
    e0, w0, f0, _ = plain.compute(pos, diam, cell, cell_inv, nbrs)
    e1, w1, f1, _ = uni.compute(pos, diam, cell, cell_inv, nbrs)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e0))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w0))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0))


@pytest.mark.parametrize("plane_scan", [False, True])
def test_slot_advance_matches_array_diameters(plane_scan):
    """Dense z-window and x-plane-scan sweeps through the slot hot loop,
    across rebins: identical trajectories with the flag on/off."""
    n = 768
    state = make_fluid_state(n=n, rho=0.5, temp=1.0, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=0.5, n_particles=n, dt=0.002, potential=pot)
    plain = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell),
                                  n).replace(plane_scan=plane_scan)
    uni = plain.replace(uniform_sigma=1.0)

    outs = []
    for eng in (plain, uni):
        sl = slot_forces(slotify(state, eng), eng)
        adv = jax.jit(make_slot_advance(params, NVT(1.0, 0.2), eng))
        sl = adv(sl, 60)   # always crosses a rebin at liquid T
        assert not bool(np.asarray(sl.nbrs.overflow).any())
        outs.append(unslotify_state(sl))
    np.testing.assert_array_equal(np.asarray(outs[1].positions),
                                  np.asarray(outs[0].positions))
    np.testing.assert_array_equal(np.asarray(outs[1].velocities),
                                  np.asarray(outs[0].velocities))


def test_slot_hilo_matches_array_diameters():
    """The f32x2 hi/lo precision sweep composes with uniform sigma."""
    n = 600
    state = make_fluid_state(n=n, rho=0.5, temp=1.0, dtype=jnp.float32,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=0.5, n_particles=n,
                        dt=jnp.float32(0.002), potential=pot)
    plain = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell),
                                  n)
    uni = plain.replace(uniform_sigma=1.0)
    outs = []
    for eng in (plain, uni):
        sl = slot_forces(slotify(state, eng), eng)
        adv = jax.jit(make_slot_advance(params, NVE(), eng, hilo=True))
        sl = adv(sl, 40)
        outs.append(unslotify_state(sl))
    np.testing.assert_array_equal(np.asarray(outs[1].positions),
                                  np.asarray(outs[0].positions))
    np.testing.assert_array_equal(np.asarray(outs[1].velocities),
                                  np.asarray(outs[0].velocities))


def test_slotify_raises_on_diameter_mismatch():
    n = 500
    state = make_fluid_state(n=n, rho=0.5, temp=1.0, dtype=jnp.float64,
                             cutoff=1.5)
    state = state.replace(
        diameters=jnp.linspace(0.8, 1.2, n, dtype=jnp.float64))
    pot = LennardJones(r_cut=1.8)
    eng = CellGridEngine.create(pot, 1.8, 0.3, np.asarray(state.unitcell),
                                n).replace(uniform_sigma=1.0)
    with pytest.raises(ValueError, match="uniform_sigma"):
        slotify(state, eng)


def test_halo_slot_uniform_matches_single_chip():
    """Sharded sweep with the smaller (diameter-free) ppermute payload ==
    single-chip uniform sweep == single-chip array sweep."""
    from mdtpu.parallel.halo_slot import (
        HaloSlotEngine,
        build_sharded_slot_state,
        make_sharded_slot_advance,
        unshard_slot_state,
    )
    from mdtpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    n = 1200
    state = make_fluid_state(n=n, rho=0.4, temp=0.75, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=0.4, n_particles=n, dt=0.002, potential=pot)
    eng = HaloSlotEngine.create_tuned(
        pot, 1.5, np.asarray(state.unitcell), n, n_shards=8,
        diameters=np.ones(n))
    assert eng.uniform_sigma == 1.0
    single = eng.as_single_chip()
    assert single.uniform_sigma == 1.0
    plain_single = single.replace(uniform_sigma=0.0)

    ref = slot_forces(slotify(state, plain_single), plain_single)
    ref_adv = jax.jit(make_slot_advance(params, NVE(), plain_single))
    ref_out = unslotify_state(ref_adv(ref, 40))

    sh = build_sharded_slot_state(state, eng, mesh)
    adv = make_sharded_slot_advance(params, NVE(), eng, mesh, sh)
    sh = adv(sh, 40)
    jax.block_until_ready(sh.positions)
    assert not bool(np.asarray(sh.nbrs.overflow).any())
    out = unshard_slot_state(sh)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref_out.positions),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.velocities),
                               np.asarray(ref_out.velocities),
                               rtol=1e-8, atol=1e-9)
