"""Slot-space hot loop vs the ordinary particle-order step: identical
physics, including across in-loop rebins (small skin forces several)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVE, NVT, Brownian, Parameters
from mdtpu.integrate.slot_step import (
    make_slot_step,
    slotify,
    unslotify_arrays,
)
from mdtpu.integrate.step import make_step
from mdtpu.ops.cell_grid import CellGridEngine
from mdtpu.potentials.lennard_jones import LennardJones
from tests.test_dynamics import _with_forces, make_fluid_state


def _setup(n=768, rho=0.5, skin=0.15):
    state = make_fluid_state(n=n, rho=rho, temp=1.0, dtype=jnp.float64,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    eng = CellGridEngine.create(pot, 1.5, skin, np.asarray(state.unitcell), n)
    state = _with_forces(state, eng)
    return state, params, eng


def _slot_with_forces(state, eng):
    from mdtpu.integrate.slot_step import slot_forces

    return slot_forces(slotify(state, eng), eng)


@pytest.mark.parametrize("ensemble", [NVE(), NVT(1.0, 0.2)])
def test_slot_step_matches_particle_step(ensemble):
    state, params, eng = _setup()
    ref_step = jax.jit(make_step(params, ensemble, eng))
    slot_step = jax.jit(make_slot_step(params, ensemble, eng))
    sl = _slot_with_forces(state, eng)

    ref = state
    for _ in range(150):  # skin 0.15 forces several rebins along the way
        ref = ref_step(ref)
        sl = slot_step(sl)

    assert not bool(sl.nbrs.overflow)
    np.testing.assert_allclose(float(sl.energy), float(ref.energy),
                               rtol=1e-9)
    np.testing.assert_allclose(float(sl.temperature), float(ref.temperature),
                               rtol=1e-9)
    pos_s, vel_s, _, _ = unslotify_arrays(sl)
    pos_r = np.asarray(ref.positions)
    o_s, o_r = np.lexsort(pos_s.T), np.lexsort(pos_r.T)
    np.testing.assert_allclose(pos_s[o_s], pos_r[o_r], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(vel_s[o_s], np.asarray(ref.velocities)[o_r],
                               rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("ensemble", [NVE(), NVT(1.0, 0.2)])
def test_slot_advance_matches_per_step_cond(ensemble):
    # The nested-while advance (rebin hoisted out of the step) must be
    # step-for-step identical to the per-step lax.cond form — rebuilds fire
    # at the start of exactly the same steps.
    from mdtpu.integrate.slot_step import make_slot_advance

    state, params, eng = _setup()
    slot_step = jax.jit(make_slot_step(params, ensemble, eng))
    advance = jax.jit(make_slot_advance(params, ensemble, eng),
                      static_argnums=())
    sl_ref = _slot_with_forces(state, eng)
    sl_adv = advance(sl_ref, 150)   # skin 0.15: several rebins inside
    for _ in range(150):
        sl_ref = slot_step(sl_ref)

    assert int(sl_adv.step) == int(sl_ref.step)
    np.testing.assert_array_equal(np.asarray(sl_adv.positions),
                                  np.asarray(sl_ref.positions))
    np.testing.assert_array_equal(np.asarray(sl_adv.velocities),
                                  np.asarray(sl_ref.velocities))
    np.testing.assert_array_equal(np.asarray(sl_adv.nbrs.occupied),
                                  np.asarray(sl_ref.nbrs.occupied))
    np.testing.assert_array_equal(np.asarray(sl_adv.energy),
                                  np.asarray(sl_ref.energy))


def test_slot_step_brownian_runs_and_pads_stay_far():
    state, params, eng = _setup()
    # Overdamped dynamics needs a much smaller dt than inertial MD for a
    # steep potential (same choice as the particle-order Brownian tests).
    params = params.replace(dt=1e-5)
    slot_step = jax.jit(make_slot_step(params, Brownian(1.0), eng))
    sl = _slot_with_forces(state, eng)
    n_real = int(np.asarray(sl.nbrs.occupied).sum())
    for _ in range(30):
        sl = slot_step(sl)
    assert int(sl.step) == 30
    assert int(sl.nprom) == 3
    occ = np.asarray(sl.nbrs.occupied)
    pos = np.asarray(sl.positions).T  # (n_slots, d)
    # vacant rows never moved or wrapped into the box
    assert (pos[~occ][:, 0] > 1e5).all()
    assert occ.sum() == n_real
    assert np.all(np.isfinite(pos[occ]))


def test_slot_step_polydisperse_matches_particle_step():
    # Diameters ride the packed rebin scatter; with sigma=1 a mix-up would be
    # invisible — use a genuinely polydisperse fluid and force rebins.
    from tests.test_dynamics import make_fluid_state

    n = 600
    state = make_fluid_state(n=n, rho=0.4, temp=0.8, dtype=jnp.float64,
                             cutoff=1.5)
    key = jax.random.PRNGKey(77)
    diam = 0.8 + 0.4 * jax.random.uniform(key, (n,), dtype=jnp.float64)
    state = state.replace(diameters=diam)
    pot = LennardJones(r_cut=1.5)   # lorentz mixing: diameters matter
    params = Parameters(density=0.4, n_particles=n, dt=0.002, potential=pot)
    eng = CellGridEngine.create(pot, 1.5, 0.15, np.asarray(state.unitcell), n)
    state = _with_forces(state, eng)

    ref_step = jax.jit(make_step(params, NVT(0.8, 0.2), eng))
    sl = _slot_with_forces(state, eng)
    from mdtpu.integrate.slot_step import make_slot_advance, unslotify_state
    advance = jax.jit(make_slot_advance(params, NVT(0.8, 0.2), eng))

    ref = state
    for _ in range(120):
        ref = ref_step(ref)
    sl = advance(sl, 120)
    out = unslotify_state(sl)

    # unslotify restores ORIGINAL particle order: compare row-for-row.
    np.testing.assert_allclose(np.asarray(out.diameters), np.asarray(diam),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(ref.positions), rtol=1e-8,
                               atol=1e-9)
    np.testing.assert_allclose(float(sl.energy), float(ref.energy), rtol=1e-9)


def test_slot_advance_with_temperature_ramp():
    # NVT whose ktemp is a schedule of the (1-indexed) step — through the
    # slot advance it must hit the same per-step targets as the particle
    # step (ramps are how quenches plug in).
    from mdtpu.integrate.ramps import LinearRamp
    from mdtpu.integrate.slot_step import make_slot_advance

    state, params, eng = _setup()
    ramp = LinearRamp(1.0, 0.25, 100)
    ref_step = jax.jit(make_step(params, NVT(ramp, 0.05), eng))
    advance = jax.jit(make_slot_advance(params, NVT(ramp, 0.05), eng))

    sl = _slot_with_forces(state, eng)
    ref = state
    for _ in range(100):
        ref = ref_step(ref)
    sl = advance(sl, 100)
    np.testing.assert_allclose(float(sl.temperature), float(ref.temperature),
                               rtol=1e-9)
    # 100 steps at tau=0.05 only partially equilibrates; the exact-match
    # assertion above is the real test — this just confirms cooling happened.
    assert float(sl.temperature) < 0.6
