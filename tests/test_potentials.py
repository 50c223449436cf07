"""Potential kernels vs closed forms and autodiff (SURVEY.md section 4, unit
tests: F = -dV/dr checked against jax.grad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import A_PARAM, B_PARAM, PseudoHS
from mdtpu.potentials.xplor import LennardJonesXPLOR, xplor_switch


def force_autodiff(pot, r, s1=1.0, s2=1.0):
    energy = lambda rr: pot.evaluate(rr, s1, s2)[0]
    return -jax.grad(energy)(r)


@pytest.mark.parametrize("pot,s1,s2,rs", [
    (PseudoHS(), 1.0, 1.0, [0.9, 0.95, 1.0, 1.01]),
    (PseudoHS(), 1.2, 0.8, [0.9, 0.95, 1.0]),
    (LennardJones(), 1.0, 1.0, [0.9, 1.0, 1.12, 1.5, 2.0, 2.4]),
    (LennardJones(shift=True), 1.0, 1.0, [1.0, 1.5, 2.4]),
    (LennardJones(force_shift=True), 1.0, 1.0, [1.0, 1.5, 2.4]),
    (LennardJonesXPLOR(r_on=2.0, r_cut=2.5), 1.0, 1.0, [1.0, 1.9, 2.1, 2.3, 2.45]),
])
def test_force_equals_minus_grad(pot, s1, s2, rs):
    for r in rs:
        r = jnp.asarray(r, jnp.float64)
        u, f = pot.evaluate(r, s1, s2)
        f_ad = force_autodiff(pot, r, s1, s2)
        np.testing.assert_allclose(f, f_ad, rtol=1e-8, atol=1e-10)


def test_pseudohs_matches_reference_form():
    # /root/reference/src/potentials.jl:16-29 at sigma = 1
    pot = PseudoHS()
    r = jnp.asarray(0.97, jnp.float64)
    lam = 50.0
    u_ref = A_PARAM * ((1 / 0.97) ** lam - (1 / 0.97) ** (lam - 1)) + 1.0
    u, f = pot.evaluate(r, 1.0, 1.0)
    np.testing.assert_allclose(u, u_ref, rtol=1e-12)
    # cutoff
    u, f = pot.evaluate(jnp.asarray(B_PARAM + 1e-6, jnp.float64), 1.0, 1.0)
    assert u == 0.0 and f == 0.0
    # contact value: u(sigma) = 1 + a*0 ... actually at r = sigma: sr = 1
    u_c, _ = pot.evaluate(jnp.asarray(1.0, jnp.float64), 1.0, 1.0)
    np.testing.assert_allclose(u_c, 1.0, rtol=1e-12)


def test_pseudohs_continuous_at_cutoff():
    pot = PseudoHS()
    eps = 1e-9
    u_in, f_in = pot.evaluate(jnp.asarray(B_PARAM - eps, jnp.float64), 1.0, 1.0)
    assert abs(float(u_in)) < 1e-5
    assert abs(float(f_in)) < 1e-3


def test_lj_unshifted_values():
    # /root/reference/src/potentials.jl:66-77: at r = sigma, V = 0; minimum at
    # 2^(1/6) sigma with V = -eps, F = 0.
    pot = LennardJones(epsilon=1.0, sigma=1.0, r_cut=2.5)
    u, f = pot.evaluate(jnp.asarray(1.0, jnp.float64), 1.0, 1.0)
    np.testing.assert_allclose(u, 0.0, atol=1e-12)
    rmin = 2.0 ** (1.0 / 6.0)
    u, f = pot.evaluate(jnp.asarray(rmin, jnp.float64), 1.0, 1.0)
    np.testing.assert_allclose(u, -1.0, rtol=1e-12)
    np.testing.assert_allclose(f, 0.0, atol=1e-12)
    # beyond cutoff
    u, f = pot.evaluate(jnp.asarray(2.6, jnp.float64), 1.0, 1.0)
    assert u == 0.0 and f == 0.0


def test_lj_shift_flags_actually_work():
    # Unlike the reference (SURVEY.md quirk 4), shift makes V(r_cut-) -> 0.
    rc = 2.5
    r = jnp.asarray(rc - 1e-9, jnp.float64)
    u_plain, _ = LennardJones(r_cut=rc).evaluate(r, 1.0, 1.0)
    u_shift, _ = LennardJones(r_cut=rc, shift=True).evaluate(r, 1.0, 1.0)
    assert abs(float(u_shift)) < 1e-8
    assert abs(float(u_plain)) > 1e-4
    u_fs, f_fs = LennardJones(r_cut=rc, force_shift=True).evaluate(r, 1.0, 1.0)
    assert abs(float(u_fs)) < 1e-7
    assert abs(float(f_fs)) < 1e-7


def test_lj_lrc_closed_forms():
    # /root/reference/src/potentials.jl:111-128
    pot = LennardJones(r_cut=2.5, tail_correction=True)
    n, volume = 1000, 1250.0
    rho = n / volume
    sr3 = (1.0 / 2.5) ** 3
    e_ref = (8.0 * np.pi * rho / 3.0) * (sr3 ** 3 / 3.0 - sr3) * n
    p_ref = (16.0 * np.pi * rho ** 2 / 3.0) * (2.0 * sr3 ** 3 / 3.0 - sr3)
    np.testing.assert_allclose(pot.energy_lrc(n, volume), e_ref, rtol=1e-12)
    np.testing.assert_allclose(pot.pressure_lrc(n, volume), p_ref, rtol=1e-12)
    assert float(LennardJones(r_cut=2.5).energy_lrc(n, volume)) == 0.0


def test_xplor_switch_window():
    s, ds = xplor_switch(jnp.asarray(1.5, jnp.float64), 2.0, 2.5)
    assert s == 1.0 and ds == 0.0
    s, ds = xplor_switch(jnp.asarray(2.6, jnp.float64), 2.0, 2.5)
    assert s == 0.0 and ds == 0.0
    s, ds = xplor_switch(jnp.asarray(2.25, jnp.float64), 2.0, 2.5)
    assert 0.0 < float(s) < 1.0
    assert float(ds) < 0.0  # decaying switch
    # switch derivative matches autodiff
    g = jax.grad(lambda r: xplor_switch(r, 2.0, 2.5)[0])(jnp.asarray(2.25, jnp.float64))
    np.testing.assert_allclose(ds, g, rtol=1e-10)


def test_xplor_energy_continuous():
    pot = LennardJonesXPLOR(r_on=2.0, r_cut=2.5)
    u_on, _ = pot.evaluate(jnp.asarray(2.0 - 1e-9, jnp.float64), 1.0, 1.0)
    u_on2, _ = pot.evaluate(jnp.asarray(2.0 + 1e-9, jnp.float64), 1.0, 1.0)
    np.testing.assert_allclose(u_on, u_on2, rtol=1e-6)
    u_rc, _ = pot.evaluate(jnp.asarray(2.5 - 1e-7, jnp.float64), 1.0, 1.0)
    assert abs(float(u_rc)) < 1e-10


def test_batched_evaluation():
    pot = LennardJones()
    r = jnp.linspace(0.8, 3.0, 64, dtype=jnp.float64)
    u, f = pot.evaluate(r, 1.0, 1.0)
    assert u.shape == r.shape and f.shape == r.shape
    assert np.all(np.asarray(u[r >= 2.5]) == 0.0)


@pytest.mark.parametrize("pot,rs", [
    (PseudoHS(), [0.9, 0.95, 1.0, 1.01]),
    (PseudoHS(lam=49), [0.9, 0.95, 1.0, 1.01]),          # odd lam fast path
    (PseudoHS(lam=35), [0.9, 0.95, 1.0]),
    (LennardJones(), [0.9, 1.0, 1.12, 1.5, 2.4, 2.6]),
    (LennardJones(shift=True, force_shift=True), [1.0, 1.5, 2.4]),
    (LennardJonesXPLOR(r_on=2.0, r_cut=2.5), [1.0, 1.9, 2.1, 2.3, 2.45, 2.6]),
])
def test_evaluate_r2_matches_evaluate(pot, rs):
    """The engines' sqrt-free hot path must agree with the canonical kernel:
    u identical, f_over_r * r == f. Covers the XPLOR polynomial-in-r2 switch
    and both parities of the PseudoHS exponent."""
    for r in rs:
        r = jnp.asarray(r, jnp.float64)
        u, f = pot.evaluate(r, 1.1, 0.9)
        u2, f_over_r = pot.evaluate_r2(r * r, 1.1, 0.9)
        np.testing.assert_allclose(u2, u, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(f_over_r * r, f, rtol=1e-10, atol=1e-12)


def test_lj_lrc_prefactors():
    """True tail corrections carry eps * sigma^3 (the reference omits them,
    /root/reference/src/potentials.jl:111-128 — correct only at eps=sigma=1)."""
    n, volume = 1000, 1250.0
    base_e = float(LennardJones(r_cut=2.5, tail_correction=True).energy_lrc(n, volume))
    base_p = float(LennardJones(r_cut=2.5, tail_correction=True).pressure_lrc(n, volume))
    pot = LennardJones(epsilon=2.0, sigma=1.0, r_cut=2.5, tail_correction=True)
    np.testing.assert_allclose(float(pot.energy_lrc(n, volume)), 2.0 * base_e, rtol=1e-12)
    np.testing.assert_allclose(float(pot.pressure_lrc(n, volume)), 2.0 * base_p, rtol=1e-12)
    # sigma scaling: integrand sigma-dependence is sigma^3 * f(sigma/rc) — check
    # against direct numerical integration of the tail integral.
    import scipy.integrate as si
    eps, sig, rc = 1.0, 1.3, 3.5
    pot = LennardJones(epsilon=eps, sigma=sig, r_cut=rc, tail_correction=True)
    rho = n / volume
    v = lambda r: 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
    e_num = 2 * np.pi * rho * n * si.quad(lambda r: v(r) * r * r, rc, np.inf)[0]
    np.testing.assert_allclose(float(pot.energy_lrc(n, volume)), e_num, rtol=1e-8)


def test_engine_cutoff_must_cover_potential_range():
    # The hot sweep has no engine-level cutoff mask (potential contract:
    # exact zeros beyond its own cutoff) — so engine creation must reject a
    # cutoff smaller than the potential's maximum interaction range.
    import numpy as np
    import pytest

    from mdtpu.ops import select_engine
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.potentials.pseudo_hs import PseudoHS

    cell = np.eye(3) * 30.0
    lj = LennardJones(r_cut=2.5)
    with pytest.raises(ValueError, match="maximum interaction range"):
        CellGridEngine.create(lj, 1.5, 0.3, cell, 1000)
    with pytest.raises(ValueError, match="maximum interaction range"):
        CellGridEngine.create_tuned(lj, 2.0, cell, 1000)
    # Sigma-scaled pseudo-HS: a large diameter stretches the range past a
    # cutoff that would be fine for sigma=1.
    phs = PseudoHS()
    assert CellGridEngine.create(phs, 1.5, 0.3, cell, 1000) is not None
    with pytest.raises(ValueError, match="maximum interaction range"):
        CellGridEngine.create(phs, 1.5, 0.3, cell, 1000, max_sigma=1.6)
    with pytest.raises(ValueError, match="maximum interaction range"):
        select_engine(lj, 1.5, unitcell=cell, n_particles=1000)
