"""The validation harness's independent oracles (validate.py): the Mayer-
integral B2 quadrature is pinned to published constants, so the dilute-gas
anchor the TPU run is judged against is itself verifiable on CPU."""

import numpy as np

import validate


def test_b2_quadrature_pinned_to_boyle_temperature():
    # Published LJ Boyle temperature: B2(3.417927) = 0.
    assert abs(validate.lj_b2(validate.BOYLE_T)) < 2e-3


def test_b2_quadrature_matches_published_t1():
    # Published LJ B2*(T*=1.0) = -5.3158 (classic tabulated value).
    np.testing.assert_allclose(validate.lj_b2(1.0), -5.3158, atol=2e-3)


def test_b2_monotone_increasing_below_boyle():
    temps = [0.8, 1.0, 1.5, 2.0, 3.0, validate.BOYLE_T]
    vals = [validate.lj_b2(t) for t in temps]
    assert all(a < b for a, b in zip(vals, vals[1:]))
    assert vals[0] < -7.0 and abs(vals[-1]) < 1e-2


def test_u2_negative_and_consistent_with_b2_derivative():
    # Thermodynamic consistency between the two quadratures:
    # B2(beta) = -2 pi int (e^{-beta u} - 1) r^2 dr, hence
    # dB2/dbeta = 2 pi int u e^{-beta u} r^2 dr = u2 exactly.
    t = 2.0
    beta = 1.0 / t
    h = 1e-5
    b_plus = validate.lj_b2(1.0 / (beta + h))
    b_minus = validate.lj_b2(1.0 / (beta - h))
    dB2_dbeta = (b_plus - b_minus) / (2 * h)
    np.testing.assert_allclose(validate.lj_u2(t), dB2_dbeta, rtol=1e-4)
    assert validate.lj_u2(t) < 0


def test_block_sem_iid_limit():
    rng = np.random.default_rng(0)
    x = rng.normal(size=10_000)
    sem = validate.block_sem(x, nblocks=10)
    # IID: block SEM ~ sigma/sqrt(n) = 0.01 (within a factor ~2 at 10 blocks)
    assert 0.003 < sem < 0.03


def test_fit_b2_b3_recovers_known_coefficients():
    """The SEM-weighted isotherm fit (validate.point_b2_isotherm's oracle)
    recovers exact virial coefficients from synthetic Z(rho) data."""
    b2, b3 = -0.6276, 1.7
    rhos = np.array([0.02, 0.05, 0.08])
    z = 1.0 + b2 * rhos + b3 * rhos ** 2
    b2_fit, b3_fit, err = validate.fit_b2_b3(rhos, z, [1e-4, 1e-4, 1e-4])
    np.testing.assert_allclose(b2_fit, b2, atol=1e-9)
    np.testing.assert_allclose(b3_fit, b3, atol=1e-6)
    assert 0 < err < 1e-2


def test_fit_b2_b3_weighting_prefers_tight_points():
    """A noisy point with a huge SEM must not drag the fit: weight it out
    and the clean two points (+pinned intercept) determine the line."""
    b2, b3 = -0.6276, 1.7
    rhos = np.array([0.02, 0.05, 0.08])
    z = 1.0 + b2 * rhos + b3 * rhos ** 2
    z_bad = z.copy()
    z_bad[1] += 0.05  # corrupted midpoint
    b2_fit, _, _ = validate.fit_b2_b3(rhos, z_bad, [1e-5, 1.0, 1e-5])
    np.testing.assert_allclose(b2_fit, b2, atol=1e-3)
