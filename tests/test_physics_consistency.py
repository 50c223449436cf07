"""Independent thermodynamic cross-checks.

The reference validates its physics against LAMMPS/NIST reference data on an
external wiki (/root/reference/README.md:189) that is not vendored in the
repo, so there are no authoritative numbers to pin against (SURVEY.md
section 4, integration item: "pressure/RDF parity vs NIST LJ reference
data"). These tests substitute two fully in-repo *independent routes* to the
same thermodynamic quantities, which catch exactly the bug classes an
external-data comparison would:

(a) the virial pressure W/(d*V) against a numerical -dU/dV volume
    derivative on frozen configurations (orthorhombic + triclinic, 2D + 3D)
    -- any error in the virial accumulation, minimum-image convention, or
    force sign shows up as a route disagreement;

(b) canonical NVT averages <U/N> and <P> from the MD driver (velocity
    Verlet + Bussi thermostat) against an independent Metropolis Monte
    Carlo sampler written directly in numpy in this test (no shared code
    with mdtpu beyond the closed-form LJ expression) -- validates that the
    thermostat actually samples the canonical ensemble and that the virial
    pressure is thermodynamically consistent at a realistic state point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import NVT, Parameters
from mdtpu.integrate.step import engine_forces, make_step
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from mdtpu.potentials.xplor import LennardJonesXPLOR
from mdtpu.sim.initialization import build_state_from_arrays, initialize_velocities
from mdtpu.sim.pack import pack_positions


def _frozen_config(n, rho, d, cutoff, seed, triclinic=False):
    key = jax.random.PRNGKey(seed)
    L = (n / rho) ** (1.0 / d)
    cell = np.eye(d) * L
    if triclinic:
        cell[0, 1] = 0.2 * L  # tilted box exercises the general MIC path
    cell = jnp.asarray(cell, jnp.float64)
    pos = pack_positions(key, cell, n, d, tol=0.9, dtype=jnp.float64)
    return pos, cell


def _energy_virial(pot, cutoff, pos, cell):
    eng = NaivePairEngine(potential=pot, cutoff=cutoff)
    cell_inv = jnp.asarray(np.linalg.inv(np.asarray(cell)))
    e, w, f, _ = eng.compute(pos, jnp.ones(pos.shape[0], pos.dtype),
                             cell, cell_inv, ())
    return float(e), float(w)


@pytest.mark.parametrize("pot,cutoff,d,triclinic", [
    (PseudoHS(), 1.5, 3, False),
    (PseudoHS(), 1.5, 2, False),
    (PseudoHS(), 1.5, 3, True),
    (LennardJones(r_cut=2.5, force_shift=True), 2.5, 3, False),
    (LennardJonesXPLOR(r_on=2.0, r_cut=2.5), 2.5, 3, False),
])
def test_virial_matches_volume_derivative(pot, cutoff, d, triclinic):
    """W/(d*V) == -dU/dV under affine volume scaling (fixed fractional
    coordinates, fixed cutoff). Holds identically for any pair potential
    that is smooth at the cutoff; a central difference in the box scale
    pins the virial route to 1e-6 relative. Convention under test:
    P_excess = W/(d*V) with W = sum_{i<j} f_ij * r_ij
    (/root/reference/src/pairwise.jl:32-33, src/simulation.jl:129-131)."""
    n = 48
    pos, cell = _frozen_config(n, 0.5, d, cutoff, seed=3, triclinic=triclinic)

    _, w = _energy_virial(pot, cutoff, pos, cell)
    vol = abs(float(np.linalg.det(np.asarray(cell))))
    p_virial = w / (d * vol)

    eps = 1e-5
    u_plus, _ = _energy_virial(pot, cutoff, pos * (1 + eps), cell * (1 + eps))
    u_minus, _ = _energy_virial(pot, cutoff, pos * (1 - eps), cell * (1 - eps))
    dv = vol * ((1 + eps) ** d - (1 - eps) ** d)
    p_deriv = -(u_plus - u_minus) / dv

    assert p_virial == pytest.approx(p_deriv, rel=1e-6, abs=1e-9), (
        f"virial route {p_virial} vs -dU/dV route {p_deriv}")


# ---------------------------------------------------------------------------
# (b) MD (Bussi NVT) vs independent Metropolis MC at one LJ state point.
# ---------------------------------------------------------------------------

_N = 64
_RHO = 0.6
_T = 1.5
_RC = 2.5


def _lj_numpy(r2):
    """Plain cut (unshifted) LJ, written independently of mdtpu."""
    inside = (r2 < _RC * _RC) & (r2 > 0.0)  # r2 == 0 is the self row
    r2s = np.where(inside, r2, 1.0)
    sr2 = 1.0 / r2s
    sr6 = sr2 * sr2 * sr2
    return np.where(inside, 4.0 * (sr6 * sr6 - sr6), 0.0)


def _mc_averages(L, n_sweeps=2600, n_equil=600, seed=7):
    """Single-particle-move Metropolis MC of the cut LJ fluid; returns
    (<U/N>, <P>) with P = rho*T + <W>/(3V), W from the analytic pair
    virial w(r) = 24*(2/r^12 - 1/r^6) summed over pairs inside the cut."""
    rng = np.random.default_rng(seed)
    # Start from a simple-cubic lattice (independent of mdtpu's packers).
    m = int(np.ceil(_N ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    -1).reshape(-1, 3)[:_N]
    x = (grid + 0.5) * (L / m)

    def pair_u(dx):
        dx -= L * np.round(dx / L)
        return _lj_numpy(np.sum(dx * dx, axis=-1))

    def particle_energy(x, i, xi):
        dx = xi[None, :] - x
        u = pair_u(dx)
        u[i] = 0.0
        return u.sum()

    beta = 1.0 / _T
    step = 0.22
    u_samples, w_samples = [], []
    for sweep in range(n_sweeps):
        for i in range(_N):
            xi_old = x[i]
            xi_new = (xi_old + rng.uniform(-step, step, 3)) % L
            du = (particle_energy(x, i, xi_new)
                  - particle_energy(x, i, xi_old))
            if du <= 0 or rng.random() < np.exp(-beta * du):
                x[i] = xi_new
        if sweep >= n_equil:
            dx = x[:, None, :] - x[None, :, :]
            dx -= L * np.round(dx / L)
            r2 = np.sum(dx * dx, axis=-1)
            iu = np.triu_indices(_N, 1)
            r2 = r2[iu]
            inside = r2 < _RC * _RC
            r2 = r2[inside]
            sr6 = 1.0 / r2 ** 3
            u_samples.append(np.sum(4.0 * (sr6 * sr6 - sr6)))
            # w(r) = r * (-dV/dr) = 24*(2*sr12 - sr6)
            w_samples.append(np.sum(24.0 * (2.0 * sr6 * sr6 - sr6)))
    vol = L ** 3
    return (np.mean(u_samples) / _N,
            _RHO * _T + np.mean(w_samples) / (3.0 * vol))


def _md_averages(L, n_equil=1500, n_samples=400, stride=10, seed=11):
    pot = LennardJones(r_cut=_RC)
    params = Parameters(density=_RHO, n_particles=_N, dt=0.002, potential=pot)
    engine = NaivePairEngine(potential=pot, cutoff=_RC)

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    cell = jnp.eye(3, dtype=jnp.float64) * L
    pos = pack_positions(k1, cell, _N, 3, tol=0.9, dtype=jnp.float64)
    state = build_state_from_arrays(pos, jnp.ones(_N, jnp.float64), cell, k3,
                                    dtype=jnp.float64, cutoff=_RC)
    state = state.replace(
        velocities=initialize_velocities(_T, k2, _N, 3, dtype=jnp.float64))
    e, w, f, nbrs = engine_forces(engine, state.positions, state.diameters,
                                  state.unitcell, state.unitcell_inv, None)
    state = state.replace(forces=f, energy=e, virial=w, nbrs=nbrs)

    step = make_step(params, NVT(_T, 0.2), engine)

    @jax.jit
    def advance(s, k):
        return jax.lax.fori_loop(0, k, lambda i, t: step(t), s)

    state = advance(state, n_equil)
    us, ws = [], []
    for _ in range(n_samples):
        state = advance(state, stride)
        us.append(float(state.energy))
        ws.append(float(state.virial))
    vol = L ** 3
    return (np.mean(us) / _N, _RHO * _T + np.mean(ws) / (3.0 * vol))


def test_md_matches_mc_canonical_averages():
    """<U/N> and <P> from Bussi-thermostatted MD agree with an independent
    Metropolis MC sampler of the same cut-LJ Hamiltonian at
    (rho=0.6, T=1.5). MC is exactly canonical, so agreement validates both
    the thermostat's sampling and the virial-pressure convention
    end-to-end. Tolerances are ~4x the combined statistical error of the
    two finite runs (systematic thermostat/virial bugs are 10-100x)."""
    L = (_N / _RHO) ** (1.0 / 3.0)
    u_mc, p_mc = _mc_averages(L)
    u_md, p_md = _md_averages(L)

    assert u_md == pytest.approx(u_mc, abs=0.10), (
        f"<U/N>: MD {u_md:.4f} vs MC {u_mc:.4f}")
    assert p_md == pytest.approx(p_mc, abs=0.30), (
        f"<P>: MD {p_md:.4f} vs MC {p_mc:.4f}")
