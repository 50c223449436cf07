"""Reference API-surface parity: every export of MolecularDynamics.jl
(/root/reference/src/MolecularDynamics.jl:29-35) has an mdtpu counterpart,
and reference-specific behaviors (LRC in thermo output, Brownian pressure
averaging, thermo format) hold end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mdtpu


# export list: /root/reference/src/MolecularDynamics.jl:29-35 (+ `public`)
REFERENCE_EXPORTS = [
    "Parameters", "NVT", "NVE", "Brownian",
    "initialize_state", "run_simulation",     # run_simulation! -> run_simulation
    "PseudoHS", "LennardJonesXPLOR", "LennardJones",
    "LinearRamp", "ExponentialRamp",
    "minimize",                                # minimize! -> minimize
    "initial_temperature_for_velocities", "initialize_velocities",
    "Potential", "evaluate",                   # `public` names
]


def test_all_reference_exports_present():
    missing = [name for name in REFERENCE_EXPORTS if not hasattr(mdtpu, name)]
    assert not missing, f"missing reference exports: {missing}"


def test_parameters_field_order_matches_reference():
    # /root/reference/src/types.jl:8-13: (rho, n_particles, dt, potential)
    p = mdtpu.Parameters(0.76, 1024, 0.001, mdtpu.PseudoHS())
    assert float(p.density) == 0.76
    assert p.n_particles == 1024
    assert float(p.dt) == 0.001
    assert isinstance(p.potential, mdtpu.PseudoHS)


def test_lrc_appears_in_thermo_output(tmp_path):
    # /root/reference/src/simulation.jl:118-131: thermo energy includes
    # energy_lrc/N; pressure includes pressure_lrc.
    n = 64
    pot_plain = mdtpu.LennardJones(r_cut=1.5)
    pot_tail = mdtpu.LennardJones(r_cut=1.5, tail_correction=True)

    def run(pot, out):
        params = mdtpu.Parameters(density=0.5, n_particles=n, dt=1e-4,
                                  potential=pot)
        state = mdtpu.initialize_state(params, out, dimension=3, cutoff=1.5,
                                       seed=3, dtype=jnp.float64)
        state = state.replace(velocities=mdtpu.initialize_velocities(
            1.0, jax.random.PRNGKey(1), n, 3, jnp.float64))
        mdtpu.run_simulation(state, params, mdtpu.NVE(), total_steps=2,
                             frequency=1, pathname=out)
        rows = open(os.path.join(out, "thermo.txt")).read().splitlines()[1:]
        return [tuple(map(float, r.split())) for r in rows]

    rows_plain = run(pot_plain, str(tmp_path / "plain"))
    rows_tail = run(pot_tail, str(tmp_path / "tail"))

    volume = n / 0.5
    e_lrc = float(pot_tail.energy_lrc(n, volume)) / n
    p_lrc = float(pot_tail.pressure_lrc(n, volume))
    assert abs(e_lrc) > 1e-6 and abs(p_lrc) > 1e-6
    # identical trajectories (same seed/engine); columns differ by exactly LRC
    np.testing.assert_allclose(rows_tail[0][1] - rows_plain[0][1], e_lrc,
                               atol=2e-5)
    np.testing.assert_allclose(rows_tail[0][3] - rows_plain[0][3], p_lrc,
                               atol=2e-5)


def test_brownian_pressure_uses_10step_averaged_virial(tmp_path):
    # /root/reference/src/simulation.jl:253-266: P = W_avg/(d*nprom*V) + rho*kT
    # with W sampled every 10 steps, and T column = ktemp.
    n = 32
    pot = mdtpu.PseudoHS()
    params = mdtpu.Parameters(density=0.3, n_particles=n, dt=1e-5, potential=pot)
    out = str(tmp_path / "br")
    state = mdtpu.initialize_state(params, out, dimension=3, cutoff=1.5,
                                   seed=5, dtype=jnp.float64)
    state = mdtpu.run_simulation(state, params, mdtpu.Brownian(1.3),
                                 total_steps=25, frequency=25, pathname=out)
    rows = open(os.path.join(out, "thermo.txt")).read().splitlines()[1:]
    step, e, t, p = map(float, rows[0].split())
    assert t == pytest.approx(1.3)
    assert np.isfinite(p)


def test_thermo_format_matches_reference(tmp_path):
    # "%d %.6f %.6f %.6f" rows under "# Step Energy Temperature Pressure"
    # (/root/reference/src/simulation.jl:54-58).
    n = 32
    params = mdtpu.Parameters(density=0.3, n_particles=n, dt=1e-4,
                              potential=mdtpu.PseudoHS())
    out = str(tmp_path / "fmt")
    state = mdtpu.initialize_state(params, out, dimension=3, cutoff=1.5,
                                   seed=6, dtype=jnp.float64)
    mdtpu.run_simulation(state, params, mdtpu.NVE(), total_steps=3,
                         frequency=1, pathname=out)
    lines = open(os.path.join(out, "thermo.txt")).read().splitlines()
    assert lines[0] == "# Step Energy Temperature Pressure"
    for line in lines[1:]:
        cols = line.split()
        assert len(cols) == 4
        assert cols[0].isdigit()
        for c in cols[1:]:
            assert len(c.split(".")[-1]) == 6  # %.6f
