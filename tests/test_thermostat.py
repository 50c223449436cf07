"""Bussi thermostat noise moments and ramp schedules (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.types import NVT, ConstantSchedule
from mdtpu.integrate.ramps import (
    ExponentialRamp,
    LinearRamp,
    initial_temperature_for_velocities,
)
from mdtpu.integrate.thermostat import (
    bussi_rescale,
    compute_kinetic,
    compute_temperature,
    sum_noises,
)


def test_sum_noises_moments():
    # chi-squared with nf dof: mean = nf, var = 2 nf
    # (/root/reference/src/thermostat.jl:1-18)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    for nf in [1.0, 2.0, 7.0, 64.0]:
        draws = jax.vmap(lambda k: sum_noises(k, nf))(keys)
        mean = float(jnp.mean(draws))
        var = float(jnp.var(draws))
        assert abs(mean - nf) < 0.15 * max(nf, 1.0)
        assert abs(var - 2 * nf) < 0.3 * max(2 * nf, 1.0)
    assert float(sum_noises(keys[0], 0.0)) == 0.0


def test_kinetic_and_temperature():
    v = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    np.testing.assert_allclose(compute_kinetic(v), 2.5)
    np.testing.assert_allclose(compute_temperature(v, 3.0), 5.0 / 3.0)


def test_bussi_drives_to_target_temperature():
    # Repeated rescaling of a hot gas must converge to the target T and then
    # fluctuate canonically around it.
    n, d = 512, 3
    nf = d * (n - 1.0)
    target = 0.8
    key = jax.random.PRNGKey(1)
    v = jax.random.normal(key, (n, d), dtype=jnp.float64) * 3.0  # hot start

    temps = []
    for i in range(400):
        key = jax.random.fold_in(jax.random.PRNGKey(2), i)
        v = bussi_rescale(key, v, target, nf, dt=0.005, tau=0.05)
        temps.append(float(compute_temperature(v, nf)))
    temps = np.array(temps[100:])
    assert abs(temps.mean() - target) < 0.02
    # canonical kinetic-T variance = 2 T^2 / nf
    expected_var = 2 * target ** 2 / nf
    assert 0.3 * expected_var < temps.var() < 3.0 * expected_var


def test_linear_ramp_endpoints_and_clamp():
    # /root/reference/src/temperature_ramps.jl:13-29 (1-indexed semantics)
    ramp = LinearRamp(2.0, 1.0, 11)
    np.testing.assert_allclose(ramp(1), 2.0)
    np.testing.assert_allclose(ramp(11), 1.0)
    np.testing.assert_allclose(ramp(6), 1.5)
    np.testing.assert_allclose(ramp(100), 1.0)   # hold T_final
    np.testing.assert_allclose(ramp(0), 2.0)     # clamp below
    np.testing.assert_allclose(LinearRamp(2.0, 1.0, 1)(1), 1.0)


def test_exponential_ramp_endpoints():
    ramp = ExponentialRamp(2.0, 0.5, 21)
    np.testing.assert_allclose(ramp(1), 2.0, rtol=1e-12)
    np.testing.assert_allclose(ramp(21), 0.5, rtol=1e-12)
    np.testing.assert_allclose(ramp(1000), 0.5)
    mid = float(ramp(11))
    np.testing.assert_allclose(mid, 1.0, rtol=1e-10)  # geometric midpoint


def test_ramps_traceable():
    ramp = LinearRamp(2.0, 1.0, 100)
    vals = jax.jit(jax.vmap(ramp))(jnp.arange(1, 101))
    np.testing.assert_allclose(vals[0], 2.0)
    np.testing.assert_allclose(vals[-1], 1.0)


def test_initial_temperature_for_velocities():
    assert initial_temperature_for_velocities(1.5) == 1.5
    assert initial_temperature_for_velocities(LinearRamp(0.5, 2.0, 10)) == 2.0
    assert initial_temperature_for_velocities(ExponentialRamp(3.0, 1.0, 10)) == 3.0
    assert initial_temperature_for_velocities(ConstantSchedule(0.7)) == 0.7


def test_nvt_wraps_constant():
    # /root/reference/src/types.jl:44 sugar
    ens = NVT(1.4737, 0.1)
    np.testing.assert_allclose(ens.ktemp(5), 1.4737)
    ens2 = NVT(LinearRamp(2.0, 1.0, 10), 0.1)
    np.testing.assert_allclose(ens2.ktemp(10), 1.0)
