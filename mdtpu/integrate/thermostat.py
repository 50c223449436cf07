"""Bussi-Donadio-Parrinello stochastic velocity rescaling thermostat.

Reference: /root/reference/src/thermostat.jl. The canonical-sampling rescale
factor is

    scale = sqrt( e^{-dt/tau} + c2*(r2 + r1^2) + 2*r1*sqrt(e^{-dt/tau} * c2) )
    c2    = (1 - e^{-dt/tau}) * T_target / (T_current * nf)

with r1 ~ N(0,1) and r2 ~ chi-squared with (nf - 1) degrees of freedom. The
reference draws r2 with the Gamma trick in even/odd branches
(/root/reference/src/thermostat.jl:1-18 ``sum_noises``); here a single
``jax.random.gamma(key, (nf-1)/2) * 2`` covers all cases (chi2_k = 2*Gamma(k/2))
— statistically identical and traceable.

This is a *global* rescale (one scalar applied to all velocities), so on a
sharded mesh it reduces to a ``psum`` of the kinetic energy — the direct analog
of the reference's reducer protocol (SURVEY.md 2.14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_kinetic(velocities, axis_name=None):
    """Total kinetic energy 0.5 * sum v^2 (unit masses, matching the
    reference /root/reference/src/thermostat.jl:50-60). Under ``shard_map``
    pass ``axis_name`` to psum the per-shard partial — the analog of the
    reference's reducer tree (/root/reference/src/pairwise.jl:17-23)."""
    kinetic = 0.5 * jnp.sum(velocities * velocities)
    if axis_name is not None:
        kinetic = jax.lax.psum(kinetic, axis_name)
    return kinetic


def compute_temperature(velocities, nf, axis_name=None):
    """Instantaneous kinetic temperature 2K/nf
    (/root/reference/src/thermostat.jl:62-67)."""
    return 2.0 * compute_kinetic(velocities, axis_name) / nf


def sum_noises(key, nf):
    """Sum of ``nf`` squared standard Gaussians (chi-squared with nf dof),
    via 2 * Gamma(nf/2). Reference: /root/reference/src/thermostat.jl:1-18."""
    nf = jnp.asarray(nf)
    safe_nf = jnp.maximum(nf, 1e-12)
    draw = 2.0 * jax.random.gamma(key, safe_nf / 2.0)
    return jnp.where(nf > 0, draw, jnp.zeros_like(draw))


def bussi_scale_from_kinetic(key, kinetic, ktemp, nf, dt, tau, dtype):
    """The exact Bussi rescale factor given the (already reduced) kinetic
    energy. Split out so one kinetic reduction serves both the thermostat
    and the temperature observable (T_after = scale^2 * 2K/nf) — on a
    sharded mesh that is one psum per step instead of two."""
    current_temperature = 2.0 * kinetic / nf

    k1, k2 = jax.random.split(key)
    r1 = jax.random.normal(k1, dtype=jnp.float32).astype(dtype)
    r2 = sum_noises(k2, nf - 1.0).astype(dtype)

    term_1 = jnp.exp(-jnp.asarray(dt, dtype) / jnp.asarray(tau, dtype))
    c2 = (1.0 - term_1) * jnp.asarray(ktemp, dtype) / (current_temperature * nf)
    term_2 = c2 * (r2 + r1 * r1)
    term_3 = 2.0 * r1 * jnp.sqrt(term_1 * c2)
    return jnp.sqrt(term_1 + term_2 + term_3)


def bussi_rescale(key, velocities, ktemp, nf, dt, tau, axis_name=None):
    """Return velocities rescaled by the exact Bussi factor.

    Reference: /root/reference/src/thermostat.jl:20-48. Sharded semantics
    (``axis_name`` set): the kinetic energy is psum'ed so every shard computes
    the SAME global rescale factor from the same (replicated) key — one
    thermostat for the whole system, not one per shard.
    """
    kinetic = compute_kinetic(velocities, axis_name)
    scale = bussi_scale_from_kinetic(key, kinetic, ktemp, nf, dt, tau,
                                     velocities.dtype)
    return velocities * scale
