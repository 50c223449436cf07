"""Potential protocol: the canonical pair-interaction interface.

The reference exposes a multiple-dispatch interface ``evaluate(pot, r, sigma1,
sigma2) -> (energy, force)`` (/root/reference/src/types.jl:1-6 and the hot-path
call at /root/reference/src/pairwise.jl:31). Here the canonical form is a
single traceable method on a pytree dataclass:

    potential.evaluate(r, sigma_i, sigma_j) -> (u, f)

where ``r`` may be any-shaped array of pair distances (guaranteed > 0 by the
engine), and ``f`` is the scalar force magnitude ``-dV/dr`` so that the pair
force vector is ``f * dr / r`` (same convention as
/root/reference/src/pairwise.jl:32).

CUTOFF CONTRACT (load-bearing): the potential MUST return exact zeros
``(0, 0)`` for every pair beyond its own cutoff, for arbitrarily large ``r``
(including the engines' far-pad distances ~1e6 and self-pair bumps ~1e30).
The production cell-grid sweep carries NO engine-level cutoff mask — the
compare+selects were ~8% of the pair sweep (mdtpu/ops/cell_grid.py) — so a
potential that returns nonzero tails beyond the engine's cell reach would
silently produce stencil-truncated (anisotropic) interactions. Engines
validate coverage at creation via :meth:`Potential.max_cutoff` /
:func:`check_engine_cutoff`; user potentials should implement
``max_cutoff`` to opt in to that validation (without it the engine trusts
the user-supplied engine cutoff).

User-defined potentials subclass ``Potential`` (as a ``flax.struct.dataclass``)
and implement ``evaluate``; they then work in every engine, the minimizer, and
the sharded path with no further registration — the analog of adding a Julia
``evaluate`` method (/root/reference/README.md custom-potential example).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Potential:
    """Base class (mixin) for pair potentials.

    Subclasses must be ``flax.struct.dataclass``es and implement
    ``evaluate(r, sigma_i, sigma_j) -> (u, f)`` with traceable jnp ops.
    """

    def evaluate(self, r, sigma_i, sigma_j):
        raise NotImplementedError(
            f"evaluate not implemented for potential type: {type(self).__name__}"
        )

    def evaluate_r2(self, r2, sigma_i, sigma_j):
        """Squared-distance form: returns ``(u, f_over_r)`` where the pair
        force vector is ``f_over_r * dr`` and the pair virial is
        ``f_over_r * r2``.

        This is the engines' hot-path entry point: with it the entire pair
        kernel needs no sqrt and no divide-by-r (big VPU win on TPU — sqrt
        and divide are multi-cycle). The default falls back to ``evaluate``
        via one sqrt, so user potentials only need ``evaluate``; built-ins
        override with fully sqrt-free forms.
        """
        r2 = jnp.asarray(r2)
        r = jnp.sqrt(r2)
        u, f = self.evaluate(r, sigma_i, sigma_j)
        return u, f / jnp.where(r > 0, r, jnp.ones_like(r))

    def force_r2(self, r2, sigma_i, sigma_j):
        """Force-only squared-distance form: ``f_over_r`` alone.

        Engines call this on steps where no observable (energy/virial) is
        read — all but the thermo/sample steps — skipping the energy
        polynomial. Default reuses ``evaluate_r2``; built-ins override when
        the force expression shares no work with the energy."""
        return self.evaluate_r2(r2, sigma_i, sigma_j)[1]

    def max_cutoff(self, max_sigma=1.0):
        """Largest pair distance at which this potential is nonzero, given
        the largest particle diameter in the system (Lorentz mixing makes
        the worst-case pair sigma equal to ``max_sigma``). Engines compare
        this against their own cutoff at creation (see module docstring:
        the hot sweep has no engine-level mask, so the engine cutoff MUST
        cover the potential's full range). Returns None when unknown (user
        potentials implementing only ``evaluate``) — validation is then
        skipped and the user-supplied engine cutoff is trusted."""
        return None

    # Long-range (tail) corrections; generic no-op interface mirroring
    # /root/reference/src/potentials.jl:281-293. Overrides return the *total*
    # system correction (energy) / correction to pressure.
    def energy_lrc(self, n_particles, volume):
        return jnp.asarray(0.0)

    def pressure_lrc(self, n_particles, volume):
        return jnp.asarray(0.0)


def check_engine_cutoff(potential, cutoff, max_sigma=1.0):
    """Raise if the engine's cutoff does not cover the potential's maximum
    interaction range (which would silently truncate interactions
    anisotropically — the engines' pair sweeps carry no cutoff mask)."""
    fn = getattr(potential, "max_cutoff", None)
    mc = fn(max_sigma) if fn is not None else None
    if mc is not None and float(cutoff) < float(mc) - 1e-9:
        raise ValueError(
            f"engine cutoff {float(cutoff):g} is smaller than the "
            f"potential's maximum interaction range {float(mc):g} "
            f"(max diameter {float(max_sigma):g}); pairs beyond the cell "
            f"reach would be silently dropped — increase the engine cutoff")


def lj_tail_corrections(epsilon, sigma, r_cut, n_particles, volume):
    """The ONE closed-form LJ tail-correction pair (total energy, pressure)
    shared by LennardJones and LennardJonesXPLOR — the reference implements
    the same forms twice (/root/reference/src/potentials.jl:111-128 LJ,
    :256-271 XPLOR); keeping two copies here let them drift once already
    (the eps*sigma^3 prefactor fix)."""
    import math

    rho = n_particles / volume
    src3 = (sigma / r_cut) ** 3
    src9 = src3 ** 3
    pref = epsilon * sigma ** 3
    e_total = ((8.0 * math.pi * rho * pref / 3.0)
               * (src9 / 3.0 - src3)) * n_particles
    p_total = (16.0 * math.pi * rho ** 2 * pref / 3.0) * (2.0 * src9 / 3.0
                                                          - src3)
    return e_total, p_total


def lorentz_sigma(mixing, self_sigma, sigma_i, sigma_j, dtype):
    """The ONE sigma-mixing rule shared by the built-in potentials:
    Lorentz arithmetic mean (the reference's convention,
    /root/reference/src/potentials.jl:11-14) or ``mixing="none"`` (always
    the potential's own sigma)."""
    if mixing == "none":
        return jnp.asarray(self_sigma, dtype)
    return 0.5 * (jnp.asarray(sigma_i, dtype) + jnp.asarray(sigma_j, dtype))


def evaluate(potential, r, sigma_i=1.0, sigma_j=1.0):
    """Free-function form of the evaluate interface (API parity with the
    reference's exported ``evaluate``)."""
    return potential.evaluate(r, sigma_i, sigma_j)


def energy_lrc(potential, n_particles, volume):
    return potential.energy_lrc(n_particles, volume)


def pressure_lrc(potential, n_particles, volume):
    return potential.pressure_lrc(n_particles, volume)
