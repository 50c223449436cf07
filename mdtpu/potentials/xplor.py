"""Lennard-Jones with XPLOR smooth switching and optional tail corrections.

Reference: /root/reference/src/potentials.jl:166-271. The switching function
S(r) is 1 below r_on, a smooth rational on [r_on, r_cut), and 0 beyond; the
pair force here is exactly -d/dr [V(r) S(r)], verified by autodiff in tests.

Deliberate fixes vs the reference (do-not-replicate bugs):
  * the reference's switch derivative (/root/reference/src/potentials.jl:199-204)
    mis-expands d(a^2 b)/dr — its first two terms cancel leaving +4*r*a^2/denom,
    whereas the true derivative is 4*r*a*(a-b)/denom = 12*r*a*(r_on^2-r^2)/denom
    (negative on the switching window, as a decaying switch requires). We use
    the correct derivative.
  * the reference's XPLOR ``evaluate`` is keyword-only and therefore never
    dispatches from the pair loop (SURVEY.md quirk 2); this implements the
    canonical positional interface and works in every engine.
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import struct

from mdtpu.potentials.base import Potential, lj_tail_corrections, lorentz_sigma
from mdtpu.potentials.lennard_jones import _sr_powers


def xplor_switch(r, r_on, r_cut):
    """Value and derivative (dS/dr) of the XPLOR switching function.

    Reference: /root/reference/src/potentials.jl:190-209.
    Returns (S, dSdr) with S in [0, 1] and dSdr <= 0 on [r_on, r_cut].
    """
    rc2 = r_cut * r_cut
    ron2 = r_on * r_on
    r2 = r * r
    denom = (rc2 - ron2) ** 3
    a = rc2 - r2
    b = rc2 + 2.0 * r2 - 3.0 * ron2
    s_mid = a * a * b / denom
    # d/dr [a^2 b] = 2a * (-2r) * b + a^2 * 4r = 4r * a * (a - b)
    ds_mid = 4.0 * r * a * (a - b) / denom

    below = r < r_on
    above = r >= r_cut
    s = jnp.where(below, jnp.ones_like(s_mid), jnp.where(above, jnp.zeros_like(s_mid), s_mid))
    ds = jnp.where(below | above, jnp.zeros_like(ds_mid), ds_mid)
    return s, ds


@struct.dataclass
class LennardJonesXPLOR(Potential):
    epsilon: jnp.ndarray = 1.0
    sigma: jnp.ndarray = 1.0
    r_on: jnp.ndarray = 2.0
    r_cut: jnp.ndarray = 2.5
    tail_correction: bool = struct.field(pytree_node=False, default=False)
    mixing: str = struct.field(pytree_node=False, default="lorentz")

    def max_cutoff(self, max_sigma=1.0):
        return float(self.r_cut)

    def evaluate(self, r, sigma_i=1.0, sigma_j=1.0):
        dtype = jnp.asarray(r).dtype
        eps = jnp.asarray(self.epsilon, dtype)
        rc = jnp.asarray(self.r_cut, dtype)
        ron = jnp.asarray(self.r_on, dtype)
        sigma = lorentz_sigma(self.mixing, self.sigma, sigma_i, sigma_j,
                              dtype)

        inside = r < rc
        r_safe = jnp.where(inside, r, jnp.ones_like(r))
        sr6, sr12 = _sr_powers(sigma, r_safe)
        v = 4.0 * eps * (sr12 - sr6)
        f = 24.0 * eps * (2.0 * sr12 - sr6) / r_safe  # = -dV/dr

        s, dsdr = xplor_switch(r_safe, ron, rc)
        # force = -d(V*S)/dr = S * (-dV/dr) - V * dS/dr
        force = s * f - v * dsdr
        energy = v * s

        zero = jnp.zeros_like(energy)
        return jnp.where(inside, energy, zero), jnp.where(inside, force, zero)

    def evaluate_r2(self, r2, sigma_i=1.0, sigma_j=1.0):
        """Sqrt-free hot path. Both the LJ core and the XPLOR switch are
        polynomials in r^2:

          S_mid      = a^2 b / denom,  a = rc^2 - r^2,  b = rc^2 + 2r^2 - 3ron^2
          (dS/dr)/r  = 4 a (a - b) / denom
          F/r        = S * (24 eps (2 sr12 - sr6) / r^2) - V * (dS/dr)/r

        so unlike every other engine-visible potential there is not even an
        rsqrt — one reciprocal per pair."""
        dtype = jnp.asarray(r2).dtype
        eps = jnp.asarray(self.epsilon, dtype)
        rc = jnp.asarray(self.r_cut, dtype)
        ron = jnp.asarray(self.r_on, dtype)
        sigma = lorentz_sigma(self.mixing, self.sigma, sigma_i, sigma_j,
                              dtype)

        rc2 = rc * rc
        ron2 = ron * ron
        inside = r2 < rc2
        r2_safe = jnp.where(inside, r2, jnp.ones_like(r2))
        inv_r2 = 1.0 / r2_safe
        sr2 = (sigma * sigma) * inv_r2
        sr6 = sr2 * sr2 * sr2
        sr12 = sr6 * sr6
        v = 4.0 * eps * (sr12 - sr6)
        f_over_r = 24.0 * eps * (2.0 * sr12 - sr6) * inv_r2

        denom = (rc2 - ron2) ** 3
        a = rc2 - r2_safe
        b = rc2 + 2.0 * r2_safe - 3.0 * ron2
        below = r2_safe < ron2
        s = jnp.where(below, jnp.ones_like(a), a * a * b / denom)
        ds_over_r = jnp.where(below, jnp.zeros_like(a),
                              4.0 * a * (a - b) / denom)

        energy = v * s
        force_over_r = s * f_over_r - v * ds_over_r
        zero = jnp.zeros_like(energy)
        return (jnp.where(inside, energy, zero),
                jnp.where(inside, force_over_r, zero))

    # /root/reference/src/potentials.jl:256-271 (same closed forms as sharp-
    # cutoff LJ, using r_cut) — one shared implementation, base.py.
    def energy_lrc(self, n_particles, volume):
        if not self.tail_correction:
            return jnp.asarray(0.0)
        return lj_tail_corrections(self.epsilon, self.sigma, self.r_cut,
                                   n_particles, volume)[0]

    def pressure_lrc(self, n_particles, volume):
        if not self.tail_correction:
            return jnp.asarray(0.0)
        return lj_tail_corrections(self.epsilon, self.sigma, self.r_cut,
                                   n_particles, volume)[1]
