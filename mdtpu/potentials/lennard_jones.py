"""Lennard-Jones potential with working energy/force shifting and tail
corrections.

Reference: /root/reference/src/potentials.jl:31-164. Unlike the reference —
where the ``shift``/``force_shift`` flags are stored but dead because
``evaluate`` always calls ``lj_unshifted``
(/root/reference/src/potentials.jl:160-164; SURVEY.md quirk 4) — the flags here
actually select the shifted kernels. Shift constants are computed at the
*mixed* sigma so polydisperse systems stay continuous at the cutoff.

Long-range corrections: /root/reference/src/potentials.jl:111-152 —
  energy:   N * 8*pi*rho*eps*sigma^3/3 * [ (sigma/rc)^9 / 3 - (sigma/rc)^3 ]
  pressure: 16*pi*rho^2*eps*sigma^3/3 * [ 2*(sigma/rc)^9 / 3 - (sigma/rc)^3 ]
applied only when ``tail_correction`` is set. The reference's ``ener_lrc`` /
``pressure_lrc`` omit the eps*sigma^3 prefactor (correct only at
eps = sigma = 1); the physically complete form is used here, matching this
repo's XPLOR tail formulas. Identical to the reference at eps = sigma = 1.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

from mdtpu.potentials.base import Potential, lj_tail_corrections, lorentz_sigma


def _sr_powers(sigma, r):
    sr = sigma / r
    sr2 = sr * sr
    sr6 = sr2 * sr2 * sr2
    sr12 = sr6 * sr6
    return sr6, sr12


@struct.dataclass
class LennardJones(Potential):
    epsilon: jnp.ndarray = 1.0
    sigma: jnp.ndarray = 1.0
    r_cut: jnp.ndarray = 2.5
    shift: bool = struct.field(pytree_node=False, default=False)
    force_shift: bool = struct.field(pytree_node=False, default=False)
    tail_correction: bool = struct.field(pytree_node=False, default=False)
    # Mixing rule for unlike sigmas: "lorentz" (arithmetic mean, matching the
    # reference's hard-coded choice /root/reference/src/potentials.jl:162) or
    # "none" (always use self.sigma).
    mixing: str = struct.field(pytree_node=False, default="lorentz")

    def _mixed_sigma(self, sigma_i, sigma_j, dtype):
        return lorentz_sigma(self.mixing, self.sigma, sigma_i, sigma_j, dtype)

    def max_cutoff(self, max_sigma=1.0):
        # The kernel cuts at fixed r_cut regardless of sigma
        # (/root/reference/src/potentials.jl:160-164).
        return float(self.r_cut)

    def evaluate(self, r, sigma_i=1.0, sigma_j=1.0):
        dtype = jnp.asarray(r).dtype
        eps = jnp.asarray(self.epsilon, dtype)
        rc = jnp.asarray(self.r_cut, dtype)
        sigma = self._mixed_sigma(sigma_i, sigma_j, dtype)

        inside = r < rc
        r_safe = jnp.where(inside, r, jnp.ones_like(r))
        sr6, sr12 = _sr_powers(sigma, r_safe)
        v = 4.0 * eps * (sr12 - sr6)
        f = 24.0 * eps * (2.0 * sr12 - sr6) / r_safe

        if self.shift or self.force_shift:
            src6, src12 = _sr_powers(sigma, rc)
            v_cut = 4.0 * eps * (src12 - src6)
            v = v - v_cut
            if self.force_shift:
                # V_fs = V - V_c + (r - r_c) * F_c with F_c = -dV/dr at r_c, so
                # both V and F vanish continuously at the cutoff. (The
                # reference's energy term has the opposite sign,
                # /root/reference/src/potentials.jl:100, which contradicts its
                # own force expression at :101 — unreachable dead code there
                # anyway, SURVEY.md quirk 4.)
                f_cut = 24.0 * eps * (2.0 * src12 - src6) / rc
                v = v + (r_safe - rc) * f_cut
                f = f - f_cut

        zero = jnp.zeros_like(v)
        return jnp.where(inside, v, zero), jnp.where(inside, f, zero)

    def evaluate_r2(self, r2, sigma_i=1.0, sigma_j=1.0):
        """Sqrt-free hot path: V and F/r are pure polynomials in sigma^2/r^2
        for the plain and energy-shifted forms. Force-shift needs F_c (a
        constant) times 1/r, obtained with one rsqrt."""
        dtype = jnp.asarray(r2).dtype
        eps = jnp.asarray(self.epsilon, dtype)
        rc = jnp.asarray(self.r_cut, dtype)
        sigma = self._mixed_sigma(sigma_i, sigma_j, dtype)

        inside = r2 < rc * rc
        r2_safe = jnp.where(inside, r2, jnp.ones_like(r2))
        if self.force_shift:
            # Force-shift needs 1/r anyway: derive 1/r^2 from ONE rsqrt
            # instead of paying both a divide and an rsqrt (each multi-pass
            # on the VPU — together ~15% of the pair-sweep ops).
            inv_r = jax.lax.rsqrt(r2_safe)
            inv_r2 = inv_r * inv_r
        else:
            inv_r2 = 1.0 / r2_safe       # the single expensive op per pair
        sr2 = (sigma * sigma) * inv_r2
        sr6 = sr2 * sr2 * sr2
        sr12 = sr6 * sr6
        v = 4.0 * eps * (sr12 - sr6)
        f_over_r = 24.0 * eps * (2.0 * sr12 - sr6) * inv_r2

        if self.shift or self.force_shift:
            src6, src12 = _sr_powers(sigma, rc)
            v_cut = 4.0 * eps * (src12 - src6)
            v = v - v_cut
            if self.force_shift:
                f_cut = 24.0 * eps * (2.0 * src12 - src6) / rc
                v = v + (r2_safe * inv_r - rc) * f_cut
                f_over_r = f_over_r - f_cut * inv_r

        zero = jnp.zeros_like(v)
        return jnp.where(inside, v, zero), jnp.where(inside, f_over_r, zero)

    def force_r2(self, r2, sigma_i=1.0, sigma_j=1.0):
        """Force-only hot path: drops the energy polynomial (v, shift
        constants) — ~5 VPU ops per pair slot fewer than evaluate_r2."""
        dtype = jnp.asarray(r2).dtype
        eps = jnp.asarray(self.epsilon, dtype)
        rc = jnp.asarray(self.r_cut, dtype)
        sigma = self._mixed_sigma(sigma_i, sigma_j, dtype)

        inside = r2 < rc * rc
        r2_safe = jnp.where(inside, r2, jnp.ones_like(r2))
        if self.force_shift:
            inv_r = jax.lax.rsqrt(r2_safe)
            inv_r2 = inv_r * inv_r
        else:
            inv_r2 = 1.0 / r2_safe
        sr2 = (sigma * sigma) * inv_r2
        sr6 = sr2 * sr2 * sr2
        sr12 = sr6 * sr6
        f_over_r = 24.0 * eps * (2.0 * sr12 - sr6) * inv_r2
        if self.force_shift:
            src6, src12 = _sr_powers(sigma, rc)
            f_cut = 24.0 * eps * (2.0 * src12 - src6) / rc
            f_over_r = f_over_r - f_cut * inv_r
        return jnp.where(inside, f_over_r, jnp.zeros_like(f_over_r))

    # Total tail corrections (/root/reference/src/potentials.jl:111-152).
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
