"""Pseudo-hard-sphere (WCA-like) potential.

Reference: /root/reference/src/potentials.jl:1-29. lambda = 50 steep
inverse-power pair; constants ``B_PARAM`` (cutoff in units of sigma) and
``A_PARAM`` chosen so the potential and force vanish continuously at the
cutoff with contact value matching the pseudo-HS mapping of Jover et al.

TPU notes: the r^50 powers are computed by binary exponentiation (pure VPU
multiplies; see mdtpu.utils.math.ipow) rather than exp/log, mirroring the
reference's FastPow.@fastpow.

Deviations from the reference (deliberate fixes, documented in SURVEY.md
"behavioral quirks" 2-3):
  * the cutoff scales with the mixed sigma (``r < B_PARAM * sigma``); the
    reference cuts at fixed ``b_param`` (/root/reference/src/potentials.jl:20)
    which is only correct for sigma = 1. Set ``sigma_scaled_cutoff=False`` for
    bit-parity with the reference on monodisperse systems (identical there).
  * the force includes the 1/sigma factor required by F = -dV/dr (verified by
    autodiff in tests); the reference omits it (identical at sigma = 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mdtpu.potentials.base import Potential, lorentz_sigma
from mdtpu.utils.math import ipow

# /root/reference/src/potentials.jl:2-3
B_PARAM = 1.0204081632653061
A_PARAM = 134.5526623421209


@struct.dataclass
class PseudoHS(Potential):
    lam: int = struct.field(pytree_node=False, default=50)
    sigma_scaled_cutoff: bool = struct.field(pytree_node=False, default=True)
    # Shared sigma-mixing rule (base.lorentz_sigma): "lorentz" or "none"
    # (PseudoHS's own length scale is 1, the reference's implicit choice).
    mixing: str = struct.field(pytree_node=False, default="lorentz")

    def max_cutoff(self, max_sigma=1.0):
        return B_PARAM * float(max_sigma) if self.sigma_scaled_cutoff \
            else B_PARAM

    def evaluate(self, r, sigma_i=1.0, sigma_j=1.0):
        lam = self.lam
        dtype = jnp.asarray(r).dtype
        sigma = lorentz_sigma(self.mixing, 1.0, sigma_i, sigma_j, dtype)
        cutoff = B_PARAM * sigma if self.sigma_scaled_cutoff else jnp.asarray(B_PARAM, dtype)
        inside = r < cutoff
        r_safe = jnp.where(inside, r, jnp.ones_like(r))
        sr = sigma / r_safe
        sr_lm1 = ipow(sr, lam - 1)
        sr_l = sr_lm1 * sr
        sr_lp1 = sr_l * sr
        a = jnp.asarray(A_PARAM, dtype)
        u = a * (sr_l - sr_lm1) + 1.0
        f = (a / sigma) * (lam * sr_lp1 - (lam - 1) * sr_l)
        zero = jnp.zeros_like(u)
        return jnp.where(inside, u, zero), jnp.where(inside, f, zero)

    def evaluate_r2(self, r2, sigma_i=1.0, sigma_j=1.0):
        """Hot path: even powers come from sr2 = (sigma/r)^2 by integer
        squaring; the single odd power needs one rsqrt (no divides).

        u        = a (sr^lam - sr^(lam-1)) + 1
        f_over_r = (a / sigma^2) (lam sr^(lam+2) - (lam-1) sr^(lam+1))
        """
        lam = self.lam
        dtype = jnp.asarray(r2).dtype
        sigma = lorentz_sigma(self.mixing, 1.0, sigma_i, sigma_j, dtype)
        cutoff = B_PARAM * sigma if self.sigma_scaled_cutoff else jnp.asarray(B_PARAM, dtype)
        inside = r2 < cutoff * cutoff
        r2_safe = jnp.where(inside, r2, jnp.ones_like(r2))
        inv_r = jax.lax.rsqrt(r2_safe)
        sr = sigma * inv_r
        sr2 = sr * sr
        if lam % 2 == 0:       # sr^(lam-2) = (sr2)^((lam-2)/2)
            sr_lm2 = ipow(sr2, (lam - 2) // 2)
        else:                  # odd lam: one extra sr factor
            sr_lm2 = ipow(sr2, (lam - 3) // 2) * sr
        sr_lm1 = sr_lm2 * sr
        sr_l = sr_lm2 * sr2
        sr_lp1 = sr_l * sr
        sr_lp2 = sr_l * sr2
        a = jnp.asarray(A_PARAM, dtype)
        u = a * (sr_l - sr_lm1) + 1.0
        f_over_r = (a / (sigma * sigma)) * (lam * sr_lp2 - (lam - 1) * sr_lp1)
        zero = jnp.zeros_like(u)
        return jnp.where(inside, u, zero), jnp.where(inside, f_over_r, zero)
