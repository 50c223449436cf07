"""Small numeric helpers used by the hot pair kernels.

TPU notes: integer powers are computed by repeated squaring (pure VPU
multiplies) instead of ``jnp.power`` (exp/log transcendentals), which is both
faster and more accurate for the large exponents used by the pseudo-hard-sphere
potential (lambda = 50; reference: /root/reference/src/potentials.jl:16-29 uses
FastPow.@fastpow for the same reason).
"""

from __future__ import annotations

import jax.numpy as jnp


def ipow(x, n: int):
    """x**n for a static non-negative integer n, via binary exponentiation."""
    if not isinstance(n, int):
        raise TypeError(f"ipow exponent must be a static int, got {type(n)}")
    if n < 0:
        raise ValueError("ipow exponent must be >= 0")
    if n == 0:
        return jnp.ones_like(x)
    result = None
    base = x
    while n > 0:
        if n & 1:
            result = base if result is None else result * base
        n >>= 1
        if n:
            base = base * base
    return result


def two_sum(a, b):
    """Error-free transform: s = fl(a + b) and the exact residual r with
    a + b == s + r (Knuth; no magnitude ordering assumed). 6 VPU ops."""
    s = a + b
    bb = s - a
    err_b = b - bb
    err_a = a - (s - bb)
    return s, err_a + err_b


def kahan_add(x, comp, dx):
    """One step of Kahan (compensated) summation: returns (x', comp').

    Used by the integrators to keep f32 position/velocity accumulation error
    bounded over millions of steps (NVE drift gate; see SURVEY.md section 7
    "hard parts (b)"). Relies on XLA not reassociating float ops, which it
    does not do by default.
    """
    y = dx - comp
    t = x + y
    comp_new = (t - x) - y
    return t, comp_new
