"""Temperature ramp schedules (callable pytrees usable as NVT's ktemp).

Reference: /root/reference/src/temperature_ramps.jl. Both ramps use the
reference's 1-indexed step semantics: the driver calls the schedule with
``step + 1`` (/root/reference/src/integrate.jl:49 via
/root/reference/src/simulation.jl:107), values clamp to [1, n_steps] and hold
exactly T_final afterwards.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from mdtpu.core.types import ConstantSchedule


@struct.dataclass
class LinearRamp:
    t_initial: Any
    t_final: Any
    n_steps: int = struct.field(pytree_node=False)

    def __call__(self, step):
        ti = jnp.asarray(self.t_initial)
        tf = jnp.asarray(self.t_final)
        if self.n_steps <= 1:
            return tf
        raw = jnp.asarray(step)
        step = jnp.clip(raw, 1, self.n_steps)
        progress = (step - 1.0) / (self.n_steps - 1.0)
        # Hold EXACTLY t_final past the ramp (the interpolation at
        # progress=1 differs from tf by roundoff; the reference
        # early-returns T_final, /root/reference/src/temperature_ramps.jl).
        return jnp.where(raw >= self.n_steps, tf, ti + (tf - ti) * progress)


@struct.dataclass
class ExponentialRamp:
    t_initial: Any
    t_final: Any
    n_steps: int = struct.field(pytree_node=False)

    def __call__(self, step):
        ti = jnp.asarray(self.t_initial)
        tf = jnp.asarray(self.t_final)
        if self.n_steps <= 1:
            return tf
        raw = jnp.asarray(step)
        step = jnp.clip(raw, 1, self.n_steps)
        # NOTE: without x64 the progress is f32 — ramps longer than 2^24
        # steps quantize into plateaus (integers above 16.7M are not
        # representable); the endpoints below are exact regardless.
        progress = (step - 1.0) / (self.n_steps - 1.0)
        alpha = jnp.log(tf / ti)
        return jnp.where(raw >= self.n_steps, tf,
                         ti * jnp.exp(alpha * progress))


def initial_temperature_for_velocities(ktemp):
    """Temperature to draw initial velocities at: max(T_i, T_f) for ramps,
    the value itself otherwise (/root/reference/src/temperature_ramps.jl:67-73).
    """
    if hasattr(ktemp, "t_initial") and hasattr(ktemp, "t_final"):
        return max(float(ktemp.t_initial), float(ktemp.t_final))
    if isinstance(ktemp, ConstantSchedule):
        return float(ktemp.value)
    if callable(ktemp):
        # Generic callable schedule: probe step 1 (host-side).
        return float(ktemp(1))
    return float(ktemp)
