"""FIRE (Fast Inertial Relaxation Engine) energy minimizer.

Reference: /root/reference/src/minimize.jl:31-135, re-designed as a single
jitted ``lax.while_loop`` so the whole minimization runs on-device with zero
host round-trips. Defaults match the reference's *code* (f_inc=1.2, f_dec=0.2,
dt in [0.01, 0.1], alpha0=0.1, Nmin=5, tol=1e-6 on the RMS force
F_rms = |F| / sqrt(ndof), ndof = d*(N-1)).

Deliberate fixes vs the reference:
  * the velocity reset on P <= 0 writes actual zeros; the reference's
    ``fill!(v, zeros(MVector))`` aliases one shared vector across all entries
    (SURVEY.md quirk 5).
  * the return value is uniform: ``(state, energy, converged, n_steps)``
    whether or not it converged (the reference returns ``nothing`` on
    non-convergence).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mdtpu.core.box import wrap_positions
from mdtpu.core.types import Parameters, SimulationState
from mdtpu.integrate.step import engine_forces


class _FireCarry(NamedTuple):
    positions: Any
    images: Any
    v: Any
    forces: Any
    energy: Any
    virial: Any
    nbrs: Any
    dt: Any
    alpha: Any
    steps_since_neg: Any
    step: Any
    f_rms: Any


def fire_minimize(
    state: SimulationState,
    params: Parameters,
    engine,
    *,
    max_steps: int = 10000,
    tol: float = 1e-6,
    dt_initial: float = 0.01,
    dt_max: float = 0.1,
    alpha0: float = 0.1,
    f_inc: float = 1.2,
    f_dec: float = 0.2,
    n_min: int = 5,
    dmax: float = 0.1,
):
    """Minimize the potential energy of ``state`` in place (functionally).

    Returns ``(new_state, energy, converged, n_steps)``.

    Engine capacity overflow (dropped pairs/rows) would silently truncate
    forces and let the RMS-force test "converge" on a configuration that
    still has contacts — the run retries with grown capacity until the
    overflow flag clears (same policy as the driver's restore-and-rerun).
    """
    grew = False
    for _ in range(8):
        out = _fire_once(state, params, engine, max_steps=max_steps, tol=tol,
                         dt_initial=dt_initial, dt_max=dt_max, alpha0=alpha0,
                         f_inc=f_inc, f_dec=f_dec, n_min=n_min, dmax=dmax)
        new_state = out[0]
        over = getattr(new_state.nbrs, "overflow", None)
        grow = getattr(engine, "with_grown_capacity", None)
        if over is None or not bool(over) or grow is None:
            if grew:
                # The retries ran on an internally-grown engine the caller
                # never sees: returning its grown-capacity nbrs alongside
                # the caller's original engine would mismatch shapes (or
                # silently read the wrong static capacity) at the next
                # compute/needs_rebuild. Drop them; consumers re-allocate.
                return (new_state.replace(nbrs=None),) + tuple(out[1:])
            return out
        grew = True
        engine = grow()
        state = state.replace(nbrs=None)  # re-allocate at grown capacity
    raise RuntimeError(
        "engine capacity still overflowing after 8 grows during FIRE "
        "minimization — forces would be silently truncated")


def _fire_once(
    state: SimulationState,
    params: Parameters,
    engine,
    *,
    max_steps, tol, dt_initial, dt_max, alpha0, f_inc, f_dec, n_min, dmax,
):
    dtype = state.positions.dtype
    n = state.n_particles
    dim = state.dimension
    ndof = jnp.asarray(dim * (n - 1.0), dtype)
    cell, cell_inv = state.unitcell, state.unitcell_inv
    diameters = state.diameters

    nbrs = state.nbrs
    if nbrs is None:
        nbrs = engine.allocate(state.positions, diameters, cell, cell_inv)

    def forces_at(x, nb):
        return engine_forces(engine, x, diameters, cell, cell_inv, nb)

    def safe_norm(a, axis=None, keepdims=False):
        """max-scaled Euclidean norm: never squares raw values. TPU's
        emulated f64 keeps the f32 exponent range (~1e38), so ||F||^2 of the
        ~1e25-scale forces of an overlapping r^-50 start overflows to inf
        and FIRE stalls (scale = inf/inf = nan zeroes every displacement) —
        while true-f64 CPUs sail through. Scaling by max|a| first keeps
        every intermediate <= sqrt(N)."""
        if axis is None:
            m = jnp.max(jnp.abs(a))
            m_safe = jnp.where(m > 0, m, jnp.ones_like(m))
            return jnp.linalg.norm(a / m_safe) * m
        m = jnp.max(jnp.abs(a), axis=axis, keepdims=True)
        m_safe = jnp.where(m > 0, m, jnp.ones_like(m))
        r = jnp.linalg.norm(a / m_safe, axis=axis, keepdims=keepdims)
        return r * (m if keepdims else jnp.squeeze(m, axis=axis))

    e0, w0, f0, nbrs = forces_at(state.positions, nbrs)
    f_rms0 = safe_norm(f0) / jnp.sqrt(ndof)

    carry0 = _FireCarry(
        positions=state.positions,
        images=state.images,
        v=jnp.zeros_like(state.positions),
        forces=f0,
        energy=e0,
        virial=w0,
        nbrs=nbrs,
        dt=jnp.asarray(dt_initial, dtype),
        alpha=jnp.asarray(alpha0, dtype),
        steps_since_neg=jnp.asarray(0, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        f_rms=f_rms0,
    )

    def cond(c: _FireCarry):
        return (c.step < max_steps) & (c.f_rms >= tol)

    def body(c: _FireCarry) -> _FireCarry:
        # Inertia update (/root/reference/src/minimize.jl:89-102). Norms and
        # the power use the overflow-safe scaled forms (see safe_norm); only
        # the SIGN of P = sum(v . F) matters, so it is computed on
        # max-normalized copies.
        v = c.v + c.dt * c.forces
        vmax = jnp.max(jnp.abs(v))
        fmax = jnp.max(jnp.abs(c.forces))
        vmax_s = jnp.where(vmax > 0, vmax, jnp.ones_like(vmax))
        fmax_s = jnp.where(fmax > 0, fmax, jnp.ones_like(fmax))
        power = jnp.sum((v / vmax_s) * (c.forces / fmax_s))
        vn = jnp.linalg.norm(v / vmax_s)
        fn = jnp.linalg.norm(c.forces / fmax_s)
        do_mix = (vmax > 0) & (fmax > 0)
        scale = c.alpha * (vmax_s / fmax_s) * (
            vn / jnp.where(fn > 0, fn, jnp.ones_like(fn)))
        v = jnp.where(do_mix, (1.0 - c.alpha) * v + scale * c.forces, v)

        # dt / alpha adaptation (/root/reference/src/minimize.jl:104-115).
        positive = power > 0
        ssn_pos = c.steps_since_neg + 1
        grow = ssn_pos > n_min
        dt_pos = jnp.where(grow, jnp.minimum(c.dt * f_inc, dt_max), c.dt)
        alpha_pos = jnp.where(grow, c.alpha * 0.99, c.alpha)

        dt_neg = jnp.maximum(c.dt * f_dec, dt_initial)

        dt = jnp.where(positive, dt_pos, dt_neg)
        alpha = jnp.where(positive, alpha_pos, jnp.asarray(alpha0, dtype))
        steps_since_neg = jnp.where(positive, ssn_pos, jnp.asarray(0, jnp.int32))
        v = jnp.where(positive, v, jnp.zeros_like(v))

        # Position update + wrap (/root/reference/src/minimize.jl:117-123),
        # with a LAMMPS-style per-particle displacement cap ``dmax`` so steep
        # potentials (or overlapping f32 starts) cannot explode the step.
        disp = dt * v
        disp_norm = safe_norm(disp, axis=-1, keepdims=True)
        disp_norm = jnp.where(jnp.isfinite(disp_norm), disp_norm,
                              jnp.full_like(disp_norm, jnp.inf))
        cap = jnp.minimum(1.0, dmax / jnp.maximum(disp_norm, 1e-30))
        disp = jnp.where(jnp.isfinite(disp), disp * cap,
                         jnp.zeros_like(disp))
        x = c.positions + disp
        x, images = wrap_positions(x, c.images, cell, cell_inv)

        energy, virial, forces, nb = forces_at(x, c.nbrs)
        f_rms = safe_norm(forces) / jnp.sqrt(ndof)

        return _FireCarry(
            positions=x, images=images, v=v, forces=forces, energy=energy,
            virial=virial, nbrs=nb, dt=dt, alpha=alpha,
            steps_since_neg=steps_since_neg, step=c.step + 1, f_rms=f_rms,
        )

    final = jax.lax.while_loop(cond, body, carry0)

    new_state = state.replace(
        positions=final.positions,
        images=final.images,
        forces=final.forces,
        energy=final.energy,
        virial=final.virial,
        nbrs=final.nbrs,
    )
    converged = final.f_rms < tol
    return new_state, final.energy, converged, final.step
