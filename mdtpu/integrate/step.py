"""Fused simulation step factories — the jitted hot loop body.

TPU design: one pure function ``step(state) -> state`` fusing integrator,
force engine, thermostat and thermo accumulation; the driver runs it under
``lax.fori_loop`` so the device never syncs with the host between outputs.

Reference call stack being re-designed (SURVEY.md 3.2-3.3):
  MD path:       integrate_half! -> map_pairwise! -> integrate_second_half!
                 -> ensemble_step!   (/root/reference/src/simulation.jl:88-117)
  Brownian path: map_pairwise! -> integrate_brownian!
                 (/root/reference/src/simulation.jl:232-256)

Deliberate fix vs the reference: initial forces are computed at state
construction (the reference starts its first half-kick with zero forces).
RNG: each step uses ``fold_in(state.key, state.step)`` so runs are
deterministic and exactly resumable from a checkpoint.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mdtpu.core.box import wrap_positions, wrap_positions_compensated
from mdtpu.core.types import NVE, NVT, Brownian, Parameters, SimulationState
from mdtpu.integrate.thermostat import compute_temperature
from mdtpu.utils.math import kahan_add

SQRT3 = math.sqrt(3.0)


def engine_forces(engine, positions, diameters, cell, cell_inv, nbrs,
                  force_dtype=None):
    """Evaluate forces, transparently rebuilding the engine's neighbor state
    when stale (fixed shapes, so the rebuild is a ``lax.cond``).

    ``force_dtype``: evaluate the pair sweep in this dtype (e.g. f32) while
    the caller integrates in a wider one (mixed-precision NVE: the O(N*nbrs)
    sweep runs at f32 speed, the O(N) integration in f64 — see
    make_md_step)."""
    if force_dtype is not None and positions.dtype != force_dtype:
        positions = positions.astype(force_dtype)
        diameters = diameters.astype(force_dtype)
        cell = cell.astype(force_dtype)
        cell_inv = cell_inv.astype(force_dtype)
    if nbrs is None:
        # Structure-changing first build (static decision at trace time).
        nbrs = engine.allocate(positions, diameters, cell, cell_inv)
    else:
        rebuild = engine.needs_rebuild(positions, nbrs, cell, cell_inv)
        if isinstance(rebuild, bool):
            # Static answer: skip the cond entirely. Engines whose rebuild
            # policy is external (halo reshard at driver boundaries) or
            # nonexistent (all-pairs) return plain False — important under
            # shard_map, where collectives inside a lax.cond branch are not
            # SPMD-safe even when never taken.
            if rebuild:
                nbrs = engine.allocate(positions, diameters, cell, cell_inv)
        else:
            nbrs = jax.lax.cond(
                rebuild,
                lambda p, n: engine.allocate(p, diameters, cell, cell_inv),
                lambda p, n: n,
                positions,
                nbrs,
            )
    return engine.compute(positions, diameters, cell, cell_inv, nbrs)


def _add(x, comp, dx, compensated: bool):
    if compensated:
        return kahan_add(x, comp, dx)
    return x + dx, comp


def md_velocity_finish(ensemble, v, vc, state, dt, compensated: bool,
                       axis_name: str | None):
    """Post-kick ensemble logic shared by the particle-order and slot step
    factories — the ONE implementation of the reference's ``ensemble_step!``
    physics (/root/reference/src/integrate.jl:40-53): Bussi rescale +
    temperature for NVT (one kinetic reduction serves thermostat AND
    temperature, T_after = scale^2 * 2K/nf — one psum per step on a mesh),
    plain temperature for NVE. Returns ``(v, vc, temperature)``.

    Works on both layouts: (N, d) particle rows and (d, S) slot components
    (unoccupied slots hold zero velocity, so the kinetic sum is exact)."""
    step_1indexed = state.step + 1
    if isinstance(ensemble, NVT):
        from mdtpu.integrate.thermostat import (bussi_scale_from_kinetic,
                                                compute_kinetic)

        ktemp_t = ensemble.ktemp(step_1indexed)
        key_step = jax.random.fold_in(state.key, state.step)
        kinetic = compute_kinetic(v, axis_name=axis_name)
        scale = bussi_scale_from_kinetic(key_step, kinetic, ktemp_t,
                                         state.nf, dt, ensemble.tau,
                                         v.dtype)
        v = v * scale
        temperature = scale * scale * 2.0 * kinetic / state.nf
        if compensated:
            # Rescaling invalidates the velocity compensation buffer.
            vc = jnp.zeros_like(vc)
    else:
        temperature = compute_temperature(v, state.nf, axis_name=axis_name)
    return v, vc, temperature


def brownian_noise(key, step, shape, dtype, axis_name: str | None):
    """The reference's variance-matched uniform noise, xi on
    [-sqrt(3), sqrt(3)] (/root/reference/src/integrate.jl:55-59) — shared by
    both step factories. Per-step key is ``fold_in(key, step)``; on a mesh
    each shard additionally folds in its axis index (key is replicated)."""
    key_step = jax.random.fold_in(key, step)
    if axis_name is not None:
        key_step = jax.random.fold_in(key_step, jax.lax.axis_index(axis_name))
    u = jax.random.uniform(key_step, shape, dtype=dtype)
    return (2.0 * u - 1.0) * SQRT3


def brownian_virial_sample(state, virial):
    """Virial sampled every 10 steps for the averaged Brownian pressure
    (/root/reference/src/simulation.jl:253-256); returns the updated
    ``(virial_accum, nprom)``."""
    take = (state.step % 10) == 0
    virial_accum = state.virial_accum + jnp.where(take, virial, 0.0).astype(
        state.virial_accum.dtype)
    nprom = state.nprom + take.astype(state.nprom.dtype)
    return virial_accum, nprom


def make_md_step(params: Parameters, ensemble, engine, compensated: bool = True,
                 axis_name: str | None = None, force_dtype=None):
    """Velocity-Verlet step with NVE/NVT ensemble logic fused in.

    ``axis_name``: when the step runs inside ``shard_map`` over a device mesh
    (particle arrays row-sharded), global reductions (kinetic energy for the
    thermostat and temperature) become psums over this axis — the SAME physics
    code serves single-device and sharded execution, so the Bussi algebra
    exists exactly once in the codebase. The engine is then responsible for
    its own collectives (see mdtpu.parallel).

    ``force_dtype``: mixed-precision mode — run the pair sweep in this dtype
    (f32: the hot O(N*nbrs) path at full TPU speed) while state integration
    stays in the state's (wider) dtype. With f64 state + f32 forces the NVE
    drift gate passes at near-f32 cost: integration rounding (the drift
    mechanism Kahan cannot fully fix, because the periodic wrap re-rounds
    coordinates) is f64, and the f32 force error enters only as a slow
    random walk."""
    if isinstance(ensemble, Brownian):
        raise TypeError("use make_brownian_step for Brownian dynamics")

    def step(state: SimulationState) -> SimulationState:
        dtype = state.positions.dtype
        dt = jnp.asarray(params.dt, dtype)
        half = 0.5 * dt
        cell, cell_inv = state.unitcell, state.unitcell_inv

        # First half-kick + drift (/root/reference/src/integrate.jl:8-21).
        v, vc = _add(state.velocities, state.vel_comp, state.forces * half, compensated)
        x, xc = _add(state.positions, state.pos_comp, v * dt, compensated)
        if compensated:
            # Delta-form wrap: avoids re-rounding every coordinate per step
            # (the dominant f32 NVE drift source — see box.py).
            x, xc, images = wrap_positions_compensated(x, xc, state.images,
                                                       cell, cell_inv)
        else:
            x, images = wrap_positions(x, state.images, cell, cell_inv)

        # Force evaluation (the analog of map_pairwise!).
        energy, virial, forces, nbrs = engine_forces(
            engine, x, state.diameters, cell, cell_inv, state.nbrs,
            force_dtype=force_dtype,
        )
        if forces.dtype != dtype:
            forces = forces.astype(dtype)
            energy = energy.astype(dtype)
            virial = virial.astype(dtype)

        # Second half-kick (/root/reference/src/integrate.jl:28-38).
        v, vc = _add(v, vc, forces * half, compensated)

        # Ensemble logic — shared implementation (md_velocity_finish); the
        # schedule is called with the 1-indexed step, matching the reference.
        v, vc, temperature = md_velocity_finish(ensemble, v, vc, state, dt,
                                                compensated, axis_name)

        return state.replace(
            positions=x,
            velocities=v,
            forces=forces,
            images=images,
            step=state.step + 1,
            energy=energy,
            virial=virial,
            temperature=temperature,
            pos_comp=xc,
            vel_comp=vc,
            nbrs=nbrs,
        )

    return step


def make_brownian_step(params: Parameters, ensemble: Brownian, engine,
                       compensated: bool = True,
                       axis_name: str | None = None):
    """Overdamped Euler-Maruyama (Ermak-McCammon) step.

    Matches the intended reference behaviour (/root/reference/src/integrate.jl:66-83,
    /root/reference/src/simulation.jl:212): displacement
    ``dx = F * dt / kT + xi * sqrt(2 dt)`` with xi uniform on [-sqrt(3), sqrt(3)]
    (variance-matched uniform noise instead of Gaussians — a standard
    weak-order-1 substitution the reference makes for speed). The reference's
    Brownian driver itself is broken as written (SURVEY.md quirk 1); this
    implements the clearly intended semantics.
    """

    def step(state: SimulationState) -> SimulationState:
        dtype = state.positions.dtype
        dt = jnp.asarray(params.dt, dtype)
        ktemp = jnp.asarray(ensemble.ktemp, dtype)
        sigma = jnp.sqrt(2.0 * dt)
        cell, cell_inv = state.unitcell, state.unitcell_inv

        # Forces FIRST, then move (first-order integrator;
        # /root/reference/src/simulation.jl:232-250).
        energy, virial, forces, nbrs = engine_forces(
            engine, state.positions, state.diameters, cell, cell_inv, state.nbrs
        )

        noise = brownian_noise(state.key, state.step, state.positions.shape,
                               dtype, axis_name)
        dx = forces * (dt / ktemp) + noise * sigma
        x, xc = _add(state.positions, state.pos_comp, dx, compensated)
        if compensated:
            x, xc, images = wrap_positions_compensated(x, xc, state.images,
                                                       cell, cell_inv)
        else:
            x, images = wrap_positions(x, state.images, cell, cell_inv)

        virial_accum, nprom = brownian_virial_sample(state, virial)

        return state.replace(
            positions=x,
            forces=forces,
            images=images,
            step=state.step + 1,
            energy=energy,
            virial=virial,
            temperature=ktemp,
            pos_comp=xc,
            nbrs=nbrs,
            virial_accum=virial_accum,
            nprom=nprom,
        )

    return step


def make_step(params: Parameters, ensemble, engine, compensated: bool = True,
              axis_name: str | None = None, force_dtype=None):
    """Dispatch on ensemble type — the analog of the reference's
    ``ensemble_step!`` multiple dispatch (/root/reference/src/integrate.jl:40-53)
    plus the two ``run_simulation!`` methods. See make_md_step for
    ``axis_name`` (sharded execution) and ``force_dtype`` (mixed-precision
    integration)."""
    if isinstance(ensemble, Brownian):
        return make_brownian_step(params, ensemble, engine, compensated,
                                  axis_name=axis_name)
    if isinstance(ensemble, (NVT, NVE)):
        return make_md_step(params, ensemble, engine, compensated,
                            axis_name=axis_name, force_dtype=force_dtype)
    raise TypeError(f"unknown ensemble type: {type(ensemble).__name__}")
