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

    Cell-grid engines route through the SLOT-SPACE loop
    (:func:`fire_minimize_slots`): the whole minimization runs in
    component-major cell-sorted order with the rebuild hoisted into a
    nested while_loop, so each force evaluation pays neither the per-step
    scatter into the slot grid nor the force gather back (the two ops the
    dynamics' slot loop exists to remove — measured ~3.7x of the sweep at
    65k, BENCH_NOTES). Other engines (naive oracle, (N, K) neighbor list)
    keep the particle-order loop.

    Engine capacity overflow (dropped pairs/rows) would silently truncate
    forces and let the RMS-force test "converge" on a configuration that
    still has contacts — the run retries with grown capacity until the
    overflow flag clears (same policy as the driver's restore-and-rerun).
    """
    if hasattr(engine, "compute_slots"):
        return _fire_slots_with_retries(
            state, params, engine, max_steps=max_steps, tol=tol,
            dt_initial=dt_initial, dt_max=dt_max, alpha0=alpha0,
            f_inc=f_inc, f_dec=f_dec, n_min=n_min, dmax=dmax)
    caller_engine = engine
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
                # never sees: its grown-capacity nbrs would mismatch the
                # caller's engine's static shapes at the next
                # compute/needs_rebuild. Re-allocate on the CALLER's engine
                # so both paths honor the same contract (state.nbrs is live
                # and matches the engine that was passed in); if the
                # caller's capacity is genuinely too small for the
                # minimized configuration, its overflow flag raises at the
                # next compute — flagged, never silent.
                nbrs = caller_engine.allocate(
                    new_state.positions, new_state.diameters,
                    new_state.unitcell, new_state.unitcell_inv)
                return (new_state.replace(nbrs=nbrs),) + tuple(out[1:])
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


# --------------------------------------------------------------- slot space
# FIRE over the component-major cell-sorted slot layout: the minimization
# analog of mdtpu.integrate.slot_step — every force evaluation is
# reshape-only (no scatter into the grid, no force gather back; those two
# irregular ops cost ~3.7x the pair sweep at the 65k bench), rebuilds are
# hoisted into a nested while_loop exactly like make_slot_advance, and all
# global reductions (RMS force, FIRE power, norms) are psum/pmax-able so the
# SAME choreography runs single-chip and under shard_map (the sharded
# minimize the reference cannot express; /root/reference/src/minimize.jl:31
# is the role analog).


class _FireScalars(NamedTuple):
    dt: Any
    alpha: Any
    steps_since_neg: Any
    step: Any
    f_rms: Any


def make_slot_fire(engine, *, max_steps=10000, tol=1e-6, dt_initial=0.01,
                   dt_max=0.1, alpha0=0.1, f_inc=1.2, f_dec=0.2, n_min=5,
                   dmax=0.1, axis_name=None):
    """``run(slot_state) -> (slot_state, f_rms, converged, n_steps,
    overflow)`` — the whole FIRE minimization as ONE traceable program over
    a slot-layout state (positions/velocities/forces (d, n_slots),
    ``state.velocities`` carries FIRE's internal velocity; vacant slots hold
    far-pad coordinates and zeros, so every reduction is exact).

    ``axis_name``: run the SAME program inside ``shard_map`` over the
    slot-sharded state (HaloSlotEngine) — scalar reductions psum, maxima
    pmax, the rebin migrates rows on device (collective-bearing rebins run
    unconditionally per outer iteration, never under lax.cond). The
    ``overflow`` output is the global sticky capacity/migration flag: a
    True run must be retried at grown capacity from the ORIGINAL state
    (overflowed rebins drop rows)."""
    from mdtpu.integrate.slot_step import _engine_needs_rebin, _engine_rebin

    def pmax(x):
        return jax.lax.pmax(x, axis_name) if axis_name else x

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def gmax_abs(a):
        return pmax(jnp.max(jnp.abs(a)))

    def gsum(a):
        return psum(jnp.sum(a))

    def gnorm_scaled(a, m_safe):
        """Global L2 norm of a/m_safe (overflow-safe when m_safe is the
        global max |a|: TPU's emulated f64 keeps the f32 exponent range, so
        ||F||^2 of ~1e25-scale overlap forces would hit inf; see the
        particle-order fire's safe_norm)."""
        return jnp.sqrt(gsum((a / m_safe) ** 2))

    def g_f_rms(forces, ndof):
        fm = gmax_abs(forces)
        fm_s = jnp.where(fm > 0, fm, jnp.ones_like(fm))
        return gnorm_scaled(forces, fm_s) * fm_s / jnp.sqrt(ndof)

    def overflow_any(s):
        local = jnp.asarray(s.nbrs.overflow).any()
        if axis_name is not None:
            return jax.lax.psum(local.astype(jnp.int32), axis_name) > 0
        return local

    def sweep(s, observables=True):
        # Lean in-loop sweeps: FIRE consumes only forces per iteration
        # (energy/virial are refreshed by one full sweep at exit), which
        # skips the energy polynomial + virial accumulation passes — same
        # trick as make_slot_advance's lean steps, forces bitwise
        # identical.
        e, w, f, nbrs = engine.compute_slots(
            s.positions, s.diameters, s.unitcell, s.unitcell_inv, s.nbrs,
            observables=observables)
        if not observables:
            e, w = s.energy, s.virial
        return s.replace(forces=f, energy=e, virial=w, nbrs=nbrs)

    def fire_step(s, sc, ndof):
        dtype = s.positions.dtype
        v = s.velocities + sc.dt * s.forces
        vmax = gmax_abs(v)
        fmax = gmax_abs(s.forces)
        vmax_s = jnp.where(vmax > 0, vmax, jnp.ones_like(vmax))
        fmax_s = jnp.where(fmax > 0, fmax, jnp.ones_like(fmax))
        # Only the SIGN of P = sum(v . F) matters: computed on
        # max-normalized copies (/root/reference/src/minimize.jl:89-102).
        power = gsum((v / vmax_s) * (s.forces / fmax_s))
        vn = gnorm_scaled(v, vmax_s)
        fn = gnorm_scaled(s.forces, fmax_s)
        do_mix = (vmax > 0) & (fmax > 0)
        scale = sc.alpha * (vmax_s / fmax_s) * (
            vn / jnp.where(fn > 0, fn, jnp.ones_like(fn)))
        v = jnp.where(do_mix, (1.0 - sc.alpha) * v + scale * s.forces, v)

        # dt / alpha adaptation (/root/reference/src/minimize.jl:104-115).
        positive = power > 0
        ssn_pos = sc.steps_since_neg + 1
        grow = ssn_pos > n_min
        dt_pos = jnp.where(grow, jnp.minimum(sc.dt * f_inc, dt_max), sc.dt)
        alpha_pos = jnp.where(grow, sc.alpha * 0.99, sc.alpha)
        dt_neg = jnp.maximum(sc.dt * f_dec, dt_initial)
        dt = jnp.where(positive, dt_pos, dt_neg)
        alpha = jnp.where(positive, alpha_pos, jnp.asarray(alpha0, dtype))
        ssn = jnp.where(positive, ssn_pos, jnp.asarray(0, jnp.int32))
        v = jnp.where(positive, v, jnp.zeros_like(v))

        # Per-slot displacement cap ``dmax`` (LAMMPS-style), rows are
        # component-major so the slot norm reduces axis 0; vacant slots
        # have v = 0 and never move. The wrap is DEFERRED to rebin time
        # (same contract as the dynamics' slot loop).
        disp = dt * v
        m = jnp.max(jnp.abs(disp), axis=0, keepdims=True)
        m_safe = jnp.where(m > 0, m, jnp.ones_like(m))
        dnorm = jnp.sqrt(jnp.sum((disp / m_safe) ** 2, axis=0,
                                 keepdims=True)) * m
        dnorm = jnp.where(jnp.isfinite(dnorm), dnorm,
                          jnp.full_like(dnorm, jnp.inf))
        cap = jnp.minimum(1.0, dmax / jnp.maximum(dnorm, 1e-30))
        disp = jnp.where(jnp.isfinite(disp), disp * cap,
                         jnp.zeros_like(disp))

        s = s.replace(positions=s.positions + disp, velocities=v)
        s = sweep(s, observables=False)
        f_rms = g_f_rms(s.forces, ndof)
        return s, _FireScalars(dt, alpha, ssn, sc.step + 1, f_rms)

    def run(state):
        dtype = state.positions.dtype
        ndof = jnp.asarray(state.nf, dtype)
        state = state.replace(
            velocities=jnp.zeros_like(state.velocities),
            vel_comp=jnp.zeros_like(state.vel_comp))
        state = sweep(state)
        f_rms0 = g_f_rms(state.forces, ndof)
        sc0 = _FireScalars(jnp.asarray(dt_initial, dtype),
                           jnp.asarray(alpha0, dtype),
                           jnp.asarray(0, jnp.int32),
                           jnp.asarray(0, jnp.int32), f_rms0)
        ovf0 = overflow_any(state)

        def outer_cond(c):
            s, sc, ovf = c
            return (sc.step < max_steps) & (sc.f_rms >= tol) & ~ovf

        def outer_body(c):
            s, sc, ovf = c
            # Rebin UNCONDITIONALLY: the inner loop exits to here exactly
            # when a rebuild is needed (or on the very first entry, where
            # one extra rebin is exact and cheap), so the drift re-check +
            # lax.cond the dynamics' advance uses would be pure overhead at
            # FIRE's rebin cadence (~every 4 iterations at the dmax cap —
            # vs ~25+ steps for thermal dynamics). Also what the sharded
            # engine requires anyway (collectives under lax.cond are not
            # SPMD-safe).
            s = _engine_rebin(s, engine)
            ovf = ovf | overflow_any(s)

            # Same inner-predicate rule as make_slot_advance: the while
            # cond reads carried scalars only; the O(n_slots) drift
            # reduction and the overflow reduction are computed in the
            # body where they fuse with the step.
            def inner_cond(ci):
                s2, sc2, rebuild, ovf2 = ci
                return ((sc2.step < max_steps) & (sc2.f_rms >= tol)
                        & ~rebuild & ~ovf2)

            def inner_body(ci):
                s2, sc2, _, ovf2 = ci
                s2, sc2 = fire_step(s2, sc2, ndof)
                return (s2, sc2, _engine_needs_rebin(s2, engine, axis_name),
                        ovf2 | overflow_any(s2))

            s, sc, _, ovf = jax.lax.while_loop(
                inner_cond, inner_body,
                (s, sc, jnp.asarray(False), ovf))
            return s, sc, ovf

        state, sc, ovf = jax.lax.while_loop(outer_cond, outer_body,
                                            (state, sc0, ovf0))
        # In-loop sweeps are lean (forces only): one full sweep refreshes
        # energy/virial at the reported minimum.
        state = sweep(state)
        converged = (sc.f_rms < tol) & ~ovf
        return state, sc.f_rms, converged, sc.step, ovf

    return run


_SLOT_FIRE_CACHE: dict = {}


def _slot_fire_jit(engine, key_extra, axis_name=None, mesh=None,
                   spec_state=None, **hyper):
    """Compiled slot-FIRE programs cached across calls (same rationale as
    the driver's _ADVANCE_CACHE: rebuilding the closure re-traces the whole
    fused while_loop program)."""
    try:
        key = (engine, axis_name, mesh, key_extra,
               tuple(sorted(hyper.items())))
        cached = _SLOT_FIRE_CACHE.get(key)
    except TypeError:
        key, cached = None, None
    if cached is not None:
        return cached
    run = make_slot_fire(engine, axis_name=axis_name, **hyper)
    if axis_name is None:
        fn = jax.jit(run)
    else:
        from jax.sharding import PartitionSpec as P

        from mdtpu.parallel.halo_slot import slot_state_specs

        specs = slot_state_specs(engine, spec_state,
                                 float(spec_state.cutoff))
        fn = jax.jit(jax.shard_map(
            run, mesh=mesh, in_specs=(specs,),
            out_specs=(specs, P(), P(), P(), P()), check_vma=False))
    if key is not None:
        _SLOT_FIRE_CACHE[key] = fn
    return fn


def fire_minimize_slots(state: SimulationState, engine, **hyper):
    """FIRE over an already-slotified single-chip state. Returns
    ``(slot_state, f_rms, converged, n_steps, overflow)``; the returned
    state's ``velocities`` hold FIRE's internal velocity (callers that need
    the original velocities restore them — particle identity survives via
    ids, see :func:`fire_minimize`)."""
    return _slot_fire_jit(engine, None, **hyper)(state)


def _fire_slots_with_retries(state, params, engine, **hyper):
    """Particle-order in/out wrapper over the slot FIRE (the
    ``fire_minimize`` cell-grid path): slotify, run, unslotify, restore the
    caller's velocities; on capacity overflow (initial binning OR a rebin
    inside the loop) retry from the ORIGINAL state at grown capacity —
    an overflowed rebin drops rows, so mid-run states are unusable."""
    from mdtpu.integrate.slot_step import slotify, unslotify_state

    velocities0 = state.velocities
    start = state.replace(nbrs=None)
    for _ in range(8):
        st = slotify(start, engine)
        if not bool(st.nbrs.overflow):
            st, f_rms, converged, n_steps, ovf = fire_minimize_slots(
                st, engine, **hyper)
            if not bool(ovf):
                out = unslotify_state(st)
                out = out.replace(velocities=velocities0)
                return out, out.energy, bool(converged), int(n_steps)
        grow = getattr(engine, "with_grown_capacity", None)
        if grow is None:
            raise RuntimeError(
                "engine capacity overflowed during FIRE and the engine "
                "cannot grow")
        engine = grow()
    raise RuntimeError(
        "engine capacity still overflowing after 8 grows during FIRE "
        "minimization — forces would be silently truncated")


def fire_minimize_sharded(state: SimulationState, params: Parameters,
                          engine, mesh, **hyper):
    """Sharded FIRE minimization over a device mesh — ``state`` is an
    ordinary (N, d) particle-order state, ``engine`` a
    :class:`~mdtpu.parallel.halo_slot.HaloSlotEngine` (default: tuned for
    the mesh). The SAME slot-FIRE program as the single-chip path runs
    under ``shard_map``: forces via the halo-exchange slot sweep, rebins
    migrate rows on device, RMS-force/power reductions psum. Returns
    ``(state, energy, converged, n_steps)`` in particle order (same
    contract as :func:`fire_minimize`). Capability the reference cannot
    express (single-process; /root/reference/src/minimize.jl:31-135)."""
    import numpy as np

    from mdtpu.integrate.slot_step import CapacityOverflowError
    from mdtpu.parallel.halo_slot import (HaloSlotEngine,
                                          build_sharded_slot_state,
                                          unshard_slot_state)

    if engine is None:
        engine = HaloSlotEngine.create_tuned(
            params.potential, float(state.cutoff),
            np.asarray(state.unitcell), state.n_particles,
            n_shards=mesh.devices.size,
            diameters=np.asarray(state.diameters), workload="minimize")
    velocities0 = state.velocities
    start = state.replace(nbrs=None)
    for _ in range(8):
        try:
            sh = build_sharded_slot_state(start, engine, mesh)
        except CapacityOverflowError:
            engine = engine.with_grown_capacity()
            continue
        fn = _slot_fire_jit(engine, state.n_particles,
                            axis_name=engine.axis_name, mesh=mesh,
                            spec_state=sh, **hyper)
        sh, f_rms, converged, n_steps, ovf = fn(sh)
        if not bool(np.asarray(ovf)):
            out = unshard_slot_state(sh)
            out = out.replace(velocities=velocities0)
            return out, out.energy, bool(converged), int(n_steps)
        engine = engine.with_grown_capacity()
    raise RuntimeError(
        "engine capacity still overflowing after 8 grows during sharded "
        "FIRE minimization")
