"""SPMD sharded simulation step (multi-chip scaling path).

Two complementary mechanisms, both exercised by the fake-mesh CPU tests:

1. ``shard_state`` + ``make_sharded_step``: GSPMD auto-partitioning — particle
   arrays carry a ``NamedSharding(P("shard"))``, the fused step is jitted over
   the mesh, and XLA inserts the collectives (all-gather of positions for the
   pair interaction, psum for the energy/virial/kinetic reductions). This is
   the "annotate shardings, let XLA place collectives" recipe and needs zero
   changes to the physics code.

2. ``make_shard_map_step``: an explicit ``shard_map`` version where each
   device owns an N/P particle slab, all-gathers remote positions over ICI for
   the pair sweep, and combines scalars with ``psum`` — the hand-written
   communication pattern that later rounds refine into ring halo exchange
   (``ppermute`` over the 27-cell stencil, SURVEY.md section 5 long-context
   row). Global operations (Bussi's single rescale factor, temperature)
   require cross-shard reductions, which appear here explicitly.

Both produce bit-identical physics to the single-device step (up to reduction
order), verified in tests/test_parallel.py on 8 virtual CPU devices.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mdtpu.core.box import minimum_image, wrap_positions
from mdtpu.core.types import NVE, NVT, Brownian, Parameters, SimulationState
from mdtpu.parallel.mesh import SHARD_AXIS, particle_sharding, replicated
from mdtpu.utils.math import kahan_add

_PARTICLE_FIELDS = (
    "positions", "velocities", "forces", "images", "diameters",
    "pos_comp", "vel_comp",
)


def shard_state(state: SimulationState, mesh: Mesh) -> SimulationState:
    """Place particle arrays row-sharded over the mesh, everything else
    replicated. N must be divisible by the mesh size (pad upstream if not)."""
    p_shard = particle_sharding(mesh)
    rep = replicated(mesh)

    def place(name, val):
        if val is None:
            return None
        target = p_shard if name in _PARTICLE_FIELDS else rep
        return jax.device_put(val, target)

    updates = {name: place(name, getattr(state, name))
               for name in _PARTICLE_FIELDS}
    for name in ("unitcell", "unitcell_inv", "key", "step", "nf", "energy",
                 "virial", "temperature", "virial_accum", "nprom"):
        updates[name] = place("replicated:" + name, getattr(state, name))
    return state.replace(**updates)


def make_sharded_step(params: Parameters, ensemble, engine, mesh: Mesh,
                      compensated: bool = True, donate: bool = True):
    """GSPMD path: the ordinary fused step jitted over the mesh. Works with
    any engine; XLA partitions the (N, N) / (N, K) pair math over the shard
    axis and inserts the collectives."""
    from mdtpu.integrate.step import make_step

    step = make_step(params, ensemble, engine, compensated=compensated)
    kwargs = dict(donate_argnums=(0,)) if donate else {}
    return jax.jit(step, **kwargs)


# ---------------------------------------------------------------------------
# Explicit shard_map step (all-pairs engine, collective-aware physics)
# ---------------------------------------------------------------------------


def _local_pair_sweep(potential, cutoff, x_local, diam_local, x_all, diam_all,
                      cell, cell_inv, shard_index, shard_size):
    """Pair interactions of a local particle slab against ALL particles.

    Each pair is seen from both sides across shards, so energy/virial are
    halved and force rows need no scatter — identical inversion to the
    single-device naive engine. Component-wise (local, N) tiles and the
    sqrt-free evaluate_r2 path (see mdtpu.ops.naive layout note).
    """
    n_all = x_all.shape[0]
    dim = x_local.shape[1]
    xl_t, xa_t = x_local.T, x_all.T

    d_comps = [xl_t[k][:, None] - xa_t[k][None, :] for k in range(dim)]
    frac = [sum(cell_inv[k, j] * d_comps[j] for j in range(dim))
            for k in range(dim)]
    frac = [f - jnp.round(f) for f in frac]
    d_comps = [sum(cell[i, k] * frac[k] for k in range(dim)) for i in range(dim)]
    r2 = sum(dc * dc for dc in d_comps)

    # Mask out self-pairs: local row i is global row shard_index*shard_size + i.
    local_rows = jnp.arange(x_local.shape[0]) + shard_index * shard_size
    self_mask = local_rows[:, None] == jnp.arange(n_all)[None, :]
    cutoff = jnp.asarray(cutoff, x_local.dtype)
    mask = (~self_mask) & (r2 < cutoff * cutoff)

    r2_safe = jnp.where(mask, r2, jnp.ones_like(r2))
    u, f_over_r = potential.evaluate_r2(r2_safe, diam_local[:, None],
                                        diam_all[None, :])
    u = jnp.where(mask, u, jnp.zeros_like(u))
    f_over_r = jnp.where(mask, f_over_r, jnp.zeros_like(f_over_r))

    energy_partial = 0.5 * jnp.sum(u)
    virial_partial = 0.5 * jnp.sum(f_over_r * r2_safe)
    forces_local = jnp.stack(
        [jnp.sum(f_over_r * dc, axis=1) for dc in d_comps], axis=-1
    )
    return energy_partial, virial_partial, forces_local


def make_shard_map_step(params: Parameters, ensemble, engine, mesh: Mesh,
                        compensated: bool = True):
    """Explicit-collective step: all-pairs engine under shard_map.

    State layout: particle fields sharded over rows; cell/key/step/etc.
    replicated. Reductions over the shard axis are explicit psums.
    """
    from mdtpu.integrate.thermostat import sum_noises

    potential = params.potential
    cutoff = engine.cutoff
    is_nvt = isinstance(ensemble, NVT)
    is_brownian = isinstance(ensemble, Brownian)
    axis = SHARD_AXIS
    n_shards = mesh.devices.size

    def step_local(state: SimulationState) -> SimulationState:
        dtype = state.positions.dtype
        dt = jnp.asarray(params.dt, dtype)
        half = 0.5 * dt
        cell, cell_inv = state.unitcell, state.unitcell_inv
        shard_index = jax.lax.axis_index(axis)
        shard_size = state.positions.shape[0]
        nf = state.nf

        def pair_sweep(x_local, diam_local):
            x_all = jax.lax.all_gather(x_local, axis, tiled=True)
            diam_all = jax.lax.all_gather(diam_local, axis, tiled=True)
            e_p, w_p, f_local = _local_pair_sweep(
                potential, cutoff, x_local, diam_local, x_all, diam_all,
                cell, cell_inv, shard_index, shard_size,
            )
            energy = jax.lax.psum(e_p, axis)
            virial = jax.lax.psum(w_p, axis)
            return energy, virial, f_local

        def add(x, c, dx):
            if compensated:
                return kahan_add(x, c, dx)
            return x + dx, c

        if is_brownian:
            energy, virial, forces = pair_sweep(state.positions, state.diameters)
            ktemp = jnp.asarray(ensemble.ktemp, dtype)
            key_step = jax.random.fold_in(state.key, state.step)
            key_shard = jax.random.fold_in(key_step, shard_index)
            u = jax.random.uniform(key_shard, state.positions.shape, dtype=dtype)
            noise = (2.0 * u - 1.0) * jnp.sqrt(jnp.asarray(3.0, dtype))
            dx = forces * (dt / ktemp) + noise * jnp.sqrt(2.0 * dt)
            x, xc = add(state.positions, state.pos_comp, dx)
            x, images = wrap_positions(x, state.images, cell, cell_inv)
            take = (state.step % 10) == 0
            return state.replace(
                positions=x, forces=forces, images=images,
                step=state.step + 1, energy=energy, virial=virial,
                temperature=ktemp, pos_comp=xc,
                virial_accum=state.virial_accum + jnp.where(take, virial, 0.0),
                nprom=state.nprom + take.astype(state.nprom.dtype),
            )

        # MD path: kick-drift-wrap, pair sweep, kick, thermostat.
        v, vc = add(state.velocities, state.vel_comp, state.forces * half)
        x, xc = add(state.positions, state.pos_comp, v * dt)
        x, images = wrap_positions(x, state.images, cell, cell_inv)

        energy, virial, forces = pair_sweep(x, state.diameters)
        v, vc = add(v, vc, forces * half)

        step_1indexed = state.step + 1
        kinetic = 0.5 * jax.lax.psum(jnp.sum(v * v), axis)
        current_t = 2.0 * kinetic / nf
        if is_nvt:
            ktemp_t = jnp.asarray(ensemble.ktemp(step_1indexed), dtype)
            # Bussi: ONE global rescale factor — same RNG draws on every shard
            # (replicated key), kinetic energy psum'ed above.
            key_step = jax.random.fold_in(state.key, state.step)
            k1, k2 = jax.random.split(key_step)
            r1 = jax.random.normal(k1, dtype=jnp.float32).astype(dtype)
            r2 = sum_noises(k2, nf - 1.0).astype(dtype)
            term_1 = jnp.exp(-dt / jnp.asarray(ensemble.tau, dtype))
            c2 = (1.0 - term_1) * ktemp_t / (current_t * nf)
            scale = jnp.sqrt(term_1 + c2 * (r2 + r1 * r1)
                             + 2.0 * r1 * jnp.sqrt(term_1 * c2))
            v = v * scale
            if compensated:
                vc = jnp.zeros_like(vc)
            kinetic = 0.5 * jax.lax.psum(jnp.sum(v * v), axis)
            current_t = 2.0 * kinetic / nf

        return state.replace(
            positions=x, velocities=v, forces=forces, images=images,
            step=step_1indexed, energy=energy, virial=virial,
            temperature=current_t, pos_comp=xc, vel_comp=vc,
        )

    spec_tree = state_partition_specs(cutoff=float(engine.cutoff))
    fn = jax.shard_map(
        step_local, mesh=mesh,
        in_specs=(spec_tree,), out_specs=spec_tree,
        check_vma=False,
    )
    return jax.jit(fn)


def state_partition_specs(cutoff: float = 1.5) -> SimulationState:
    """Prefix pytree of PartitionSpecs for a SimulationState: particle arrays
    row-sharded, everything else replicated. ``cutoff`` must match the state's
    static cutoff field (pytree metadata)."""
    import dataclasses

    field_names = [f.name for f in dataclasses.fields(SimulationState)
                   if f.name not in ("nbrs", "cutoff")]
    return SimulationState(
        **{f: (P(SHARD_AXIS) if f in _PARTICLE_FIELDS else P())
           for f in field_names},
        nbrs=None,
        cutoff=cutoff,
    )
