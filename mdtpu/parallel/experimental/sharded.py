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

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from mdtpu.core.types import Parameters, SimulationState
from mdtpu.parallel.mesh import SHARD_AXIS, particle_sharding, replicated

_PARTICLE_FIELDS = (
    "positions", "velocities", "forces", "images", "diameters",
    "pos_comp", "vel_comp", "ids",
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


@struct.dataclass
class ShardedAllPairsEngine:
    """All-pairs engine for a row-sharded particle slab under ``shard_map``.

    Implements the standard engine protocol (allocate/compute/needs_rebuild)
    so the ordinary ``make_step`` physics runs unchanged on a mesh: compute()
    all-gathers remote positions over ICI for the pair sweep of the local slab
    and psums the energy/virial scalars — the explicit-collective analog of
    CellListMap's thread-local outputs + reducer
    (/root/reference/src/pairwise.jl:2-23). Forces for local rows need no
    communication (each pair is evaluated on both owning shards).

    For the scalable O(N/P) production engine see
    mdtpu.parallel.halo.HaloCellGridEngine.
    """

    potential: Any
    cutoff: Any = struct.field(pytree_node=False, default=1.5)
    axis_name: str = struct.field(pytree_node=False, default=SHARD_AXIS)

    def allocate(self, positions, diameters, cell, cell_inv):
        # None (not ()) keeps the state pytree structure identical across
        # steps under shard_map's fixed in/out specs.
        return None

    def needs_rebuild(self, positions, nbrs, cell, cell_inv):
        # Plain False: statically skips the rebuild cond (collectives inside
        # a lax.cond branch are not SPMD-safe under shard_map).
        return False

    def compute(self, positions, diameters, cell, cell_inv, nbrs=None):
        axis = self.axis_name
        x_all = jax.lax.all_gather(positions, axis, tiled=True)
        diam_all = jax.lax.all_gather(diameters, axis, tiled=True)
        e_p, w_p, f_local = _local_pair_sweep(
            self.potential, self.cutoff, positions, diameters, x_all,
            diam_all, cell, cell_inv, jax.lax.axis_index(axis),
            positions.shape[0],
        )
        energy = jax.lax.psum(e_p, axis)
        virial = jax.lax.psum(w_p, axis)
        return energy, virial, f_local, nbrs


def make_shard_map_step(params: Parameters, ensemble, engine, mesh: Mesh,
                        compensated: bool = True, state_cutoff=None):
    """Explicit-collective step under shard_map.

    The physics is the ordinary ``make_step`` (ONE implementation of the
    Velocity-Verlet / Bussi / Brownian algebra in the codebase) invoked with
    ``axis_name`` so its global reductions become psums; the pair sweep is an
    engine with collectives inside. ``engine`` selects the sweep: a
    HaloCellGridEngine (or any protocol-compatible sharded engine) is used
    as-is; anything else (e.g. the single-device NaivePairEngine) is mapped to
    the all-gather ShardedAllPairsEngine with the same potential and cutoff.

    State layout: particle fields sharded over rows; cell/key/step/etc.
    replicated.
    """
    from mdtpu.integrate.step import make_step

    if not hasattr(engine, "axis_name"):
        engine = ShardedAllPairsEngine(potential=engine.potential,
                                       cutoff=engine.cutoff,
                                       axis_name=SHARD_AXIS)
    axis = getattr(engine, "axis_name", SHARD_AXIS)
    step_local = make_step(params, ensemble, engine, compensated=compensated,
                           axis_name=axis)

    # The spec tree's static metadata must match the state's (cutoff is
    # pytree metadata on SimulationState); pass state_cutoff when the state
    # was built with a different cutoff than the engine's.
    if state_cutoff is None:
        state_cutoff = float(engine.cutoff)
    nbrs_spec = (engine.nbrs_partition_specs()
                 if hasattr(engine, "nbrs_partition_specs") else None)
    spec_tree = state_partition_specs(cutoff=state_cutoff, nbrs=nbrs_spec)
    fn = jax.shard_map(
        step_local, mesh=mesh,
        in_specs=(spec_tree,), out_specs=spec_tree,
        check_vma=False,
    )
    return jax.jit(fn)


def state_partition_specs(cutoff: float = 1.5, nbrs=None) -> SimulationState:
    """Prefix pytree of PartitionSpecs for a SimulationState: particle arrays
    row-sharded, everything else replicated. ``cutoff`` must match the state's
    static cutoff field (pytree metadata); ``nbrs`` is the engine's neighbor
    state spec subtree (None for stateless sharded engines)."""
    import dataclasses

    field_names = [f.name for f in dataclasses.fields(SimulationState)
                   if f.name not in ("nbrs", "cutoff")]
    return SimulationState(
        **{f: (P(SHARD_AXIS) if f in _PARTICLE_FIELDS else P())
           for f in field_names},
        nbrs=nbrs,
        cutoff=cutoff,
    )
