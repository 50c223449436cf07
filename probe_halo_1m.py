"""Attribute the sharded per-chip overhead at 1M per shard (VERDICT r5
item 2b): the residual 16.2% (post-gather-rebin) decomposed into

  * per-step SWEEP overhead: sharded compute_slots (window construct +
    batched window/reaction ppermutes + psums on a 1-device mesh) vs the
    single-chip plane-scan sweep, both timed as fused force-only
    fori_loops (no rebins),
  * per-REBIN overhead: HaloSlotEngine.slot_rebin (escape detection,
    fixed-shape migration ppermute buffers, edge clamps + packed_resort)
    vs the single-chip packed_resort rebin, one-shot timings,
  * rebin CADENCE: counted by a jitted advance-like loop that carries a
    rebin counter (same nested while_loop as make_slot_advance).

overhead/step ~= d_sweep + d_rebin / cadence (+ unexplained remainder
printed as such). Run on the real TPU chip.
"""

import json
import time

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def _system(n, rho=0.76, temp=1.4737, dtype=jnp.float32):
    from mdtpu.core.types import Parameters
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.sim.initialization import lattice_fluid_state

    state = lattice_fluid_state(n, rho, temp, dtype=dtype, cutoff=2.5,
                                jitter=0.01)
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    return state, params, pot


def _best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main(n=1048576):
    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import (_rebin, make_slot_advance,
                                           slot_forces, slotify)
    from mdtpu.parallel.halo_slot import (HaloSlotEngine,
                                          build_sharded_slot_state,
                                          make_sharded_slot_advance)
    from mdtpu.parallel.mesh import make_mesh

    state, params, pot = _system(n)
    cell_np = np.asarray(state.unitcell)
    mesh = make_mesh(1)
    eng = HaloSlotEngine.create_tuned(pot, 2.5, cell_np, n, n_shards=1)
    single = eng.as_single_chip()
    print(json.dumps({"geometry": [list(eng.grid), eng.cell_capacity,
                                   round(eng.skin, 3),
                                   int(eng.plane_scan)]}), flush=True)

    # --- melt both states to steady-state fluid (sharded layout == global
    # slotify on a 1-device mesh, so melt once and share coordinates).
    st_single = slot_forces(slotify(state, single), single)
    adv_single = jax.jit(make_slot_advance(params, NVT(1.4737, 0.4), single))
    st_single = jax.block_until_ready(adv_single(st_single, 300))

    sh = build_sharded_slot_state(state, eng, mesh)
    adv_sh = make_sharded_slot_advance(params, NVT(1.4737, 0.4), eng, mesh,
                                       sh)
    sh = jax.block_until_ready(adv_sh(sh, 300))

    # --- (0) end-to-end rates (the bench_halo --large numbers, re-measured
    # here so every piece below shares one session's RPC conditions).
    K = 100
    t_single = _best(lambda: adv_single(st_single, K)) / K
    t_sh = _best(lambda: adv_sh(sh, K)) / K
    print(json.dumps({"end_to_end_ms_single": round(t_single * 1e3, 3),
                      "end_to_end_ms_sharded": round(t_sh * 1e3, 3),
                      "overhead_pct": round((t_sh / t_single - 1) * 100,
                                            1)}), flush=True)

    # --- (1) force-only sweep loops (no rebin, lean): K sweeps chained so
    # the per-RPC floor amortizes; chain by feeding forces back as a dummy
    # dependency (positions unchanged -> no rebin need, no drift).
    from jax.sharding import PartitionSpec as P
    from mdtpu.parallel.halo_slot import slot_state_specs

    specs = slot_state_specs(eng, sh, float(sh.cutoff))
    ax = eng.axis_name

    def sweep_loop_single(st, k):
        def body(i, carry):
            x, f = carry
            e, w, f2, _ = single.compute_slots(
                x + 0.0 * f[:1, :1].sum(), st.diameters, st.unitcell,
                st.unitcell_inv, st.nbrs, observables=False)
            return x, f2
        return jax.lax.fori_loop(0, k, body, (st.positions, st.forces))[1]

    j_single = jax.jit(sweep_loop_single, static_argnums=1)
    jax.block_until_ready(j_single(st_single, K))
    t_sweep_single = _best(lambda: j_single(st_single, K)) / K

    def sweep_loop_sharded(x, diam, cellm, cell_inv, nbrs, k):
        def inner(x, diam, nbrs):
            def body(i, carry):
                xx, f = carry
                e, w, f2, _ = eng.compute_slots(
                    xx + 0.0 * f[:1, :1].sum(), diam, cellm, cell_inv,
                    nbrs, observables=False)
                return xx, f2
            return jax.lax.fori_loop(0, k, body,
                                     (x, jnp.zeros_like(x)))[1]
        return jax.shard_map(inner, mesh=mesh,
                             in_specs=(P(None, ax), P(ax), specs.nbrs),
                             out_specs=P(None, ax),
                             check_vma=False)(x, diam, nbrs)

    j_sh = jax.jit(sweep_loop_sharded, static_argnums=5)
    args = (sh.positions, sh.diameters, sh.unitcell, sh.unitcell_inv,
            sh.nbrs)
    jax.block_until_ready(j_sh(*args, K))
    t_sweep_sh = _best(lambda: j_sh(*args, K)) / K
    print(json.dumps({"sweep_ms_single": round(t_sweep_single * 1e3, 3),
                      "sweep_ms_sharded": round(t_sweep_sh * 1e3, 3),
                      "d_sweep_ms": round((t_sweep_sh - t_sweep_single) * 1e3,
                                          3)}), flush=True)

    # --- (2) one-shot rebins (big enough that the RPC floor is noise).
    j_reb_single = jax.jit(lambda s: _rebin(s, single))
    jax.block_until_ready(j_reb_single(st_single))
    t_reb_single = _best(lambda: j_reb_single(st_single))

    j_reb_sh = jax.jit(
        jax.shard_map(lambda s: eng.slot_rebin(s), mesh=mesh,
                      in_specs=(specs,), out_specs=specs, check_vma=False))
    jax.block_until_ready(j_reb_sh(sh))
    t_reb_sh = _best(lambda: j_reb_sh(sh))
    print(json.dumps({"rebin_ms_single": round(t_reb_single * 1e3, 2),
                      "rebin_ms_sharded": round(t_reb_sh * 1e3, 2),
                      "d_rebin_ms": round((t_reb_sh - t_reb_single) * 1e3,
                                          2)}), flush=True)

    # --- (3) rebin cadence: advance-like loop carrying a rebin counter.
    from mdtpu.integrate.slot_step import _engine_needs_rebin, _engine_rebin
    from mdtpu.integrate.slot_step import make_slot_step

    step = make_slot_step(params, NVT(1.4737, 0.4), single,
                          rebin_check=False, observables=False)

    @jax.jit
    def count_rebins(s, k):
        def outer_cond(c):
            s, i, r = c
            return i < k

        def outer_body(c):
            s, i, r = c
            s = jax.lax.cond(_engine_needs_rebin(s, single),
                             lambda t: _engine_rebin(t, single),
                             lambda t: t, s)

            def inner_cond(cc):
                s2, j, rebuild = cc
                return (j < k) & ~rebuild

            def inner_body(cc):
                s2, j, _ = cc
                s2 = step(s2)
                return s2, j + 1, _engine_needs_rebin(s2, single)

            s, i, _ = jax.lax.while_loop(inner_cond, inner_body,
                                         (s, i, jnp.asarray(False)))
            return s, i, r + 1

        _, _, r = jax.lax.while_loop(outer_cond, outer_body,
                                     (s, jnp.int32(0), jnp.int32(0)))
        return r

    KC = 400
    n_reb = int(count_rebins(st_single, KC))
    cadence = KC / max(n_reb, 1)
    print(json.dumps({"rebins_per_400_steps": n_reb,
                      "cadence_steps": round(cadence, 1)}), flush=True)

    # --- attribution summary.
    d_sweep = (t_sweep_sh - t_sweep_single) * 1e3
    d_rebin = (t_reb_sh - t_reb_single) * 1e3 / cadence
    total = (t_sh - t_single) * 1e3
    print(json.dumps({
        "metric": f"sharded per-chip overhead attribution, N={n}, "
                  "1-device mesh",
        "total_overhead_ms_per_step": round(total, 3),
        "sweep_overhead_ms_per_step": round(d_sweep, 3),
        "rebin_overhead_ms_per_step": round(d_rebin, 3),
        "unexplained_ms_per_step": round(total - d_sweep - d_rebin, 3),
        "overhead_pct": round((t_sh / t_single - 1) * 100, 1),
    }), flush=True)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1048576)
