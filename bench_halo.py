"""Halo-engine per-chip efficiency on the real TPU (1-device mesh).

Multi-chip hardware is unavailable (one v5e via the axon tunnel), but the
halo engine's PER-CHIP cost is measurable on a 1-device mesh: the ppermute
ring degenerates to a self-copy, so the measured step time is the sharded
sweep + refresh/gather machinery without any ICI time — exactly the
per-chip efficiency number that multiplies out to multi-chip throughput.

Compares, at the headline config (N=65,536 LJ, rho=0.8, rc=2.5, NVT, f32):
  * halo engine, cutoff-sized cells (round-2 geometry, HaloCellGridEngine.create)
  * halo engine, tuned fat-cell geometry  (create_tuned, round 3)
  * particle-order single-device CellGridEngine (same step structure)
  * slot-space single-device fast path    (the production number)

Prints one JSON line with steps/sec for each.
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def _system(n=65536, rho=0.8, temp=1.0, dtype=jnp.float32):
    from mdtpu.core.types import Parameters
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.sim.initialization import (
        build_state_from_arrays, initialize_velocities, lattice_positions)

    d = 3
    L = (n / rho) ** (1.0 / d)
    cell = jnp.eye(d, dtype=dtype) * np.float32(L)
    pos = lattice_positions(n, cell, d, dtype=dtype, jitter=0.01,
                            key=jax.random.PRNGKey(0))
    state = build_state_from_arrays(pos, jnp.ones(n, dtype), cell,
                                    jax.random.PRNGKey(1), dtype=dtype,
                                    cutoff=2.5)
    state = state.replace(velocities=initialize_velocities(
        temp, jax.random.PRNGKey(2), n, d, dtype=dtype))
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    return state, params, pot


class BenchOverflow(RuntimeError):
    """Engine capacity overflowed during the timed run: the rate would be
    measured on a truncated system. Callers grow the engine and retry."""


def _time_advance(advance, state, warm=400, steps=300, reps=3):
    # Full melt (rebin frequency in the melting transient is much higher
    # than steady state) + a discarded first timed call (stray lazy
    # recompiles), then best-of-reps against shared-chip contention.
    state = advance(state, warm)
    jax.block_until_ready(state)
    state = advance(state, steps)
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = advance(state, steps)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)
    assert bool(jnp.isfinite(state.temperature))
    if state.nbrs is not None and hasattr(state.nbrs, "overflow"):
        if bool(jnp.asarray(state.nbrs.overflow).max()):
            raise BenchOverflow
    return steps / best


def _with_capacity_retries(build, eng, retries=4):
    """Build + time an engine variant, growing capacity on overflow (the
    melting transient can overflow a borderline capacity estimate —
    especially the deliberately-bad cutoff-cell geometry)."""
    for _ in range(retries):
        advance, st = build(eng)
        try:
            return _time_advance(advance, st), eng
        except BenchOverflow:
            eng = eng.with_grown_capacity()
    raise RuntimeError("engine capacity still overflowing after retries")


def bench_halo(engine_kind="tuned"):
    from mdtpu.core.types import NVT
    from mdtpu.parallel.experimental.halo import (HaloCellGridEngine,
                                                  allocate_sharded,
                                                  pad_state, reshard)
    from mdtpu.parallel.experimental.sharded import (make_shard_map_step,
                                                     shard_state)
    from mdtpu.parallel.mesh import make_mesh

    state, params, pot = _system()
    n = state.n_particles
    cell_np = np.asarray(state.unitcell)
    if engine_kind == "tuned":
        eng = HaloCellGridEngine.create_tuned(pot, 2.5, cell_np, n,
                                              n_shards=1)
    else:
        eng = HaloCellGridEngine.create(pot, 2.5, 0.3, cell_np, n,
                                        n_shards=1)
    mesh = make_mesh(1)
    # The row-layout engine's contract is DRIVER-CADENCE resharding
    # (mdtpu/parallel/driver.py reshard_every): between reshards its
    # staleness flag latches once particles drift past skin/2, so the
    # timed loop must pay the periodic host reshard exactly like the
    # driver does. 25 steps is a comfortably safe cadence at this dt.
    RESHARD_EVERY = 25

    def build(eng):
        padded, ovf = reshard(pad_state(state, eng, margin=0.1), eng)
        assert not bool(ovf)
        sh0 = allocate_sharded(shard_state(padded, mesh), eng, mesh)
        step = make_shard_map_step(params, NVT(1.0, 0.4), eng, mesh,
                                   state_cutoff=2.5)

        @jax.jit
        def chunk(s, k):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), s)

        def advance(s, k):
            done = 0
            while done < k:
                r = min(RESHARD_EVERY, k - done)
                s = chunk(s, r)
                done += r
                s2, ovf = reshard(s, eng)
                if bool(ovf):
                    raise BenchOverflow
                s = allocate_sharded(shard_state(s2, mesh), eng, mesh)
            return s

        return advance, sh0

    rate, eng = _with_capacity_retries(build, eng)
    return rate, eng.grid, eng.cell_capacity


def bench_halo_slot(n=65536, warm=400, steps=300):
    """The slot-layout sharded engine (mdtpu.parallel.halo_slot): per-chip
    cost should sit within ~15% of the single-chip slot loop — the ppermute
    self-copy plus the unconditional per-rebin migration exchange are the
    only extras."""
    from mdtpu.core.types import NVT
    from mdtpu.parallel.halo_slot import (HaloSlotEngine,
                                          build_sharded_slot_state,
                                          make_sharded_slot_advance)
    from mdtpu.parallel.mesh import make_mesh

    state, params, pot = _system(n=n)
    eng = HaloSlotEngine.create_tuned(pot, 2.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=1)
    mesh = make_mesh(1)

    def build(eng):
        sh = build_sharded_slot_state(state, eng, mesh)
        return make_sharded_slot_advance(params, NVT(1.0, 0.4), eng, mesh,
                                         sh), sh

    def time_eng(eng):
        advance, st = build(eng)
        return _time_advance(advance, st, warm=warm, steps=steps)

    for _ in range(4):
        try:
            return time_eng(eng), eng
        except BenchOverflow:
            eng = eng.with_grown_capacity()
    raise RuntimeError("engine capacity still overflowing after retries")


def bench_halo_slot_large():
    """Per-chip slot-halo overhead at the sizes that MOTIVATE multi-chip
    (VERDICT round-3 item 5): N = 262k and 1M on a 1-device mesh, sharded
    vs single-chip slot loop with the SAME tuned geometry (both auto-switch
    to the plane scan past the ~120 MB dense-tile cliff). Also reports the
    halo plane payload bytes/step for the projected weak-scaling table."""
    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                           slotify)

    out = {}
    for n in (262144, 1048576):
        warm = 300 if n <= 300000 else 150
        steps = 200 if n <= 300000 else 100
        halo_rate, eng = bench_halo_slot(n=n, warm=warm, steps=steps)
        single = eng.as_single_chip()
        state, params, pot = _system(n=n)

        def build_single(single):
            st = slot_forces(slotify(state, single), single)
            return jax.jit(make_slot_advance(params, NVT(1.0, 0.4),
                                             single)), st

        for _ in range(4):
            try:
                advance, st = build_single(single)
                single_rate = _time_advance(advance, st, warm=warm,
                                            steps=steps)
                break
            except BenchOverflow:
                single = single.with_grown_capacity()
        # Halo window plane payload per step (f32): d components x
        # (nmid x nwin x 3C) forward + d x (nmid x nwin x C) reactions back.
        cap = eng.cell_capacity
        plane = int(np.prod(eng.grid[1:]))
        payload = 3 * plane * (3 * cap + cap) * 4
        out[n] = {
            "halo_slot": round(halo_rate, 1),
            "single_chip_slot": round(single_rate, 1),
            "overhead_pct": round((single_rate / halo_rate - 1) * 100, 1),
            "geometry": [list(eng.grid), cap],
            "plane_scan": bool(eng.plane_scan),
            "halo_plane_payload_bytes": payload,
        }
    return out


def bench_particle_order():
    from mdtpu.core.types import NVT
    from mdtpu.integrate.step import engine_forces, make_step
    from mdtpu.ops.cell_grid import CellGridEngine

    state, params, pot = _system()
    eng = CellGridEngine.create_tuned(pot, 2.5, np.asarray(state.unitcell),
                                      state.n_particles)
    def build(eng):
        e, w, f, nbrs = engine_forces(eng, state.positions, state.diameters,
                                      state.unitcell, state.unitcell_inv,
                                      None)
        st = state.replace(nbrs=nbrs, forces=f, energy=e, virial=w)
        step = make_step(params, NVT(1.0, 0.4), eng)

        @jax.jit
        def advance(s, k):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), s)

        return advance, st

    return _with_capacity_retries(build, eng)[0]


def bench_slot():
    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                           slotify)
    from mdtpu.ops.cell_grid import CellGridEngine

    state, params, pot = _system()
    eng = CellGridEngine.create(pot, 2.5, 0.6, np.asarray(state.unitcell),
                                state.n_particles, cell_capacity=36)

    def build(eng):
        st = slot_forces(slotify(state, eng), eng)
        return jax.jit(make_slot_advance(params, NVT(1.0, 0.4), eng)), st

    return _with_capacity_retries(build, eng)[0]


def bench_halo_slot_2d(n=65536):
    """2D sharded per-chip cost (1-device mesh) vs the single-chip 2D
    y-window slot loop with the SAME geometry — quantifies what the
    dimension-generic halo path adds in 2D (bench_2d's polydisperse
    pseudo-HS config)."""
    from bench_2d import build as build_2d
    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                           slotify)
    from mdtpu.parallel.halo_slot import (HaloSlotEngine,
                                          build_sharded_slot_state,
                                          make_sharded_slot_advance)
    from mdtpu.parallel.mesh import make_mesh

    state, params, pot, cutoff = build_2d(n=n)
    eng = HaloSlotEngine.create_tuned(
        pot, cutoff, np.asarray(state.unitcell), n, n_shards=1,
        diameters=np.asarray(state.diameters))
    mesh = make_mesh(1)

    def build_sharded(eng):
        sh = build_sharded_slot_state(state, eng, mesh)
        return make_sharded_slot_advance(params, NVT(1.0, 0.4), eng, mesh,
                                         sh), sh

    halo_rate, eng = _with_capacity_retries(build_sharded, eng)
    single = eng.as_single_chip()

    def build_single(single):
        st = slot_forces(slotify(state, single), single)
        return jax.jit(make_slot_advance(params, NVT(1.0, 0.4), single)), st

    single_rate, _ = _with_capacity_retries(build_single, single)
    return halo_rate, single_rate, eng.grid, eng.cell_capacity


if __name__ == "__main__":
    import sys

    if "--2d" in sys.argv:
        n = 65536
        hs, single, grid, cap = bench_halo_slot_2d(n=n)
        print(json.dumps({
            "metric": f"2D halo-SLOT engine per-chip steps/s, 1-device "
                      f"mesh, N={n} polydisperse pseudo-HS NVT f32",
            "halo_slot_2d": round(hs, 1),
            "halo_slot_geometry": [list(grid), cap],
            "slot_fast_path_2d": round(single, 1),
            "halo_slot_vs_slot_overhead_pct":
                round((single / hs - 1) * 100, 1),
        }))
        sys.exit(0)
    if "--large" in sys.argv:
        out = bench_halo_slot_large()
        print(json.dumps({
            "metric": "halo-SLOT per-chip steps/s at large N, 1-device "
                      "mesh, LJ NVT f32 (plane-scan regime)",
            **{f"N={n}": v for n, v in out.items()},
        }))
        sys.exit(0)
    if "--slot-only" in sys.argv:
        hs, eng_hs = bench_halo_slot()
        grid_hs, cap_hs = eng_hs.grid, eng_hs.cell_capacity
        slot = bench_slot()
        print(json.dumps({
            "metric": "halo-SLOT engine per-chip steps/s, 1-device mesh, "
                      "N=65536 LJ NVT f32",
            "halo_slot": round(hs, 1),
            "halo_slot_geometry": [list(grid_hs), cap_hs],
            "slot_fast_path": round(slot, 1),
            "halo_slot_vs_slot_overhead_pct": round((slot / hs - 1) * 100, 1),
        }))
        sys.exit(0)
    halo_old, grid_old, cap_old = bench_halo("cutoff")
    halo_tuned, grid_tuned, cap_tuned = bench_halo("tuned")
    hs, eng_hs = bench_halo_slot()
    grid_hs, cap_hs = eng_hs.grid, eng_hs.cell_capacity
    particle = bench_particle_order()
    slot = bench_slot()
    print(json.dumps({
        "metric": "halo-engine per-chip steps/s, 1-device mesh, N=65536 LJ NVT f32",
        "halo_cutoff_cells": round(halo_old, 1),
        "halo_cutoff_geometry": [list(grid_old), cap_old],
        "halo_tuned": round(halo_tuned, 1),
        "halo_tuned_geometry": [list(grid_tuned), cap_tuned],
        "halo_slot": round(hs, 1),
        "halo_slot_geometry": [list(grid_hs), cap_hs],
        "particle_order_cellgrid": round(particle, 1),
        "slot_fast_path": round(slot, 1),
        "halo_slot_vs_slot_overhead_pct": round((slot / hs - 1) * 100, 1),
    }))
