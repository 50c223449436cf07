"""Decompose the halo-slot engine's 1-device-mesh overhead vs the
single-chip slot loop: sweep-only, rebin-only, and fused-advance timings.
Run on the real TPU; prints one JSON line."""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from bench_halo import _system


def t(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from jax.sharding import PartitionSpec as P

    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import slot_forces, slotify
    from mdtpu.parallel.halo_slot import (HaloSlotEngine,
                                          build_sharded_slot_state,
                                          slot_state_specs)
    from mdtpu.parallel.mesh import make_mesh

    state, params, pot = _system()
    n = state.n_particles
    eng = HaloSlotEngine.create_tuned(pot, 2.5, np.asarray(state.unitcell),
                                      n, n_shards=1)
    single = eng.as_single_chip()
    mesh = make_mesh(1)
    ax = eng.axis_name

    ref = slot_forces(slotify(state, single), single)
    sh = build_sharded_slot_state(state, eng, mesh)
    specs = slot_state_specs(eng, sh, float(sh.cutoff))

    # --- sweep only ---------------------------------------------------
    @jax.jit
    def sweep_single(s):
        return single.compute_slots(s.positions, s.diameters, s.unitcell,
                                    s.unitcell_inv, s.nbrs,
                                    observables=False)[2]

    sweep_sh = jax.jit(jax.shard_map(
        lambda pos, d, c, ci, nb: eng.compute_slots(pos, d, c, ci, nb,
                                                    observables=False)[2],
        mesh=mesh,
        in_specs=(P(None, ax), P(ax), P(), P(), specs.nbrs),
        out_specs=P(None, ax), check_vma=False))

    ms_single = t(sweep_single, ref)
    ms_shard = t(lambda s: sweep_sh(s.positions, s.diameters, s.unitcell,
                                    s.unitcell_inv, s.nbrs), sh)

    # --- rebin only ---------------------------------------------------
    from mdtpu.integrate.slot_step import _rebin

    @jax.jit
    def rebin_single(s):
        return _rebin(s, single)

    rebin_sh = jax.jit(jax.shard_map(
        eng.slot_rebin, mesh=mesh, in_specs=(specs,), out_specs=specs,
        check_vma=False))

    ms_rb_single = t(rebin_single, ref, reps=20)
    ms_rb_shard = t(rebin_sh, sh, reps=20)

    # --- needs_rebin (psum'd) per-step check --------------------------
    from mdtpu.integrate.slot_step import make_slot_step

    step_single = jax.jit(make_slot_step(params, NVT(1.0, 0.4), single,
                                         rebin_check=False,
                                         observables=False))
    step_sh = jax.jit(jax.shard_map(
        make_slot_step(params, NVT(1.0, 0.4), eng, rebin_check=False,
                       observables=False, axis_name=ax),
        mesh=mesh, in_specs=(specs,), out_specs=specs, check_vma=False))

    ms_step_single = t(step_single, ref)
    ms_step_shard = t(step_sh, sh)

    print(json.dumps({
        "sweep_ms": {"single": round(ms_single, 3),
                     "halo_slot": round(ms_shard, 3)},
        "rebin_ms": {"single": round(ms_rb_single, 3),
                     "halo_slot": round(ms_rb_shard, 3)},
        "lean_step_ms": {"single": round(ms_step_single, 3),
                         "halo_slot": round(ms_step_shard, 3)},
    }))


if __name__ == "__main__" and "--loop" not in __import__("sys").argv:
    main()


def main_loop():
    """Fused-loop isolation: raw fori_loop of lean steps (no rebin, no
    needs-check) sharded vs single — loop/fusion overhead of the sharded
    body; then + psum'd needs; then the full advance."""
    from jax.sharding import PartitionSpec as P

    from mdtpu.core.types import NVT
    from mdtpu.integrate.slot_step import (_engine_needs_rebin,
                                           make_slot_advance,
                                           make_slot_step, slot_forces,
                                           slotify)
    from mdtpu.parallel.halo_slot import (HaloSlotEngine,
                                          build_sharded_slot_state,
                                          make_sharded_slot_advance,
                                          slot_state_specs)
    from mdtpu.parallel.mesh import make_mesh

    state, params, pot = _system()
    eng = HaloSlotEngine.create_tuned(pot, 2.5, np.asarray(state.unitcell),
                                      state.n_particles, n_shards=1)
    single = eng.as_single_chip()
    mesh = make_mesh(1)
    ax = eng.axis_name
    ref = slot_forces(slotify(state, single), single)
    sh = build_sharded_slot_state(state, eng, mesh)
    specs = slot_state_specs(eng, sh, float(sh.cutoff))

    k = 200
    res = {}
    for tag, use_needs in (("raw", False), ("with_needs", True)):
        step_sh = make_slot_step(params, NVT(1.0, 0.4), eng,
                                 rebin_check=False, observables=False,
                                 axis_name=ax)
        step_si = make_slot_step(params, NVT(1.0, 0.4), single,
                                 rebin_check=False, observables=False)

        def body_sh(i, s):
            s = step_sh(s)
            if use_needs:
                flag = _engine_needs_rebin(s, eng, ax)
                s = s.replace(energy=s.energy + 0.0 * flag)
            return s

        def body_si(i, s):
            s = step_si(s)
            if use_needs:
                flag = _engine_needs_rebin(s, single, None)
                s = s.replace(energy=s.energy + 0.0 * flag)
            return s

        loop_sh = jax.jit(jax.shard_map(
            lambda s: jax.lax.fori_loop(0, k, body_sh, s),
            mesh=mesh, in_specs=(specs,), out_specs=specs, check_vma=False))
        loop_si = jax.jit(lambda s: jax.lax.fori_loop(0, k, body_si, s))
        res[tag] = {
            "single": round(t(loop_si, ref, reps=3) / k, 4),
            "halo_slot": round(t(loop_sh, sh, reps=3) / k, 4),
        }

    adv_si = jax.jit(make_slot_advance(params, NVT(1.0, 0.4), single))
    adv_sh = make_sharded_slot_advance(params, NVT(1.0, 0.4), eng, mesh, sh)
    res["full_advance"] = {
        "single": round(t(lambda s: adv_si(s, k), ref, reps=3) / k, 4),
        "halo_slot": round(t(lambda s: adv_sh(s, k), sh, reps=3) / k, 4),
    }
    print(json.dumps(res))


if __name__ == "__main__" and True:
    import sys
    if "--loop" in sys.argv:
        main_loop()
        sys.exit(0)
