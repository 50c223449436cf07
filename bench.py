"""Headline benchmark: MD steps/sec on the real TPU chip.

Config matches BASELINE.json's north-star metric: N = 65,536 Lennard-Jones
fluid (rho = 0.8, kT = 1.0, r_cut = 2.5, dt = 0.002) with the roll-stencil
cell-grid engine, f32 with Kahan-compensated integration, fused NVT hot loop
(includes on-device thermostat and skin-triggered neighbor rebuilds).
Prints ONE JSON line.

``vs_baseline`` is the ratio against the single-node multithreaded Julia
reference. The reference repo publishes no numbers and Julia is not in this
image (BASELINE.md), so the denominator carries real uncertainty; both its
sources are documented so the ratio can be audited:

  * the reference's per-step cost is one full CellListMap ``map_pairwise!``
    call INCLUDING cell-list construction — ``run_simulation!`` re-runs the
    system update every step (/root/reference/src/simulation.jl:100-104),
    there is no skin/deferred-rebuild machinery;
  * documented estimate (rounds 1-2): the CellListMap.jl paper
    (arXiv:2202.06427) benchmarks this call for short-range pair kernels at
    N ~ 1e5 on 8-16 x86 threads at tens of ms/call; interpolating to
    N = 65,536 at rho = 0.8, rc = 2.5 (~52 in-range neighbors/particle,
    1.7M interacting pairs/step) gave ~40-60 ms/call -> ~20 steps/s;
  * MEASURED anchor (round 3, native/cellbench.cc): an optimized
    single-thread C++ sorted-cell implementation of exactly this per-step
    work (counting-sort build + half-stencil Newton LJ sweep, -O3
    -march=native) measures 77-96 ms/call on this container's one vCPU.
    That pins the SERIAL reference cost at <= ~85 ms/call (CellListMap
    per-thread does strictly more work per call: projection sort, per-
    thread output copies, reduction). The multithreaded denominator then
    depends on the baseline node one assumes:
      - 1 core (this container): ~12 steps/s        -> ratio ~ 88x
      - paper-interpolated 8-16 threads: 20 steps/s -> ratio ~ 53x
      - 16 cores at 70-80% scaling: ~100-150 steps/s -> ratio ~ 7-11x
    The official denominator stays the documented 20 steps/s estimate for
    cross-round comparability; the bracket above is printed in the JSON so
    the ratio's provenance never hides the raw numbers. The ABSOLUTES
    (ms/step, particle-steps/s) are the trustworthy measurements.
Target: vs_baseline >= 50 (against the documented estimate).
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

JULIA_BASELINE_STEPS_PER_SEC = 20.0  # documented estimate, see module docstring


def build(n=65536, rho=0.8, temp=1.0, dtype=jnp.float32, slot=False,
          cell_capacity=None, skin=0.6, poly=0.0, tuned=False):
    # skin 0.6 -> grid 14 (cell 3.1), mean occupancy 23.9; C=36 (+2.5 sigma,
    # overflow flag guards the tail) pads to the same 40 sublanes as any C in
    # 33..40 while halving the rebuild frequency vs skin 0.3 — measured best
    # of the (skin, C) sweep (probe_skin): 1.14 ms/step vs 1.23 at 0.3/30.
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate.step import make_step
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.sim.initialization import lattice_fluid_state
    from mdtpu.potentials.lennard_jones import LennardJones

    state = lattice_fluid_state(n, rho, temp, dtype=dtype, cutoff=2.5,
                                jitter=0.01)
    diameters = jnp.ones(n, dtype)
    if poly:
        # Polydisperse row (VERDICT r4 item 6): sigma ~ U[1-poly, 1+poly].
        # The reference is polydisperse-FIRST (per-pair Lorentz mixing in
        # every hot call, /root/reference/src/potentials.jl:160-164); our
        # uniform-sigma fast path hoists the mixing, so this row bounds
        # what that hoist is worth. LJ cuts at fixed r_cut regardless of
        # sigma, so geometry and cutoff are unchanged.
        diameters = 1.0 + poly * jax.random.uniform(
            jax.random.PRNGKey(7), (n,), dtype, minval=-1.0, maxval=1.0)
        state = state.replace(diameters=diameters)
    cell = state.unitcell

    # Unshifted LJ with Lorentz sigma-mixing: exactly what the reference
    # evaluates in its hot loop (/root/reference/src/potentials.jl:160-164 —
    # always lj_unshifted, sigma = (s1+s2)/2).
    pot = LennardJones(r_cut=2.5)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    if tuned:
        # Sizes beyond the headline 65k: padded-lane-optimal geometry with
        # the dense-tile -> plane-scan auto-switch.
        engine = CellGridEngine.create_tuned(pot, 2.5, np.asarray(cell), n,
                                             diameters=np.asarray(diameters))
        if cell_capacity is not None:
            engine = engine.replace(cell_capacity=int(cell_capacity))
    else:
        engine = CellGridEngine.create(pot, 2.5, skin, np.asarray(cell), n,
                                       cell_capacity=cell_capacity or 36,
                                       diameters=np.asarray(diameters))

    if slot:
        # Slot-space hot loop: no per-step scatter/gather, skin rebuild
        # hoisted out of the step (see mdtpu/integrate/slot_step.py —
        # a per-step lax.cond costs as much as the whole pair sweep).
        from mdtpu.integrate.slot_step import (make_slot_advance, slot_forces,
                                               slotify)

        state = slot_forces(slotify(state, engine), engine)
        advance = jax.jit(make_slot_advance(params, NVT(temp, 0.4), engine))
        return state, advance, engine
    else:
        nbrs = engine.allocate(state.positions, state.diameters,
                               state.unitcell, state.unitcell_inv)
        e, w, f, nbrs = engine.compute(state.positions, state.diameters,
                                       state.unitcell, state.unitcell_inv,
                                       nbrs)
        state = state.replace(nbrs=nbrs, forces=f, energy=e, virial=w)
        step = make_step(params, NVT(temp, 0.4), engine)

    advance = jax.jit(
        lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: step(x), s))
    return state, advance, engine


def main(slot=True):
    state, advance, engine = build(slot=slot)
    # Warmup/compile + melt the lattice into a fluid (400 steps: the
    # melting transient rebuilds the cell lists far more often than steady
    # state, which depressed the round-1/2 200-step-warmup numbers).
    state = advance(state, 400)
    jax.block_until_ready(state)

    # Best of 3 windows: the shared chip shows ±3% contention swings and
    # occasional worse transients (BENCH_NOTES measurement protocol).
    n_steps = 600
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = advance(state, n_steps)
        jax.block_until_ready(state)
        elapsed = min(elapsed, time.perf_counter() - t0)
    assert bool(jnp.isfinite(state.temperature)), "simulation diverged"
    assert not bool(state.nbrs.overflow), "cell capacity overflow"

    steps_per_sec = n_steps / elapsed
    n = 65536
    # Machine-checkable utilization (VERDICT r4 item 5): the padded-lane
    # roofline previously hand-derived in BENCH_NOTES, emitted per round.
    util = engine.padded_lane_stats(ms_per_step=elapsed / n_steps * 1e3)
    print(json.dumps({
        "metric": "steps/sec, N=65536 LJ fluid NVT (rho=0.8, rc=2.5, f32, cell-grid engine)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / JULIA_BASELINE_STEPS_PER_SEC, 2),
        # Auditable absolutes (baseline derivation in the module docstring
        # and BENCH_NOTES.md): the ratio's denominator is an estimate, the
        # numbers below are measurements.
        "ms_per_step": round(elapsed / n_steps * 1e3, 4),
        "particle_steps_per_sec": round(steps_per_sec * n, 0),
        "baseline_steps_per_sec_estimate": JULIA_BASELINE_STEPS_PER_SEC,
        # Measured serial anchor for the denominator (native/cellbench.cc,
        # single-thread optimized C++ of the reference's per-step work) and
        # the implied ratio bracket across baseline-node assumptions — see
        # module docstring.
        "baseline_anchor_ms_per_call_1thread": 85.0,
        "vs_baseline_bracket": {
            "1_core_node": round(steps_per_sec / 12.0, 1),
            "documented_estimate": round(
                steps_per_sec / JULIA_BASELINE_STEPS_PER_SEC, 1),
            "16_core_node": round(steps_per_sec / 125.0, 1),
        },
        **util,
    }))


def poly_main(spread=0.2):
    """Polydisperse headline rows (VERDICT r4 item 6): the same NVT loop
    with per-pair Lorentz sigma mixing live in the sweep (sigma ~
    U[1-spread, 1+spread]) at 65k and 262k, next to the uniform-sigma
    number so the headline's fast-path scope is explicit."""
    for n in (65536, 262144):
        rows = {}
        for name, spr in (("uniform_sigma", 0.0), ("polydisperse", spread)):
            # Polydisperse occupancy tails are wider than the uniform-sigma
            # sizing assumes (size disparity lets more centers pack into one
            # cell) — on the latched overflow flag (melt OR timed window),
            # retry the whole measurement with grown capacity, like the
            # driver's restore-and-rerun.
            n_steps = 600 if n <= 100_000 else 300
            cap = None
            for _ in range(4):
                kw = {} if cap is None else {"cell_capacity": cap}
                state, advance, engine = build(n=n, slot=True, poly=spr,
                                               tuned=n != 65536, **kw)
                state = advance(state, 400)
                jax.block_until_ready(state)
                if bool(state.nbrs.overflow):
                    cap = int(engine.cell_capacity * 1.4 + 4)
                    continue
                elapsed = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    state = advance(state, n_steps)
                    jax.block_until_ready(state)
                    elapsed = min(elapsed, time.perf_counter() - t0)
                if not bool(state.nbrs.overflow):
                    break
                cap = int(engine.cell_capacity * 1.4 + 4)
            else:
                raise RuntimeError("cell capacity still overflowing")
            assert bool(jnp.isfinite(state.temperature))
            rows[name] = round(n_steps / elapsed, 1)
        print(json.dumps({
            "metric": f"steps/sec, N={n} LJ NVT f32, uniform vs "
                      f"polydisperse sigma~U[{1-spread},{1+spread}] "
                      "(per-pair Lorentz mixing live in the sweep)",
            **rows,
            "poly_cost_pct": round((rows["uniform_sigma"]
                                    / rows["polydisperse"] - 1) * 100, 1),
        }), flush=True)


if __name__ == "__main__":
    import sys

    if "--poly" in sys.argv:
        poly_main()
    else:
        main(slot="--no-slot" not in sys.argv)
