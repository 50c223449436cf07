"""CellGridEngine (roll-stencil) vs the naive oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.ops.cell_grid import CellGridEngine
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from tests.test_engines import random_fluid


@pytest.mark.parametrize("d,n,rho,pot,cutoff", [
    (3, 256, 0.6, LennardJones(r_cut=1.5), 1.5),
    (2, 200, 0.5, LennardJones(r_cut=1.5), 1.5),
    (3, 400, 0.8, PseudoHS(), 1.5),
])
def test_cell_grid_matches_naive(d, n, rho, pot, cutoff):
    key = jax.random.PRNGKey(11)
    pos, cell = random_fluid(key, n, rho, d)
    diam = jnp.ones(n, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)

    naive = NaivePairEngine(potential=pot, cutoff=cutoff)
    e0, w0, f0, _ = naive.compute(pos, diam, cell, cell_inv, ())

    eng = CellGridEngine.create(pot, cutoff, 0.3, np.asarray(cell), n)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)
    assert not bool(nbrs.overflow)
    e1, w1, f1, _ = eng.compute(pos, diam, cell, cell_inv, nbrs)
    np.testing.assert_allclose(e1, e0, rtol=1e-9)
    np.testing.assert_allclose(w1, w0, rtol=1e-9)
    np.testing.assert_allclose(f1, f0, rtol=1e-8, atol=1e-10)


def test_cell_grid_polydisperse():
    key = jax.random.PRNGKey(12)
    n = 300
    pos, cell = random_fluid(key, n, 0.4, 3)
    diam = jax.random.uniform(key, (n,), dtype=jnp.float64) * 0.4 + 0.8
    cell_inv = jnp.linalg.inv(cell)
    pot = LennardJones(r_cut=1.5)

    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(pos, diam, cell, cell_inv, ())
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)
    e1, w1, f1, _ = eng.compute(pos, diam, cell, cell_inv, nbrs)
    np.testing.assert_allclose(e1, e0, rtol=1e-9)
    np.testing.assert_allclose(f1, f0, rtol=1e-8, atol=1e-10)


def test_cell_grid_stale_positions_within_skin():
    # compute() must stay exact when positions moved (< skin/2) after allocate.
    key = jax.random.PRNGKey(13)
    n = 256
    pot = PseudoHS()
    pos, cell = random_fluid(key, n, 0.5, 3)
    diam = jnp.ones(n, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)
    eng = CellGridEngine.create(pot, 1.5, 0.4, np.asarray(cell), n)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)

    # bounded jitter: per-component < 0.1 so |disp| < 0.1*sqrt(3) < skin/2 = 0.2
    moved = pos + 0.1 * (2.0 * jax.random.uniform(key, pos.shape,
                                                  dtype=pos.dtype) - 1.0)
    # wrap back into the box so the grid refresh sees in-box coordinates
    from mdtpu.core.box import wrap_positions

    moved, _ = wrap_positions(moved, jnp.zeros((n, 3), jnp.int32), cell, cell_inv)
    assert not bool(eng.needs_rebuild(moved, nbrs, cell, cell_inv))

    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(moved, diam, cell, cell_inv, ())
    e1, w1, f1, _ = eng.compute(moved, diam, cell, cell_inv, nbrs)
    np.testing.assert_allclose(e1, e0, rtol=1e-9)
    np.testing.assert_allclose(f1, f0, rtol=1e-8, atol=1e-10)


def test_cell_grid_overflow_flag():
    key = jax.random.PRNGKey(14)
    n = 512
    pot = PseudoHS()
    pos, cell = random_fluid(key, n, 0.9, 3)
    diam = jnp.ones(n, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n,
                                cell_capacity=2)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)
    assert bool(nbrs.overflow)
    assert eng.with_grown_capacity().cell_capacity > 2


def test_cell_grid_in_fused_nvt_loop():
    # Full fused step with rebuild-cond under fori_loop (what the driver runs).
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate.step import make_step
    from tests.test_dynamics import _with_forces, make_fluid_state

    n = 512
    state = make_fluid_state(n=n, rho=0.6, temp=1.0, dtype=jnp.float64, cutoff=1.5)
    pot = PseudoHS()
    params = Parameters(density=0.6, n_particles=n, dt=0.001, potential=pot)
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell), n)
    state = state.replace(nbrs=eng.allocate(state.positions, state.diameters,
                                            state.unitcell, state.unitcell_inv))
    state = _with_forces(state, eng)
    step = make_step(params, NVT(1.0, 0.1), eng)
    advance = jax.jit(lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: step(x), s))
    out = advance(state, 50)
    assert int(out.step) == 50
    assert abs(float(out.temperature) - 1.0) < 0.5
    assert bool(jnp.all(jnp.isfinite(out.positions)))


def test_cell_grid_triclinic_matches_naive():
    """Tilted (triclinic) cells run on the fast path: fractional binning plus
    full cell-vector ghost shifts. Must match the naive oracle (which does
    general matmul MIC) exactly."""
    key = jax.random.PRNGKey(31)
    n = 4096
    pot = PseudoHS()
    # A well-tilted 3D cell, large enough for a >=3^3 grid of plane
    # thicknesses >= cutoff + skin.
    L = 24.0
    cell = jnp.asarray([[L, 3.0, 2.0],
                        [0.0, L, 4.0],
                        [0.0, 0.0, L]], jnp.float64)
    cell_inv = jnp.linalg.inv(cell)
    frac = jax.random.uniform(key, (n, 3), dtype=jnp.float64)
    pos = frac @ cell.T
    diam = jnp.ones(n, jnp.float64)

    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n)
    assert all(g >= 3 for g in eng.grid)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)
    assert not bool(nbrs.overflow)
    e1, w1, f1, _ = eng.compute(pos, diam, cell, cell_inv, nbrs)

    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(pos, diam, cell, cell_inv, ())
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-9)
    np.testing.assert_allclose(float(w1), float(w0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-8, atol=1e-9)


def test_select_engine_triclinic_uses_cell_grid():
    from mdtpu.ops import select_engine

    L = 24.0
    cell = np.asarray([[L, 3.0, 0.0], [0.0, L, 2.0], [0.0, 0.0, L]])
    eng = select_engine(PseudoHS(), 1.5, unitcell=cell, n_particles=8192)
    assert isinstance(eng, CellGridEngine)


def test_hilo_pair_sweep_beats_plain_f32_accuracy():
    # Double-f32 (hi+lo) coordinates: pair displacements carry the Kahan low
    # word, so f32 force error vs the f64 oracle must drop well below the
    # plain-f32 sweep's (the NVE-gate 'f32x2' mechanism).
    from mdtpu.integrate.slot_step import _scatter_rows
    from mdtpu.ops.cell_grid import CellGridState

    key = jax.random.PRNGKey(3)
    n, rho, d = 512, 0.7, 3
    pot = LennardJones(r_cut=1.5, force_shift=True)
    from mdtpu.sim.initialization import lattice_positions

    L = (n / rho) ** (1.0 / 3.0)
    cell64 = jnp.eye(3, dtype=jnp.float64) * L
    pos64 = lattice_positions(n, cell64, 3, dtype=jnp.float64, jitter=0.12,
                              key=key)
    diam64 = jnp.ones(n, jnp.float64)

    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    _, _, f_ref, _ = naive.compute(pos64, diam64, cell64,
                                   jnp.linalg.inv(cell64), ())

    hi = pos64.astype(jnp.float32)
    lo = (pos64 - hi.astype(jnp.float64)).astype(jnp.float32)
    cell32 = cell64.astype(jnp.float32)
    cinv32 = jnp.linalg.inv(cell64).astype(jnp.float32)
    diam32 = diam64.astype(jnp.float32)

    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell64), n)
    nbrs = eng.allocate(hi, diam32, cell32, cinv32)
    assert not bool(nbrs.overflow)
    cap = eng.cell_capacity
    n_slots = int(np.prod(eng.grid)) * cap
    addr = nbrs.addr

    hi_rows = _scatter_rows(hi.T, addr, n_slots, "far")
    lo_rows = _scatter_rows(lo.T, addr, n_slots, 0)
    occupied = jnp.zeros((n_slots + 1,), bool).at[addr].set(True)[:-1]
    diam_slot = jnp.ones((n_slots + 1,), jnp.float32).at[addr].set(diam32)[:-1]
    slot_nbrs = CellGridState(
        addr=jnp.arange(n_slots, dtype=jnp.int32), occupied=occupied,
        sorted_diam=diam_slot, ref_positions=hi_rows,
        overflow=nbrs.overflow)

    _, _, f_plain, _ = eng.compute_slots(hi_rows, diam_slot, cell32, cinv32,
                                         slot_nbrs)
    _, _, f_hilo, _ = eng.compute_slots(hi_rows, diam_slot, cell32, cinv32,
                                        slot_nbrs, pos_lo=lo_rows)

    # Map the oracle forces into slot order for comparison.
    f_ref_slots = np.zeros((3, n_slots))
    f_ref_slots[:, np.asarray(addr)] = np.asarray(f_ref).T
    scale = np.abs(np.asarray(f_ref)).max()
    err_plain = np.abs(np.asarray(f_plain, np.float64) - f_ref_slots).max() / scale
    err_hilo = np.abs(np.asarray(f_hilo, np.float64) - f_ref_slots).max() / scale
    assert err_hilo < err_plain / 3, (err_hilo, err_plain)
    # Residual floor = the f32 potential-kernel arithmetic itself (~few ulp
    # of the max pair force); coordinate-truncation noise is gone.
    assert err_hilo < 1e-6, err_hilo


def test_plane_scan_sweep_matches_dense():
    # Memory-bounded x-plane-scan sweep (for beyond-HBM sizes): same math,
    # per-plane reductions; must match the dense z-window sweep to machine
    # precision, lean and observable modes alike.
    from mdtpu.integrate.slot_step import slot_forces, slotify
    from mdtpu.sim.initialization import (build_state_from_arrays,
                                          lattice_positions)

    pot = LennardJones(r_cut=1.5)
    n, rho = 2048, 0.5
    L = (n / rho) ** (1.0 / 3.0)
    cell = jnp.eye(3, dtype=jnp.float64) * L
    pos = lattice_positions(n, cell, 3, dtype=jnp.float64, jitter=0.08,
                            key=jax.random.PRNGKey(2))
    state = build_state_from_arrays(pos, jnp.ones(n, jnp.float64), cell,
                                    jax.random.PRNGKey(3),
                                    dtype=jnp.float64, cutoff=1.5)
    eng = CellGridEngine.create(pot, 1.5, 0.6, np.asarray(cell), n)
    st = slot_forces(slotify(state, eng), eng)
    args = (st.positions, st.diameters, st.unitcell, st.unitcell_inv, st.nbrs)
    e0, w0, f0, _ = eng.compute_slots(*args)
    e1, w1, f1, _ = eng.replace(plane_scan=True).compute_slots(*args)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-12)
    np.testing.assert_allclose(float(w1), float(w0), rtol=1e-12)
    occ = np.asarray(st.nbrs.occupied)
    np.testing.assert_allclose(np.asarray(f1)[:, occ], np.asarray(f0)[:, occ],
                               rtol=1e-12, atol=1e-12)
    _, _, f2, _ = eng.replace(plane_scan=True).compute_slots(
        *args, observables=False)
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(f1))

    # The particle-order path (engine.compute) must honor plane_scan too:
    # create_tuned enables it exactly when the dense tiles exhaust HBM, and
    # callers like make_step/engine_forces go through compute().
    nbrs = eng.allocate(state.positions, state.diameters, state.unitcell,
                        state.unitcell_inv)
    pargs = (state.positions, state.diameters, state.unitcell,
             state.unitcell_inv, nbrs)
    pe0, pw0, pf0, _ = eng.compute(*pargs)
    pe1, pw1, pf1, _ = eng.replace(plane_scan=True).compute(*pargs)
    np.testing.assert_allclose(float(pe1), float(pe0), rtol=1e-12)
    np.testing.assert_allclose(float(pw1), float(pw0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pf1), np.asarray(pf0),
                               rtol=1e-12, atol=1e-12)


def _fluid_2d(n=800, rho=0.5, tilt=0.0, dtype=jnp.float64, seed=7,
              jitter=0.08):
    from mdtpu.sim.initialization import lattice_positions

    L = (n / rho) ** 0.5
    cell = jnp.asarray([[L, tilt], [0.0, L]], dtype)
    pos = lattice_positions(n, cell, 2, dtype=dtype, jitter=jitter,
                            key=jax.random.PRNGKey(seed))
    return pos, jnp.ones(n, dtype), cell, jnp.linalg.inv(cell)


@pytest.mark.parametrize("tilt", [0.0, 3.0])
def test_ywindow_sweep_matches_naive_2d(tilt):
    # 2D cell grid on the same window fast path as 3D (y-window + x Newton
    # half stencil), including triclinic cells — the reference is dimension-
    # generic (/root/reference/src/types.jl:15-32) and previously 2D fell
    # back to the roll engine (orthorhombic-only) or O(N^2).
    pot = PseudoHS()
    pos, diam, cell, cinv = _fluid_2d(tilt=tilt)
    n = pos.shape[0]
    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(pos, diam, cell, cinv, ())

    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n)
    assert len(eng.grid) == 2
    nbrs = eng.allocate(pos, diam, cell, cinv)
    assert not bool(nbrs.overflow)
    e1, w1, f1, _ = eng.compute(pos, diam, cell, cinv, nbrs)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-9)
    np.testing.assert_allclose(float(w1), float(w0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-8, atol=1e-9)


def test_2d_slot_sweep_and_tuned_engine_match_oracle():
    from mdtpu.integrate.slot_step import slot_forces, slotify
    from mdtpu.sim.initialization import build_state_from_arrays

    pot = PseudoHS()
    pos, diam, cell, cinv = _fluid_2d(n=1200, rho=0.6)
    n = pos.shape[0]
    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(pos, diam, cell, cinv, ())

    eng = CellGridEngine.create_tuned(pot, 1.5, np.asarray(cell), n)
    assert len(eng.grid) == 2
    state = build_state_from_arrays(pos, diam, cell, jax.random.PRNGKey(0),
                                    dtype=jnp.float64, cutoff=1.5)
    st = slot_forces(slotify(state, eng), eng)
    np.testing.assert_allclose(float(st.energy), float(e0), rtol=1e-9)
    np.testing.assert_allclose(float(st.virial), float(w0), rtol=1e-9)
    occ = np.asarray(st.nbrs.occupied)
    ids = np.asarray(st.ids)[occ]
    f_slot = np.asarray(st.forces).T[occ][np.argsort(ids)]
    np.testing.assert_allclose(f_slot, np.asarray(f0), rtol=1e-8, atol=1e-9)


def test_2d_hilo_pair_sweep_accuracy():
    # The f32x2 precision mode works in 2D through the y-window sweep.
    from mdtpu.integrate.slot_step import _scatter_rows
    from mdtpu.ops.cell_grid import CellGridState

    # Dense config: strong pair forces push the f32 kernel-arithmetic floor
    # well below the coordinate-truncation noise the hilo mode removes.
    pot = LennardJones(r_cut=1.5, force_shift=True)
    pos64, diam64, cell64, cinv64 = _fluid_2d(n=800, rho=0.9, seed=11,
                                              jitter=0.12)
    n = pos64.shape[0]
    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    _, _, f_ref, _ = naive.compute(pos64, diam64, cell64, cinv64, ())

    hi = pos64.astype(jnp.float32)
    lo = (pos64 - hi.astype(jnp.float64)).astype(jnp.float32)
    cell32, cinv32 = cell64.astype(jnp.float32), cinv64.astype(jnp.float32)
    diam32 = diam64.astype(jnp.float32)
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell64), n)
    nbrs = eng.allocate(hi, diam32, cell32, cinv32)
    assert not bool(nbrs.overflow)
    n_slots = int(np.prod(eng.grid)) * eng.cell_capacity
    addr = nbrs.addr
    hi_rows = _scatter_rows(hi.T, addr, n_slots, "far")
    lo_rows = _scatter_rows(lo.T, addr, n_slots, 0)
    occupied = jnp.zeros((n_slots + 1,), bool).at[addr].set(True)[:-1]
    diam_slot = jnp.ones((n_slots + 1,), jnp.float32).at[addr].set(diam32)[:-1]
    slot_nbrs = CellGridState(
        addr=jnp.arange(n_slots, dtype=jnp.int32), occupied=occupied,
        sorted_diam=diam_slot, ref_positions=hi_rows, overflow=nbrs.overflow)

    _, _, f_plain, _ = eng.compute_slots(hi_rows, diam_slot, cell32, cinv32,
                                         slot_nbrs)
    _, _, f_hilo, _ = eng.compute_slots(hi_rows, diam_slot, cell32, cinv32,
                                        slot_nbrs, pos_lo=lo_rows)
    f_ref_slots = np.zeros((2, n_slots))
    f_ref_slots[:, np.asarray(addr)] = np.asarray(f_ref).T
    scale = np.abs(np.asarray(f_ref)).max()
    err_plain = np.abs(np.asarray(f_plain, np.float64) - f_ref_slots).max() / scale
    err_hilo = np.abs(np.asarray(f_hilo, np.float64) - f_ref_slots).max() / scale
    assert err_hilo < err_plain / 3, (err_hilo, err_plain)
    assert err_hilo < 1e-6, err_hilo


def test_hilo_composes_with_plane_scan():
    # The f32x2 precision mode must survive the switch to the memory-bounded
    # scan sweep (mandatory beyond ~0.5M particles): same two_sum ghost
    # shifts, same error floor vs the f64 oracle as the dense hilo sweep.
    from mdtpu.integrate.slot_step import _scatter_rows
    from mdtpu.ops.cell_grid import CellGridState
    from mdtpu.sim.initialization import lattice_positions

    key = jax.random.PRNGKey(3)
    n, rho = 512, 0.7
    pot = LennardJones(r_cut=1.5, force_shift=True)
    L = (n / rho) ** (1.0 / 3.0)
    cell64 = jnp.eye(3, dtype=jnp.float64) * L
    pos64 = lattice_positions(n, cell64, 3, dtype=jnp.float64, jitter=0.12,
                              key=key)
    diam64 = jnp.ones(n, jnp.float64)
    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    _, _, f_ref, _ = naive.compute(pos64, diam64, cell64,
                                   jnp.linalg.inv(cell64), ())

    hi = pos64.astype(jnp.float32)
    lo = (pos64 - hi.astype(jnp.float64)).astype(jnp.float32)
    cell32 = cell64.astype(jnp.float32)
    cinv32 = jnp.linalg.inv(cell64).astype(jnp.float32)
    diam32 = diam64.astype(jnp.float32)

    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell64), n)
    nbrs = eng.allocate(hi, diam32, cell32, cinv32)
    assert not bool(nbrs.overflow)
    n_slots = int(np.prod(eng.grid)) * eng.cell_capacity
    addr = nbrs.addr
    hi_rows = _scatter_rows(hi.T, addr, n_slots, "far")
    lo_rows = _scatter_rows(lo.T, addr, n_slots, 0)
    occupied = jnp.zeros((n_slots + 1,), bool).at[addr].set(True)[:-1]
    diam_slot = jnp.ones((n_slots + 1,), jnp.float32).at[addr].set(diam32)[:-1]
    slot_nbrs = CellGridState(
        addr=jnp.arange(n_slots, dtype=jnp.int32), occupied=occupied,
        sorted_diam=diam_slot, ref_positions=hi_rows, overflow=nbrs.overflow)

    e_d, w_d, f_dense, _ = eng.compute_slots(hi_rows, diam_slot, cell32,
                                             cinv32, slot_nbrs,
                                             pos_lo=lo_rows)
    scan = eng.replace(plane_scan=True)
    e_s, w_s, f_scan, _ = scan.compute_slots(hi_rows, diam_slot, cell32,
                                             cinv32, slot_nbrs,
                                             pos_lo=lo_rows)

    f_ref_slots = np.zeros((3, n_slots))
    f_ref_slots[:, np.asarray(addr)] = np.asarray(f_ref).T
    scale = np.abs(np.asarray(f_ref)).max()
    err_scan = np.abs(np.asarray(f_scan, np.float64) - f_ref_slots).max() / scale
    assert err_scan < 1e-6, err_scan  # hilo error floor, not plain-f32 ~1e-4
    # Scan vs dense hilo: identical math, reduction order differs only across
    # planes — forces agree to a few f32 ulps of the force scale.
    np.testing.assert_allclose(np.asarray(f_scan), np.asarray(f_dense),
                               atol=5e-5 * scale, rtol=0)
    np.testing.assert_allclose(float(e_s), float(e_d), rtol=1e-5)
    np.testing.assert_allclose(float(w_s), float(w_d), rtol=1e-5)
    # Lean mode: forces bitwise identical to the observable sweep.
    _, _, f_lean, _ = scan.compute_slots(hi_rows, diam_slot, cell32, cinv32,
                                         slot_nbrs, observables=False,
                                         pos_lo=lo_rows)
    np.testing.assert_array_equal(np.asarray(f_lean), np.asarray(f_scan))


def test_create_tuned_minimize_workload_trades_skin():
    """workload='minimize' amortizes FIRE's rebin cadence into the tuning
    score (VERDICT r4 item 3): its geometry must carry at least the
    dynamics skin — in the regimes that matter (large N) strictly more —
    never less, and never an invalid one."""
    from mdtpu.potentials.lennard_jones import LennardJones

    pot = LennardJones(r_cut=2.5)
    grew = False
    for n, rho in ((65536, 0.8), (262144, 0.8), (1048576, 0.76)):
        L = (n / rho) ** (1 / 3)
        cell = np.eye(3) * L
        dyn = CellGridEngine.create_tuned(pot, 2.5, cell, n)
        mini = CellGridEngine.create_tuned(pot, 2.5, cell, n,
                                           workload="minimize")
        assert mini.skin >= dyn.skin - 1e-9
        grew |= mini.skin > dyn.skin + 1e-9
        # More skin -> fewer cells -> at least the occupancy per cell.
        assert mini.cell_capacity >= dyn.cell_capacity
    assert grew  # the profile actually changes geometry somewhere


def test_create_tuned_rejects_unknown_workload():
    from mdtpu.potentials.lennard_jones import LennardJones

    with pytest.raises(ValueError, match="workload"):
        CellGridEngine.create_tuned(LennardJones(r_cut=2.5), 2.5,
                                    np.eye(3) * 40.0, 40000,
                                    workload="annealing")


def test_padded_lane_stats_fields():
    """bench.py's utilization fields (VERDICT r4 item 5) are derived from
    the same padded-lane cost model as create_tuned: verify the counts
    against a hand computation on a known geometry."""
    from mdtpu.potentials.lennard_jones import LennardJones

    eng = CellGridEngine.create(LennardJones(r_cut=2.5), 2.5, 0.6,
                                np.eye(3) * 43.0886, 65536,
                                cell_capacity=36)
    st = eng.padded_lane_stats()
    n_cells = int(np.prod(eng.grid))
    subl = -(-36 // 8) * 8          # 40
    lanes = -(-(3 * 36) // 128) * 128  # 128
    assert st["padded_lane_slots_per_step"] == n_cells * subl * lanes * 5
    assert st["useful_pair_fraction"] == round(36 * 108 / (subl * lanes), 4)
    assert "lane_utilization" not in st
    st2 = eng.padded_lane_stats(ms_per_step=1.0)
    assert 0 < st2["lane_utilization"] < 10
    assert st2["vpu_speed_of_light_ms"] > 0


def test_select_engine_threads_workload():
    from mdtpu.ops import select_engine
    from mdtpu.potentials.lennard_jones import LennardJones

    pot = LennardJones(r_cut=2.5)
    # 1M is the size where the rebin amortization actually moves the
    # argmin (at 65k-262k the 3C > 128 lane cliff pins both profiles to
    # the same geometry — see test_create_tuned_minimize_workload_trades_skin).
    n, L = 1048576, (1048576 / 0.76) ** (1 / 3)
    dyn = select_engine(pot, 2.5, unitcell=np.eye(3) * L, n_particles=n,
                        prefer="cellgrid")
    mini = select_engine(pot, 2.5, unitcell=np.eye(3) * L, n_particles=n,
                         prefer="cellgrid", workload="minimize")
    assert mini.skin > dyn.skin
