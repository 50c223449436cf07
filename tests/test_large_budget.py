"""f32 slot-budget machinery: the multi-binade far-pad ramp and the hi/lo
id rows that let the packed f32 rebin stay exact past 2^24 slots/particles
(previous hard cap ~10M particles/chip; now the far-ramp budget 2^28)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.types import Parameters
from mdtpu.integrate.slot_step import (
    pack_state_rows,
    packed_resort,
    slotify,
    unpack_state_rows,
)
from mdtpu.ops.cell_grid import FAR_RAMP_MAX, CellGridEngine, far_ramp
from mdtpu.potentials.lennard_jones import LennardJones
from tests.test_dynamics import make_fluid_state


def _ramp_np(ks):
    """Reference f64 formula evaluated in numpy."""
    ks = np.asarray(ks, np.int64)
    e = ks >> 23
    m = (ks & ((1 << 23) - 1)).astype(np.float64)
    return np.exp2(e.astype(np.float64)) * (float(1 << 25) + 4.0 * m)


@pytest.mark.parametrize("k0", [
    0,                      # start
    (1 << 23) - 500,        # first binade boundary
    (1 << 24) - 500,        # old 2^24 cap — a plain 4-spaced ramp collapses
    FAR_RAMP_MAX - 1000,    # top of the budget
])
def test_far_ramp_f32_exact_and_spaced(k0):
    count = 1000
    vals = np.asarray(far_ramp(count, jnp.float32, k0=k0))
    ref = _ramp_np(k0 + np.arange(count))
    # Exactly representable: the f32 values equal the exact f64 formula.
    np.testing.assert_array_equal(vals.astype(np.float64), ref)
    # Mutually > cutoff apart even after f32 rounding.
    diffs = np.diff(vals.astype(np.float64))
    assert diffs.min() >= 4.0


def test_plain_ramp_would_collapse_past_2_24():
    # The motivating failure: base + 4k rounds adjacent values together
    # once 4k passes 2^26 (ulp 8) — the multi-binade ramp never does.
    k = np.arange(2 ** 24 + 100, 2 ** 24 + 200, dtype=np.float64)
    plain = (1.0e6 + 4.0 * k).astype(np.float32)
    assert (np.diff(plain.astype(np.float64)) == 0).any()
    multi = np.asarray(far_ramp(100, jnp.float32, k0=2 ** 24 + 100))
    assert np.diff(multi.astype(np.float64)).min() >= 4.0


def test_far_ramp_shard_offsets_disjoint():
    # Per-device index offsets k0 = p*(S+1) must give globally distinct,
    # well-separated values across shards.
    S = 777
    all_vals = np.concatenate([
        np.asarray(far_ramp(S + 1, jnp.float32, k0=p * (S + 1)))
        for p in range(8)])
    diffs = np.diff(np.sort(all_vals.astype(np.float64)))
    assert diffs.min() >= 4.0


def _slot_state(n=500, dtype=jnp.float32):
    state = make_fluid_state(n=n, rho=0.5, temp=1.0, dtype=dtype, cutoff=1.5)
    pot = LennardJones(r_cut=1.5)
    eng = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(state.unitcell), n)
    from mdtpu.integrate.slot_step import slot_forces

    return slot_forces(slotify(state, eng), eng), eng


def test_pack_unpack_ids_exact_past_2_24_f32():
    sl, eng = _slot_state(dtype=jnp.float32)
    # Give the occupied slots ids far past 2^24 (inexact in one f32 word).
    big = jnp.where(sl.ids >= 0, sl.ids + (2 ** 25 + 3), -1)
    sl = sl.replace(ids=big)
    packed = pack_state_rows(sl)
    assert packed.dtype == jnp.float32
    out = unpack_state_rows(sl, packed)
    np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(big))


def test_packed_resort_rides_big_ids_f32():
    sl, eng = _slot_state(dtype=jnp.float32)
    big = jnp.where(sl.ids >= 0, sl.ids + (2 ** 25 + 3), -1)
    sl = sl.replace(ids=big)
    from mdtpu.integrate.slot_step import _rebin

    out = _rebin(sl, eng)
    assert not bool(out.nbrs.overflow)
    got = np.sort(np.asarray(out.ids)[np.asarray(out.nbrs.occupied)])
    want = np.sort(np.asarray(big)[np.asarray(sl.nbrs.occupied)])
    np.testing.assert_array_equal(got, want)


def test_output_rows_ride_big_ids_f32():
    """Device-ordered output rows (id-key sort, _pack_output_rows) stay
    correct when ids exceed 2^24: the ordering key is the int32 id itself
    (never an f32 row), so id-RANK order holds at any id magnitude."""
    from mdtpu.sim.driver import _pack_output_rows, _unpack_output_rows

    sl, eng = _slot_state(n=400, dtype=jnp.float32)
    big = jnp.where(sl.ids >= 0, sl.ids + (2 ** 25 + 3), -1)
    sl = sl.replace(ids=big)
    rows = _pack_output_rows(sl, True, 400)
    out = _unpack_output_rows(rows)
    # Rows come back ordered by id rank: row k is the particle with the
    # k-th smallest id.
    occ = np.asarray(sl.nbrs.occupied)
    order = np.argsort(np.asarray(big)[occ])
    want = np.asarray(sl.positions).T[occ][order].astype(np.float32)
    np.testing.assert_array_equal(out["positions"], want)


def test_slotify_guard_at_far_ramp_budget():
    state = make_fluid_state(n=64, rho=0.5, temp=1.0, dtype=jnp.float32,
                             cutoff=1.5)
    pot = LennardJones(r_cut=1.5)
    eng = CellGridEngine(potential=pot, cutoff=1.5, skin=0.3,
                         grid=(4096, 4096, 16), cell_capacity=16)
    with pytest.raises(ValueError, match="2\\^28"):
        slotify(state, eng)
