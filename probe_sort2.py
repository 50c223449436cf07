"""Rebin v2 candidate: probe_sort.py showed the packed (R, n_slots) gather
costs per-INDEX, not per-byte (23-row packed take == 1-row take; 53 ms at
1.67M indices). Two ways to cut the index count:

  sortP      — lax.sort carrying ALL R rows as payload (variadic sort,
               num_keys=1): no index-space gather at all.
  blocked    — gather (R, cap) TILES from cell-run starts: n_cells indices
               (42.9k at 1M) instead of n_slots (1.67M), via vmap'd
               dynamic_slice on pre-sorted rows.
  resort_v2  — sortP + blocked + ONE fused fill where: full candidate.

Compared against the shipped packed_resort on the same inputs. One JSON
line.
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / reps * 1e3, 3)


def main():
    from bench_fire import _system
    from mdtpu.integrate.slot_step import (_far_row, pack_state_rows,
                                           packed_resort, slot_forces,
                                           slotify, unpack_state_rows)
    from mdtpu.ops.cell_grid import CellGridEngine

    res = {}
    for n in (262144, 1048576):
        state, params, pot = _system(n)
        eng = CellGridEngine.create_tuned(pot, 2.5,
                                          np.asarray(state.unitcell), n)
        st = slot_forces(slotify(state, eng), eng)
        m = st.positions.shape[1]
        n_cells = int(np.prod(eng.grid))
        cap = eng.cell_capacity
        n_slots = n_cells * cap
        key = jax.random.PRNGKey(0)
        cid = jax.random.randint(key, (m,), 0, n_cells + 1, dtype=jnp.int32)
        rows = pack_state_rows(st)
        R = rows.shape[0]

        r = {"n_slots": m, "rows": R}

        def sortP(c, rw):
            return jax.lax.sort((c,) + tuple(rw), num_keys=1,
                                is_stable=False)

        r["sortP_ms"] = timeit(jax.jit(sortP), cid, rows)

        def blocked(sorted_rows, starts):
            sl = jax.vmap(lambda s: jax.lax.dynamic_slice(
                sorted_rows, (0, s), (R, cap)))(starts)
            return sl.transpose(1, 0, 2).reshape(R, n_slots)

        sorted_all = jax.jit(sortP)(cid, rows)
        sorted_cid = sorted_all[0]
        sorted_rows = jnp.stack(sorted_all[1:])
        starts = jnp.searchsorted(
            sorted_cid, jnp.arange(n_cells, dtype=cid.dtype),
            side="left").astype(jnp.int32)
        r["blocked_ms"] = timeit(jax.jit(blocked), sorted_rows, starts)

        far = _far_row(n_slots, st.positions.dtype)[:-1]
        dim = st.positions.shape[0]

        def resort_v2(s, c):
            rw = pack_state_rows(s)
            out = jax.lax.sort((c,) + tuple(rw), num_keys=1,
                               is_stable=False)
            sc = out[0]
            srw = jnp.stack(out[1:])
            st_ = jnp.searchsorted(
                sc, jnp.arange(n_cells + 1, dtype=c.dtype),
                side="left").astype(jnp.int32)
            counts = st_[1:] - st_[:-1]
            idx = (st_[:-1, None]
                   + jnp.arange(cap, dtype=jnp.int32)[None, :])
            valid = (idx < st_[1:, None]).reshape(-1)
            packed = blocked(srw, st_[:-1])
            fill_col = jnp.concatenate([
                jnp.zeros((6 * dim, 1), packed.dtype),
                jnp.ones((1, 1), packed.dtype),
                jnp.zeros((R - 6 * dim - 1, 1), packed.dtype)], axis=0)
            packed = jnp.where(valid[None, :], packed, fill_col)
            return unpack_state_rows(st, packed, occupied=valid,
                                     position_fill=(valid, far)), \
                jnp.any(counts > cap)

        r["resort_v2_ms"] = timeit(
            jax.jit(lambda s, c: resort_v2(s, c)[0]), st, cid, reps=5)
        r["resort_v1_ms"] = timeit(jax.jit(
            lambda s, c: packed_resort(s, c, n_cells, cap)[0]), st, cid,
            reps=5)
        res[n] = r
    print(json.dumps(res))


if __name__ == "__main__":
    main()
