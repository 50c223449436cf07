"""TPU rebin cost decomposition at slot-space sizes. Random permutations
(identity/reversed indices get optimized into copies — first probe version
measured nothing), plus _rebin and packed_resort in isolation on a REAL
slot state. One JSON line."""

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
    from mdtpu.integrate.slot_step import (_rebin, fold_wrap, packed_resort,
                                           slot_forces, slotify)
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
        key = jax.random.PRNGKey(0)
        perm = jax.random.permutation(key, m).astype(jnp.int32)
        cid = jax.random.randint(key, (m,), 0, n_cells + 1, dtype=jnp.int32)
        iota = jnp.arange(m, dtype=jnp.int32)
        rows = jax.random.normal(jax.random.PRNGKey(1), (23, m),
                                 dtype=jnp.float32)

        r = {"n_slots": m}
        r["sort_ms"] = timeit(jax.jit(lambda c, i: jax.lax.sort(
            (c, i), num_keys=1, is_stable=False)), cid, iota)
        # Batched window sorts: if TPU sort vectorizes over the batch dim,
        # a banded resort (rows move <= skin/2 => bounded displacement in
        # slot order) can replace the global sort with 2 window passes.
        for b in (16, 64, 256):
            w = m // b
            cid2 = cid[:b * w].reshape(b, w)
            iota2 = iota[:b * w].reshape(b, w)
            r[f"sort_b{b}_ms"] = timeit(jax.jit(lambda c, i: jax.lax.sort(
                (c, i), num_keys=1, is_stable=False, dimension=1)),
                cid2, iota2)
        r["take_perm_ms"] = timeit(jax.jit(
            lambda a, o: jnp.take(a, o, axis=1)), rows, perm)
        # Layout variants: a (23, m) axis-1 gather pulls 23 strided 4-byte
        # elements per index (HBM lines 4*m apart); the transposed (m, 23)
        # axis-0 gather pulls one contiguous 92-byte run per index.
        rows_t = jnp.asarray(np.asarray(rows).T.copy())
        r["take_t_ms"] = timeit(jax.jit(
            lambda a, o: jnp.take(a, o, axis=0)), rows_t, perm)
        r["transpose_ms"] = timeit(jax.jit(lambda a: a.T + 0.0), rows)
        r["take_tt_ms"] = timeit(jax.jit(
            lambda a, o: jnp.take(a.T, o, axis=0).T + 0.0), rows, perm)
        r["take_perrow_ms"] = timeit(jax.jit(
            lambda a, o: jnp.stack([jnp.take(a[k], o) for k in
                                    range(a.shape[0])])), rows, perm)
        base = jnp.zeros((23, m + 1), jnp.float32)
        r["scatter_perm_ms"] = timeit(jax.jit(
            lambda b, a, v: b.at[:, a].set(v)), base, perm, rows)
        r["fold_wrap_ms"] = timeit(jax.jit(lambda s: fold_wrap(s)[0]), st)
        r["packed_resort_ms"] = timeit(jax.jit(
            lambda s, c: packed_resort(s, c, n_cells, cap)[0]), st, cid,
            reps=5)
        r["rebin_ms"] = timeit(jax.jit(lambda s: _rebin(s, eng)), st, reps=5)
        res[n] = r
    print(json.dumps(res))


if __name__ == "__main__":
    main()
