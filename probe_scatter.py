"""Scatter/gather micro-variants at bench shapes on the real TPU."""
import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

N = 65536
PAD = 3375 * 29 + 1


def timed(fn, args, label, iters=200):
    f = jax.jit(fn)
    out = f(*args, 2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args, iters)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"probe": label, "ms": round(dt, 4)}), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    addr = jax.random.permutation(key, PAD - 1)[:N].astype(jnp.int32)
    addr_sorted = jnp.sort(addr)
    vals = jax.random.uniform(key, (3, N), jnp.float32)
    far = jnp.arange(PAD, dtype=jnp.float32)
    slot_src = jnp.zeros((PAD,), jnp.int32).at[addr].set(
        jnp.arange(N, dtype=jnp.int32))

    def loop(body):
        def f(v, k):
            def it(i, acc):
                return acc + body(v + 0.0 * acc) * 1e-30
            return jax.lax.fori_loop(0, k, it, jnp.float32(0))
        return f

    def scat_plain(v):
        return sum(jnp.sum(far.at[addr].set(v[k])[:-1]) for k in range(3))

    def scat_unique(v):
        return sum(jnp.sum(far.at[addr].set(
            v[k], unique_indices=True, indices_are_sorted=False)[:-1])
            for k in range(3))

    def scat_unique_sorted(v):
        return sum(jnp.sum(far.at[addr_sorted].set(
            v[k], unique_indices=True, indices_are_sorted=True)[:-1])
            for k in range(3))

    def gath_plain(v):
        big = jnp.concatenate([v, jnp.zeros((3, PAD - N), v.dtype)], axis=1)
        return sum(jnp.sum(big[k][addr]) for k in range(3))

    def gath_take_fill(v):
        return sum(jnp.sum(jnp.take(v[k], slot_src, fill_value=0.0,
                                    unique_indices=False)) for k in range(3))

    def gath_unique(v):
        big = jnp.concatenate([v, jnp.zeros((3, PAD - N), v.dtype)], axis=1)
        return sum(jnp.sum(jnp.take(big[k], addr, unique_indices=True,
                                    indices_are_sorted=False))
                   for k in range(3))

    timed(loop(scat_plain), (vals,), "scatter_plain")
    timed(loop(scat_unique), (vals,), "scatter_unique")
    timed(loop(scat_unique_sorted), (vals,), "scatter_unique_sorted")
    timed(loop(gath_plain), (vals,), "gather_plain")
    timed(loop(gath_take_fill), (vals,), "gather_take_slotsrc")
    timed(loop(gath_unique), (vals,), "gather_unique")


if __name__ == "__main__":
    main()
