"""Micro-probe of the plane-kernel inner loop on the real TPU.

Isolates the cost components of one pair-block sweep at bench geometry
(rows=225, cap=29, 5 offsets, 15 programs): full potential vs no-divide vs
no-reductions vs reductions-only. One JSON line per variant.
"""

import json
import time
from functools import partial

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX, NY, NZ, CAP = 15, 15, 15, 29
ROWS = NY * NZ
C3 = 3 * CAP
CHUNK = 45
N_OFF = 5


def kernel(w_ref, fx_ref, e_ref, *, variant, chunk):
    rows, cap, c3 = ROWS, CAP, C3
    n_chunks = rows // chunk

    def body(own_s, win_s):
        w0 = [w_ref[k, 0] for k in range(4)]
        for k in range(4):
            own_s[k] = w0[k][:, cap:2 * cap]
        fx_ref[0] = jnp.zeros((rows, cap), jnp.float32)

        def sweep_static(energy):
            for ci in range(rows // chunk):
                r0 = ci * chunk
                o = [own_s[k, r0:r0 + chunk, :][:, :, None] for k in range(4)]
                w = [win_s[k, r0:r0 + chunk, :][:, None, :] for k in range(4)]
                dx = o[0] - w[0]
                dy = o[1] - w[1]
                dz = o[2] - w[2]
                r2 = dx * dx + dy * dy + dz * dz
                mask = r2 < 6.25
                inv_r2 = 1.0 / r2
                sr6 = inv_r2 * inv_r2 * inv_r2
                sr12 = sr6 * sr6
                u = 4.0 * (sr12 - sr6)
                f = 24.0 * (2.0 * sr12 - sr6) * inv_r2
                u = jnp.where(mask, u, 0.0)
                f = jnp.where(mask, f, 0.0)
                energy = energy + jnp.sum(u)
                fx_ref[0, r0:r0 + chunk, :] += (
                    jnp.sum(f * dx, axis=2) + jnp.sum(f * dy, axis=2)
                    + jnp.sum(f * dz, axis=2))
            return energy

        def sweep(energy):
            if variant == "full_static":
                return sweep_static(energy)

            def chunk_body(ci, energy):
                r0 = pl.multiple_of(ci * chunk, chunk)
                o = [own_s[k, pl.ds(r0, chunk), :][:, :, None] for k in range(4)]
                w = [win_s[k, pl.ds(r0, chunk), :][:, None, :] for k in range(4)]
                dx = o[0] - w[0]
                dy = o[1] - w[1]
                dz = o[2] - w[2]
                r2 = dx * dx + dy * dy + dz * dz
                mask = r2 < 6.25
                if variant in ("full", "reduce_only"):
                    inv_r2 = 1.0 / r2
                    sr2 = inv_r2
                    sr6 = sr2 * sr2 * sr2
                    sr12 = sr6 * sr6
                    u = 4.0 * (sr12 - sr6)
                    f = 24.0 * (2.0 * sr12 - sr6) * inv_r2
                elif variant == "nodiv":
                    u = r2 * 0.5
                    f = r2 + dx
                u = jnp.where(mask, u, 0.0)
                f = jnp.where(mask, f, 0.0)
                if variant in ("full", "nodiv"):
                    energy = energy + jnp.sum(u)
                    fx_ref[0, pl.ds(r0, chunk), :] += (
                        jnp.sum(f * dx, axis=2) + jnp.sum(f * dy, axis=2)
                        + jnp.sum(f * dz, axis=2))
                else:  # reduce_only: skip lane reductions, cheap scalar
                    energy = energy + u[0, 0, 0] + f[0, 0, 0]
                return energy
            return jax.lax.fori_loop(0, n_chunks, chunk_body, energy)

        energy = jnp.zeros((), jnp.float32)
        for s in range(N_OFF):
            for k in range(4):
                win_s[k] = pltpu.roll(w0[k], (s * NZ) % rows, 0)
            energy = sweep(energy)
        e_ref[0, 0, 0] = energy

    pl.run_scoped(body, own_s=pltpu.VMEM((4, ROWS, CAP), jnp.float32),
                  win_s=pltpu.VMEM((4, ROWS, C3), jnp.float32))


def run(variant, chunk=CHUNK):
    w = jax.random.uniform(jax.random.PRNGKey(0), (4, NX, ROWS, C3),
                           jnp.float32) * 40.0
    f = pl.pallas_call(
        partial(kernel, variant=variant, chunk=chunk),
        grid=(NX,),
        in_specs=[pl.BlockSpec((4, 1, ROWS, C3), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, ROWS, CAP), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((NX, ROWS, CAP), jnp.float32),
                   jax.ShapeDtypeStruct((NX, 1, 1), jnp.float32)),
    )

    def many(x, n):
        def b(i, acc):
            fx, e = f(x + 0.0 * acc)
            return acc + e[0, 0, 0]
        return jax.lax.fori_loop(0, n, b, jnp.float32(0))

    g = jax.jit(many, static_argnums=1)
    out = g(w, 2)
    jax.block_until_ready(out)
    n = 50
    t0 = time.perf_counter()
    out = g(w, n)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({"variant": variant, "chunk": chunk,
                      "ms_per_sweep": round(dt, 4)}), flush=True)


if __name__ == "__main__":
    import sys
    variants = sys.argv[1:] or ["full_static", "full_static:15", "full:5"]
    for v in variants:
        if ":" in v:
            name, c = v.split(":")
            run(name, chunk=int(c))
        else:
            run(v)
