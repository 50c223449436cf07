"""Measure device->host pull cost on the remote-TPU tunnel: per-RPC floor
(tiny pulls) and effective bandwidth vs payload size/shape. Informs the
driver's trajectory-frame stacking (VERDICT r4 item 1): whether the coupled
cadence is RPC-bound (stacking wins) or byte-bound (payload cuts win), and
whether a stacked (K, R, n) pull pays any per-shape penalty vs flat.

Protocol: np.asarray of a jax Array caches the host copy (repeat pulls are
free), so every timing pulls a FRESH array (x + i); first pull of a shape is
discarded (lazy transfer-program setup)."""

import time

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def bench_shape(name, shp, reps=5):
    f = jax.jit(lambda i: jnp.zeros(shp, jnp.float32) + i)
    arrs = [jax.block_until_ready(f(float(i))) for i in range(reps)]
    times = []
    for a in arrs:
        t0 = time.perf_counter()
        np.asarray(a)
        times.append(time.perf_counter() - t0)
    best = min(times[1:])
    nb = arrs[0].nbytes
    print(f"{name}: nbytes={nb} best={best*1e3:.1f} ms "
          f"({nb/best/1e6:.1f} MB/s) all={[round(t*1e3,1) for t in times]}",
          flush=True)


def main():
    shapes = [
        ("tiny (8,)", (8,)),
        ("one frame (6, 65536) 1.6MB", (6, 65536)),
        ("one old frame (8, 65536) 2.1MB", (8, 65536)),
        ("stack (16, 6, 65536) 25MB", (16, 6, 65536)),
        ("driver buffer (96, 65536) 25MB", (96, 65536)),
        ("flat 25MB", (16 * 6 * 65536,)),
        ("flat 4MB", (1024 * 1024,)),
        ("flat 1.6MB", (6 * 65536,)),
    ]
    for name, shp in shapes:
        bench_shape(name, shp)

    # Same 25 MB, flattened ON DEVICE before the pull (one HBM relayout
    # copy) — if the tiled 2-D layout is what pays the 3-D stack's ~60%
    # shape penalty, the driver should reshape(-1) before np.asarray.
    f = jax.jit(lambda i: (jnp.zeros((96, 65536), jnp.float32) + i)
                .reshape(-1))
    arrs = [jax.block_until_ready(f(float(i))) for i in range(5)]
    times = []
    for a in arrs:
        t0 = time.perf_counter()
        np.asarray(a)
        times.append(time.perf_counter() - t0)
    print(f"device-flattened (96,65536)->1D: best={min(times[1:])*1e3:.1f} "
          f"ms all={[round(t*1e3,1) for t in times]}", flush=True)

    # RPC floor: a trivial jitted call + scalar pull, interleaved.
    f = jax.jit(lambda x: x + 1.0)
    x = jax.block_until_ready(jnp.zeros((8,), jnp.float32))
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            x = f(x)
            np.asarray(x)
        print(f"call+pull x10: {(time.perf_counter()-t0)*1e2:.1f} ms each",
              flush=True)

    # Overlap: pull a large array WHILE a long fused loop executes — can the
    # driver hide the trajectory-frame pull under the next batch's compute,
    # or does the tunnel serialize (round-3 measured small-pull overlap as
    # SLOWER; re-check for one big pull)?
    heavy = jax.jit(lambda x, k: jax.lax.fori_loop(
        0, k, lambda i, y: jnp.sin(y) * 1.0001 + 1e-7, x))
    big = jax.block_until_ready(jnp.zeros((16 * 6 * 65536,)) + 3.14)
    y = jax.block_until_ready(jnp.zeros((2048, 2048)))
    t0 = time.perf_counter()
    jax.block_until_ready(heavy(y, 2000))
    t_heavy = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(big)
    t_idle_pull = time.perf_counter() - t0
    big2 = jax.block_until_ready(big + 1.0)  # fresh array (host cache)
    t0 = time.perf_counter()
    out = heavy(y, 2000)            # async dispatch
    t_disp = time.perf_counter() - t0
    np.asarray(big2)                # pull DURING execution
    t_pull_done = time.perf_counter() - t0
    jax.block_until_ready(out)
    t_both = time.perf_counter() - t0
    print(f"overlap: heavy={t_heavy*1e3:.0f} ms idle_pull_25MB="
          f"{t_idle_pull*1e3:.0f} ms dispatch={t_disp*1e3:.0f} ms "
          f"pull_during_exec={t_pull_done*1e3:.0f} ms both_done="
          f"{t_both*1e3:.0f} ms (serialized would be "
          f"{(t_heavy+t_idle_pull)*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
