"""Occupancy stats + capacity sweep at the bench config on TPU."""
import json, time
import jax
from mdtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from bench import build

def occ_stats():
    state, advance = build(slot=False)
    state = advance(state, 400)
    jax.block_until_ready(state)
    # counts per cell on the melted state
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones
    pot = LennardJones(r_cut=2.5, force_shift=True)
    eng = CellGridEngine.create(pot, 2.5, 0.3, np.asarray(state.unitcell), 65536, cell_capacity=29)
    grid = jnp.asarray(eng.grid, jnp.int32)
    n_cells = int(np.prod(eng.grid))
    @jax.jit
    def counts_of(pos):
        frac = jnp.dot(pos, state.unitcell_inv.T, precision=jax.lax.Precision.HIGHEST)
        frac = frac - jnp.floor(frac)
        coords = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)
        strides = np.concatenate([np.cumprod(np.asarray(eng.grid)[::-1])[-2::-1], [1]]).astype(np.int32)
        cid = jnp.sum(coords * jnp.asarray(strides), axis=1)
        return jnp.zeros((n_cells,), jnp.int32).at[cid].add(1)
    maxes = []
    for i in range(10):
        state = advance(state, 100)
        c = counts_of(state.positions)
        maxes.append(int(jnp.max(c)))
    print(json.dumps({"probe": "occupancy_max_over_10x100_steps", "maxes": maxes}), flush=True)

def bench_cap(cap):
    state, advance = build(slot=True, cell_capacity=cap)
    state = advance(state, 200)
    jax.block_until_ready(state)
    n_steps = 600
    t0 = time.perf_counter()
    state = advance(state, n_steps)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    print(json.dumps({"probe": f"bench_slot_cap{cap}",
                      "steps_per_sec": round(n_steps / dt, 2),
                      "overflow": bool(state.nbrs.overflow)}), flush=True)

if __name__ == "__main__":
    occ_stats()
    for cap in (24, 26, 32):
        bench_cap(cap)
