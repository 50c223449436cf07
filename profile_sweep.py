"""Decompose the XLA z-window sweep at bench geometry on the real TPU.

Stages: refresh scatter -> ghost windows -> pair blocks (half stencil,
no reactions) -> reactions+unwindow (the full engine) -> force gather;
plus a full-stencil variant (9 both-sides offsets, no reaction fold-back)
and a slot-space variant (no per-step scatter/gather at all).
One JSON line per probe.
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from bench import build
from mdtpu.ops.cell_grid import CellGridEngine, ghost_z_window, refresh_far_grids
from mdtpu.potentials.lennard_jones import LennardJones


def timed(fn, arg, iters, label):
    out = jax.jit(fn)(arg, 2)
    jax.block_until_ready(out)
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(arg, iters)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"probe": label, "ms": round(dt, 4)}), flush=True)


def main():
    n, rho = 65536, 0.8
    state, advance = build(n=n)
    state = advance(state, 200)
    jax.block_until_ready(state)

    pot = LennardJones(r_cut=2.5, force_shift=True)
    eng = CellGridEngine.create(pot, 2.5, 0.3, np.asarray(state.unitcell), n,
                                cell_capacity=29)
    nbrs = eng.allocate(state.positions, state.diameters, state.unitcell,
                        state.unitcell_inv)
    state = state.replace(nbrs=nbrs)
    nx, ny, nz = eng.grid
    cap = eng.cell_capacity
    n_cells = nx * ny * nz
    dtype = jnp.float32
    cell = state.unitcell
    lengths = [cell[k, k] for k in range(3)]

    def loop(body):
        def f(s, iters):
            def it(i, acc):
                return acc + body(s.positions + 0.0 * acc) * 1e-30
            return jax.lax.fori_loop(0, iters, it, jnp.float32(0))
        return f

    # 1. refresh only
    def refresh(pos):
        grids = refresh_far_grids(pos, nbrs, eng.grid, cap, cell, state.unitcell_inv)
        return sum(jnp.sum(g) for g in grids)
    timed(loop(refresh), state, 200, "refresh_scatter")

    # 2. refresh + windows
    def windows(pos):
        grids = refresh_far_grids(pos, nbrs, eng.grid, cap, cell, state.unitcell_inv)
        win = [ghost_z_window(grids[k], cell[k, 2])
               for k in range(3)]
        return sum(jnp.sum(w) for w in win)
    timed(loop(windows), state, 200, "refresh_plus_windows")

    # 3..5 use pieces of the engine: blocks without reactions (forces on own
    # rows only), the full engine, and a gather-free total.
    diam = nbrs.sorted_diam.reshape(nx, ny, nz, cap)
    cutoff2 = jnp.asarray(6.25, dtype)

    i_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 1)
    diag_bump = jnp.where(j_ids == i_ids + cap, jnp.asarray(1e30, dtype),
                          jnp.zeros((), dtype))[None]

    def blocks(pos, offsets, reactions):
        grids = refresh_far_grids(pos, nbrs, eng.grid, cap, cell, state.unitcell_inv)
        win = [ghost_z_window(grids[k], cell[k, 2])
               for k in range(3)]
        win_d = ghost_z_window(diam)
        own = [g.reshape(n_cells, cap, 1) for g in grids]
        own_d = diam.reshape(n_cells, cap, 1)

        def shift(w, ox, oy, gx, gy):
            if ox:
                top = w[:ox] + gx if gx is not None else w[:ox]
                w = jnp.concatenate([w[ox:], top], axis=0)
            if oy == 1:
                left = w[:, :1] + gy if gy is not None else w[:, :1]
                w = jnp.concatenate([w[:, 1:], left], axis=1)
            elif oy == -1:
                right = w[:, -1:] - gy if gy is not None else w[:, -1:]
                w = jnp.concatenate([right, w[:, :-1]], axis=1)
            return w

        total = jnp.zeros((), dtype)
        f_own = [jnp.zeros((n_cells, cap), dtype) for _ in range(3)]
        for ox, oy in offsets:
            if ox == 0 and oy == 0:
                wc = [w.reshape(n_cells, 1, 3 * cap) for w in win]
                wd = win_d.reshape(n_cells, 1, 3 * cap)
                self_block = True
            else:
                wc = [shift(win[k], max(ox, 0) if ox else 0, oy,
                            cell[k, 0], cell[k, 1])
                      .reshape(n_cells, 1, 3 * cap) for k in range(3)]
                # negative ox via roll (full stencil)
                if ox < 0:
                    wc = [jnp.roll(w.reshape(nx, ny * nz, 1, 3 * cap), 1,
                                   axis=0).reshape(n_cells, 1, 3 * cap)
                          for w in wc]
                wd = shift(win_d, max(ox, 0), oy, None, None)
                if ox < 0:
                    wd = jnp.roll(wd.reshape(nx, ny * nz, 3 * cap), 1,
                                  axis=0)
                wd = wd.reshape(n_cells, 1, 3 * cap)
                self_block = False
            d_comps = [own[k] - wc[k] for k in range(3)]
            r2 = sum(dk * dk for dk in d_comps)
            if self_block:
                r2 = r2 + diag_bump
            mask = r2 < cutoff2
            u, f_over_r = pot.evaluate_r2(r2, own_d, wd)
            u = jnp.where(mask, u, jnp.zeros_like(u))
            f_over_r = jnp.where(mask, f_over_r, jnp.zeros_like(f_over_r))
            total = total + jnp.sum(u)
            for k in range(3):
                f_own[k] = f_own[k] + jnp.sum(f_over_r * d_comps[k], axis=2)
            if reactions:
                for k in range(3):
                    react = -jnp.sum(f_over_r * d_comps[k], axis=1)
                    r = react.reshape(nx, ny, nz, 3, cap)
                    r = (jnp.roll(r[..., 0, :], -1, axis=2) + r[..., 1, :]
                         + jnp.roll(r[..., 2, :], 1, axis=2))
                    r = jnp.roll(r, (ox, oy), axis=(0, 1))
                    f_own[k] = f_own[k] + r.reshape(n_cells, cap)
        return total + sum(jnp.sum(f) for f in f_own)

    half = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
    timed(loop(lambda p: blocks(p, half, False)), state, 100,
          "half_stencil_blocks_only")
    timed(loop(lambda p: blocks(p, half, True)), state, 100,
          "half_stencil_with_reactions")
    full = [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]
    timed(loop(lambda p: blocks(p, full, False)), state, 100,
          "full_stencil_no_reactions")

    # 6. the production engine compute (blocks + reactions + gather)
    def engine_compute(pos):
        e, w, f, _ = eng.compute(pos, state.diameters, state.unitcell,
                                 state.unitcell_inv, nbrs)
        return e + jnp.sum(f)
    timed(loop(engine_compute), state, 100, "engine_compute_full")


if __name__ == "__main__":
    main()
