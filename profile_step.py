"""Decompose the bench-config step time on the real TPU.

Times, via fused fori_loops (the only trustworthy timing on the remote-RPC
TPU — see CLAUDE.md):
  * full NVT step (the bench number),
  * force compute only (pair sweep, no rebuild cond),
  * integrator-only (no force eval),
  * allocate (rebuild) alone,
  * a single-offset pair block in isolation (VPU roofline probe).

Prints one JSON line per measurement.
"""

import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from bench import build


def timed(fn, state, iters, label, per_step_divisor=1):
    out = fn(state, 2)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(state, iters)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ms = dt / iters * 1000.0 / per_step_divisor
    print(json.dumps({"probe": label, "ms_per_iter": round(ms, 4),
                      "iters": iters}), flush=True)
    return out


def main():
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate.step import make_step
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones

    n, rho, temp = 65536, 0.8, 1.0
    state, advance = build()
    # melt
    state = advance(state, 200)
    jax.block_until_ready(state)

    pot = LennardJones(r_cut=2.5, force_shift=True)
    cell_np = np.asarray(state.unitcell)
    engine = CellGridEngine.create(pot, 2.5, 0.3, cell_np, n, cell_capacity=29)

    # 1. full step
    timed(advance, state, 300, "full_nvt_step")

    # 2. compute-only (forces at fixed nbrs, feed positions back to keep the
    # loop honest)
    def compute_only(s, k):
        def body(i, carry):
            e, w, f, nbrs = engine.compute(carry.positions, carry.diameters,
                                           carry.unitcell, carry.unitcell_inv,
                                           carry.nbrs)
            return carry.replace(energy=e, virial=w, forces=f, nbrs=nbrs,
                                 positions=carry.positions + 0.0 * f)
        return jax.lax.fori_loop(0, k, body, s)

    timed(jax.jit(compute_only), state, 300, "compute_only")

    # 3. integrate-only: zero-cost force stub
    def integ_only(s, k):
        def body(i, carry):
            v = carry.velocities + 0.5 * 0.002 * carry.forces
            x = carry.positions + 0.002 * v
            from mdtpu.core.box import wrap_positions
            x, im = wrap_positions(x, carry.images, carry.unitcell,
                                   carry.unitcell_inv)
            t = 2.0 * 0.5 * jnp.sum(v * v) / carry.nf
            return carry.replace(positions=x, velocities=v, images=im,
                                 temperature=t)
        return jax.lax.fori_loop(0, k, body, s)

    timed(jax.jit(integ_only), state, 300, "integrate_wrap_only")

    # 4. allocate (rebuild) alone
    def alloc_loop(s, k):
        def body(i, carry):
            nbrs = engine.allocate(carry.positions + 1e-7 * i,
                                   carry.diameters, carry.unitcell,
                                   carry.unitcell_inv)
            return carry.replace(nbrs=nbrs)
        return jax.lax.fori_loop(0, k, body, s)

    timed(jax.jit(alloc_loop), state, 100, "allocate_rebuild")

    # 5. rebuild cadence: how often does needs_rebuild fire in the hot run?
    def count_rebuilds(s, k):
        def body(i, carry):
            s2, cnt = carry
            rb = engine.needs_rebuild(s2.positions, s2.nbrs, s2.unitcell,
                                      s2.unitcell_inv)
            from bench import build as _b  # noqa
            s3 = advance_step(s2)
            return (s3, cnt + rb.astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, (s, jnp.int32(0)))

    from mdtpu.core.types import NVT as _NVT
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    advance_step = make_step(params, NVT(temp, 0.4), engine)
    s2, cnt = jax.jit(count_rebuilds)(state, 300)
    jax.block_until_ready(s2)
    print(json.dumps({"probe": "rebuilds_per_300_steps", "count": int(cnt)}),
          flush=True)

    # 6. single pair-block probe: one in-plane offset of the z-window sweep
    # (isolates pure VPU throughput on the (n_cells, C, 3C) tiles).
    nbrs = state.nbrs
    cap = engine.cell_capacity
    nx, ny, nz = engine.grid
    n_cells = nx * ny * nz
    pad = n_cells * cap + 1

    def one_block(s, k):
        def body(i, acc):
            pos_t = s.positions.T
            grids = [jnp.zeros((pad,), s.positions.dtype)
                     .at[nbrs.addr].set(pos_t[kk])[:-1]
                     .reshape(nx, ny, nz, cap) for kk in range(3)]
            occ = nbrs.occupied.reshape(nx, ny, nz, cap)

            def window(a):
                return jnp.concatenate(
                    [jnp.roll(a, 1, axis=2), a, jnp.roll(a, -1, axis=2)],
                    axis=3)

            win = [window(g).reshape(n_cells, 1, 3 * cap) for g in grids]
            wo = window(occ).reshape(n_cells, 1, 3 * cap)
            own = [g.reshape(n_cells, cap, 1) for g in grids]
            own_o = occ.reshape(n_cells, cap, 1)
            L = s.unitcell[0, 0]
            r2 = jnp.zeros((n_cells, cap, 3 * cap), s.positions.dtype)
            for kk in range(3):
                dk = own[kk] - win[kk]
                dk = dk - L * jnp.round(dk / L)
                r2 = r2 + dk * dk
            mask = own_o & wo & (r2 < 6.25)
            r2s = jnp.where(mask, r2, 1.0)
            u, f = pot.evaluate_r2(r2s, 1.0, 1.0)
            u = jnp.where(mask, u, 0.0)
            return acc + jnp.sum(u) * 1e-30
        return s.replace(energy=jax.lax.fori_loop(0, k, body, s.energy))

    timed(jax.jit(one_block), state, 100, "one_offset_pair_block")


if __name__ == "__main__":
    main()
