"""MXU-offloaded z-window sweep vs the VPU form: accuracy + speed at bench
geometry. r2 via |yi|^2+|yj|^2-2 yi.yj and force sums via batched
dot_general over the component axis, with all coordinates CELL-CENTERED
(|y| <= ~5) so precision survives."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax
from mdtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from bench import build
from mdtpu.ops.cell_grid import ghost_z_window

HI = jax.lax.Precision.HIGHEST

def mxu_sweep(engine, positions, diameters, cell, lean=True):
    """positions: (3, n_slots) slot order. Returns f (3, n_slots)."""
    pot = engine.potential
    dim = 3
    cap = engine.cell_capacity
    nx, ny, nz = engine.grid
    n_cells = nx * ny * nz
    dtype = positions.dtype
    shape = (nx, ny, nz, cap)
    grids = [positions[k].reshape(shape) for k in range(dim)]
    diam = diameters.reshape(shape)

    # Cell centers per axis (orthorhombic): ctr[k] along axis k.
    axv = [cell[k, k] / g for k, g in enumerate((nx, ny, nz))]
    ctr = [
        ((jnp.arange(nx, dtype=dtype) + 0.5) * axv[0])[:, None, None, None],
        ((jnp.arange(ny, dtype=dtype) + 0.5) * axv[1])[None, :, None, None],
        ((jnp.arange(nz, dtype=dtype) + 0.5) * axv[2])[None, None, :, None],
    ]
    # Own coords relative to OWN cell center; windows built from absolute
    # coords then re-centered to the own cell's center (ghost shifts baked).
    own_y = [ (grids[k] - ctr[k]).reshape(n_cells, cap) for k in range(dim)]
    win = [ghost_z_window(grids[k], cell[k, 2]) for k in range(dim)]
    win_y = [(win[k] - ctr[k]).reshape(n_cells, 3 * cap) for k in range(dim)]
    win_d = ghost_z_window(diam)

    i_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 1)
    diag_bump = jnp.where(j_ids == i_ids + cap, jnp.asarray(1e30, dtype),
                          jnp.zeros((), dtype))[None]

    own_stack = jnp.stack(own_y)            # (3, b, C)

    def pair_block(wy_stack, wd, exclude_self, ox=0, oy=0):
        # wy_stack (3, b, 3C); own_stack (3, b, C)
        own_n = sum(own_y[k] * own_y[k] for k in range(dim))   # (b, C)
        win_n = sum(wy_stack[k] * wy_stack[k] for k in range(dim))  # (b, 3C)
        cross = jax.lax.dot_general(
            own_stack, wy_stack,
            (((0,), (0,)), ((1,), (1,))), precision=HI)  # (b, C, 3C)
        r2 = own_n[:, :, None] + win_n[:, None, :] - 2.0 * cross
        if exclude_self:
            r2 = r2 + diag_bump
        od = diam.reshape(n_cells, cap, 1)
        wdr = wd.reshape(n_cells, 1, 3 * cap)
        f_over_r = pot.force_r2(r2, od, wdr)
        # own forces: y_i * rowsum(f) - sum_j f*y_j (batched dot)
        rowsum = jnp.sum(f_over_r, axis=2)            # (b, C)
        fy = jax.lax.dot_general(
            wy_stack, f_over_r,
            (((2,), (2,)), ((1,), (0,))), precision=HI)  # (b, 3, C)
        f_own_b = jnp.stack([own_y[k] * rowsum for k in range(dim)], 1) - fy
        if exclude_self:
            return f_own_b, None
        # reactions: -( sum_i f*y_i - y_j * colsum(f) )
        colsum = jnp.sum(f_over_r, axis=1)            # (b, 3C)
        oyf = jax.lax.dot_general(
            own_stack, f_over_r,
            (((2,), (1,)), ((1,), (0,))), precision=HI)  # (b, 3, 3C)
        react = jnp.stack([wy_stack[k] * colsum for k in range(dim)], 1) - oyf
        return f_own_b, react   # react (b, 3, 3C), sign: -(oyf - y_j colsum) = react

    def unwindow(reaction):
        r = reaction.reshape(nx, ny, nz, 3, cap)
        return (jnp.roll(r[..., 0, :], -1, axis=2) + r[..., 1, :]
                + jnp.roll(r[..., 2, :], 1, axis=2))

    def plane_shift(w, ox, oy, gx, gy):
        if ox == 1:
            top = w[:1] + gx if gx is not None else w[:1]
            w = jnp.concatenate([w[1:], top], axis=0)
        if oy == 1:
            left = w[:, :1] + gy if gy is not None else w[:, :1]
            w = jnp.concatenate([w[:, 1:], left], axis=1)
        elif oy == -1:
            right = w[:, -1:] - gy if gy is not None else w[:, -1:]
            w = jnp.concatenate([right, w[:, :-1]], axis=1)
        return w

    win_y_grid = [w.reshape(nx, ny, nz, 3 * cap) for w in win_y]

    f_own, _ = pair_block(jnp.stack(win_y), win_d, True)
    for ox, oy in ((0, 1), (1, -1), (1, 0), (1, 1)):
        # shifted windows, RE-CENTERED: neighbor's window coords were
        # relative to the neighbor's center; shift by the center delta
        # (constant per axis) + ghost box shifts.
        wy = []
        for k in range(dim):
            # Cell-relative coords absorb periodic wrap seamlessly: NO box
            # ghost shift; the center delta ctr_neighbor - ctr_own = offset*ax
            # applies to every row including the wrapped one.
            g = plane_shift(win_y_grid[k].reshape(nx, ny, nz, 3 * cap),
                            ox, oy, None, None)
            delta = 0.0
            if k == 0 and ox: delta = axv[0] * ox
            if k == 1 and oy: delta = axv[1] * oy
            wy.append((g + delta).reshape(n_cells, 3 * cap))
        wd = plane_shift(win_d, ox, oy, None, None)
        fb, react = pair_block(jnp.stack(wy), wd, False, ox, oy)
        f_own = f_own + fb
        for k in range(dim):
            r = unwindow(react[:, k, :])
            r = jnp.roll(r, (ox, oy), axis=(0, 1))
            f_own = f_own.at[:, k, :].add(r.reshape(n_cells, cap))

    # f_own (b, 3, C) -> (3, n_slots)
    return jnp.stack([f_own[:, k, :].reshape(-1) for k in range(dim)])


def main():
    state, advance = build(slot=True)
    state = advance(state, 200)
    jax.block_until_ready(state)
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones
    pot = LennardJones(r_cut=2.5)
    eng = CellGridEngine(potential=pot, cutoff=2.5, skin=0.6,
                         grid=(14, 14, 14), cell_capacity=36)

    # accuracy: vs the engine's VPU sweep (forces only, lean)
    e, w, f_ref, _ = eng.compute_slots(state.positions, state.diameters,
                                       state.unitcell, state.unitcell_inv,
                                       state.nbrs, observables=False)
    f_mxu = mxu_sweep(eng, state.positions, state.diameters, state.unitcell)
    occ = np.asarray(state.nbrs.occupied)
    fr = np.asarray(f_ref)[:, occ]; fm = np.asarray(f_mxu)[:, occ]
    scale = np.abs(fr).max()
    err = np.abs(fm - fr).max() / scale
    print(json.dumps({"probe": "mxu_accuracy_vs_vpu",
                      "max_norm_err": float(err), "scale": float(scale)}),
          flush=True)

    # timing
    def timed(fn, label):
        def body(i, s):
            f = fn(s)
            return s.replace(positions=s.positions + 1e-30 * f)
        g = jax.jit(lambda s, k: jax.lax.fori_loop(0, k, body, s))
        out = g(state, 2); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = g(state, 200); jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 200 * 1e3
        print(json.dumps({"probe": label, "ms": round(dt, 4)}), flush=True)

    timed(lambda s: eng.compute_slots(s.positions, s.diameters, s.unitcell,
                                      s.unitcell_inv, s.nbrs,
                                      observables=False)[2],
          "vpu_sweep_lean")
    timed(lambda s: mxu_sweep(eng, s.positions, s.diameters, s.unitcell),
          "mxu_sweep_lean")


if __name__ == "__main__":
    main()
