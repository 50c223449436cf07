"""Plane-blocked Pallas TPU kernel for the cell-grid pair sweep.

The production pair sweep (the role CellListMap's threaded ``map_pairwise!``
plays in the reference, /root/reference/src/simulation.jl:100-104) as one
on-chip kernel: all pair-block intermediates live in VMEM/registers, never in
HBM — the XLA z-window path materializes several (n_cells, C, 3C) f32
temporaries per offset (~50 MB each at the bench size), which makes it
HBM-bound (measured: removing 25% of per-slot ops moved the sweep time 6%).

Layout (shared with CellGridEngine — same allocate/CellGridState):

  * inputs are the ghost-z-window arrays built by
    ``mdtpu.ops.cell_grid.ghost_z_window`` over far-pad refreshed grids,
    reshaped to (nx, R, 3C), R = ny*nz rows (one row per (y, z) cell);
  * grid = (nx,) programs, one per x-plane. Each program receives its own
    plane and the x+1 plane (periodic, via the index map) — the Newton half
    stencil needs no x-1 data;
  * in-plane offsets of the half stencil ((0,0) self both-sides, (0,1),
    (1,-1), (1,0), (1,1)) become row rolls (pltpu.roll by -oy*nz) of the
    staged planes, with periodic image shifts added to the wrapped rows of
    the x/y coordinate components (ghosts: no per-slot minimum-image);
  * pair blocks are (B, C, 3C) broadcasts over row chunks, sized so all live
    temporaries fit VMEM; forces accumulate into the output block in VMEM;
  * reaction forces on the 4 non-self offsets are written to a separate
    (nx, 4, R, 3C) output and folded back (z-unwindow + in-plane roll + add)
    by cheap XLA ops outside the kernel — Newton's third law without any
    scatter or cross-program communication.

Empty capacity slots carry far-away coordinates (mutually > cutoff apart), so
the r2 < rc^2 test eliminates them — no occupancy masks. Self pairs are
excluded by a +1e30 bump on the window diagonal band.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdtpu.ops.cell_grid import (
    CellGridEngine,
    CellGridState,
    ghost_z_window,
    refresh_far_grids,
)

HALF_OFFSETS = ((0, 1), (1, -1), (1, 0), (1, 1))


def _row_chunk(rows: int, cap: int) -> int:
    """Largest divisor of ``rows`` keeping the ~6 live (B, C, 3C) f32
    temporaries within a few MB of VMEM."""
    sub = -(-cap // 8) * 8
    lane = -(-3 * cap // 128) * 128
    budget = 5 * 1024 * 1024
    max_b = max(1, budget // (6 * sub * lane * 4))
    best = 1
    for b in range(1, rows + 1):
        if rows % b == 0 and b <= max_b:
            best = b
    return best


def _plane_kernel(wx0_ref, wy0_ref, wz0_ref, wd0_ref,
                  wx1_ref, wy1_ref, wz1_ref, wd1_ref,
                  sx_ref,
                  fx_ref, fy_ref, fz_ref, rx_ref, ry_ref, rz_ref,
                  e_ref, w_ref,
                  *, potential, cutoff2, ny, nz, cap, chunk):
    """One program = one x-plane of R = ny*nz cells.

    VMEM discipline: the per-offset neighbor views are staged into ONE
    (4, R, 3C) scratch buffer and the pair blocks run as a fori_loop over row
    chunks — so at any instant only one chunk's (B, C, 3C) temporaries are
    live (a fully unrolled version kept every offset's temporaries on the
    Mosaic stack simultaneously and OOM'd VMEM even at tiny shapes)."""
    rows = ny * nz
    c3 = 3 * cap
    dtype = fx_ref.dtype
    n_chunks = rows // chunk
    cutoff2 = jnp.asarray(cutoff2, dtype)

    def body(own_s, win_s):
        # Own-plane arrays and the (ghost-fixed) x+1 plane.
        w0 = [wx0_ref[0], wy0_ref[0], wz0_ref[0], wd0_ref[0]]
        w1 = [wx1_ref[0] + sx_ref[0, 0, 0], wy1_ref[0], wz1_ref[0],
              wd1_ref[0]]
        for k in range(4):
            # Own slots: the center C-wide band of the own window.
            own_s[k] = w0[k][:, cap:2 * cap]

        # Row masks selecting the wrapped rows of the y rolls (built once).
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        top_rows = row_ids >= (ny - 1) * nz   # receive y=0 data under oy=+1
        bot_rows = row_ids < nz               # receive y=ny-1 under oy=-1

        ii = jax.lax.broadcasted_iota(jnp.int32, (cap, c3), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (cap, c3), 1)
        diag_bump = jnp.where(jj == ii + cap, jnp.asarray(1e30, dtype),
                              jnp.zeros((), dtype))[None]

        # Zero the force accumulators.
        fx_ref[0] = jnp.zeros((rows, cap), dtype)
        fy_ref[0] = jnp.zeros((rows, cap), dtype)
        fz_ref[0] = jnp.zeros((rows, cap), dtype)

        def sweep(s, self_block, energy, virial):
            """Pair blocks of the own plane against the staged window view."""

            def chunk_body(ci, carry):
                energy, virial = carry
                r0 = pl.multiple_of(ci * chunk, chunk)
                o = [own_s[k, pl.ds(r0, chunk), :][:, :, None]
                     for k in range(4)]
                w = [win_s[k, pl.ds(r0, chunk), :][:, None, :]
                     for k in range(4)]
                dx = o[0] - w[0]
                dy = o[1] - w[1]
                dz = o[2] - w[2]
                r2 = dx * dx + dy * dy + dz * dz
                if self_block:
                    r2 = r2 + diag_bump
                mask = r2 < cutoff2
                u, f_over_r = potential.evaluate_r2(r2, o[3], w[3])
                u = jnp.where(mask, u, jnp.zeros_like(u))
                f_over_r = jnp.where(mask, f_over_r, jnp.zeros_like(f_over_r))

                scale = 0.5 if self_block else 1.0
                energy = energy + scale * jnp.sum(u, dtype=jnp.float32)
                virial = virial + scale * jnp.sum(f_over_r * r2,
                                                  dtype=jnp.float32)
                fx_ref[0, pl.ds(r0, chunk), :] += jnp.sum(f_over_r * dx,
                                                          axis=2)
                fy_ref[0, pl.ds(r0, chunk), :] += jnp.sum(f_over_r * dy,
                                                          axis=2)
                fz_ref[0, pl.ds(r0, chunk), :] += jnp.sum(f_over_r * dz,
                                                          axis=2)
                if not self_block:
                    rx_ref[0, s, pl.ds(r0, chunk), :] = -jnp.sum(
                        f_over_r * dx, axis=1)
                    ry_ref[0, s, pl.ds(r0, chunk), :] = -jnp.sum(
                        f_over_r * dy, axis=1)
                    rz_ref[0, s, pl.ds(r0, chunk), :] = -jnp.sum(
                        f_over_r * dz, axis=1)
                return energy, virial

            return jax.lax.fori_loop(0, n_chunks, chunk_body,
                                     (energy, virial))

        # Self block: (0, 0), every pair seen from both sides.
        for k in range(4):
            win_s[k] = w0[k]
        energy, virial = sweep(None, True, jnp.zeros((), jnp.float32),
                               jnp.zeros((), jnp.float32))

        # Half-stencil offsets.
        for s, (ox, oy) in enumerate(HALF_OFFSETS):
            base = w1 if ox == 1 else w0
            for k in range(4):
                if oy == 0:
                    win_s[k] = base[k]
                else:
                    v = pltpu.roll(base[k], (-oy * nz) % rows, 0)
                    if k == 1:  # image shift on wrapped rows, y component
                        if oy == 1:
                            v = v + jnp.where(top_rows, sx_ref[0, 0, 1],
                                              jnp.zeros((), dtype))
                        else:
                            v = v - jnp.where(bot_rows, sx_ref[0, 0, 1],
                                              jnp.zeros((), dtype))
                    win_s[k] = v
            energy, virial = sweep(s, False, energy, virial)

        e_ref[0, 0, 0] = energy
        w_ref[0, 0, 0] = virial

    pl.run_scoped(
        body,
        own_s=pltpu.VMEM((4, rows, cap), dtype),
        win_s=pltpu.VMEM((4, rows, c3), dtype),
    )


@struct.dataclass
class PallasPlaneEngine(CellGridEngine):
    """CellGridEngine with the pair sweep as a plane-blocked Pallas kernel.

    Shares allocate/needs_rebuild/CellGridState with CellGridEngine; the
    reaction fold-back and the force gather to particle order stay in XLA.
    3D f32 only (f64 and 2D fall back to the XLA z-window path).
    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """

    interpret: bool = struct.field(pytree_node=False, default=False)
    orthorhombic: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, potential, cutoff, skin, unitcell, n_particles,
               cell_capacity=None, interpret=False):
        from mdtpu.core.box import is_orthorhombic

        base = CellGridEngine.create(potential, cutoff, skin, unitcell,
                                     n_particles, cell_capacity)
        return cls(potential=base.potential, cutoff=base.cutoff,
                   skin=base.skin, grid=base.grid,
                   cell_capacity=base.cell_capacity, interpret=interpret,
                   orthorhombic=is_orthorhombic(unitcell))

    def compute(self, positions, diameters, cell, cell_inv,
                nbrs: CellGridState):
        n, dim = positions.shape
        dtype = positions.dtype
        if dim != 3 or dtype != jnp.float32 or not self.orthorhombic:
            # f64 / 2D / triclinic: the XLA z-window path handles them all.
            return CellGridEngine.compute(self, positions, diameters, cell,
                                          cell_inv, nbrs)
        cap = self.cell_capacity
        nx, ny, nz = self.grid
        rows = ny * nz
        c3 = 3 * cap
        lengths = [cell[k, k] for k in range(3)]

        grids = refresh_far_grids(positions, nbrs, self.grid, cap, cell,
                                  cell_inv)
        diam = nbrs.sorted_diam.reshape(nx, ny, nz, cap)
        win = [ghost_z_window(grids[k], lengths[2] if k == 2 else None)
               .reshape(nx, rows, c3) for k in range(3)]
        win.append(ghost_z_window(diam).reshape(nx, rows, c3))

        # Per-program image shifts: sx[i, 0, 0] = Lx iff plane i+1 wraps to 0;
        # sx[i, 0, 1] = Ly (the y-roll wrap shift, same for every program).
        # Leading nx dim so the (1, 1, 2) block satisfies the TPU block rule
        # (last two dims equal the array's).
        sx = jnp.zeros((nx, 1, 2), dtype)
        sx = sx.at[nx - 1, 0, 0].set(lengths[0])
        sx = sx.at[:, 0, 1].set(lengths[1])

        chunk = _row_chunk(rows, cap)
        kernel = partial(
            _plane_kernel, potential=self.potential,
            cutoff2=float(self.cutoff) ** 2, ny=ny, nz=nz, cap=cap,
            chunk=chunk,
        )

        plane = lambda off: pl.BlockSpec(
            (1, rows, c3), lambda i, off=off: ((i + off) % nx, 0, 0),
            memory_space=pltpu.VMEM)
        in_specs = [plane(0)] * 4 + [plane(1)] * 4 + [
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)]
        n_off = len(HALF_OFFSETS)
        f_spec = pl.BlockSpec((1, rows, cap), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        r_spec = pl.BlockSpec((1, n_off, rows, c3), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
        out_shape = (
            jax.ShapeDtypeStruct((nx, rows, cap), dtype),
            jax.ShapeDtypeStruct((nx, rows, cap), dtype),
            jax.ShapeDtypeStruct((nx, rows, cap), dtype),
            jax.ShapeDtypeStruct((nx, n_off, rows, c3), dtype),
            jax.ShapeDtypeStruct((nx, n_off, rows, c3), dtype),
            jax.ShapeDtypeStruct((nx, n_off, rows, c3), dtype),
            jax.ShapeDtypeStruct((nx, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((nx, 1, 1), jnp.float32),
        )
        out_specs = (f_spec, f_spec, f_spec, r_spec, r_spec, r_spec,
                     s_spec, s_spec)

        fx, fy, fz, rx, ry, rz, e_p, w_p = pl.pallas_call(
            kernel,
            grid=(nx,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
        )(win[0], win[1], win[2], win[3], win[0], win[1], win[2], win[3], sx)

        energy = jnp.sum(e_p).astype(dtype)
        virial = jnp.sum(w_p).astype(dtype)

        # Fold the reaction partials back (XLA): z-unwindow, then shift to
        # the neighbor plane/row, then add. react[:, s, :, k, :] is the force
        # on window slot (w, c2) of the (ox, oy) neighbor of each cell.
        f_own = [fx.reshape(nx, ny, nz, cap),
                 fy.reshape(nx, ny, nz, cap),
                 fz.reshape(nx, ny, nz, cap)]

        def unwindow(r):
            r = r.reshape(nx, ny, nz, 3, cap)
            return (jnp.roll(r[..., 0, :], -1, axis=2) + r[..., 1, :]
                    + jnp.roll(r[..., 2, :], 1, axis=2))

        reacts = (rx, ry, rz)
        for s, (ox, oy) in enumerate(HALF_OFFSETS):
            for k in range(3):
                r = unwindow(reacts[k][:, s])
                r = jnp.roll(r, (ox, oy), axis=(0, 1))
                f_own[k] = f_own[k] + r

        forces = jnp.stack(
            [f_own[k].reshape(-1)[nbrs.addr] for k in range(3)], axis=-1)
        return energy, virial, forces, nbrs
