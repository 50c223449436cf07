"""Pallas TPU kernel for the cell-grid pair sweep.

The performance heart of the framework: the whole 27-cell-stencil pair sweep
(the role CellListMap's threaded ``map_pairwise!`` plays in the reference,
/root/reference/src/simulation.jl:100-104) as ONE on-chip kernel with zero
HBM round-trips for intermediates.

Design (every choice driven by Mosaic layout rules — no reshapes, no
gathers, no scatters inside the kernel):

  * particles are binned/sorted by cell exactly as in CellGridEngine (same
    ``allocate`` / ``CellGridState``), except pad slots carry FAR-AWAY
    coordinates (1e6 + 4*slot) instead of zeros — mutually > cutoff apart —
    so no occupancy mask is ever needed: the r2 < rc^2 test kills them;
  * each step the sorted buffers are expanded to a **ghost-cell** grid,
    shape (Px*Py, Pz*C) per component with P* = n* + 2: one row per (x, y)
    column of cells, ghost coordinates shifted by +-L. Ghosts make minimum-
    image arithmetic unnecessary inside the kernel — displacements are true
    displacements;
  * grid = (nx*ny,) programs, one per interior (x, y) column. For each of
    the 9 in-plane offsets the neighbor column is ONE contiguous row of the
    input; z-neighbors live inside the row, so per own-cell z the window is
    a static 99-wide lane slice. The pair block is a 2-D broadcast
    (C, 1) - (1, 3C) -> (C, 3C) built with one tiny transpose;
  * forces accumulate in registers/VMEM; each program writes one row of the
    (nx*ny, nz*C) force outputs and one partial energy/virial.

Every pair is seen from both sides (full stencil — Newton's 3rd law is not
usable across programs), so scalars are halved and forces need no reaction
pass.
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

from mdtpu.ops.cell_grid import CellGridEngine, CellGridState

PAD_BASE = 1.0e6
PAD_SPACING = 4.0  # > any sane cutoff; pad slots never interact


def _ghost_maps(grid: Tuple[int, int, int], lengths):
    """Static ghost-expansion maps: for each padded cell (Px*Py*Pz,), the
    core flat cell index it mirrors and the (3,) coordinate shift.

    Ghost at padded index 0 mirrors the far-side core cell (coords near L):
    its coords must be core - L. Ghost at index P-1 mirrors core cell 0:
    coords = core + L.
    """
    nx, ny, nz = grid
    px, py, pz = nx + 2, ny + 2, nz + 2
    src = np.zeros((px, py, pz), np.int32)
    shift = np.zeros((px, py, pz, 3), np.float64)
    for ix in range(px):
        cx = (ix - 1) % nx
        sx = -lengths[0] if ix == 0 else (lengths[0] if ix == px - 1 else 0.0)
        for iy in range(py):
            cy = (iy - 1) % ny
            sy = -lengths[1] if iy == 0 else (lengths[1] if iy == py - 1 else 0.0)
            for iz in range(pz):
                cz = (iz - 1) % nz
                sz = -lengths[2] if iz == 0 else (lengths[2] if iz == pz - 1 else 0.0)
                src[ix, iy, iz] = (cx * ny + cy) * nz + cz
                shift[ix, iy, iz] = (sx, sy, sz)
    return src.reshape(-1), shift.reshape(-1, 3)


def _pair_row_kernel(px_ref, py_ref, pz_ref, diam_ref,
                     fx_ref, fy_ref, fz_ref, e_ref, w_ref,
                     *, potential, cutoff2, ny, nz, cap):
    """One program = one interior (x, y) column of nz cells.

    Input rows are (Px*Py, Pz*C); own data sits at lanes [C, C + nz*C) of
    row (x+1)*(ny+2) + (y+1).
    """
    prog = pl.program_id(0)
    x = prog // ny
    y = prog - x * ny
    py_rows = ny + 2
    own_row = (x + 1) * py_rows + (y + 1)

    offsets = [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]

    def body(scratch):
        # Stage the 9 neighbor rows x 4 arrays into scratch at STATIC rows:
        # dynamically-sliced views carry layouts the vector unit can't
        # transpose; scratch reads are clean. Row layout: t * 4 + comp.
        for t, (ox, oy) in enumerate(offsets):
            row = own_row + ox * py_rows + oy
            scratch[pl.ds(4 * t + 0, 1), :] = px_ref[pl.ds(row, 1), :]
            scratch[pl.ds(4 * t + 1, 1), :] = py_ref[pl.ds(row, 1), :]
            scratch[pl.ds(4 * t + 2, 1), :] = pz_ref[pl.ds(row, 1), :]
            scratch[pl.ds(4 * t + 3, 1), :] = diam_ref[pl.ds(row, 1), :]

        dtype = fx_ref.dtype
        energy = jnp.zeros((), dtype)
        virial = jnp.zeros((), dtype)

        ii = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 1)
        not_self_eye = jj != ii + cap
        own_t = 4  # offsets[4] == (0, 0): the own row

        for z in range(nz):
            o0 = cap + z * cap              # own cell lane offset
            w0 = z * cap                    # window lane offset (z-1 cell)
            oxp = scratch[pl.ds(4 * own_t + 0, 1), o0:o0 + cap].T  # (C, 1)
            oyp = scratch[pl.ds(4 * own_t + 1, 1), o0:o0 + cap].T
            ozp = scratch[pl.ds(4 * own_t + 2, 1), o0:o0 + cap].T
            odm = scratch[pl.ds(4 * own_t + 3, 1), o0:o0 + cap].T

            acc_fx = jnp.zeros((1, cap), dtype)
            acc_fy = jnp.zeros((1, cap), dtype)
            acc_fz = jnp.zeros((1, cap), dtype)

            for t, (ox, oy) in enumerate(offsets):
                wxp = scratch[pl.ds(4 * t + 0, 1), w0:w0 + 3 * cap]  # (1, 3C)
                wyp = scratch[pl.ds(4 * t + 1, 1), w0:w0 + 3 * cap]
                wzp = scratch[pl.ds(4 * t + 2, 1), w0:w0 + 3 * cap]
                wdm = scratch[pl.ds(4 * t + 3, 1), w0:w0 + 3 * cap]

                dx = oxp - wxp                   # (C, 3C)
                dy = oyp - wyp
                dz = ozp - wzp
                r2 = dx * dx + dy * dy + dz * dz

                mask = r2 < cutoff2
                if ox == 0 and oy == 0:
                    mask = mask & not_self_eye

                r2_safe = jnp.where(mask, r2, jnp.ones_like(r2))
                u, f_over_r = potential.evaluate_r2(r2_safe, odm, wdm)
                u = jnp.where(mask, u, jnp.zeros_like(u))
                f_over_r = jnp.where(mask, f_over_r,
                                     jnp.zeros_like(f_over_r))

                energy = energy + 0.5 * jnp.sum(u)
                virial = virial + 0.5 * jnp.sum(f_over_r * r2_safe)
                acc_fx = acc_fx + jnp.sum(f_over_r * dx, axis=1,
                                          keepdims=True).T
                acc_fy = acc_fy + jnp.sum(f_over_r * dy, axis=1,
                                          keepdims=True).T
                acc_fz = acc_fz + jnp.sum(f_over_r * dz, axis=1,
                                          keepdims=True).T

            # Stage into scratch at STATIC offsets (dynamic stores with
            # unaligned lane offsets are unimplemented in Mosaic); the full
            # rows are flushed once below with aligned dynamic stores.
            scratch[pl.ds(36, 1), z * cap:(z + 1) * cap] = acc_fx
            scratch[pl.ds(37, 1), z * cap:(z + 1) * cap] = acc_fy
            scratch[pl.ds(38, 1), z * cap:(z + 1) * cap] = acc_fz

        fx_ref[pl.ds(prog, 1), :] = scratch[pl.ds(36, 1), 0:nz * cap]
        fy_ref[pl.ds(prog, 1), :] = scratch[pl.ds(37, 1), 0:nz * cap]
        fz_ref[pl.ds(prog, 1), :] = scratch[pl.ds(38, 1), 0:nz * cap]
        e_ref[prog, 0] = energy
        w_ref[prog, 0] = virial

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((39, (nz + 2) * cap), fx_ref.dtype),
    )


@struct.dataclass
class PallasCellEngine(CellGridEngine):
    """CellGridEngine with the pair sweep as a single Pallas TPU kernel.

    Shares allocate/needs_rebuild/state with CellGridEngine; only the pad
    coordinates (far-away instead of zero) and compute() differ.
    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """

    interpret: bool = struct.field(pytree_node=False, default=False)
    _lengths: Tuple[float, ...] = struct.field(pytree_node=False,
                                               default=(1.0, 1.0, 1.0))

    @classmethod
    def create(cls, potential, cutoff, skin, unitcell, n_particles,
               cell_capacity=None, interpret=False):
        base = CellGridEngine.create(potential, cutoff, skin, unitcell,
                                     n_particles, cell_capacity)
        lengths = tuple(float(v) for v in np.diag(np.asarray(unitcell)))
        return cls(potential=base.potential, cutoff=base.cutoff,
                   skin=base.skin, grid=base.grid,
                   cell_capacity=base.cell_capacity,
                   interpret=interpret, _lengths=lengths)

    def _far_pad_base(self, pad, dtype):
        slots = np.arange(pad, dtype=np.float64)
        return jnp.asarray(PAD_BASE + PAD_SPACING * slots, dtype)

    def compute(self, positions, diameters, cell, cell_inv,
                nbrs: CellGridState):
        n, dim = positions.shape
        if dim != 3:
            return CellGridEngine.compute(self, positions, diameters, cell,
                                          cell_inv, nbrs)
        dtype = positions.dtype
        cap = self.cell_capacity
        nx, ny, nz = self.grid
        n_cells = nx * ny * nz
        pad = n_cells * cap + 1

        # Refresh sorted buffers over the far-pad base (empty slots sit at
        # mutually-distant far coordinates -> no occupancy mask needed).
        far = self._far_pad_base(pad, dtype)
        pos_t = positions.T
        core = [far.at[nbrs.addr].set(pos_t[k])[:-1].reshape(n_cells, cap)
                for k in range(dim)]
        diam_core = jnp.ones((pad,), dtype).at[nbrs.addr].set(
            diameters)[:-1].reshape(n_cells, cap)

        # Ghost expansion: static gather + static coordinate shift.
        src, shift = _ghost_maps(self.grid, self._lengths)
        src = jnp.asarray(src)
        px_rows, py_rows, pz_rows = nx + 2, ny + 2, nz + 2

        def expand(comp, k=None):
            g = comp[src]
            if k is not None:
                g = g + jnp.asarray(shift[:, k], dtype)[:, None]
            return g.reshape(px_rows * py_rows, pz_rows * cap)

        gpx = expand(core[0], 0)
        gpy = expand(core[1], 1)
        gpz = expand(core[2], 2)
        gdiam = expand(diam_core)

        n_prog = nx * ny
        kernel = partial(
            _pair_row_kernel, potential=self.potential,
            cutoff2=float(self.cutoff * self.cutoff), ny=ny, nz=nz, cap=cap,
        )
        out_shape = (
            jax.ShapeDtypeStruct((n_prog, nz * cap), dtype),
            jax.ShapeDtypeStruct((n_prog, nz * cap), dtype),
            jax.ShapeDtypeStruct((n_prog, nz * cap), dtype),
            jax.ShapeDtypeStruct((n_prog, 1), dtype),
            jax.ShapeDtypeStruct((n_prog, 1), dtype),
        )
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)

        fx, fy, fz, e_p, w_p = pl.pallas_call(
            kernel,
            grid=(n_prog,),
            out_shape=out_shape,
            in_specs=[vmem] * 4,
            out_specs=(vmem, vmem, vmem, smem, smem),
            interpret=self.interpret,
        )(gpx, gpy, gpz, gdiam)

        energy = jnp.sum(e_p)
        virial = jnp.sum(w_p)
        forces = jnp.stack(
            [fx.reshape(-1)[nbrs.addr], fy.reshape(-1)[nbrs.addr],
             fz.reshape(-1)[nbrs.addr]],
            axis=-1,
        )
        return energy, virial, forces, nbrs
