"""All-pairs O(N^2) pair engine — the correctness oracle.

This is the TPU-native analog of the reference's CellListMap ``map_pairwise!``
with the ``energy_and_forces!`` callback (/root/reference/src/pairwise.jl:26-39):
for every pair within the engine cutoff it evaluates the potential and
accumulates total energy, the scalar virial W = sum_{i<j} f_ij * r_ij
(= dot(f*r/d, r) in the reference, /root/reference/src/pairwise.jl:32-33), and
per-particle force vectors.

Engine protocol (shared by all engines):
    nbrs  = engine.allocate(positions, diameters, cell, cell_inv)
    out   = engine.compute(positions, diameters, cell, cell_inv, nbrs)
    # out = (energy, virial, forces, nbrs')

TPU layout note: all pair quantities are computed **component-wise** as (N, N)
arrays — never (N, N, d). A trailing dim of 3 would be padded to 128 lanes by
TPU tiling (T(8,128)), a 42x memory blowup; per-component (N, N) tiles are
dense. Each pair is computed from both sides and halved, so there is no
scatter at all — forces come out of row reductions.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


def _minimum_image_components(d_comps, cell, cell_inv):
    """Minimum-image per-component displacement arrays (any cell, unrolled
    over the d*d scalar cell entries so the arrays stay 2-D tiles)."""
    dim = len(d_comps)
    frac = [sum(cell_inv[k, j] * d_comps[j] for j in range(dim))
            for k in range(dim)]
    frac = [f - jnp.round(f) for f in frac]
    return [sum(cell[i, k] * frac[k] for k in range(dim)) for i in range(dim)]


@struct.dataclass
class NaivePairEngine:
    potential: Any
    cutoff: Any = 1.5

    def allocate(self, positions, diameters, cell, cell_inv):
        return ()

    def compute(self, positions, diameters, cell, cell_inv, nbrs=()):
        n, dim = positions.shape
        dtype = positions.dtype

        pos_t = positions.T   # contiguous component rows (see module note)
        comps = [pos_t[k] for k in range(dim)]
        d_comps = [c[:, None] - c[None, :] for c in comps]
        d_comps = _minimum_image_components(d_comps, cell, cell_inv)
        r2 = sum(dc * dc for dc in d_comps)

        eye = jnp.eye(n, dtype=bool)
        cutoff = jnp.asarray(self.cutoff, dtype)
        mask = (~eye) & (r2 < cutoff * cutoff)

        # Sqrt-free hot path via evaluate_r2 (see mdtpu.potentials.base).
        r2_safe = jnp.where(mask, r2, jnp.ones_like(r2))
        u, f_over_r = self.potential.evaluate_r2(
            r2_safe, diameters[:, None], diameters[None, :]
        )
        u = jnp.where(mask, u, jnp.zeros_like(u))
        f_over_r = jnp.where(mask, f_over_r, jnp.zeros_like(f_over_r))

        energy = 0.5 * jnp.sum(u)
        virial = 0.5 * jnp.sum(f_over_r * r2_safe)
        forces = jnp.stack(
            [jnp.sum(f_over_r * dc, axis=1) for dc in d_comps], axis=-1
        )
        return energy, virial, forces, nbrs

    def needs_rebuild(self, positions, nbrs, cell, cell_inv):
        # Static False: stateless engine, engine_forces skips the rebuild
        # cond entirely.
        return False
