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

Implementation: one batched (N, N) distance computation with minimum-image
displacements and a masked potential evaluation — all pairs are computed both
ways and halved, so there is no scatter at all; forces come out of a single
row-sum. On TPU this is entirely VPU work with perfect regularity and is
competitive up to N ~ 16k; beyond that the cell-list engine takes over.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from mdtpu.core.box import minimum_image


@struct.dataclass
class NaivePairEngine:
    potential: Any
    cutoff: Any = 1.5

    def allocate(self, positions, diameters, cell, cell_inv):
        return ()

    def compute(self, positions, diameters, cell, cell_inv, nbrs=()):
        n = positions.shape[0]
        dtype = positions.dtype
        dr = positions[:, None, :] - positions[None, :, :]
        dr = minimum_image(dr, cell, cell_inv)
        r2 = jnp.sum(dr * dr, axis=-1)

        eye = jnp.eye(n, dtype=bool)
        cutoff = jnp.asarray(self.cutoff, dtype)
        mask = (~eye) & (r2 < cutoff * cutoff)

        r = jnp.sqrt(jnp.where(mask, r2, jnp.ones_like(r2)))
        u, f = self.potential.evaluate(r, diameters[:, None], diameters[None, :])
        u = jnp.where(mask, u, jnp.zeros_like(u))
        f = jnp.where(mask, f, jnp.zeros_like(f))

        energy = 0.5 * jnp.sum(u)
        virial = 0.5 * jnp.sum(f * r)
        forces = jnp.einsum("ij,ijd->id", f / r, dr)
        return energy, virial, forces, nbrs

    def needs_rebuild(self, positions, nbrs, cell, cell_inv):
        return jnp.asarray(False)
