"""Regression tests for the experimental Pallas kernels.

These kernels are documented NEGATIVE results (measured slower than the
production XLA z-window sweep — BENCH_NOTES.md "Pallas findings") kept as
tested records; one oracle-parity regression per kernel keeps them honest
without maintaining a production-grade suite.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.ops.cell_grid import CellGridEngine
from mdtpu.ops.experimental import PallasCellEngine, PallasPlaneEngine
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.potentials.lennard_jones import LennardJones
from tests.test_engines import random_fluid


def test_pallas_cell_matches_cell_grid():
    pot = LennardJones(r_cut=1.5)
    key = jax.random.PRNGKey(21)
    n = 500
    pos, cell = random_fluid(key, n, 0.6, 3)
    diam = jnp.ones(n, jnp.float64)
    cinv = jnp.linalg.inv(cell)

    ref = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n)
    nb = ref.allocate(pos, diam, cell, cinv)
    e0, w0, f0, _ = ref.compute(pos, diam, cell, cinv, nb)

    pe = PallasCellEngine.create(pot, 1.5, 0.3, np.asarray(cell), n,
                                 interpret=True)
    e1, w1, f1, _ = pe.compute(pos, diam, cell, cinv, nb)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    np.testing.assert_allclose(w1, w0, rtol=1e-12)
    np.testing.assert_allclose(f1, f0, rtol=1e-10, atol=1e-12)


def test_pallas_plane_matches_oracle():
    from mdtpu.sim.initialization import lattice_positions

    pot = LennardJones(r_cut=1.5, force_shift=True)
    n = 500
    L = (n / 0.6) ** (1.0 / 3.0)
    cell = jnp.eye(3, dtype=jnp.float32) * np.float32(L)
    pos = lattice_positions(n, cell, 3, dtype=jnp.float32, jitter=0.15,
                            key=jax.random.PRNGKey(21))
    diam = jnp.ones(n, jnp.float32)
    cinv = jnp.linalg.inv(cell)

    pe = PallasPlaneEngine.create(pot, 1.5, 0.3, np.asarray(cell), n,
                                  interpret=True)
    nb = pe.allocate(pos, diam, cell, cinv)
    assert not bool(nb.overflow)
    e1, w1, f1, _ = pe.compute(pos, diam, cell, cinv, nb)

    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(
        pos.astype(jnp.float64), diam.astype(jnp.float64),
        cell.astype(jnp.float64),
        jnp.linalg.inv(cell.astype(jnp.float64)), ())
    np.testing.assert_allclose(float(e1), float(e0), rtol=2e-5)
    np.testing.assert_allclose(float(w1), float(w0), rtol=2e-5)
    scale = np.abs(np.asarray(f0)).max()
    np.testing.assert_allclose(np.asarray(f1) / scale,
                               np.asarray(f0) / scale, atol=5e-6)
