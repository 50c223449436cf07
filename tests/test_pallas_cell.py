"""PallasCellEngine (interpret mode) vs the XLA cell-grid engine.

The Pallas kernel is numerically exact vs the oracle; on current TPU compiles
it is slower than the XLA z-window engine (Mosaic runs the many small (C, 3C)
blocks with low VPU utilization), so it stays an experimental alternative —
see mdtpu/ops/pallas_cell.py docstring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.ops.cell_grid import CellGridEngine
from mdtpu.ops.pallas_cell import PallasCellEngine
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from tests.test_engines import random_fluid


@pytest.mark.parametrize("pot,cutoff,rho", [
    (LennardJones(r_cut=1.5), 1.5, 0.6),
    (PseudoHS(), 1.5, 0.5),
])
def test_pallas_matches_cell_grid(pot, cutoff, rho):
    key = jax.random.PRNGKey(21)
    n = 500
    pos, cell = random_fluid(key, n, rho, 3)
    diam = jnp.ones(n, jnp.float64)
    cinv = jnp.linalg.inv(cell)

    ref = CellGridEngine.create(pot, cutoff, 0.3, np.asarray(cell), n)
    nb = ref.allocate(pos, diam, cell, cinv)
    e0, w0, f0, _ = ref.compute(pos, diam, cell, cinv, nb)

    pe = PallasCellEngine.create(pot, cutoff, 0.3, np.asarray(cell), n,
                                 interpret=True)
    e1, w1, f1, _ = pe.compute(pos, diam, cell, cinv, nb)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    np.testing.assert_allclose(w1, w0, rtol=1e-12)
    np.testing.assert_allclose(f1, f0, rtol=1e-10, atol=1e-12)


def test_pallas_polydisperse():
    key = jax.random.PRNGKey(22)
    n = 300
    pos, cell = random_fluid(key, n, 0.4, 3)
    diam = jax.random.uniform(key, (n,), dtype=jnp.float64) * 0.4 + 0.8
    cinv = jnp.linalg.inv(cell)
    pot = LennardJones(r_cut=1.5)

    ref = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n)
    nb = ref.allocate(pos, diam, cell, cinv)
    e0, w0, f0, _ = ref.compute(pos, diam, cell, cinv, nb)
    pe = PallasCellEngine.create(pot, 1.5, 0.3, np.asarray(cell), n,
                                 interpret=True)
    e1, w1, f1, _ = pe.compute(pos, diam, cell, cinv, nb)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    np.testing.assert_allclose(f1, f0, rtol=1e-10, atol=1e-12)
