"""PallasPlaneEngine (interpret mode) vs the XLA cell-grid engine and the
O(N^2) oracle. The plane kernel is the f32/3D production TPU sweep; other
dtypes/dims fall back to the XLA z-window path (tested too)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.core.box import wrap_positions
from mdtpu.ops.cell_grid import CellGridEngine
from mdtpu.ops.naive import NaivePairEngine
from mdtpu.ops.pallas_plane import PallasPlaneEngine
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from tests.test_engines import random_fluid


def _setup(pot, cutoff, rho, n=500, key=21, jitter=0.15):
    # Jittered lattice: realistic short-range structure with no hard overlaps
    # (a steep r^-50 potential on overlapping random points overflows f32 —
    # correctly, but uselessly for an accuracy comparison).
    from mdtpu.sim.initialization import lattice_positions

    L = (n / rho) ** (1.0 / 3.0)
    cell = jnp.eye(3, dtype=jnp.float32) * np.float32(L)
    pos = lattice_positions(n, cell, 3, dtype=jnp.float32, jitter=jitter,
                            key=jax.random.PRNGKey(key))
    diam = jnp.ones(n, jnp.float32)
    cinv = jnp.linalg.inv(cell)
    return pos, cell, cinv, diam


@pytest.mark.parametrize("pot,cutoff,rho", [
    (LennardJones(r_cut=1.5, force_shift=True), 1.5, 0.6),
    (PseudoHS(), 1.5, 0.5),
])
def test_plane_kernel_matches_oracle(pot, cutoff, rho):
    n = 500
    pos, cell, cinv, diam = _setup(pot, cutoff, rho, n)

    pe = PallasPlaneEngine.create(pot, cutoff, 0.3, np.asarray(cell), n,
                                  interpret=True)
    nb = pe.allocate(pos, diam, cell, cinv)
    assert not bool(nb.overflow)
    e1, w1, f1, _ = pe.compute(pos, diam, cell, cinv, nb)

    # f64 oracle on the same coordinates.
    naive = NaivePairEngine(potential=pot, cutoff=cutoff)
    e0, w0, f0, _ = naive.compute(pos.astype(jnp.float64), diam.astype(jnp.float64),
                                  cell.astype(jnp.float64),
                                  jnp.linalg.inv(cell.astype(jnp.float64)), ())
    np.testing.assert_allclose(float(e1), float(e0), rtol=2e-5)
    np.testing.assert_allclose(float(w1), float(w0), rtol=2e-5)
    scale = np.abs(np.asarray(f0)).max()
    np.testing.assert_allclose(np.asarray(f1) / scale, np.asarray(f0) / scale,
                               atol=5e-6)


def test_plane_kernel_matches_xla_zwindow_bitwise_inputs():
    # Same sorted layout, same f32 inputs. The two sweeps round periodic
    # images differently (the XLA z-window bakes exact box-length ghost
    # shifts into window construction; the kernel applies per-slot
    # minimum-image rounding), so agreement is to each one's f32 accuracy
    # vs the oracle (~1e-6 of the max pair force), not bitwise.
    pot = LennardJones(r_cut=1.5, force_shift=True)
    n = 600
    pos, cell, cinv, diam = _setup(pot, 1.5, 0.7, n, key=5)

    xe = CellGridEngine.create(pot, 1.5, 0.3, np.asarray(cell), n)
    pe = PallasPlaneEngine(potential=pot, cutoff=xe.cutoff, skin=xe.skin,
                           grid=xe.grid, cell_capacity=xe.cell_capacity,
                           interpret=True)
    nb = xe.allocate(pos, diam, cell, cinv)
    e0, w0, f0, _ = xe.compute(pos, diam, cell, cinv, nb)
    e1, w1, f1, _ = pe.compute(pos, diam, cell, cinv, nb)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-6)
    np.testing.assert_allclose(float(w1), float(w0), rtol=1e-6)
    scale = np.abs(np.asarray(f0)).max()
    np.testing.assert_allclose(np.asarray(f1) / scale, np.asarray(f0) / scale,
                               atol=5e-6)


def test_plane_kernel_stale_positions_within_skin():
    # Boundary-crossing drift within skin/2 must stay exact (the ghost
    # windows rely on the ref + MIC(pos - ref) refresh).
    pot = PseudoHS()
    n = 400
    pos, cell, cinv, diam = _setup(pot, 1.5, 0.4, n, key=13)
    pe = PallasPlaneEngine.create(pot, 1.5, 0.4, np.asarray(cell), n,
                                  interpret=True)
    nb = pe.allocate(pos, diam, cell, cinv)

    moved = pos + 0.1 * (2.0 * jax.random.uniform(
        jax.random.PRNGKey(7), pos.shape, dtype=pos.dtype) - 1.0)
    moved, _ = wrap_positions(moved, jnp.zeros((n, 3), jnp.int32), cell, cinv)
    assert not bool(pe.needs_rebuild(moved, nb, cell, cinv))

    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(moved, diam, cell, cinv, ())
    e1, w1, f1, _ = pe.compute(moved, diam, cell, cinv, nb)
    np.testing.assert_allclose(float(e1), float(e0), rtol=2e-5)
    scale = np.abs(np.asarray(f0)).max()
    np.testing.assert_allclose(np.asarray(f1) / scale, np.asarray(f0) / scale,
                               atol=5e-6)


def test_plane_kernel_f64_falls_back():
    pot = PseudoHS()
    n = 200
    pos, cell = random_fluid(jax.random.PRNGKey(3), n, 0.4, 3)
    diam = jnp.ones(n, jnp.float64)
    cinv = jnp.linalg.inv(cell)
    pe = PallasPlaneEngine.create(pot, 1.5, 0.3, np.asarray(cell), n,
                                  interpret=True)
    nb = pe.allocate(pos, diam, cell, cinv)
    e1, w1, f1, _ = pe.compute(pos, diam, cell, cinv, nb)
    naive = NaivePairEngine(potential=pot, cutoff=1.5)
    e0, w0, f0, _ = naive.compute(pos, diam, cell, cinv, ())
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-9)
