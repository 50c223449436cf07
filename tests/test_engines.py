"""Pair engines: naive oracle vs a plain-numpy brute force, and the cell
neighbor-list engine vs the naive oracle (the key equivalence CellListMap
guarantees in the reference; SURVEY.md section 4, integration tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdtpu.ops.naive import NaivePairEngine
from mdtpu.ops.neighbor_list import NeighborListEngine
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS


def numpy_bruteforce(positions, diameters, lengths, pot, cutoff):
    """Plain-python i<j double loop — the ultimate oracle."""
    n, d = positions.shape
    energy = 0.0
    virial = 0.0
    forces = np.zeros_like(positions)
    for i in range(n):
        for j in range(i + 1, n):
            dr = positions[i] - positions[j]
            dr -= lengths * np.round(dr / lengths)
            r = np.linalg.norm(dr)
            if r >= cutoff:
                continue
            u, f = pot.evaluate(jnp.asarray(r, jnp.float64),
                                diameters[i], diameters[j])
            u, f = float(u), float(f)
            energy += u
            virial += f * r
            fv = f * dr / r
            forces[i] += fv
            forces[j] -= fv
    return energy, virial, forces


def random_fluid(key, n, rho, d, dtype=jnp.float64):
    L = (n / rho) ** (1.0 / d)
    pos = jax.random.uniform(key, (n, d), dtype=dtype) * L
    cell = jnp.eye(d, dtype=dtype) * L
    return pos, cell


@pytest.mark.parametrize("d,n,pot,cutoff", [
    (3, 24, LennardJones(r_cut=2.5), 2.5),
    (2, 24, LennardJones(r_cut=2.5), 2.5),
    (3, 24, PseudoHS(), 1.5),
])
def test_naive_matches_bruteforce(d, n, pot, cutoff):
    key = jax.random.PRNGKey(1)
    pos, cell = random_fluid(key, n, 0.4, d)
    diam = np.ones(n)
    lengths = np.diag(np.asarray(cell))

    e_ref, w_ref, f_ref = numpy_bruteforce(np.asarray(pos), diam, lengths, pot, cutoff)

    eng = NaivePairEngine(potential=pot, cutoff=cutoff)
    e, w, f, _ = eng.compute(pos, jnp.asarray(diam), cell, jnp.linalg.inv(cell), ())
    np.testing.assert_allclose(e, e_ref, rtol=1e-9)
    np.testing.assert_allclose(w, w_ref, rtol=1e-9)
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-10)


def test_forces_are_minus_energy_gradient():
    """Engine forces == -grad of engine energy (whole-system autodiff)."""
    key = jax.random.PRNGKey(2)
    pot = LennardJones(r_cut=2.0)
    pos, cell = random_fluid(key, 32, 0.5, 3)
    diam = jnp.ones(32, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)
    eng = NaivePairEngine(potential=pot, cutoff=2.0)

    def energy(x):
        e, _, _, _ = eng.compute(x, diam, cell, cell_inv, ())
        return e

    f_ad = -jax.grad(energy)(pos)
    _, _, f, _ = eng.compute(pos, diam, cell, cell_inv, ())
    np.testing.assert_allclose(f, f_ad, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("d,n,rho", [(3, 256, 0.6), (2, 200, 0.5), (3, 400, 0.8)])
def test_neighbor_list_matches_naive(d, n, rho):
    key = jax.random.PRNGKey(3)
    pot = LennardJones(r_cut=1.5)
    cutoff = 1.5
    pos, cell = random_fluid(key, n, rho, d)
    diam = jnp.ones(n, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)

    naive = NaivePairEngine(potential=pot, cutoff=cutoff)
    e0, w0, f0, _ = naive.compute(pos, diam, cell, cell_inv, ())

    eng = NeighborListEngine.create(pot, cutoff, 0.3, np.asarray(cell), n)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)
    assert not bool(nbrs.overflow)
    e1, w1, f1, _ = eng.compute(pos, diam, cell, cell_inv, nbrs)
    np.testing.assert_allclose(e1, e0, rtol=1e-9)
    np.testing.assert_allclose(w1, w0, rtol=1e-9)
    np.testing.assert_allclose(f1, f0, rtol=1e-8, atol=1e-10)


def test_neighbor_list_rebuild_logic():
    key = jax.random.PRNGKey(4)
    n = 128
    pot = PseudoHS()
    pos, cell = random_fluid(key, n, 0.5, 3)
    diam = jnp.ones(n, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)
    eng = NeighborListEngine.create(pot, 1.5, 0.4, np.asarray(cell), n)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)
    assert not bool(eng.needs_rebuild(pos, nbrs, cell, cell_inv))
    # displace one particle by more than half the skin
    moved = pos.at[0].add(jnp.asarray([0.3, 0.0, 0.0]))
    assert bool(eng.needs_rebuild(moved, nbrs, cell, cell_inv))
    # crossing the boundary is NOT a big displacement (minimum image)
    L = float(jnp.diag(cell)[0])
    crossed = pos.at[:, 0].add(L * 0.999999) % L
    assert not bool(eng.needs_rebuild(crossed, nbrs, cell, cell_inv))


def test_neighbor_list_overflow_flag():
    # Tiny capacities must flag overflow rather than silently dropping pairs.
    key = jax.random.PRNGKey(5)
    n = 256
    pot = LennardJones(r_cut=1.5)
    pos, cell = random_fluid(key, n, 0.8, 3)
    diam = jnp.ones(n, jnp.float64)
    cell_inv = jnp.linalg.inv(cell)
    eng = NeighborListEngine.create(pot, 1.5, 0.3, np.asarray(cell), n,
                                    cell_capacity=2, max_neighbors=8)
    nbrs = eng.allocate(pos, diam, cell, cell_inv)
    assert bool(nbrs.overflow)
    grown = eng.with_grown_capacity()
    assert grown.cell_capacity > eng.cell_capacity
    assert grown.max_neighbors > eng.max_neighbors
