"""Observables: RDF normalization, MSD, thermo parsing."""

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.observables import (
    mean_squared_displacement,
    rdf_histogram,
    rdf_normalize,
    read_thermo,
    sample_rdf,
)
from mdtpu.sim.initialization import build_state_from_arrays


def test_rdf_ideal_gas_is_flat():
    # Uniform random points: g(r) ~ 1 everywhere (away from r=0 noise).
    key = jax.random.PRNGKey(0)
    n, L = 2048, 12.0
    pos = jax.random.uniform(key, (n, 3), dtype=jnp.float64) * L
    cell = jnp.eye(3, dtype=jnp.float64) * L
    cinv = jnp.linalg.inv(cell)
    r_max = 4.0
    counts = rdf_histogram(pos, cell, cinv, r_max, n_bins=40)
    centers, g = rdf_normalize(np.asarray(counts), n, L ** 3, r_max,
                               n_frames=1, dim=3)
    # average g over bins beyond the first few (tiny-shell noise)
    assert abs(np.mean(g[5:]) - 1.0) < 0.05


def test_rdf_simple_cubic_peaks():
    # Perfect simple-cubic lattice: g(r) peaks exactly at the lattice spacing.
    per_side, a = 8, 1.3
    idx = np.indices((per_side,) * 3).reshape(3, -1).T
    pos = jnp.asarray((idx + 0.5) * a)
    L = per_side * a
    cell = jnp.eye(3, dtype=jnp.float64) * L
    counts = np.asarray(rdf_histogram(pos, cell, jnp.linalg.inv(cell),
                                      r_max=2.0, n_bins=100))
    centers, g = rdf_normalize(counts, pos.shape[0], L ** 3, 2.0, dim=3)
    # sharp shell at the lattice spacing (the sqrt(2) shell has equal height
    # in g(r), so don't assert on the argmax)
    first_shell = np.argmin(np.abs(centers - a))
    window = g[first_shell - 1:first_shell + 2]
    assert window.max() > 3.0
    # no pairs below the lattice spacing
    assert counts[: int(0.9 * a / 2.0 * 100)].sum() == 0
    # nothing between the first and second shells
    gap = (centers > 1.05 * a) & (centers < 0.95 * a * np.sqrt(2))
    assert counts[gap].sum() == 0


def test_msd_unwrapped():
    key = jax.random.PRNGKey(1)
    n = 16
    pos = jax.random.uniform(key, (n, 3), dtype=jnp.float64) * 4.0
    state = build_state_from_arrays(pos, jnp.ones(n), jnp.eye(3) * 4.0, key,
                                    dtype=jnp.float64)
    # shift every particle by (4, 0, 0) recorded as an image crossing
    state = state.replace(images=state.images.at[:, 0].add(1))
    msd = mean_squared_displacement(state, pos)
    np.testing.assert_allclose(msd, 16.0, rtol=1e-12)


def test_read_thermo_roundtrip(tmp_path):
    path = tmp_path / "thermo.txt"
    path.write_text("# Step Energy Temperature Pressure\n"
                    "0 -3.5 1.2 0.8\n100 -3.4 1.1 0.9\n")
    data = read_thermo(str(path))
    np.testing.assert_array_equal(data["step"], [0, 100])
    np.testing.assert_allclose(data["pressure"], [0.8, 0.9])


def test_sample_rdf_runs():
    key = jax.random.PRNGKey(2)
    n = 256
    pos = jax.random.uniform(key, (n, 3), dtype=jnp.float64) * 8.0
    state = build_state_from_arrays(pos, jnp.ones(n), jnp.eye(3) * 8.0, key,
                                    dtype=jnp.float64)
    centers, g = sample_rdf(state, n_bins=50)
    assert centers.shape == (50,) and g.shape == (50,)
    assert np.all(np.isfinite(g))
