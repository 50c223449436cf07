"""Box / wrap / image bookkeeping (SURVEY.md section 4: wrap round-trip)."""

import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import (
    box_volume,
    is_orthorhombic,
    minimum_image,
    to_unitcell,
    unwrapped_positions,
    wrap_positions,
)


def test_to_unitcell_scalar_vector_matrix():
    c = to_unitcell(5.0, 3, jnp.float64)
    np.testing.assert_allclose(c, 5.0 * np.eye(3))
    c = to_unitcell([2.0, 3.0, 4.0], 3, jnp.float64)
    np.testing.assert_allclose(c, np.diag([2.0, 3.0, 4.0]))
    m = np.arange(16, dtype=float).reshape(4, 4)
    c = to_unitcell(m, 3, jnp.float64)
    np.testing.assert_allclose(c, m[:3, :3])


def test_volume_and_ortho():
    c = to_unitcell([2.0, 3.0, 4.0], 3, jnp.float64)
    np.testing.assert_allclose(box_volume(c), 24.0)
    assert is_orthorhombic(c)
    tri = np.array([[2.0, 0.5, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 4.0]])
    assert not is_orthorhombic(tri)
    np.testing.assert_allclose(box_volume(jnp.asarray(tri)), 24.0)


def test_wrap_and_unwrap_roundtrip():
    rng = np.random.default_rng(0)
    cell = jnp.asarray(np.diag([3.0, 4.0, 5.0]))
    cell_inv = jnp.linalg.inv(cell)
    x = jnp.asarray(rng.uniform(-10, 10, (32, 3)))
    images = jnp.zeros((32, 3), jnp.int32)
    w, img = wrap_positions(x, images, cell, cell_inv)
    # wrapped inside box
    frac = np.asarray(w) @ np.asarray(cell_inv).T
    assert frac.min() >= -1e-12 and frac.max() <= 1.0 + 1e-12
    # unwrapping restores the original coordinates
    np.testing.assert_allclose(unwrapped_positions(w, img, cell), x, atol=1e-9)


def test_wrap_accumulates_images():
    cell = jnp.asarray(np.eye(2) * 2.0)
    cell_inv = jnp.linalg.inv(cell)
    x = jnp.asarray([[2.5, -0.5]])
    img = jnp.asarray([[1, 0]], jnp.int32)
    w, img2 = wrap_positions(x, img, cell, cell_inv)
    np.testing.assert_allclose(w, [[0.5, 1.5]])
    np.testing.assert_array_equal(img2, [[2, -1]])


def test_minimum_image_triclinic():
    tri = jnp.asarray([[4.0, 1.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]])
    tri_inv = jnp.linalg.inv(tri)
    dr = jnp.asarray([3.9, 0.1, 0.0])
    mi = minimum_image(dr, tri, tri_inv)
    # nearest image should be shorter than the raw displacement
    assert np.linalg.norm(mi) < np.linalg.norm(dr)
    # and invariant when shifting by any lattice vector
    mi2 = minimum_image(dr + tri[:, 0], tri, tri_inv)
    np.testing.assert_allclose(mi, mi2, atol=1e-9)
