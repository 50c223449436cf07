"""On-device observables: radial distribution function, mean-squared
displacement, thermo statistics.

The reference validates physics against LAMMPS/NIST via RDF, pressure and
temperature statistics kept on its external wiki (/root/reference/README.md:189);
this module provides the in-framework equivalents so those validations are
reproducible (used by the parity tests and the bench harness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.core.box import box_volume, unwrapped_positions

_SPHERE_FACTOR = {2: np.pi, 3: 4.0 * np.pi / 3.0}


def rdf_histogram(positions, cell, cell_inv, r_max, n_bins=200):
    """One-frame pair-distance histogram (component-wise (N, N) math — no
    (N, N, d) arrays, see mdtpu.ops.naive layout note). Returns integer counts
    per bin; combine frames then normalise with ``rdf_normalize``."""
    n, dim = positions.shape
    comps = [positions[:, k] for k in range(dim)]
    d_comps = [c[:, None] - c[None, :] for c in comps]
    frac = [sum(cell_inv[k, j] * d_comps[j] for j in range(dim))
            for k in range(dim)]
    frac = [f - jnp.round(f) for f in frac]
    cart = [sum(cell[i, k] * frac[k] for k in range(dim)) for i in range(dim)]
    r2 = sum(c * c for c in cart)
    r = jnp.sqrt(r2)

    eye = jnp.eye(n, dtype=bool)
    valid = (~eye) & (r < r_max)
    bins = jnp.clip((r / r_max * n_bins).astype(jnp.int32), 0, n_bins - 1)
    bins = jnp.where(valid, bins, n_bins)  # overflow slot
    counts = jnp.zeros((n_bins + 1,), jnp.int32).at[bins.reshape(-1)].add(1)
    return counts[:n_bins]


def rdf_normalize(counts, n_particles, volume, r_max, n_frames=1, dim=3):
    """Normalise summed histogram counts to g(r). Returns (r_centers, g)."""
    counts = np.asarray(counts, dtype=np.float64)
    n_bins = counts.shape[0]
    edges = np.linspace(0.0, r_max, n_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    shell = _SPHERE_FACTOR[dim] * (edges[1:] ** dim - edges[:-1] ** dim)
    density = n_particles / volume
    ideal = shell * density * n_particles * n_frames
    return centers, counts / ideal


def sample_rdf(state, n_bins=200, r_max=None):
    """Convenience single-frame g(r) from a SimulationState."""
    if r_max is None:
        # Half the smallest PERPENDICULAR width, not the diagonal: a
        # triclinic cell's diagonal entries exceed its true widths and the
        # minimum image aliases pairs beyond half the narrowest width.
        inv = np.linalg.inv(np.asarray(state.unitcell, np.float64))
        widths = 1.0 / np.linalg.norm(inv, axis=1)
        r_max = 0.5 * float(widths.min())
    counts = rdf_histogram(state.positions, state.unitcell, state.unitcell_inv,
                           r_max, n_bins)
    volume = float(box_volume(state.unitcell))
    return rdf_normalize(np.asarray(counts), state.n_particles, volume, r_max,
                         n_frames=1, dim=state.dimension)


def mean_squared_displacement(state, reference_positions):
    """MSD of current unwrapped coordinates vs a reference snapshot."""
    unwrapped = unwrapped_positions(state.positions, state.images, state.unitcell)
    disp = unwrapped - reference_positions
    return float(jnp.mean(jnp.sum(disp * disp, axis=-1)))


def read_thermo(path):
    """Parse a thermo.txt written by run_simulation (or the reference) into a
    dict of numpy columns."""
    data = np.loadtxt(path, comments="#", ndmin=2)
    return {
        "step": data[:, 0].astype(np.int64),
        "energy": data[:, 1],
        "temperature": data[:, 2],
        "pressure": data[:, 3],
    }
