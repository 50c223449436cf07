"""Device mesh construction for sharded MD.

The reference's only parallelism is intra-node Julia threading (SURVEY.md
2.14); the TPU-native counterpart is SPMD over a ``jax.sharding.Mesh``:
particles (and their cells) are sharded over a single ``"shard"`` axis —
spatial domain decomposition expressed as data parallelism — with scalar
reductions (energy/virial/kinetic) travelling over ICI as ``psum``s, the
direct analog of CellListMap's thread-local outputs + ``reducer`` tree
(/root/reference/src/pairwise.jl:17-23).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (N, ...) particle arrays: rows split over the shard axis."""
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
