"""Multi-chip spatial domain decomposition over a jax.sharding.Mesh.

Public surface: ``run_simulation_sharded`` (the sharded analog of
``mdtpu.run_simulation``, identical outputs) plus the engines it selects
between — the production slot-layout halo engine (``HaloSlotEngine``), the
row-layout halo engine (``HaloCellGridEngine``) and the all-gather
``ShardedAllPairsEngine``. The reference has no distributed runtime
(SURVEY.md 2.14); this package is the TPU-native mapping of its threaded
map-reduce: ``psum`` replaces the reducer protocol, ``ppermute`` halo
exchange replaces shared memory.
"""

from mdtpu.parallel.driver import run_simulation_sharded
from mdtpu.parallel.halo import HaloCellGridEngine
from mdtpu.parallel.halo_slot import HaloSlotEngine
from mdtpu.parallel.mesh import make_mesh
from mdtpu.parallel.sharded import ShardedAllPairsEngine

__all__ = [
    "run_simulation_sharded",
    "HaloSlotEngine",
    "HaloCellGridEngine",
    "ShardedAllPairsEngine",
    "make_mesh",
]
