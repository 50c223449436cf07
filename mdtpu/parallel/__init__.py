"""Multi-chip spatial domain decomposition over a jax.sharding.Mesh.

Public surface: ``run_simulation_sharded`` (the sharded analog of
``mdtpu.run_simulation``, identical outputs) and the production engine it
drives — the slot-layout halo engine (``HaloSlotEngine``): state sharded in
cell-sorted slot order over x-slabs, ONE batched plane ppermute per step,
on-device migration at every rebin, dense or plane-scan sweeps. The
reference has no distributed runtime (SURVEY.md 2.14); this package is the
TPU-native mapping of its threaded map-reduce: ``psum`` replaces the
reducer protocol, ``ppermute`` halo exchange replaces shared memory.

Superseded paths (row-layout halo engine, all-gather engine, GSPMD step)
live in :mod:`mdtpu.parallel.experimental` with their measured record.
"""

from mdtpu.parallel.driver import run_simulation_sharded
from mdtpu.parallel.halo_slot import HaloSlotEngine
from mdtpu.parallel.mesh import make_mesh

__all__ = [
    "run_simulation_sharded",
    "HaloSlotEngine",
    "make_mesh",
]
