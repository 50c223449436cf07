"""Superseded sharded engines, kept as a measured record (NOT production).

Round-by-round the sharded stack converged on the slot-layout halo engine
(:mod:`mdtpu.parallel.halo_slot`) — on-device ppermute migration at every
rebin, zero host resharding, per-chip cost within ~10-25% of the
single-chip slot loop. The engines here are the paths it replaced, demoted
with one regression test each (tests/test_parallel.py) as the record:

* ``halo.HaloCellGridEngine`` — row-layout spatial decomposition with
  driver-cadence HOST resharding. End-to-end ~10x slower than the slot
  halo engine at the 65k bench (row scatter/gather per step + the reshard
  stalls; BENCH_NOTES round 3), 3D-only, no hi/lo sweep.
* ``sharded.ShardedAllPairsEngine`` — all-gather O(N^2/P) sweep: every
  step all-gathers all positions. Simple and exact, but O(N) per-chip
  communication; superseded for anything beyond small systems.
* ``sharded.make_sharded_step`` — GSPMD auto-sharding of the naive step
  (no shard_map): XLA inserts the collectives; kept as the
  minimal-machinery baseline.

None of these is reachable from ``run_simulation_sharded`` (the public
sharded driver is slot-only); construct and drive them manually if needed.
"""

from mdtpu.parallel.experimental.halo import HaloCellGridEngine
from mdtpu.parallel.experimental.sharded import (
    ShardedAllPairsEngine,
    make_shard_map_step,
    make_sharded_step,
    shard_state,
)

__all__ = [
    "HaloCellGridEngine",
    "ShardedAllPairsEngine",
    "make_shard_map_step",
    "make_sharded_step",
    "shard_state",
]
