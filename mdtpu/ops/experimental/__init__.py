"""Experimental engines: documented NEGATIVE results kept as tested records.

Both Pallas kernels compute the identical physics to the production XLA
z-window sweep and are verified against the O(N^2) oracle, but MEASURED
SLOWER on this hardware (BENCH_NOTES.md "Pallas findings": plane kernel
5.13 vs 3.93 ms/step at the round-1 bench; Mosaic relayout of the
dynamically sliced (B, C, 3C) pair blocks dominates). They are retained
as (a) the record of why "hand-write the pair loop in Pallas" is not the
TPU answer for this computation, and (b) working scaffolding should a
future Mosaic fix the relayout cost. Not part of the public API; not
selected by select_engine. One regression test each in
tests/test_experimental_pallas.py.
"""

from mdtpu.ops.experimental.pallas_cell import PallasCellEngine
from mdtpu.ops.experimental.pallas_plane import PallasPlaneEngine

__all__ = ["PallasCellEngine", "PallasPlaneEngine"]
