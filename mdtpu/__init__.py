"""mdtpu — a TPU-native molecular dynamics framework (JAX/XLA/Pallas).

Re-designed from scratch with the full capability surface of
``edwinb-ai/MolecularDynamics.jl`` (reference export list:
/root/reference/src/MolecularDynamics.jl:29-35): classical MD of mono- and
polydisperse soft-sphere fluids in 2D/3D periodic boxes, NVT (Bussi) / NVE /
Brownian ensembles, pluggable pair potentials, FIRE minimization, temperature
ramps, packed random or file-based initialization, and Extended-XYZ + LAMMPS
trajectory output with zstd compression and log-spaced snapshots.

The compute path is pure-functional JAX: one jitted fused step under
``lax.fori_loop``, cell-binned neighbor lists with gather-based (scatter-free)
force evaluation, and sharding over TPU meshes via ``shard_map`` (see
mdtpu.parallel).
"""

from mdtpu.core.types import (
    Brownian,
    ConstantSchedule,
    NVE,
    NVT,
    Parameters,
    SimulationState,
)
from mdtpu.integrate.ramps import (
    ExponentialRamp,
    LinearRamp,
    initial_temperature_for_velocities,
)
from mdtpu.integrate.thermostat import compute_kinetic, compute_temperature
from mdtpu.minimize import fire_minimize, minimize
from mdtpu.ops import NaivePairEngine, select_engine
from mdtpu.ops.neighbor_list import NeighborListEngine
from mdtpu.potentials.base import Potential, energy_lrc, evaluate, pressure_lrc
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.pseudo_hs import PseudoHS
from mdtpu.potentials.xplor import LennardJonesXPLOR
from mdtpu.parallel.driver import run_simulation_sharded
from mdtpu.sim.driver import run_simulation
from mdtpu.sim.initialization import initialize_state, initialize_velocities

__version__ = "0.1.0"

__all__ = [
    "Parameters", "SimulationState", "NVT", "NVE", "Brownian",
    "ConstantSchedule",
    "initialize_state", "initialize_velocities", "run_simulation",
    "run_simulation_sharded",
    "PseudoHS", "LennardJones", "LennardJonesXPLOR",
    "LinearRamp", "ExponentialRamp", "initial_temperature_for_velocities",
    "minimize", "fire_minimize",
    "Potential", "evaluate", "energy_lrc", "pressure_lrc",
    "compute_kinetic", "compute_temperature",
    "NaivePairEngine", "NeighborListEngine", "select_engine",
]
