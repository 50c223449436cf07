"""Core pytree types: Parameters, SimulationState, ensembles.

Design (TPU-first, cf. SURVEY.md section 7): the entire simulation state is a
pytree of fixed-shape device arrays — structure-of-arrays ``(N, d)`` instead of
the reference's array-of-MVectors (/root/reference/src/types.jl:15-32) — so one
jitted, purely functional ``step(state) -> state`` can run under
``lax.fori_loop`` entirely on device.

Reference parity:
  * ``Parameters``       ~ /root/reference/src/types.jl:8-13
  * ``SimulationState``  ~ /root/reference/src/types.jl:15-32
  * ``NVT/NVE/Brownian`` ~ /root/reference/src/types.jl:34-51
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Parameters:
    """Simulation parameters: (density, n_particles, dt, potential).

    ``n_particles`` is static (it determines array shapes); density and dt are
    traced leaves; the potential is itself a pytree dataclass.
    """

    density: Any
    n_particles: int = struct.field(pytree_node=False)
    dt: Any = 0.001
    potential: Any = None


@struct.dataclass
class SimulationState:
    """Full device-resident simulation state (a pytree).

    Compared to the reference (/root/reference/src/types.jl:15-32) this also
    carries the force/thermo outputs of the last step, the PRNG key, the step
    counter and Kahan compensation buffers — everything needed so that NVE
    runs checkpoint/resume *exactly* (SURVEY.md section 5, checkpoint row).
    """

    positions: jnp.ndarray        # (N, d)
    velocities: jnp.ndarray       # (N, d)
    forces: jnp.ndarray           # (N, d)
    images: jnp.ndarray           # (N, d) int32 box-crossing counts
    diameters: jnp.ndarray        # (N,)
    unitcell: jnp.ndarray         # (d, d), columns are box vectors
    unitcell_inv: jnp.ndarray     # (d, d)
    key: jnp.ndarray              # jax PRNG key (base; folded with step)
    step: jnp.ndarray             # () int32/int64 current step index
    nf: jnp.ndarray               # () degrees of freedom d*(N-1)
    energy: jnp.ndarray           # () last potential energy (total)
    virial: jnp.ndarray           # () last virial sum_{i<j} f_ij * r_ij
    temperature: jnp.ndarray      # () last kinetic temperature
    # Kahan compensation buffers for f32 long-run accuracy (zeros if unused).
    pos_comp: jnp.ndarray         # (N, d)
    vel_comp: jnp.ndarray         # (N, d)
    # Neighbor/engine auxiliary state (e.g. neighbor lists); engine-specific.
    nbrs: Any = None
    # Brownian-path thermo accumulators (virial averaged over 10-step samples,
    # reference: /root/reference/src/simulation.jl:253-256).
    virial_accum: jnp.ndarray = struct.field(default=None)
    nprom: jnp.ndarray = struct.field(default=None)
    # Original particle indices, used ONLY by the slot-space layout
    # (mdtpu.integrate.slot_step) where rebuild re-sorts rows: outputs and
    # the final state are restored to original particle order through this.
    # None in the ordinary (N, d) particle-order layout.
    ids: Optional[jnp.ndarray] = None     # (n_slots,) int32 or None
    # Engine cutoff, static (the reference bakes it into the CellListMap
    # system at init, /root/reference/src/initialization.jl:100-107).
    cutoff: float = struct.field(pytree_node=False, default=1.5)

    @property
    def n_particles(self) -> int:
        return self.positions.shape[0]

    @property
    def dimension(self) -> int:
        return self.positions.shape[1]

    @property
    def dtype(self):
        return self.positions.dtype


# ---------------------------------------------------------------------------
# Temperature schedules (the reference's "ktemp is a callable of step",
# /root/reference/src/types.jl:36-44). Ramps live in mdtpu.integrate.ramps;
# here only the trivial constant schedule and the coercion helper.
# ---------------------------------------------------------------------------


@struct.dataclass
class ConstantSchedule:
    value: Any

    def __call__(self, step):
        return jnp.asarray(self.value)


def as_schedule(ktemp) -> Any:
    """Coerce a float or callable into a schedule pytree.

    Mirrors the reference's convenience constructor ``NVT(ktemp::T, tau)`` that
    wraps a constant in ``step -> ktemp`` (/root/reference/src/types.jl:44).
    """
    if callable(ktemp):
        return ktemp
    return ConstantSchedule(value=ktemp)


# ---------------------------------------------------------------------------
# Ensembles (/root/reference/src/types.jl:34-51)
# ---------------------------------------------------------------------------


@struct.dataclass
class NVT:
    """Canonical ensemble via the Bussi-Donadio-Parrinello thermostat.

    ``ktemp`` may be a constant or a callable schedule ``step -> T`` (1-indexed
    step, matching /root/reference/src/integrate.jl:49 which calls
    ``ensemble.ktemp(step)`` with ``step + 1``).
    """

    ktemp: Any
    tau: Any

    def __post_init__(self):
        object.__setattr__(self, "ktemp", as_schedule(self.ktemp))


@struct.dataclass
class NVE:
    """Microcanonical ensemble: plain velocity Verlet, no thermostat."""


@struct.dataclass
class Brownian:
    """Overdamped Brownian dynamics (Ermak-McCammon / Euler-Maruyama).

    ``ktemp`` is a constant temperature (the reference stores a plain float,
    /root/reference/src/types.jl:46-48).
    """

    ktemp: Any


Ensemble = Union[NVT, NVE, Brownian]
