from mdtpu.sim.driver import run_simulation, open_files, finalize_simulation
from mdtpu.sim.initialization import initialize_state, initialize_velocities, build_state_from_arrays
from mdtpu.sim.pack import pack_positions
