from mdtpu.integrate.step import make_step, make_md_step, make_brownian_step, engine_forces
from mdtpu.integrate.thermostat import bussi_rescale, compute_kinetic, compute_temperature, sum_noises
from mdtpu.integrate.ramps import LinearRamp, ExponentialRamp, initial_temperature_for_velocities
