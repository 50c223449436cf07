from mdtpu.io.xyz import write_xyz, read_xyz
from mdtpu.io.lammps import write_lammps_frame, format_lammps_frame
from mdtpu.io.logtimes import generate_log_times
from mdtpu.io.compress import compress_zstd, decompress_zstd
from mdtpu.io.checkpoint import save_checkpoint, load_checkpoint
