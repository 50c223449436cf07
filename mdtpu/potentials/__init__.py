from mdtpu.potentials.base import Potential, evaluate, energy_lrc, pressure_lrc
from mdtpu.potentials.pseudo_hs import PseudoHS
from mdtpu.potentials.lennard_jones import LennardJones
from mdtpu.potentials.xplor import LennardJonesXPLOR
