from mdtpu.core import box, types
