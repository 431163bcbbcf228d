"""Rayleigh-Taylor: unstable two-layer buoyancy profile."""
import numpy as np
from microhh_tpu.utils import nc

kmax, zsize = 128, 0.5
dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)
b = np.where(z > 0.5 * zsize, -1., 1.)   # heavy (negative b) on top

f = nc.Dataset("rayleightaylor_input.nc", "w")
f.createDimension("z", kmax)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("b", "f8", ("z",))[:] = b
f.close()
print("wrote rayleightaylor_input.nc")
