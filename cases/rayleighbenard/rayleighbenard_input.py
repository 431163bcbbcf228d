"""Rayleigh-Benard: zero initial buoyancy between hot/cold plates."""
import numpy as np
from microhh_tpu.utils import nc

kmax, zsize = 128, 0.5
dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)
f = nc.Dataset("rayleighbenard_input.nc", "w")
f.createDimension("z", kmax)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("b", "f8", ("z",))[:] = np.zeros(kmax)
f.close()
print("wrote rayleighbenard_input.nc")
