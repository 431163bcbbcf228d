"""Ekman spiral: start from the geostrophic wind."""
import numpy as np
from microhh_tpu.utils import nc

kmax, zsize = 64, 5.
dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)
f = nc.Dataset("ekman_input.nc", "w")
f.createDimension("z", kmax)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("u", "f8", ("z",))[:] = np.ones(kmax)
g.createVariable("v", "f8", ("z",))[:] = np.zeros(kmax)
g.createVariable("u_geo", "f8", ("z",))[:] = np.ones(kmax)
g.createVariable("v_geo", "f8", ("z",))[:] = np.zeros(kmax)
f.close()
print("wrote ekman_input.nc")
