"""Andren et al. (1994): geostrophic wind u_g = 10 m/s, passive scalar."""
import numpy as np
from microhh_tpu.utils import nc

kmax, zsize = 40, 1500.
dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)
f = nc.Dataset("andren1994_input.nc", "w")
f.createDimension("z", kmax)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("u", "f8", ("z",))[:] = np.full(kmax, 10.)
g.createVariable("v", "f8", ("z",))[:] = np.zeros(kmax)
g.createVariable("u_geo", "f8", ("z",))[:] = np.full(kmax, 10.)
g.createVariable("v_geo", "f8", ("z",))[:] = np.zeros(kmax)
g.createVariable("s", "f8", ("z",))[:] = np.zeros(kmax)
f.close()
print("wrote andren1994_input.nc")
