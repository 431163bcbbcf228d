"""Eady problem: linear shear in thermal-wind balance with the
y-gradient of theta (u_geo = -g/(f*th0) * dth/dy * z)."""
import numpy as np
from microhh_tpu.utils import nc

ktot, zsize = 32, 1000.
dz = zsize / ktot
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
fc, th0, dthdy = 1e-2, 300., -1e-4
ug = -9.81 / (fc * th0) * dthdy * z    # thermal wind
th = 300. + 0.01 * z                   # weak stratification

f = nc.Dataset("eady_input.nc", "w")
f.createDimension("z", ktot)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("th", "f8", ("z",))[:] = th
g.createVariable("u", "f8", ("z",))[:] = ug
g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
g.createVariable("u_geo", "f8", ("z",))[:] = ug
g.createVariable("v_geo", "f8", ("z",))[:] = np.zeros(ktot)
f.close()
print("wrote eady_input.nc")
