"""Input generator for the cabauw_lsm smoke case (ERA5-like soil column)."""
import numpy as np
from microhh_tpu.utils import nc

ktot, zsize = 32, 2000.
dz = zsize / ktot
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)

f = nc.Dataset("cabauw_lsm_input.nc", "w")
f.createDimension("z", ktot)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("thl", "f8", ("z",))[:] = 288. + np.where(z < 200., 0., 0.006 * (z - 200.))
g.createVariable("qt", "f8", ("z",))[:] = 0.008 - 2.5e-6 * z
g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 5.)
g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)

s = f.createGroup("soil")
s.createDimension("z", 4)
s.createVariable("z", "f8", ("z",))[:] = [-1.945, -0.64, -0.175, -0.035]
s.createVariable("t_soil", "f8", ("z",))[:] = [283., 284.5, 286., 287.]
s.createVariable("theta_soil", "f8", ("z",))[:] = [0.36, 0.32, 0.28, 0.26]
s.createVariable("index_soil", "i8", ("z",))[:] = [1, 1, 1, 1]
s.createVariable("root_frac", "f8", ("z",))[:] = [0.05, 0.2, 0.4, 0.35]
f.close()
print("wrote cabauw_lsm_input.nc")
