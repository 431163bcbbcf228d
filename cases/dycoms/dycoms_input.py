"""DYCOMS-II RF01 initial profiles (Stevens et al. 2005 GCSS spec)."""
import numpy as np
from microhh_tpu.utils import nc

ktot, zsize = 96, 1500.
dz = zsize / ktot
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)

thl = np.where(z <= 840., 289.0, 297.5 + np.maximum(z - 840., 0.) ** (1. / 3.))
qt = np.where(z <= 840., 9.0e-3, 1.5e-3)
u = np.full(ktot, 6.)
ug = np.full(ktot, 7.)
v = np.full(ktot, -4.25)
vg = np.full(ktot, -5.5)
wls = -3.75e-6 * z

f = nc.Dataset("dycoms_input.nc", "w")
f.createDimension("z", ktot)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
for name, prof in (("thl", thl), ("qt", qt), ("u", u), ("u_geo", ug),
                   ("v", v), ("v_geo", vg), ("w_ls", wls)):
    g.createVariable(name, "f8", ("z",))[:] = prof
f.close()
print("wrote dycoms_input.nc")
