"""Jaenschwalde profiles (reference case spec: piecewise-linear soundings,
zero initial CO2 with a zero inflow profile)."""
import numpy as np
from microhh_tpu.utils import nc

ktot, zsize = 64, 5000.
dz = zsize / ktot
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)

thl = np.interp(z, [0., 400., 2000., 2500., 5000.],
                [285.7, 291.9, 293.0, 297.4, 307.0])
qt = np.interp(z, [0., 400., 2000., 2500., 5000.],
               np.array([6.2, 4.93, 3.61, 1.0, 0.3]) / 1000.)
u = np.interp(z, [0., 5000.], [3., 7.])

f = nc.Dataset("jaenschwalde_input.nc", "w")
f.createDimension("z", ktot)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
for name, prof in (("thl", thl), ("qt", qt), ("u", u),
                   ("v", np.zeros(ktot)), ("co2", np.zeros(ktot)),
                   ("co2_inflow", np.zeros(ktot))):
    g.createVariable(name, "f8", ("z",))[:] = prof
f.close()
print("wrote jaenschwalde_input.nc")
