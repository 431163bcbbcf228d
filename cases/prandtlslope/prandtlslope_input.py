"""Prandtl slope flow: geometrically stretched DNS grid, zero initial b."""
import numpy as np
from microhh_tpu.utils import nc

kmax = 256
dz1 = 0.002
r = 1.01
for _ in range(50):
    r = (1. - (1. / dz1) * (1. - r)) ** (1. / kmax)
dz = dz1 * r ** np.arange(kmax)
z = np.zeros(kmax)
z[0] = 0.5 * dz[0]
for k in range(1, kmax):
    z[k] = z[k - 1] + 0.5 * (dz[k - 1] + dz[k])
zsize = z[-1] + 0.5 * dz[-1]
print("zsize = %.10f (set [grid] zsize accordingly)" % zsize)

f = nc.Dataset("prandtlslope_input.nc", "w")
f.createDimension("z", kmax)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("b", "f8", ("z",))[:] = np.zeros(kmax)
f.close()
print("wrote prandtlslope_input.nc")
