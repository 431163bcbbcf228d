"""drycbl DNS: double-tanh stretched grid (reference drycbl_input.py grid
recipe at reduced ktot) + linear stratification above the surface layer."""
import numpy as np
from microhh_tpu.utils import nc

kmax = 128
dn = 1. / kmax
n = np.linspace(dn, 1. - dn, kmax)
nloc1, nbuf1 = 20. * dn, 4. * dn
nloc2, nbuf2 = 128. * dn, 18. * dn
dz1, dz2, dz3 = 0.004, 0.008, 0.064

dzdn1 = dz1 / dn
dzdn2 = dz2 / dn
dzdn3 = dz3 / dn
dzdn = (dzdn1 + 0.5 * (dzdn2 - dzdn1) * (1. + np.tanh((n - nloc1) / nbuf1))
        + 0.5 * (dzdn3 - dzdn2) * (1. + np.tanh((n - nloc2) / nbuf2)))
dz = dzdn * dn
z = np.zeros(kmax)
z[0] = 0.5 * dz[0]
for k in range(1, kmax):
    z[k] = z[k - 1] + 0.5 * (dz[k - 1] + dz[k])
zsize = z[-1] + 0.5 * dz[-1]
print("zsize = %.10f (set [grid] zsize accordingly)" % zsize)

b = 3. * z  # background stratification matching stop (dbdz = 3)

f = nc.Dataset("drycbl_input.nc", "w")
f.createDimension("z", kmax)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("b", "f8", ("z",))[:] = b
f.close()
print("wrote drycbl_input.nc")
