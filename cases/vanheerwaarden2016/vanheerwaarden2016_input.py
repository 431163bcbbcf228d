"""Generate vanheerwaarden2016_input.nc: growing convective boundary layer
DNS over a heated plate (Van Heerwaarden & Mellado 2016 JAS; reference
cases/vanheerwaarden2016).  Tanh-stretched grid, linear stratification."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"


def tanh_stretched_z(kmax, dn, nloc1, nbuf1, nloc2, nbuf2, dz1, dz2, dz3):
    n = np.linspace(dn, 1. - dn, kmax)
    dzdn = (dz1 / dn
            + 0.5 * (dz2 - dz1) / dn * (1. + np.tanh((n - nloc1 * dn) / (nbuf1 * dn)))
            + 0.5 * (dz3 - dz2) / dn * (1. + np.tanh((n - nloc2 * dn) / (nbuf2 * dn))))
    dz = dzdn * dn
    z = np.empty(kmax)
    z[0] = 0.5 * dz[0]
    for k in range(1, kmax):
        z[k] = z[k - 1] + 0.5 * (dz[k - 1] + dz[k])
    return z, z[-1] + 0.5 * dz[-1]


# the resolution parameter is set by the horizontal grid (itot=512 unit)
ktot = 384
dn = 1. / 512.
z, zsize = tanh_stretched_z(ktot, dn, nloc1=80., nbuf1=24., nloc2=512.,
                            nbuf2=72., dz1=0.5 * dn, dz2=dn, dz3=5. * dn)

N2 = 3.
b = N2 * z

f = nc.Dataset("vanheerwaarden2016_input.nc", mode="w", datamodel="NETCDF4")
f.createDimension("z", ktot)
f.createVariable("z", float_type, ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("b", float_type, ("z",))[:] = b
f.close()
