"""Generate drycblslope_input.nc: anabatic-slope dry convective boundary
layer DNS (thermo_buoy slope variant, reference
cases/drycblslope/drycblslope_input.py).  Tanh-stretched vertical grid,
linear background stratification b = N2*z."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"


def tanh_stretched_z(kmax, nloc1, nbuf1, nloc2, nbuf2, dz1, dz2, dz3):
    """Three-zone tanh-blended grid spacing; returns (z, zsize)."""
    dn = 1. / kmax
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


kmax = 512
z, zsize = tanh_stretched_z(kmax, nloc1=80., nbuf1=16., nloc2=512., nbuf2=72.,
                            dz1=0.001, dz2=0.002, dz3=0.016)

N2 = 3.
b = N2 * z

f = nc.Dataset("drycblslope_input.nc", mode="w", datamodel="NETCDF4")
f.createDimension("z", kmax)
f.createVariable("z", float_type, ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("b", float_type, ("z",))[:] = b
f.close()
