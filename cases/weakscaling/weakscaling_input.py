"""Generate weakscaling_input.nc: the per-device weak-scaling unit
(64x32x1024 points per processor in the reference scaling runs,
cases/weakscaling/weakscaling.ini + scaling/weakscaling.juqueen).

On TPU the per-chip block is scaled by growing itot/jtot with the mesh:
itot = 64*npx, jtot = 32*npy keeps the per-chip load constant under the
P(None,'y','x') pencil sharding."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"


def tanh_stretched_z(kmax, nloc1, nbuf1, nloc2, nbuf2, dz1, dz2, dz3):
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


kmax = 1024
z, zsize = tanh_stretched_z(kmax, nloc1=160., nbuf1=32., nloc2=1024., nbuf2=144.,
                            dz1=0.0005, dz2=0.001, dz3=0.01)

N2 = 3.
b = N2 * z

f = nc.Dataset("weakscaling_input.nc", mode="w", datamodel="NETCDF4")
f.createDimension("z", kmax)
f.createVariable("z", float_type, ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("b", float_type, ("z",))[:] = b
f.close()
