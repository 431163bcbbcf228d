"""Generate SBL_input.nc: stably-stratified Ekman-layer initial profiles.
(The reference fork initializes from DNS restart data; this generator
provides an equivalent analytic initial state: geostrophic wind + linear
stable stratification.)"""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"

with open('SBL.ini') as f:
    for line in f:
        if line.split('=')[0] == 'ktot':
            kmax = int(line.split('=')[1])
        if line.split('=')[0] == 'zsize':
            zsize = float(line.split('=')[1])

dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)
ug = 0.05
b0 = -0.0044

nc_file = nc.Dataset("SBL_input.nc", mode="w", datamodel="NETCDF4")
nc_file.createDimension("z", kmax)
nc_file.createVariable("z", float_type, ("z",))[:] = z
g = nc_file.createGroup("init")
g.createVariable("u", float_type, ("z",))[:] = np.full(kmax, ug)
g.createVariable("v", float_type, ("z",))[:] = np.zeros(kmax)
g.createVariable("b", float_type, ("z",))[:] = b0 * (1. - z / zsize)
g.createVariable("u_geo", float_type, ("z",))[:] = np.full(kmax, ug)
g.createVariable("v_geo", float_type, ("z",))[:] = np.zeros(kmax)
nc_file.close()
