"""Generate drycblles_input.nc: linearly stratified dry CBL
(same profiles as the reference case generator)."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"

with open('drycblles.ini') as f:
    for line in f:
        if line.split('=')[0] == 'ktot':
            kmax = int(line.split('=')[1])
        if line.split('=')[0] == 'zsize':
            zsize = float(line.split('=')[1])

dz = zsize / kmax
dthetadz = 0.003

z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)
u = np.zeros(np.size(z))
v = np.zeros(np.size(z))
th = 300. + dthetadz * z

nc_file = nc.Dataset("drycblles_input.nc", mode="w", datamodel="NETCDF4")

nc_file.createDimension("z", kmax)
nc_z = nc_file.createVariable("z", float_type, ("z",))

nc_group_init = nc_file.createGroup("init")
nc_u = nc_group_init.createVariable("u", float_type, ("z",))
nc_v = nc_group_init.createVariable("v", float_type, ("z",))
nc_th = nc_group_init.createVariable("th", float_type, ("z",))

nc_z[:] = z[:]
nc_u[:] = u[:]
nc_v[:] = v[:]
nc_th[:] = th[:]

nc_file.close()
