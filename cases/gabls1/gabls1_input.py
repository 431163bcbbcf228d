"""Generate gabls1_input.nc: GABLS1 stable BL intercomparison profiles
(Beare et al. 2006): 265 K below 100 m, +0.01 K/m above; ug = 8 m/s;
surface cooling 0.25 K/h as a timedep series."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"

with open('gabls1.ini') as f:
    for line in f:
        if line.split('=')[0] == 'ktot':
            kmax = int(line.split('=')[1])
        if line.split('=')[0] == 'zsize':
            zsize = float(line.split('=')[1])

dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)
th = np.where(z <= 100., 265., 265. + 0.01 * (z - 100.))
u = np.full(kmax, 8.)

nc_file = nc.Dataset("gabls1_input.nc", mode="w", datamodel="NETCDF4")
nc_file.createDimension("z", kmax)
nc_file.createVariable("z", float_type, ("z",))[:] = z
g = nc_file.createGroup("init")
g.createVariable("th", float_type, ("z",))[:] = th
g.createVariable("u", float_type, ("z",))[:] = u
g.createVariable("v", float_type, ("z",))[:] = np.zeros(kmax)
g.createVariable("u_geo", float_type, ("z",))[:] = u
g.createVariable("v_geo", float_type, ("z",))[:] = np.zeros(kmax)

td = nc_file.createGroup("timedep")
td.createDimension("time_surface", 2)
td.createVariable("time_surface", float_type, ("time_surface",))[:] = [0., 32400.]
td.createVariable("th_sbot", float_type, ("time_surface",))[:] = [265., 262.75]
nc_file.close()
