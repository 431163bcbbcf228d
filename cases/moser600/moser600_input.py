"""Generate moser600_input.nc: Re_tau=180 channel DNS initial profiles
(tanh-stretched wall-normal grid + laminar parabola)."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"

with open('moser600.ini') as f:
    for line in f:
        if line.split('=')[0] == 'ktot':
            kmax = int(line.split('=')[1])
        if line.split('=')[0] == 'zsize':
            zsize = float(line.split('=')[1])

alpha = 0.967
k = np.arange(kmax)
eta = -1. + 2. * ((k + 1) - 0.5) / kmax
z = (zsize / (2. * alpha)
     * np.tanh(eta * 0.5 * (np.log(1. + alpha) - np.log(1. - alpha)))
     + 0.5 * zsize)
s = z.copy()

dpdxls = -1.5e-6
visc = 1.0e-5
u = 1. / (2. * visc) * dpdxls * (z ** 2 - zsize * z)

nc_file = nc.Dataset("moser600_input.nc", mode="w", datamodel="NETCDF4")
nc_file.createDimension("z", kmax)
nc_file.createVariable("z", float_type, ("z",))[:] = z
g = nc_file.createGroup("init")
g.createVariable("u", float_type, ("z",))[:] = u
g.createVariable("v", float_type, ("z",))[:] = np.zeros(kmax)
g.createVariable("s", float_type, ("z",))[:] = s
nc_file.close()
