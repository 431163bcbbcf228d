"""Generate sullivan2011_input.nc: Sullivan & Patton (2011) convective
boundary layer LES (reference cases/sullivan2011): three-layer th profile
with a capping inversion at ~1 km, weak geostrophic wind."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"

with open("sullivan2011.ini") as f:
    for line in f:
        if line.split("=")[0] == "ktot":
            kmax = int(line.split("=")[1])
        if line.split("=")[0] == "zsize":
            zsize = float(line.split("=")[1])

dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)

th = np.where(z <= 974., 300.,
              np.where(z <= 1074., 300. + (z - 974.) * 0.08,
                       308. + (z - 1074.) * 0.003))
u = np.ones(kmax)
ug = np.ones(kmax)

f = nc.Dataset("sullivan2011_input.nc", mode="w", datamodel="NETCDF4")
f.createDimension("z", kmax)
f.createVariable("z", float_type, ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("th", float_type, ("z",))[:] = th
g.createVariable("u", float_type, ("z",))[:] = u
g.createVariable("u_geo", float_type, ("z",))[:] = ug
g.createVariable("v_geo", float_type, ("z",))[:] = np.zeros(kmax)
f.close()
