"""Generate bomex_input.nc: the standard BOMEX shallow-cumulus
intercomparison initial/forcing profiles (Siebesma et al. 2003)."""

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"

with open('bomex.ini') as f:
    for line in f:
        if line.split('=')[0] == 'ktot':
            kmax = int(line.split('=')[1])
        if line.split('=')[0] == 'zsize':
            zsize = float(line.split('=')[1])

dz = zsize / kmax
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, kmax)

# Piecewise-linear BOMEX profiles.
thl = np.interp(z, [0., 520., 1480., 2000., 3000.],
                [298.7, 298.7, 302.4, 308.2, 311.85])
qt = 1e-3 * np.interp(z, [0., 520., 1480., 2000., 3000.],
                      [17.0, 16.3, 10.7, 4.2, 3.0])
u = np.interp(z, [0., 700., 3000.], [-8.75, -8.75, -4.61])
v = np.zeros_like(z)
ugeo = -10. + 1.8e-3 * z
vgeo = np.zeros_like(z)
wls = np.interp(z, [0., 1500., 2100., 3000.], [0., -0.65, 0., 0.]) / 100.
thlls = np.interp(z, [0., 1500., 3000.], [-2., -2., 0.]) / 86400.
qtls = np.interp(z, [0., 300., 500., 3000.], [-1.2, -1.2, 0., 0.]) * 1.e-8

nc_file = nc.Dataset("bomex_input.nc", mode="w", datamodel="NETCDF4")
nc_file.createDimension("z", kmax)
nc_z = nc_file.createVariable("z", float_type, ("z",))
nc_z[:] = z

g = nc_file.createGroup("init")
for name, prof in (("thl", thl), ("qt", qt), ("u", u), ("v", v),
                   ("u_geo", ugeo), ("v_geo", vgeo), ("w_ls", wls),
                   ("thl_ls", thlls), ("qt_ls", qtls)):
    var = g.createVariable(name, float_type, ("z",))
    var[:] = prof

nc_file.close()
