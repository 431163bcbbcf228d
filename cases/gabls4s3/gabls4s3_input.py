"""Generate gabls4s3_input.nc: GABLS4 stage-3 Antarctic stable boundary
layer LES (Dome C; reference cases/gabls4s3).

The official setup is driven by the GABLS4 SCM driver file
``SCM_LES_STAGE3.nc`` (initial th/u/v + geostrophic profiles and the
24-hour surface-temperature cycle).  When that file is present in the case
directory it is used directly; otherwise an idealized stand-in with the
published Dome C characteristics (th ~278 K aloft, strong surface-based
inversion, Ug ~ (4.6, 0) m/s, diurnal Ts cycle 278->270->278 K) is
generated so the case runs without external data.  Grab the driver from
the GABLS4 intercomparison archive for production runs.
"""

import os

import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

float_type = "f8"


def stretched_z(kmax, nloc1, nbuf1, dz1, dz2):
    """Two-zone tanh grid (fine near the surface)."""
    dn = 1. / kmax
    n = np.linspace(dn, 1. - dn, kmax)
    dzdn = dz1 / dn + 0.5 * (dz2 - dz1) / dn * (
        1. + np.tanh((n - nloc1 * dn) / (nbuf1 * dn)))
    dz = dzdn * dn
    z = np.empty(kmax)
    z[0] = 0.5 * dz[0]
    for k in range(1, kmax):
        z[k] = z[k - 1] + 0.5 * (dz[k - 1] + dz[k])
    return z


kmax = 288
z = stretched_z(kmax, nloc1=250., nbuf1=20., dz1=2., dz2=12.)  # ~955 m top

driver = "SCM_LES_STAGE3.nc"
if os.path.exists(driver):
    d = nc.Dataset(driver, "r")
    zd = d.variables["height"][:][::-1]
    th_d = d.variables["theta"][:][::-1]
    u_d = d.variables["u"][:][::-1]
    v_d = d.variables["v"][:][::-1]
    ug_d = d.variables["Ug"][0, :][::-1]
    vg_d = d.variables["Vg"][0, :][::-1]
    t_srf = d.variables["time"][:]
    Ts = d.variables["Tg"][:]
    ps = d.variables["psurf"].getValue()
    ths = Ts / (ps / 1.e5) ** (287.04 / 1005.)
    th = np.interp(z, zd, th_d)
    u = np.interp(z, zd, u_d)
    v = np.interp(z, zd, v_d)
    ug = np.interp(z, zd, ug_d)
    vg = np.interp(z, zd, vg_d)
    d.close()
else:
    print("gabls4s3: SCM_LES_STAGE3.nc not found -> idealized stand-in")
    th = 278. + np.maximum(z - 100., 0.) * 0.0078
    th = np.where(z < 100., 270. + 8. * z / 100., th)
    u = np.full(kmax, 4.6)
    v = np.zeros(kmax)
    ug = np.full(kmax, 4.6)
    vg = np.zeros(kmax)
    t_srf = np.linspace(0., 86400., 25)
    ths = 274. - 4. * np.cos(2. * np.pi * t_srf / 86400.)

f = nc.Dataset("gabls4s3_input.nc", mode="w", datamodel="NETCDF4")
f.createDimension("z", kmax)
f.createVariable("z", float_type, ("z",))[:] = z
g = f.createGroup("init")
for name, prof in (("th", th), ("u", u), ("v", v),
                   ("u_geo", ug), ("v_geo", vg)):
    g.createVariable(name, float_type, ("z",))[:] = prof
gt = f.createGroup("timedep")
gt.createDimension("time_surface", len(t_srf))
gt.createVariable("time_surface", float_type, ("time_surface",))[:] = t_srf
gt.createVariable("th_sbot", float_type, ("time_surface",))[:] = ths
f.close()
