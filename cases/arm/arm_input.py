"""ARM SGP shallow-cumulus diurnal case input (Brown et al. 2002 spec):
piecewise-linear initial soundings, time-dependent surface fluxes and
large-scale thl/qt tendencies."""
import numpy as np
from microhh_tpu.utils import nc

ktot, zsize = 64, 4400.
dz = zsize / ktot
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)

# published breakpoint soundings (z [m], thl [K], qt [g/kg])
zb = np.array([0., 50., 350., 650., 700., 1300., 2500., 5500.])
thlb = np.array([299.0, 301.5, 302.5, 303.53, 303.7, 307.13, 314.0, 343.2])
qtb = np.array([15.20, 15.17, 14.98, 14.80, 14.70, 13.50, 3.00, 3.00])
thl = np.interp(z, zb, thlb)
qt = np.interp(z, zb, qtb) * 1e-3
u = np.full(ktot, 10.)

# time-dependent surface fluxes (H, LE in W m-2 at hours after 11:30 UTC)
time_sfc = np.array([0., 4., 6.5, 7.5, 10., 12.5, 14.5]) * 3600.
H = np.array([-30., 90., 140., 140., 100., -10., -10.])
LE = np.array([5., 250., 450., 500., 420., 180., 0.])
rho0 = 97000. / (287. * thl[0] * (1. + 0.61 * qt[0]))
thl_sbot = H / (rho0 * 1005.)
qt_sbot = LE / (rho0 * 2.5e6)

# time-dependent large-scale tendencies (K/h, g/kg/h at 1 km, ramped to 0
# at 5.5 km)
time_ls = np.array([0., 3., 6., 9., 12., 14.5]) * 3600.
advthl = np.array([0., 0., 0., -0.08, -0.16, -0.16])
radthl = np.array([-0.125, 0., 0., 0., 0., -0.1])
advqt = np.array([0.08, 0.02, -0.04, -0.10, -0.16, -0.30])
ramp = np.where(z <= 1000., 1., 1. - (z - 1000.) / (5500. - 1000.))
thl_ls = (advthl + radthl)[:, None] / 3600. * ramp[None, :]
qt_ls = advqt[:, None] / 3600. * 1e-3 * ramp[None, :]

f = nc.Dataset("arm_input.nc", "w")
f.createDimension("z", ktot)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
for name, prof in (("thl", thl), ("qt", qt), ("u", u),
                   ("u_geo", u), ("v", np.zeros(ktot)),
                   ("v_geo", np.zeros(ktot))):
    g.createVariable(name, "f8", ("z",))[:] = prof
td = f.createGroup("timedep")
td.createDimension("time_surface", time_sfc.size)
td.createDimension("time_ls", time_ls.size)
td.createVariable("time_surface", "f8", ("time_surface",))[:] = time_sfc
td.createVariable("thl_sbot", "f8", ("time_surface",))[:] = thl_sbot
td.createVariable("qt_sbot", "f8", ("time_surface",))[:] = qt_sbot
td.createVariable("time_ls", "f8", ("time_ls",))[:] = time_ls
td.createVariable("thl_ls", "f8", ("time_ls", "z"))[:] = thl_ls
td.createVariable("qt_ls", "f8", ("time_ls", "z"))[:] = qt_ls
f.close()
print("wrote arm_input.nc")
