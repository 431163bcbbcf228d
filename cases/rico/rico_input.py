"""RICO composite initial profiles + large-scale forcings
(vanZanten et al. 2011 GCSS spec, 'gcss' variant)."""
import numpy as np
from microhh_tpu.utils import nc

ktot, zsize = 100, 4000.
# honor the local ini (like bomex_input.py), so resized runs/benches work
try:
    with open("rico.ini") as _f:
        for _line in _f:
            if _line.split("=")[0] == "ktot":
                ktot = int(_line.split("=")[1])
            if _line.split("=")[0] == "zsize":
                zsize = float(_line.split("=")[1])
except OSError:
    pass
dz = zsize / ktot
z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)

thl = np.where(z < 740., 297.9,
               297.9 + (317.0 - 297.9) / (4000. - 740.) * (z - 740.))
qt = np.where(z < 740., 16.0 + (13.8 - 16.0) / 740. * z,
              np.where(z < 3260.,
                       13.8 + (2.4 - 13.8) / (3260. - 740.) * (z - 740.),
                       2.4 + (1.8 - 2.4) / (4000. - 3260.) * (z - 3260.)))
qt *= 1e-3
u = -9.9 + 2.0e-3 * z
v = np.full(ktot, -3.8)
wls = np.where(z < 2260., -0.005 * z / 2260., -0.005)
thlls = np.full(ktot, -2.5 / 86400.)
qtls = np.where(z < 2980., (-1.0 + 1.3456 * z / 2980.) / 86400., 4e-6)
qtls *= 1e-3

f = nc.Dataset("rico_input.nc", "w")
f.createDimension("z", ktot)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
for name, prof in (("thl", thl), ("qt", qt), ("u", u), ("v", v),
                   ("u_geo", u), ("v_geo", v), ("w_ls", wls),
                   ("thl_ls", thlls), ("qt_ls", qtls)):
    g.createVariable(name, "f8", ("z",))[:] = prof
f.close()
print("wrote rico_input.nc")
