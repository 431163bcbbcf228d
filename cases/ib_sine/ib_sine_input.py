"""DEM + profiles + spatial scalar BC for the ib_sine case.

Geometry and initial state follow the reference's sine case exactly
(``cases/ib_sine/sine_input.py`` upstream): sinusoidal wall of amplitude
2.54 mm and wavelength 50.8 mm (the Hudson (1993) wavy-wall channel, see
the upstream reference_data README) offset 2 mm above the domain floor,
initial u = 0.00137 m/s with a linear buoyancy profile b = z.  The
reference runs 256x1x256 on a tanh-stretched grid; this config is the
same physics at reduced resolution (64x4x64, uniform z).
"""
import numpy as np

try:
    import netCDF4 as nc
except ImportError:
    from microhh_tpu.utils import nc

itot, jtot, ktot = 64, 4, 64
xsize, ysize, zsize = 0.1016, 0.006, 0.0554
dx, dy = xsize / itot, ysize / jtot
x = (np.arange(itot) + 0.5) * dx
z = (np.arange(ktot) + 0.5) * (zsize / ktot)

# reference sine geometry (sine_input.py: amplitude/wavelength/z_offset)
amp, lam, z_off = 0.00254, 0.0508, 0.002
dem1d = z_off + amp + amp * np.sin(2. * np.pi * x / lam)
dem = np.broadcast_to(dem1d[None, :], (jtot, itot)).astype(np.float64)
dem.copy().tofile("dem.0000000")

# spatially varying Dirichlet b at the wall: heated crests, cool troughs
# (the upstream case uses a +-0.1 step on the dem mean; a smooth sine of
# the same magnitude exercises the identical code path)
b_sbot = 0.1 * np.sin(2. * np.pi * x / lam)
np.broadcast_to(b_sbot[None, :], (jtot, itot)).astype(np.float64).copy() \
    .tofile("b_sbot.0000000")

f = nc.Dataset("ib_sine_input.nc", "w")
f.createDimension("z", ktot)
f.createVariable("z", "f8", ("z",))[:] = z
g = f.createGroup("init")
g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 0.00137)
g.createVariable("b", "f8", ("z",))[:] = z
f.close()
print("wrote dem.0000000, b_sbot.0000000, ib_sine_input.nc")
