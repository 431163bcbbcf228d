"""DEM + spatial scalar BC for the ib_sine case (sinusoidal wall)."""
import numpy as np

itot, jtot = 64, 4
xsize, ysize = 0.1016, 0.006
dx, dy = xsize / itot, ysize / jtot
x = (np.arange(itot) + 0.5) * dx

# Sinusoidal bottom wall: amplitude/wavelength of the reference ib_sine.
amp, lam = 0.005, xsize / 2.
dem1d = 0.008 + amp * np.sin(2. * np.pi * x / lam)
dem = np.broadcast_to(dem1d[None, :], (jtot, itot)).astype(np.float64)
dem.copy().tofile("dem.0000000")

# Spatially varying Dirichlet b at the wall: heated crest, cool troughs.
b_sbot = (0.1 + 0.05 * np.sin(2. * np.pi * x / lam))
np.broadcast_to(b_sbot[None, :], (jtot, itot)).astype(np.float64).copy() \
    .tofile("b_sbot.0000000")
print("wrote dem.0000000, b_sbot.0000000")
