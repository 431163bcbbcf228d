"""Soil grid for the interactive land-surface model.

Reference: ``src/soil_grid.cxx``.  The soil column has ktot full levels with
z < 0 (reference reads them from the input NetCDF ``soil`` group, top level
closest to the surface at index ktot-1); half levels follow the IFS
convention — the full level is centered between its two half levels, built
downward from zh[kend] = 0 (soil_grid.cxx:100-140).  No ghost cells.
"""

import numpy as np


class SoilGrid:
    def __init__(self, ini):
        self.ktot = ini.get_int("land_surface", "ktot")
        self.kstart = 0
        self.kend = self.ktot

    def create(self, input_nc):
        kt = self.ktot
        soil = input_nc.groups["soil"]
        self.z = np.asarray(soil.variables["z"][:kt], dtype=np.float64)

        zh = np.zeros(kt + 1)
        zh[kt] = 0.
        for k in range(kt - 1, -1, -1):
            zh[k] = zh[k + 1] - 2. * (zh[k + 1] - self.z[k])
        self.zh = zh
        self.zsize = zh[0]

        self.dz = zh[1:] - zh[:-1]
        dzh = np.zeros(kt + 1)
        dzh[1:kt] = self.z[1:] - self.z[:-1]
        dzh[kt] = 2. * -self.z[kt - 1]
        dzh[0] = 2. * (self.z[0] - zh[0])
        self.dzh = dzh
        self.dzi = 1. / self.dz
        self.dzhi = 1. / dzh
