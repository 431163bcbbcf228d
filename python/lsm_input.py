"""Generate binary land-surface input maps for heterogeneous LSM runs
(reference ``python/lsm_input.py``; consumed by
``microhh_tpu/ops/boundary_surface_lsm.py`` when ``swhomogeneous=false``).

Each map is written as a raw binary file ``<name>.0000000`` in the case
directory, in the model's run precision:

2-D (jtot, itot):  gD, c_veg, lai, rs_veg_min, rs_soil_min, lambda_stable,
                   lambda_unstable, cs_veg [, water_mask, t_bot_water]
3-D (ktot_soil, jtot, itot): index_soil, root_frac, t_soil, theta_soil

Usage::

    from lsm_input import LSM_input
    lsm = LSM_input(itot, jtot, ktot_soil, dtype=np.float64)
    lsm.fields["c_veg"][:] = 0.9
    lsm.fields["index_soil"][:] = 2      # van Genuchten class (0-based)
    ...
    lsm.save(".")
"""

import numpy as np

FIELDS_2D = ("gD", "c_veg", "lai", "rs_veg_min", "rs_soil_min",
             "lambda_stable", "lambda_unstable", "cs_veg")
FIELDS_2D_WATER = ("water_mask", "t_bot_water")
FIELDS_3D = ("index_soil", "root_frac", "t_soil", "theta_soil")


class LSM_input:
    def __init__(self, itot, jtot, ktot_soil, sw_water=False,
                 dtype=np.float64):
        self.dtype = dtype
        self.fields = {}
        names_2d = FIELDS_2D + (FIELDS_2D_WATER if sw_water else ())
        for name in names_2d:
            self.fields[name] = np.zeros((jtot, itot), dtype=dtype)
        for name in FIELDS_3D:
            self.fields[name] = np.zeros((ktot_soil, jtot, itot), dtype=dtype)

    def save(self, path="."):
        import os
        for name, fld in self.fields.items():
            fld.astype(self.dtype).tofile(
                os.path.join(path, "%s.%07d" % (name, 0)))


if __name__ == "__main__":
    demo = LSM_input(8, 8, 4)
    for k, v in demo.fields.items():
        print("%-16s %s" % (k, v.shape))
