"""TKE budget diagnostics: registration + rough balance sanity."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.stats import Stats
from microhh_tpu.utils import nc as ncmod

from test_drycblles import setup_case


def test_budget_group_written(tmp_path):
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=24, endtime=900.)
    ini = Ini(os.path.join(wd, "drycblles.ini"))
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items.setdefault("budget", {})["swbudget"] = {"": "2"}
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    f = ncmod.Dataset(os.path.join(wd, "drycblles.default.0000000.nc"), "r")
    bud = f.groups["budget"]
    ktot = m.grid.ktot
    tke_shear = bud.variables["tke_shear"][:]
    tke_buoy = bud.variables["tke_buoy"][:]
    tke_diss = bud.variables["tke_diss"][:]
    assert tke_shear.shape[1] == ktot
    # in a convective BL, buoyancy production is positive in the lower
    # mixed layer once convection has spun up (~15 min)
    assert tke_buoy[-1, 1:8].mean() > 0.
    # dissipation is negative semidefinite
    assert np.all(tke_diss <= 1e-12)
    f.close()
