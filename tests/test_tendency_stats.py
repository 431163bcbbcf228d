"""Per-op tendency statistics (swtendency): the recorded op tendencies must
sum to the total."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.stats import Stats
from microhh_tpu.utils import nc as ncmod

from test_drycblles import setup_case


def test_tendency_accounting(tmp_path):
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=16, endtime=120.)
    ini = Ini(os.path.join(wd, "drycblles.ini"))
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items["stats"]["sampletime"] = {"": "60"}
    ini.items["stats"]["swtendency"] = {"": "1"}
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    f = ncmod.Dataset(os.path.join(wd, "drycblles.default.0000000.nc"), "r")
    tend = f.groups["tend"]
    ops = ("thermo", "micro", "rad", "advec", "diff", "buffer", "decay",
           "source", "force", "pres", "limiter")
    for fld in ("u", "w", "th"):
        total = tend.variables["%s_total" % fld][:]
        parts = sum(tend.variables["%s_%s" % (fld, op)][:] for op in ops)
        assert np.allclose(parts, total, rtol=1e-10, atol=1e-14), fld
    # physics sanity: th advection+diffusion balance heating; diff of th at
    # the surface level is positive (heat input)
    th_diff = tend.variables["th_diff"][:]
    assert th_diff[-1, 0] > 0.
    f.close()
