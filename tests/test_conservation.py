"""Conservation case (reference cases/conservation): random noise flow;
momentum and TKE drift read from the status file must converge with the RK
order (reference conservation_test.py checks the dt-refinement slopes)."""

import os
import shutil
import numpy as np
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

CASE = os.path.join(os.path.dirname(__file__), "..", "cases", "conservation")


def run_one(tmp_path, rkorder, dtmax):
    wd = str(tmp_path / ("rk%d_dt%g" % (rkorder, dtmax)))
    os.makedirs(wd)
    shutil.copy(os.path.join(CASE, "conservation.ini"), wd)
    ini = Ini(os.path.join(wd, "conservation.ini"))
    ini.items["time"]["rkorder"][""] = str(rkorder)
    ini.items["time"]["dt"][""] = str(dtmax)
    ini.items["time"]["dtmax"][""] = str(dtmax)
    ini.items["stats"]["swstats"][""] = "0"
    m = Model(ini, "init", "conservation", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(ini, "run", "conservation", workdir=wd)
    m.finish_setup()
    m.run()
    out = np.loadtxt(os.path.join(wd, "conservation.out"), skiprows=1)
    # columns: ITER TIME CPUDT DT CFL DNUM DIV MOM TKE MASS
    return out


@pytest.mark.slow
def test_conservation_rk_convergence(tmp_path):
    drift = {}
    outs = {}
    for rk in (3, 4):
        for dt in (2.0, 1.0):
            out = run_one(tmp_path, rk, dt)
            outs[(rk, dt)] = out
            tke = out[:, 8]
            drift[(rk, dt)] = abs(tke[-1] - tke[1]) / tke[1]

    # TKE drift shrinks with dt at the scheme's order (3rd/4th): halving dt
    # should reduce drift by ~8x (RK3) / ~16x (RK4); require >4x to be safe.
    assert drift[(3, 1.0)] < drift[(3, 2.0)] / 4., drift
    assert drift[(4, 1.0)] < drift[(4, 2.0)] / 4., drift
    # RK4 conserves better than RK3 at the same dt
    assert drift[(4, 2.0)] < drift[(3, 2.0)], drift
    # momentum drift stays small relative to the velocity scale (the
    # reference case likewise plots a small nonzero drift)
    mom = outs[(3, 2.0)][:, 7]
    tke0 = outs[(3, 2.0)][1, 8]
    assert abs(mom[-1] - mom[0]) < 0.02 * np.sqrt(2 * tke0)
