"""Conditional-sampling mask statistics (wplus/wmin)."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.stats import Stats
from microhh_tpu.utils import nc as ncmod

from test_drycblles import setup_case


def test_updraft_downdraft_masks(tmp_path):
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=16, endtime=600.)
    ini = Ini(os.path.join(wd, "drycblles.ini"))
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items["stats"]["sampletime"] = {"": "300"}
    ini.items["stats"]["masklist"] = {"": "wplus,wmin"}
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    fp = ncmod.Dataset(os.path.join(wd, "drycblles.wplus.0000000.nc"), "r")
    fm = ncmod.Dataset(os.path.join(wd, "drycblles.wmin.0000000.nc"), "r")
    a_p = fp.groups["default"].variables["area"][:]
    a_m = fm.groups["default"].variables["area"][:]
    # complementary areas (w==0 measure ~ 0 in turbulence)
    assert np.allclose(a_p[-1] + a_m[-1], 1.0, atol=1e-6)
    # updrafts carry a positive heat flux in the CBL interior
    thw_p = fp.groups["default"].variables["th_w"][-1]
    assert thw_p[2:8].mean() > 0.
    # updraft w positive, downdraft negative
    w_p = fp.groups["default"].variables["w"][-1]
    w_m = fm.groups["default"].variables["w"][-1]
    assert w_p[2:10].min() >= 0.
    assert w_m[2:10].max() <= 0.
    fp.close()
    fm.close()


def test_couvreux_mask(tmp_path):
    """Couvreux conditional-sampling mask (decay.cxx:124-182): a decaying
    tracer released at the surface; the mask selects points with tracer
    anomaly > mean + nstd*std per level."""
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=16, endtime=600.)
    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items.setdefault("fields", {})["slist"] = {"": "couvreux"}
    ini.items["fields"]["svisc"] = {"": "0.1"}
    ini.items.setdefault("decay", {})["swdecay"] = {"couvreux": "exponential"}
    ini.items["decay"]["timescale"] = {"couvreux": "400"}
    ini.items["decay"]["nstd_couvreux"] = {"": "1."}
    ini.items["boundary"]["sbcbot"] = {"": "flux"}
    ini.items["boundary"]["sbot"] = {"th": ini.items["boundary"]["sbot"].get(
        "", ini.items["boundary"]["sbot"].get("th", "0.1")),
        "couvreux": "1.0"}
    ini.items["boundary"]["stop"] = {"th": ini.items["boundary"]["stop"].get(
        "", ini.items["boundary"]["stop"].get("th", "0.003")),
        "couvreux": "0."}
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini.items["stats"]["sampletime"] = {"": "300"}
    ini.items["stats"]["masklist"] = {"": "couvreux"}
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    f = ncmod.Dataset(os.path.join(wd, "drycblles.couvreux.0000000.nc"), "r")
    area = f.groups["default"].variables["area"][-1]
    # the >1-sigma plume fraction must be a strict, nonzero minority near
    # the surface where the tracer is released
    assert 0. < area[:6].mean() < 0.5
    # sampled updraft-plume w is positive in the lower CBL on average
    wm = f.groups["default"].variables["w"][-1]
    assert np.nanmean(wm[1:6]) > 0.
    f.close()


def test_xy_mask(tmp_path):
    """User XY mask (stats.cxx:554-555, fields.cxx:607-628): a (jtot, itot)
    plane loaded from <name>.0000000, > 0.5 selects columns at every level."""
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=16, endtime=600.)
    # mask the western half of the domain
    patch = np.zeros((16, 16))
    patch[:, :8] = 1.
    patch.astype(np.float64).tofile(os.path.join(wd, "patch.0000000"))

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items["stats"]["sampletime"] = {"": "300"}
    ini.items["stats"]["xymasklist"] = {"": "patch"}
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    f = ncmod.Dataset(os.path.join(wd, "drycblles.patch.0000000.nc"), "r")
    area = f.groups["default"].variables["area"][:]
    areah = f.groups["default"].variables["areah"][:]
    # exactly half the columns, at every level and time
    assert np.allclose(area, 0.5), area
    assert np.allclose(areah, 0.5), areah
    th = f.groups["default"].variables["th"][-1]
    assert np.all(np.isfinite(th))
    f.close()
