"""Statistics NetCDF output: layout + physics content (reference
``src/stats.cxx`` layout; read back like the reference's own analysis
scripts do)."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.stats import Stats
from microhh_tpu.utils import nc

from test_drycblles import setup_case


def test_stats_output(tmp_path):
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=24, endtime=600.)

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items["stats"]["sampletime"][""] = "300"
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    path = os.path.join(wd, "drycblles.default.0000000.nc")
    assert os.path.exists(path)
    f = nc.Dataset(path, "r")

    ktot = m.grid.ktot
    # layout like the reference: z/zh/time at root, profiles in groups
    assert f.variables["z"].shape == (ktot,)
    assert f.variables["zh"].shape == (ktot + 1,)
    ntime = f.variables["time"].shape[0]
    assert ntime == 3  # t=0, 300, 600

    default = f.groups["default"]
    th = default.variables["th"][:]
    assert th.shape == (ntime, ktot)

    # initial profile is the linear stratification
    z = f.variables["z"][:]
    assert np.allclose(th[0], 300. + 0.003 * z, atol=1e-3)

    # heating increases mean th over time
    assert th[-1].mean() > th[0].mean()

    # resolved + diffusive th flux at the surface equals the imposed 0.1
    th_flux = default.variables["th_flux"][:]
    assert th_flux.shape == (ntime, ktot + 1)
    assert abs(th_flux[-1, 0] - 0.1) < 0.02, th_flux[-1, 0]

    # variance exists and is positive after spinup
    th_2 = default.variables["th_2"][:]
    assert th_2[-1].max() > 0.

    # surface time series
    assert default.variables["ustar"][:].shape == (ntime,)
    assert np.all(default.variables["obuk"][1:] < 0.)

    # zi in the thermo group grows with time
    zi = f.groups["thermo"].variables["zi"][:]
    assert zi[-1] >= zi[0]
    f.close()
