"""Taylor-Green vortex: analytic-decay convergence test (reference
``cases/taylorgreen/taylorgreen_test.py``).  The 2nd-order scheme must show
~2nd-order convergence of u and w against the analytic solution."""

import numpy as np
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

VISC = 1. / (8. * np.pi ** 2 * 100.)

INI_TMPL = """
[grid]
itot=%(itot)d
jtot=1
ktot=%(ktot)d
xsize=1.
ysize=1.
zsize=0.5
swspatialorder=%(order)d

[force]
swlspres=0

[thermo]
swthermo=0

[fields]
visc=%(visc).17g
rndamp=0.
vortexnpair=1
vortexamp=1.
vortexaxis=y

[boundary]
mbcbot=freeslip
mbctop=freeslip

[time]
starttime=0
adaptivestep=true
dt=0.0025
dtmax=0.01
endtime=1.
savetime=1.
outputiter=10
rkorder=3

[advec]
cflmax=0.5

[diff]
dnmax=0.2
"""


def run_tg(tmp_path, itot, ktot, order=2):
    case_dir = tmp_path / ("tg%d_o%d" % (itot, order))
    case_dir.mkdir()
    ini_text = INI_TMPL % {"itot": itot, "ktot": ktot, "visc": VISC, "order": order}
    (case_dir / "taylorgreen.ini").write_text(ini_text)

    wd = str(case_dir)
    m = Model(Ini(ini_text), "init", "taylorgreen", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    m = Model(Ini(ini_text), "run", "taylorgreen", workdir=wd)
    m.finish_setup()
    s, _t = m.run()
    return m, s


def error_uw(m, s):
    g = m.grid
    ks, ke = g.kstart, g.kend
    time = 1.0
    decay = np.exp(-8. * np.pi ** 2 * VISC * time)
    xh = g.xh
    x = g.x
    z = g.z[ks:ke]
    zh = g.zh[ks:ke]
    u_ref = np.sin(2 * np.pi * xh)[None, :] * np.cos(2 * np.pi * z)[:, None] * decay
    w_ref = -np.cos(2 * np.pi * x)[None, :] * np.sin(2 * np.pi * zh)[:, None] * decay
    u = np.asarray(s["u"])[ks:ke, 0, :]
    w = np.asarray(s["w"])[ks:ke, 0, :]
    dx = 1. / g.itot
    dz = 0.5 / g.ktot
    err_u = np.sum(dx * dz * np.abs(u - u_ref))
    err_w = np.sum(dx * dz * np.abs(w - w_ref))
    return err_u, err_w


@pytest.mark.slow
def test_taylorgreen_convergence(tmp_path):
    errs = {}
    for itot, ktot in ((16, 8), (32, 16), (64, 32)):
        m, s = run_tg(tmp_path, itot, ktot)
        errs[itot] = error_uw(m, s)

    # absolute accuracy at the finest resolution
    assert errs[64][0] < 5e-4
    assert errs[64][1] < 5e-4

    # convergence order over the resolution ladder
    order_u = np.log(errs[16][0] / errs[64][0]) / np.log(4.)
    order_w = np.log(errs[16][1] / errs[64][1]) / np.log(4.)
    assert order_u > 1.7, order_u
    assert order_w > 1.7, order_w


def test_taylorgreen_single_step_stability(tmp_path):
    """One coarse run: finite fields, small divergence, status file written."""
    m, s = run_tg(tmp_path, 16, 8)
    assert np.all(np.isfinite(np.asarray(s["u"])))
    div = float(m.pres.divergence_max(m.ctx, s))
    assert div < 1e-10
    out = (tmp_path / "tg16_o2" / "taylorgreen.out").read_text()
    assert "ITER" in out
    # restart file written at savetime
    assert (tmp_path / "tg16_o2" / "u.0000001").exists()


@pytest.mark.slow
def test_taylorgreen_convergence_4th(tmp_path):
    """4th-order path (advec_4 + diff_4 + pres_4 heptadiagonal solve):
    error must drop much faster than 2nd order (reference
    taylorgreen_test.py checks ~4th-order slopes)."""
    errs = {}
    for itot, ktot in ((16, 8), (32, 16), (64, 32)):
        m, s = run_tg(tmp_path, itot, ktot, order=4)
        errs[itot] = error_uw(m, s)

    assert errs[64][0] < 2e-5, errs
    order_u = np.log(errs[16][0] / errs[64][0]) / np.log(4.)
    order_w = np.log(errs[16][1] / errs[64][1]) / np.log(4.)
    assert order_u > 3.0, (order_u, errs)
    assert order_w > 3.0, (order_w, errs)


def test_pres4_projection(tmp_path):
    """After one 4th-order step the 4th-order divergence is ~machine zero."""
    from microhh_tpu.ops.boundary import set_ghost_cells_w
    m, s = run_tg(tmp_path, 16, 8, order=4)
    s_g = m.boundary.set_ghost_cells(m.ctx, s, {})
    s_g["w"] = set_ghost_cells_w(m.ctx, s_g["w"], conservation=True)
    div = float(m.pres.divergence_max(m.ctx, s_g))
    assert div < 1e-10, div


@pytest.mark.slow
def test_moser_channel_smoke(tmp_path):
    """Short 4th-order channel run (moser180 config, shrunk): uflux forcing
    holds the mean flow, noslip walls, no NaNs."""
    import os
    import shutil
    import subprocess
    import sys
    case = os.path.join(os.path.dirname(__file__), "..", "cases", "moser180")
    wd = str(tmp_path)
    for f in os.listdir(case):
        shutil.copy(os.path.join(case, f), wd)
    from microhh_tpu.config import Ini
    ini = Ini(os.path.join(wd, "moser180.ini"))
    ini.items["grid"]["itot"][""] = "32"
    ini.items["grid"]["jtot"][""] = "16"
    ini.items["grid"]["ktot"][""] = "32"
    ini.items["time"]["endtime"][""] = "200."
    ini.items["time"]["savetime"][""] = "200."
    ini.items["stats"]["swstats"][""] = "0"
    ini_text = "\n".join("[%s]\n" % sec + "\n".join(
        ("%s=%s" % (k, v) if not sub else "%s[%s]=%s" % (k, sub, v))
        for k, subs in items.items() for sub, v in subs.items())
        for sec, items in ini.items.items())
    with open(os.path.join(wd, "moser180.ini"), "w") as f:
        f.write(ini_text)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(os.path.join(case, "..", "..")) + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.check_call([sys.executable, "moser180_input.py"], cwd=wd, env=env)

    from microhh_tpu.model import Model
    m = Model(Ini(ini_text), "init", "moser180", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(ini_text), "run", "moser180", workdir=wd)
    m.finish_setup()
    s, t = m.run()
    ks, ke = m.grid.kstart, m.grid.kend
    u = np.asarray(s["u"])
    assert np.all(np.isfinite(u))
    # uflux forcing keeps the volume-weighted mean close to the target
    dz = m.grid.dz[ks:ke][:, None, None]
    umean = (u[ks:ke] * dz).sum() / (m.grid.itot * m.grid.jtot * m.grid.zsize)
    assert abs(umean - 0.0282) < 0.003, umean
