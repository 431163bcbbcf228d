"""Moist thermodynamics: saturation adjustment physics + BOMEX smoke run."""

import os
import shutil
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.ops import thermo_moist as tm

CASE_DIR = os.path.join(os.path.dirname(__file__), "..", "cases", "bomex")


def test_esat_qsat_sanity():
    # Arden-Buck at T0: esat(273.15K) ~ 611.21 Pa
    assert abs(float(tm.esat_liq(np.float64(273.15))) - 611.21) < 0.5
    # ~2339 Pa at 20 C
    assert abs(float(tm.esat_liq(np.float64(293.15))) - 2339.) < 15.
    # qsat at surface pressure, 300K ~ 0.022-0.023
    qs = float(tm.qsat_liq(np.float64(101325.), np.float64(300.)))
    assert 0.021 < qs < 0.024


def test_sat_adjust_unsaturated():
    ql, qi, T, qs = tm.sat_adjust(jnp.asarray([300.0]), jnp.asarray([0.005]),
                                  jnp.asarray([90000.0]), jnp.asarray([tm.exner(90000.0)]))
    assert float(ql[0]) == 0.0
    assert float(qi[0]) == 0.0
    # T = thl * exner
    assert abs(float(T[0]) - 300.0 * tm.exner(90000.)) < 1e-8


def test_sat_adjust_saturated_consistency():
    """For a supersaturated parcel: ql > 0, and the result satisfies the
    implicit system T = Tl + Lv/cp*ql with qt - ql = qsat(p, T)."""
    thl = jnp.asarray([290.0])
    qt = jnp.asarray([0.020])
    p = jnp.asarray([95000.0])
    exn = jnp.asarray([tm.exner(95000.0)])
    ql, qi, T, qs = tm.sat_adjust(thl, qt, p, exn)
    ql, T = float(ql[0]), float(T[0])
    assert ql > 1e-4
    tl = 290.0 * float(exn[0])
    assert abs(T - (tl + tm.cst.Lv / tm.cst.cp * ql)) < 1e-4
    assert abs((0.020 - ql) - float(tm.qsat_liq(np.float64(95000.0), np.float64(T)))) < 1e-7


def test_sat_adjust_cold_produces_ice():
    thl = jnp.asarray([250.0])
    qt = jnp.asarray([0.004])
    p = jnp.asarray([70000.0])
    exn = jnp.asarray([tm.exner(70000.0)])
    ql, qi, T, qs = tm.sat_adjust(thl, qt, p, exn)
    # Cold parcel condenses; the Tomita water fraction splits liquid/ice
    # according to the adjusted temperature (mixed phase here).
    assert float(qi[0]) > 0.0
    alpha = float(tm.water_fraction(np.float64(T[0])))
    tot = float(ql[0]) + float(qi[0])
    assert abs(float(ql[0]) - alpha * tot) < 1e-12
    assert abs(float(qi[0]) - (1. - alpha) * tot) < 1e-12


@pytest.mark.slow
def test_bomex_smoke(tmp_path):
    wd = str(tmp_path)
    shutil.copy(os.path.join(CASE_DIR, "bomex.ini"), wd)
    shutil.copy(os.path.join(CASE_DIR, "bomex_input.py"), wd)
    # shrink for the test
    ini = Ini(os.path.join(wd, "bomex.ini"))
    ini.items["grid"]["itot"][""] = "16"
    ini.items["grid"]["jtot"][""] = "16"
    ini.items["grid"]["ktot"][""] = "32"
    ini.items["time"]["endtime"][""] = "600"
    ini.items["time"]["savetime"][""] = "600"
    ini.items["stats"]["swstats"][""] = "0"
    ini_text = "\n".join("[%s]\n" % sec + "\n".join(
        ("%s=%s" % (k, v) if not sub else "%s[%s]=%s" % (k, sub, v))
        for k, subs in items.items() for sub, v in subs.items())
        for sec, items in ini.items.items())
    with open(os.path.join(wd, "bomex.ini"), "w") as f:
        f.write(ini_text)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(os.path.join(CASE_DIR, "..", "..")) + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.check_call([sys.executable, "bomex_input.py"], cwd=wd, env=env)

    m = Model(Ini(ini_text), "init", "bomex", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    # anelastic base state: density decreases with height
    rho = m.fields.rhoref[m.grid.kstart:m.grid.kend]
    assert rho[0] > 1.1  # surface air density at 101500 Pa, ~299 K
    assert 0.8 < rho[-1] < rho[0]  # ~0.88 kg/m3 at 3 km

    m = Model(Ini(ini_text), "run", "bomex", workdir=wd)
    m.finish_setup()
    s, t = m.run()

    for name in ("u", "v", "w", "thl", "qt"):
        a = np.asarray(s[name])
        assert np.all(np.isfinite(a)), name
    # qt stays positive (limiter) and bounded
    ks, ke = m.grid.kstart, m.grid.kend
    assert np.asarray(s["qt"])[ks:ke].min() >= 0.
    assert np.asarray(s["qt"])[ks:ke].max() < 0.03
    # surface heating increases thl near the surface over 10 min
    thl = np.asarray(s["thl"])[ks:ke].mean(axis=(1, 2))
    assert thl[0] > 298.69


def _build_moist_model(tmp_path):
    import os
    from microhh_tpu.utils import nc
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    wd = str(tmp_path)
    ktot, zsize = 24, 2400.
    z = np.linspace(50., 2350., ktot)
    f = nc.Dataset(os.path.join(wd, "bs_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 298. + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.01 - 3e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.zeros(ktot)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()
    ini = """
[grid]
itot=4
jtot=4
ktot=24
xsize=800.
ysize=800.
zsize=2400.
swspatialorder=2
[advec]
swadvec=2
cflmax=1.2
[diff]
swdiff=smag2
dnmax=0.3
[thermo]
swthermo=moist
swbasestate=anelastic
pbot=101500.
[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot=0.
stop=0.
z0m=0.1
z0h=0.1
[fields]
visc=1e-5
svisc=1e-5
[time]
starttime=0
endtime=60
savetime=60
dt=2.
"""
    m = Model(Ini(ini), "run", "bs", workdir=wd)
    m.finish_setup()
    return m


def test_update_basestate_matches_create(tmp_path):
    """With the state's horizontal means equal to the init profiles, the
    traced per-substep base-state update must reproduce the create-time
    hydrostatic pressure (thermo_moist.cxx swupdatebasestate)."""
    import jax.numpy as jnp
    m = _build_moist_model(tmp_path)
    ctx = m.ctx
    g = m.grid
    ks, ke = g.kstart, g.kend
    th = m.thermo
    assert th.swupdatebasestate

    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    # rebuild the init profiles incl. mirrored surface ghost (create did
    # thl[ks-1] = thl[ks])
    thl = np.zeros(g.kcells)
    qt = np.zeros(g.kcells)
    init = m.input_nc.groups["init"]
    thl[ks:ke] = np.asarray(init.variables["thl"][:g.ktot])
    qt[ks:ke] = np.asarray(init.variables["qt"][:g.ktot])
    thl[ks - 1] = thl[ks]
    qt[ks - 1] = qt[ks]
    s["thl"] = s["thl"] + jnp.asarray(thl[:, None, None])
    s["qt"] = s["qt"] + jnp.asarray(qt[:, None, None])

    aux = th.update_basestate(ctx, s, {})
    pref_new = np.asarray(aux["pref"])
    prefh_new = np.asarray(aux["prefh"])
    assert np.allclose(pref_new[ks:ke], th.pref[ks:ke], rtol=1e-9)
    assert np.allclose(prefh_new[ks:ke + 1], th.prefh[ks:ke + 1], rtol=1e-9)

    # a warmer column hydrostatically relaxes: lower density -> higher
    # pressure aloft
    s2 = dict(s)
    s2["thl"] = s["thl"] + 5.
    aux2 = th.update_basestate(ctx, s2, {})
    assert np.asarray(aux2["pref"])[ke - 1] > pref_new[ke - 1]
