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
