"""Dry convective boundary layer LES smoke + physics sanity: Smagorinsky SGS
+ MOST surface + dry thermo + buffer, the reference's north-star configuration
(``cases/drycblles``)."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

CASE_DIR = os.path.join(os.path.dirname(__file__), "..", "cases", "drycblles")


def setup_case(tmp_path, itot=16, jtot=16, ktot=24, endtime=300.):
    ini = Ini(os.path.join(CASE_DIR, "drycblles.ini"))
    ini.items["grid"]["itot"][""] = str(itot)
    ini.items["grid"]["jtot"][""] = str(jtot)
    ini.items["grid"]["ktot"][""] = str(ktot)
    ini.items["time"]["endtime"][""] = str(endtime)
    ini.items["time"]["savetime"][""] = str(endtime)

    wd = str(tmp_path)
    # generate input nc with our shim
    shutil.copy(os.path.join(CASE_DIR, "drycblles_input.py"), wd)
    ini_text = "\n".join("[%s]\n" % sec + "\n".join(
        ("%s=%s" % (k, v) if not sub else "%s[%s]=%s" % (k, sub, v))
        for k, subs in items.items() for sub, v in subs.items())
        for sec, items in ini.items.items())
    with open(os.path.join(wd, "drycblles.ini"), "w") as f:
        f.write(ini_text)
    env = dict(os.environ)
    repo_root = os.path.abspath(os.path.join(CASE_DIR, "..", ".."))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.check_call([sys.executable, "drycblles_input.py"], cwd=wd, env=env)
    return wd


def test_drycblles_smoke(tmp_path):
    wd = setup_case(tmp_path)

    m = Model(Ini(os.path.join(wd, "drycblles.ini")), "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    m = Model(Ini(os.path.join(wd, "drycblles.ini")), "run", "drycblles", workdir=wd)
    m.finish_setup()
    s, _t = m.run()

    g = m.grid
    ks, ke = g.kstart, g.kend
    th = np.asarray(s["th"])
    w = np.asarray(s["w"])
    assert np.all(np.isfinite(th))
    assert np.all(np.isfinite(w))

    # Convection spun up: turbulent w present.
    assert np.abs(w[ks:ke]).max() > 0.01

    # Heat input: with flux 0.1 K m/s over 300 s the mean th must rise by
    # ~ flux*t/zsize-ish; check the domain-integrated th increased.
    th_prof = th[ks:ke].mean(axis=(1, 2))
    th0 = 300. + 0.003 * g.z[ks:ke]
    heat_in = np.sum((th_prof - th0) * g.dz[ks:ke])
    expected = 0.1 * 300.  # flux * time
    assert heat_in == pytest.approx(expected, rel=0.15), heat_in

    # Surface layer became superadiabatic (unstable) near the wall.
    assert th_prof[0] > th0[0]

    # Obukhov length negative (unstable), ustar positive
    sfc = {k: np.asarray(v) for k, v in m.final_sfc.items()}
    assert np.all(sfc["obuk"] < 0.)
    assert np.all(sfc["ustar"] > 0.)

    # status file exists and has no NaNs
    out = open(os.path.join(wd, "drycblles.out")).read()
    assert "nan" not in out.lower()


def test_most_lut_roundtrip():
    """The z/L lookup must invert the MO relation: for a given zL, computing
    Ri from the MO functions and looking zL back up reproduces zL."""
    import jax.numpy as jnp
    from microhh_tpu.ops import most

    z0m, z0h, zsl = 0.1, 0.1, 25.
    zL_sl, f_sl = most.prepare_lut(z0m, z0h, zsl, True, True)
    assert np.all(np.diff(f_sl.astype(np.float64)) >= 0), "f_sl must be non-decreasing"

    # Test within the strictly increasing (physically solvable) range.
    zL_test = np.array([-100., -5., -0.5, -0.01, 0.01, 0.5])
    Ri = np.interp(zL_test, zL_sl.astype(np.float64), f_sl.astype(np.float64))
    zL_back = np.asarray(most.lookup_zL(jnp.asarray(zL_sl), jnp.asarray(f_sl),
                                        jnp.asarray(Ri)))
    assert np.allclose(zL_back, zL_test, rtol=1e-3, atol=1e-4)
