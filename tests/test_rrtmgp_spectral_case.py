"""End-to-end FULL-SPECTRAL RRTMGP: a case run with the in-repo reduced
k-distribution + cloud-LUT files (python/make_rrtmgp_coefficients.py) must
take the table-driven g-point path — per-g-point major+minor gas optics,
Planck fractions, solar source, Rayleigh, LUT cloud optics — and produce
physically sane fluxes and heating rates (round-4 item 6; reference
radiation_rrtmgp.cxx:775-900,1354+)."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

from test_radiation_rrtmgp import INI

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "python"))


def build_case_model(itot=None, ktot=24, coeff_dir=None, wd=None):
    """Case model on the spectral path; ``coeff_dir``: an existing
    directory holding the four coefficient NetCDFs (e.g. the full-width
    set) to use instead of generating the reduced defaults."""
    import shutil
    import tempfile
    from microhh_tpu.utils import nc
    wd = wd or tempfile.mkdtemp(prefix="rrtmgp_case_")
    if coeff_dir is None:
        import make_rrtmgp_coefficients
        make_rrtmgp_coefficients.main(wd)
    else:
        for name in ("coefficients_lw.nc", "coefficients_sw.nc",
                     "cloud_coefficients_lw.nc", "cloud_coefficients_sw.nc"):
            shutil.copy(os.path.join(coeff_dir, name), wd)
    _write_input(wd, ktot)
    import re
    ini = re.sub(r"(?m)^ktot=.*$", "ktot=%d" % ktot, INI)
    if itot is not None:
        ini = re.sub(r"(?m)^itot=.*$", "itot=%d" % itot, ini)
        ini = re.sub(r"(?m)^jtot=.*$", "jtot=%d" % itot, ini)
    m = Model(Ini(ini), "run", "rad", workdir=wd)
    m.finish_setup()
    return m


def _write_input(wd, ktot):
    from microhh_tpu.utils import nc
    z = np.linspace(50., 2350., ktot)
    f = nc.Dataset(os.path.join(wd, "rad_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 290. + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.009 - 3e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 3.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    r = f.createGroup("radiation")
    nbg = 10
    r.createDimension("lay", nbg)
    r.createVariable("p_lay", "f8", ("lay",))[:] = np.geomspace(7.0e4, 1.0e3, nbg)
    r.createVariable("t_lay", "f8", ("lay",))[:] = np.linspace(265., 220., nbg)
    r.createVariable("h2o", "f8", ("lay",))[:] = np.geomspace(3e-3, 3e-6, nbg)
    f.close()


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import make_rrtmgp_coefficients
    from microhh_tpu.utils import nc
    wd = str(tmp_path_factory.mktemp("rrtmgp_full"))
    make_rrtmgp_coefficients.main(wd)
    ktot = 24
    z = np.linspace(50., 2350., ktot)
    f = nc.Dataset(os.path.join(wd, "rad_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = 290. + 0.004 * z
    g.createVariable("qt", "f8", ("z",))[:] = 0.009 - 3e-6 * z
    g.createVariable("u", "f8", ("z",))[:] = np.full(ktot, 3.)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    r = f.createGroup("radiation")
    nbg = 10
    r.createDimension("lay", nbg)
    r.createVariable("p_lay", "f8", ("lay",))[:] = np.geomspace(7.0e4, 1.0e3, nbg)
    r.createVariable("t_lay", "f8", ("lay",))[:] = np.linspace(265., 220., nbg)
    r.createVariable("h2o", "f8", ("lay",))[:] = np.geomspace(3e-3, 3e-6, nbg)
    f.close()
    m = Model(Ini(INI), "run", "rad", workdir=wd)
    m.finish_setup()
    return m


def _state(m, qt=0.002):
    g = m.grid
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    thl = 290. + 0.004 * np.asarray(g.z)
    s["thl"] = s["thl"] + jnp.asarray(thl[:, None, None])
    s["qt"] = s["qt"] + qt
    return s


def test_spectral_tables_loaded(model):
    rad = model.radiation
    assert rad.kdist_lw is not None and rad.kdist_lw.is_lw
    assert rad.kdist_sw is not None and not rad.kdist_sw.is_lw
    assert rad.cloud_lw is not None and rad.cloud_sw is not None
    assert rad.kdist_lw.minor          # O3 window minor gas active
    # solar constant comes from the table, not the stand-in
    assert abs(float(np.sum(rad.kdist_sw.solar_source)) - 1361.) < 1.


def test_spectral_fluxes_and_heating_rates(model):
    m = model
    ctx, g = m.ctx, m.grid
    ks, ke = g.kstart, g.kend
    s = _state(m)
    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    aux = {}
    t2, _sfc = m.radiation.exec(ctx, s, t, {}, aux, 43200., m.thermo)

    # clear-sky envelopes (spectral path): surface SW within the solar
    # constant budget, LW down plausible for a ~290 K boundary layer
    mu0 = float(np.cos(0.5))
    sw_dn = float(np.asarray(aux["sw_flux_dn_sfc"]).mean())
    lw_dn = float(np.asarray(aux["lw_flux_dn_sfc"]).mean())
    lw_up = float(np.asarray(aux["lw_flux_up_sfc"]).mean())
    assert 0.35 * 1361 * mu0 < sw_dn < 1361 * mu0, sw_dn
    assert 150. < lw_dn < 420., lw_dn
    assert 300. < lw_up < 460., lw_up   # ~sigma*293^4 ~ 418

    # heating rates: finite, nonzero, inside +-40 K/day everywhere
    hr = np.asarray(t2["thl"])[ks:ke] * 86400.
    assert np.isfinite(hr).all()
    assert np.abs(hr).max() < 40., np.abs(hr).max()
    assert np.abs(hr).max() > 0.05     # the column is radiatively active


def test_spectral_cloud_lut_shades_surface(model):
    m = model
    ctx, g = m.ctx, m.grid
    clear = _state(m, qt=0.002)
    cloudy = _state(m, qt=0.002)
    # saturate a mid-level slab -> LWP through the cloud LUT
    cloudy["qt"] = cloudy["qt"].at[g.kstart + 10:g.kstart + 14].add(0.012)

    out = {}
    for name, s in (("clear", clear), ("cloudy", cloudy)):
        aux = {}
        t = {n: jnp.zeros_like(v) for n, v in s.items()}
        m.radiation.exec(ctx, s, t, {}, aux, 43200., m.thermo)
        out[name] = {k: float(np.asarray(v).mean()) for k, v in aux.items()
                     if k.endswith("_sfc")}
    assert out["cloudy"]["sw_flux_dn_sfc"] < 0.7 * out["clear"]["sw_flux_dn_sfc"]
    # cloud base radiates downward: LW down increases under the deck
    assert out["cloudy"]["lw_flux_dn_sfc"] > out["clear"]["lw_flux_dn_sfc"]


def test_spectral_full_model_steps(model):
    """A few full RK3 steps through the g-point-scanned spectral path."""
    m = model
    m.build_step()
    g = m.grid
    st = m.fields.create(m.input_nc, dtype=m.dtype)
    s, t, sfc = m.as_device_state(st)
    dt = jnp.asarray(2.0, dtype=m.dtype)
    for i in range(3):
        s, sfc, aux = m._step_raw(s, sfc, m.pres_params, dt,
                                  jnp.asarray(2. * i, dtype=m.dtype))
    ks, ke = g.kstart, g.kend
    for n in ("thl", "qt", "u", "w"):
        assert np.isfinite(np.asarray(s[n])[ks:ke]).all(), n
