"""Full-spectral-width RRTMGP: the 256 LW / 224 SW g-point synthetic
k-distribution (rte-rrtmgp table dims, make_rrtmgp_coefficients
configure(full=True)) must load and produce physical fluxes through the
per-g-point path — the size class the reference runs in production
(radiation_rrtmgp.cxx:775-900)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "python"))


@pytest.fixture(scope="module")
def full_tables(tmp_path_factory):
    import make_rrtmgp_coefficients as mk
    wd = str(tmp_path_factory.mktemp("rrtmgp_full"))
    mk.configure(full=True)
    try:
        mk.main(wd)
    finally:
        mk.configure(full=False)
    return wd


def test_full_width_tables_load(full_tables):
    from microhh_tpu.ops.rrtmgp_optics import KDistribution
    lw = KDistribution(os.path.join(full_tables, "coefficients_lw.nc"))
    sw = KDistribution(os.path.join(full_tables, "coefficients_sw.nc"))
    assert lw.n_gpt == 256 and sw.n_gpt == 224
    assert lw.kmajor.shape[:3] == (14, 60, 9)   # ntemp, npress+1, neta
    # solar source integrates to the solar constant
    assert abs(np.asarray(sw.solar_source).sum() - 1361.) < 1.


def test_full_width_column_fluxes(full_tables):
    """A midlatitude-ish column through the full 480-g-point path: OLR
    and surface SW in physical ranges, flux profiles finite/monotone
    where they must be."""
    import jax.numpy as jnp
    from microhh_tpu.ops.rrtmgp_optics import KDistribution

    # reuse the spectral-case harness: a tiny rcemip model wired to the
    # full tables by dropping them into its case dir
    from test_rrtmgp_spectral_case import build_case_model

    m = build_case_model(itot=4, ktot=48, coeff_dir=full_tables)
    rad = m.radiation
    assert rad.kdist_lw.n_gpt == 256
    assert rad.kdist_sw.n_gpt == 224
    ctx = m.ctx
    st = m.fields.create(m.input_nc, dtype=m.dtype)
    s, _, _sfc = m.as_device_state(st)
    rad._latlon = (rad.lat, rad.lon)
    tend, sfc_out = rad._compute(ctx, s, jnp.asarray(0., m.dtype), m.thermo)
    assert np.isfinite(np.asarray(tend)).all()
    lw_up = float(np.asarray(sfc_out["lw_flux_up"]).mean())
    sw_dn = float(np.asarray(sfc_out["sw_flux_dn"]).mean())
    # surface LW up ~ sigma T^4 of a warm surface; SW reaches the ground
    assert 250. < lw_up < 600., lw_up
    assert 0. < sw_dn < 1400., sw_dn
