"""Reference-discretization parity: moist-thermo functions + sat_adjust.

The function family (esat/qsat/dqsat/exner/virtual T/buoyancy) must agree
pointwise at f64 roundoff; the vectorized fixed-iteration sat_adjust must
agree with the reference's convergence-criterion Newton to within the
reference's own stopping tolerance."""

import numpy as np
import pytest

from microhh_tpu.ops import thermo_moist as tm
from oracle_ref import thermo_moist_ref as ref


def test_function_family_parity():
    T = np.linspace(180., 330., 2000)
    p = np.linspace(4.e4, 1.05e5, 2000)
    np.testing.assert_allclose(tm.esat_liq(T), ref.esat_liq(T), rtol=1e-13)
    np.testing.assert_allclose(tm.esat_ice(T), ref.esat_ice(T), rtol=1e-13)
    np.testing.assert_allclose(tm.qsat_liq(p, T), ref.qsat_liq(p, T), rtol=1e-13)
    np.testing.assert_allclose(tm.qsat_ice(p, T), ref.qsat_ice(p, T), rtol=1e-13)
    np.testing.assert_allclose(tm.qsat(p, T), ref.qsat(p, T), rtol=1e-13)
    np.testing.assert_allclose(tm.water_fraction(T), ref.water_fraction(T), rtol=1e-13)
    np.testing.assert_allclose(tm.dqsatdT(p, T), ref.dqsatdT(p, T), rtol=1e-12)
    np.testing.assert_allclose(tm.exner(p), ref.exner(p), rtol=1e-13)

    rng = np.random.RandomState(0)
    thl = 250. + 60. * rng.rand(500)
    qt = 0.02 * rng.rand(500)
    ql = 0.2 * qt * rng.rand(500)
    qi = 0.1 * qt * rng.rand(500)
    exn = ref.exner(8.e4 + 2.e4 * rng.rand(500))
    thvref = 300. + rng.randn(500)
    np.testing.assert_allclose(
        tm.virtual_temperature(exn, thl, qt, ql, qi),
        ref.virtual_temperature(exn, thl, qt, ql, qi), rtol=1e-13)
    np.testing.assert_allclose(
        tm.buoyancy(exn, thl, qt, ql, qi, thvref),
        ref.buoyancy(exn, thl, qt, ql, qi, thvref), rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(
        tm.buoyancy_no_ql(thl, qt, thvref),
        ref.buoyancy_no_ql(thl, qt, thvref), rtol=1e-11, atol=1e-13)
    flx = rng.randn(500) * 0.1
    qtflx = 1e-4 * rng.randn(500)
    np.testing.assert_allclose(
        tm.buoyancy_flux_no_ql(thl, flx, qt, qtflx, thvref),
        ref.buoyancy_flux_no_ql(thl, flx, qt, qtflx, thvref),
        rtol=1e-10, atol=1e-13)


def test_sat_adjust_matches_reference():
    rng = np.random.RandomState(1)
    n = 400
    # span warm saturated, warm unsaturated, cold mixed-phase, very cold
    p = 3.e4 + 7.5e4 * rng.rand(n)
    exn = ref.exner(p)
    T_target = 200. + 130. * rng.rand(n)
    thl = T_target / exn
    qs_guess = ref.qsat(p, T_target)
    # 20%-180% of saturation, capped at a physical 40 g/kg
    qt = np.minimum(qs_guess * (0.2 + 1.6 * rng.rand(n)), 0.04)

    ql_m, qi_m, t_m, qs_m = tm.sat_adjust(thl, qt, p, exn)

    ql_o = np.empty(n)
    qi_o = np.empty(n)
    t_o = np.empty(n)
    qs_o = np.empty(n)
    for i in range(n):
        ql_o[i], qi_o[i], t_o[i], qs_o[i] = ref.sat_adjust_scalar(
            thl[i], qt[i], p[i], exn[i])

    # reference stops Newton at |dT|/T < 1e-5 (up to ~3e-3 K slack in its
    # answer); the fixed-iteration solver converges fully, so agreement is
    # bounded by the reference's own stopping tolerance
    np.testing.assert_allclose(t_m, t_o, rtol=0, atol=5e-3)
    np.testing.assert_allclose(ql_m, ql_o, rtol=0, atol=2e-6)
    np.testing.assert_allclose(qi_m, qi_o, rtol=0, atol=2e-6)
    np.testing.assert_allclose(qs_m, qs_o, rtol=0, atol=2e-6)

    # both phases and both saturation states must be exercised
    assert (ql_o > 1e-6).sum() > 30
    assert (qi_o > 1e-6).sum() > 30
    assert ((ql_o == 0.) & (qi_o == 0.)).sum() > 30


def test_sat_adjust_unsaturated_exact():
    """The unsaturated early-return must match bitwise (no Newton)."""
    p = np.array([9.e4, 7.e4, 5.e4])
    exn = ref.exner(p)
    thl = np.array([310., 300., 290.])   # warm and dry
    qt = np.array([1e-4, 1e-4, 1e-4])
    ql, qi, t, qs = tm.sat_adjust(thl, qt, p, exn)
    for i in range(3):
        qlo, qio, to, qso = ref.sat_adjust_scalar(thl[i], qt[i], p[i], exn[i])
        assert ql[i] == qlo == 0. and qi[i] == qio == 0.
        assert t[i] == to and qs[i] == qso
