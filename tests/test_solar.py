"""Solar position + UTC calendar anchor (radiation_rrtmgp_functions.h:41-88,
timeloop.cxx:73-77,545-580, grid.cxx:387-401)."""

import numpy as np

from microhh_tpu.ops.radiation import (calc_cos_zenith_angle, utc_anchor,
                                       utc_zenith)


def _ref_cos_zenith(lat, lon, day_of_year, seconds_since_midnight, year):
    """Numpy transliteration of the reference header for the oracle."""
    pi = np.pi
    leap = (year % 4 == 0) and ((year % 100 != 0) or (year % 400 == 0))
    days_per_year = 366 if leap else 365
    doy = day_of_year - 1
    radlat = lat * pi / 180.
    radlon = lon * pi / 180.
    doy_pi = 2. * pi * doy / days_per_year
    decl = (0.006918 - 0.399912 * np.cos(doy_pi) + 0.070257 * np.sin(doy_pi)
            - 0.006758 * np.cos(2 * doy_pi) + 0.000907 * np.sin(2 * doy_pi)
            - 0.002697 * np.cos(3 * doy_pi) + 0.00148 * np.sin(3 * doy_pi))
    a1 = (1.00554 * doy - 6.28306) * pi / 180.
    a2 = (1.93946 * doy + 23.35089) * pi / 180.
    a3 = (7.67825 * np.sin(a1) + 10.09176 * np.sin(a2)) / 60.
    hour_solar = seconds_since_midnight / 3600. - a3 + radlon * (180. / pi / 15.)
    hour_angle = (hour_solar - 12.) * 15. * (pi / 180.)
    return (np.sin(radlat) * np.sin(decl)
            + np.cos(radlat) * np.cos(decl) * np.cos(hour_angle))


def test_cos_zenith_oracle():
    rng = np.random.default_rng(7)
    for _ in range(50):
        lat = rng.uniform(-80., 80.)
        lon = rng.uniform(-180., 180.)
        doy = int(rng.integers(1, 366))
        ssm = rng.uniform(0., 86400.)
        year = int(rng.integers(1990, 2030))
        got = float(calc_cos_zenith_angle(lat, lon, float(doy), ssm, year))
        want = _ref_cos_zenith(lat, lon, doy, ssm, year)
        assert abs(got - want) < 1e-10, (lat, lon, doy, ssm, year)


def test_cos_zenith_physical():
    # Cabauw (51.97N, 4.93E) at local solar noon near the summer solstice:
    # zenith angle ~ |lat - 23.44 declination|
    mu = float(calc_cos_zenith_angle(51.97, 4.93, 172., 12 * 3600., 2016))
    expected = np.cos(np.deg2rad(51.97 - 23.44))
    assert abs(mu - expected) < 0.02
    # midnight: sun below horizon
    mu_night = float(calc_cos_zenith_angle(51.97, 4.93, 172., 0., 2016))
    assert mu_night < 0.


class _FakeIni:
    def __init__(self, txt):
        self.txt = txt

    def get_str(self, group, item, default=None):
        return self.txt


def test_utc_anchor_and_zenith():
    a = utc_anchor(_FakeIni("2016-08-21 06:00:00"))
    assert a is not None
    soy, year = a
    assert year == 2016
    # 2016-08-21 is doy 234 (leap year), 06:00 UTC
    assert abs(soy - ((234 - 1) * 86400. + 6 * 3600.)) < 1e-6
    # utc_zenith at +6h of model time == direct call at noon of doy 234
    got = float(utc_zenith(a, 51.97, 4.93, 6 * 3600.))
    want = float(calc_cos_zenith_angle(51.97, 4.93, 234., 12 * 3600., 2016))
    assert abs(got - want) < 1e-12
    assert utc_anchor(_FakeIni("")) is None


def test_timeloop_calendar():
    from microhh_tpu.config import Ini
    from microhh_tpu.timeloop import Timeloop
    ini = Ini("""
[time]
starttime=0
endtime=3600
savetime=3600
dt=10.
datetime_utc=2016-08-21 06:00:00
""")
    tl = Timeloop(ini, "run")
    assert abs(tl.calc_day_of_year(0.) - (234. + 0.25)) < 1e-9
    assert abs(tl.calc_hour_of_day(0.) - 6.) < 1e-12
    assert tl.get_year(0.) == 2016
    # crossing midnight advances the day
    assert abs(tl.calc_day_of_year(18.5 * 3600.) - (235. + 0.5 / 24.)) < 1e-9
