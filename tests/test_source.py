"""Scalar emission sources (reference ``src/source.cxx``): exact blob
normalization and the time-dependent strength/location path
(source.cxx:215-236,318-404)."""

import numpy as np
import jax.numpy as jnp

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.utils import nc


INI = """
[grid]
itot=32
jtot=16
ktot=16
xsize=3200.
ysize=1600.
zsize=1600.
swspatialorder=2

[advec]
swadvec=0

[diff]
swdiff=0

[fields]
visc=0.
slist=co2

[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.

[source]
swsource=1
sourcelist=co2
source_x0=1600.
source_y0=800.
source_z0=300.
sigma_x=100.
sigma_y=100.
sigma_z=50.
strength=2.5
%(extra)s

[time]
starttime=0
endtime=10.
savetime=10.
dt=1.
"""


def _write_timedep_nc(path):
    ds = nc.Dataset(str(path), "w")
    g = ds.createGroup("timedep")
    g.createDimension("time_source", 3)
    tv = g.createVariable("time_source", "f8", ("time_source",))
    tv[:] = [0., 100., 200.]
    for name, vals in (("source_strength_0", [1., 3., 5.]),
                       ("source_x0_0", [800., 1600., 2400.]),
                       ("source_y0_0", [800., 800., 800.]),
                       ("source_z0_0", [300., 500., 700.])):
        v = g.createVariable(name, "f8", ("time_source",))
        v[:] = vals
    ds.close()


def _make_model(tmp_path, extra=""):
    m = Model(Ini(INI % {"extra": extra}), "run", "src",
              workdir=str(tmp_path))
    m.finish_setup()
    return m


def _emitted_rate(m, t):
    g = m.grid
    dz = g.dz[g.kstart:g.kend][:, None, None]
    return float(np.sum(np.asarray(t["co2"][g.kstart:g.kend]) * g.dx * g.dy * dz))


def test_static_source_exact_rate(tmp_path):
    """The discrete blob integral equals the prescribed strength exactly."""
    m = _make_model(tmp_path)
    st = m.fields.create(None, dtype=m.dtype)
    s, t, sfc = m.as_device_state(st)
    t2 = m.source(m.ctx, s, t, {}, sfc)
    assert abs(_emitted_rate(m, t2) - 2.5) < 1e-9


def test_profile_emission(tmp_path):
    """sw_profile: the z-shape comes from init-group emission profiles
    (source.cxx:224-244); emitted rate stays exactly the strength."""
    ktot = 16
    ds = nc.Dataset(str(tmp_path / "src_input.nc"), "w")
    g = ds.createGroup("init")
    g.createDimension("z", ktot)
    prof = np.zeros(ktot)
    prof[4:8] = [0.5, 1.0, 1.0, 0.25]    # elevated stack layer
    v = g.createVariable("emission_profile_0", "f8", ("z",))
    v[:] = prof
    ds.close()
    m = _make_model(tmp_path, extra="sw_profile=1\nprofile_index=0")
    st = m.fields.create(None, dtype=m.dtype)
    s, t, sfc = m.as_device_state(st)
    t2 = m.source(m.ctx, s, t, {}, sfc)
    assert abs(_emitted_rate(m, t2) - 2.5) < 1e-9
    fld = np.asarray(t2["co2"][m.grid.kstart:m.grid.kend])
    # emission confined to (and shaped like) the profile levels
    assert fld[:4].max() == 0. and fld[8:].max() == 0.
    col = fld[:, 8, 16]
    np.testing.assert_allclose(col[4:8] / col[5], prof[4:8], rtol=1e-12)


def test_profile_with_line_rejected(tmp_path):
    import pytest
    ds = nc.Dataset(str(tmp_path / "src_input.nc"), "w")
    g = ds.createGroup("init")
    g.createDimension("z", 16)
    g.createVariable("emission_profile_0", "f8", ("z",))[:] = np.ones(16)
    ds.close()
    with pytest.raises(ValueError, match="line emissions"):
        _make_model(tmp_path, extra="sw_profile=1\nprofile_index=0\nline_x=200.")


def test_timedep_strength_and_location(tmp_path):
    """swtimedep_strength/location: the emitted rate follows the interpolated
    strength and the blob centroid follows the interpolated location."""
    _write_timedep_nc(tmp_path / "src_input.nc")
    m = _make_model(tmp_path,
                    extra="swtimedep_strength=1\nswtimedep_location=1")
    st = m.fields.create(None, dtype=m.dtype)
    s, t, sfc = m.as_device_state(st)
    g = m.grid
    from microhh_tpu.timeloop import IFACTOR

    for time_s, want_strength, want_x0, want_z0 in (
            (0., 1., 800., 300.), (50., 2., 1200., 400.),
            (150., 4., 2000., 600.)):
        sfc2 = m.source.update_timedep(sfc, int(time_s * IFACTOR))
        t2 = m.source(m.ctx, s, {k: jnp.zeros_like(v) for k, v in t.items()},
                      {}, sfc2)
        rate = _emitted_rate(m, t2)
        assert abs(rate - want_strength) < 1e-9 * max(1., want_strength), rate
        # centroid of the emission blob tracks the interpolated location
        fld = np.asarray(t2["co2"][g.kstart:g.kend])
        x = g.x[None, None, :]
        z = g.z[g.kstart:g.kend][:, None, None]
        cx = (fld * x).sum() / fld.sum()
        cz = (fld * z).sum() / fld.sum()
        assert abs(cx - want_x0) < g.dx, (cx, want_x0)
        assert abs(cz - want_z0) < 2 * (g.zsize / g.ktot), (cz, want_z0)
