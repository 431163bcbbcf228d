"""Immersed boundary (DEM ghost-cell method): geometry precompute + flow
deflection over a Gaussian hill."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

INI = """
[grid]
itot=32
jtot=8
ktot=24
xsize=640.
ysize=160.
zsize=480.
swspatialorder=2

[advec]
swadvec=2
cflmax=1.0

[diff]
swdiff=smag2
dnmax=0.3

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
visc=1.e-4
svisc=1.e-4
slist=s1

[IB]
swib=dem
n_idw_points=4
sbcbot=flux
sbot[s1]=0.

[time]
starttime=0
endtime=60
savetime=60
dt=0.5
dtmax=1.0
adaptivestep=true
"""


def make_dem(wd):
    itot, jtot = 32, 8
    dx, dy = 640. / itot, 160. / jtot
    x = (np.arange(itot) + 0.5) * dx
    hill = 120. * np.exp(-0.5 * ((x - 320.) / 60.) ** 2)
    dem = np.broadcast_to(hill[None, :], (jtot, itot)).astype(np.float64).copy()
    dem.tofile(os.path.join(wd, "dem.0000000"))
    return dem


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ib"))
    make_dem(wd)
    with open(os.path.join(wd, "ib.ini"), "w") as fh:
        fh.write(INI)
    m = Model(Ini(INI), "run", "ib", workdir=wd)
    m.finish_setup()
    return m


def test_ghost_geometry(model):
    ib = model.ib
    assert ib.active
    for loc in ("u", "v", "w", "s"):
        gs = ib.ghost[loc]
        assert gs.n > 0, loc
        assert (gs.c_sum > 0).all()
        # all ghost cells are below the terrain at their own column
        g = model.grid
        z = g.zh if loc == "w" else g.z
        x = g.xh if loc == "u" else g.x
        for m_ in range(0, gs.n, max(1, gs.n // 10)):
            zd = ib._interp2_dem(x[gs.gi[m_]],
                                 (g.yh if loc == "v" else g.y)[gs.gj[m_]])
            assert z[gs.gk[m_]] <= zd
        # all interpolation points lie outside the terrain
        zi = z[gs.ip_k]
        for m_ in range(0, gs.n, max(1, gs.n // 10)):
            for q in range(ib.n_idw - (1 if loc != "s" else 0)):
                xq = x[gs.ip_i[m_, q]]
                yq = (g.yh if loc == "v" else g.y)[gs.ip_j[m_, q]]
                assert z[gs.ip_k[m_, q]] > ib._interp2_dem(xq, yq)


def test_dirichlet_wall_value(model):
    """For a smooth field, (ghost + image)/2 must approximate the wall value
    (zero for momentum)."""
    ib = model.ib
    g = model.grid
    ctx = model.ctx
    # linear-in-z velocity field: u = 0.01*z
    u = np.broadcast_to(0.01 * g.z[:, None, None],
                        (g.kcells, g.jtot, g.itot)).copy()
    s = {"u": jnp.asarray(u), "v": jnp.asarray(u), "w": jnp.asarray(u)}
    s2 = ib.exec_momentum(ctx, s)
    gs = ib.ghost["u"]
    ghost_vals = np.asarray(s2["u"])[gs.gk, gs.gj, gs.gi]
    # image values via the same IDW machinery on the UNMODIFIED field
    c = gs.c_idw
    vals = u[gs.ip_k, gs.ip_j, gs.ip_i]
    vI = ((c[:, :-1] * vals[:, :-1]).sum(axis=1)) / gs.c_sum
    wall = 0.5 * (ghost_vals + vI)
    assert np.abs(wall).max() < 0.2, "wall value should be ~0 (no slip)"


def test_flow_over_hill(model):
    """Impulsively started flow over a Gaussian ridge: air must rise on
    the windward slope and sink in the lee."""
    m = model
    m.build_step()
    g, ctx = m.grid, m.ctx
    ks, ke = g.kstart, g.kend
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    s["u"] = s["u"].at[ks:ke].set(4.0)
    sfc_np = m.boundary.init_surface_state()
    sfc = {k: jnp.asarray(v) for k, v in sfc_np.items()}
    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    dt = jnp.asarray(0.5)
    tz = jnp.asarray(0.0)
    for _ in range(40):
        s, sfc, aux = m._step_fn(s, sfc, m.pres_params, dt, tz)
    w = np.asarray(s["w"])
    assert np.isfinite(w).all()
    # hill crest at i=16 (x=320); sample w above the slopes at z~160 (k index)
    kq = ks + 9
    w_wind = w[kq, :, 10:14].mean()   # windward (x ~ 200-280)
    w_lee = w[kq, :, 18:22].mean()    # leeward
    assert w_wind > 0.005, ("windward updraft expected", w_wind)
    assert w_lee < -0.005, ("leeward downdraft expected", w_lee)


def test_ib_mask_stats(model, tmp_path):
    """masklist=ib produces area fractions matching the terrain volume."""
    from microhh_tpu.stats import MaskStats
    import jax.numpy as jnp
    m = model
    m.workdir = str(tmp_path)
    ms = MaskStats(m, ["ib"])
    g = m.grid
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    sfc_np = m.boundary.init_surface_state()
    sfc = {k: jnp.asarray(v) for k, v in sfc_np.items()}
    ms.exec(s, sfc, 0.)
    ms.close()
    from microhh_tpu.utils import nc
    f = nc.Dataset(str(tmp_path) + "/ib.ib.0000000.nc", "r")
    area = np.asarray(f.groups["default"].variables["area"][0])
    # bottom level partly inside the hill, top level fully outside
    assert area[0] < 1.0
    assert area[-1] == 1.0
    # area fraction increases with height (hill narrows upward)
    assert (np.diff(area) >= -1e-12).all()
