"""TKE budget diagnostics: registration + rough balance sanity."""

import os
import numpy as np

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.stats import Stats
from microhh_tpu.utils import nc as ncmod

from test_drycblles import setup_case


def test_budget_group_written(tmp_path):
    wd = setup_case(tmp_path, itot=16, jtot=16, ktot=24, endtime=900.)
    ini = Ini(os.path.join(wd, "drycblles.ini"))
    m = Model(ini, "init", "drycblles", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    ini = Ini(os.path.join(wd, "drycblles.ini"))
    ini.items.setdefault("budget", {})["swbudget"] = {"": "2"}
    m = Model(ini, "run", "drycblles", workdir=wd)
    m.finish_setup()
    m.stats = Stats(m)
    m.run()
    m.stats.close()

    f = ncmod.Dataset(os.path.join(wd, "drycblles.default.0000000.nc"), "r")
    bud = f.groups["budget"]
    ktot = m.grid.ktot
    tke_shear = bud.variables["tke_shear"][:]
    tke_buoy = bud.variables["tke_buoy"][:]
    tke_diss = bud.variables["tke_diss"][:]
    assert tke_shear.shape[1] == ktot
    # in a convective BL, buoyancy production is positive in the lower
    # mixed layer once convection has spun up (~15 min)
    assert tke_buoy[-1, 1:8].mean() > 0.
    # dissipation is negative semidefinite
    assert np.all(tke_diss <= 1e-12)
    f.close()


def _model4(tmp_path):
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    ini = """
[grid]
itot=16
jtot=16
ktot=32
xsize=2.
ysize=2.
zsize=1.
swspatialorder=4
[advec]
cflmax=1.0
[diff]
swdiff=4
dnmax=0.3
[thermo]
swthermo=0
[fields]
visc=1e-5
svisc=1e-5
[boundary]
mbcbot=noslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
[time]
starttime=0
endtime=1
savetime=1
dt=0.01
[budget]
swbudget=4
"""
    m = Model(Ini(ini), "run", "b4", workdir=str(tmp_path))
    m.finish_setup()
    return m


def test_budget4_consistent_with_budget2(tmp_path):
    model4 = _model4(tmp_path)
    """On smooth large-scale fields the 4th-order budget terms must agree
    with the 2nd-order forms to discretization accuracy."""
    import jax.numpy as jnp
    from microhh_tpu.budget import budget_profiles
    m = model4
    ctx = m.ctx
    g = m.grid
    ks, ke = g.kstart, g.kend
    z = np.asarray(g.z)
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    x = (np.arange(g.itot) + 0.5) / g.itot
    s["u"] = s["u"] + jnp.asarray(np.sin(2 * np.pi * z / z[-1])[:, None, None]
                                  * (1. + 0.3 * np.cos(2 * np.pi * x))[None, None, :])
    s["w"] = s["w"].at[ks + 1:ke].set(0.1)
    s["w"] = s["w"] * jnp.asarray(
        np.sin(np.pi * np.asarray(g.zh) / g.zsize))[:, None, None]
    aux = {"p": jnp.zeros_like(s["u"])}
    p2 = budget_profiles(ctx, s, aux, None, 1e-5, order=2)
    p4 = budget_profiles(ctx, s, aux, None, 1e-5, order=4)
    for name in ("u2_shear", "u2_diss", "tke_turb"):
        a, b = np.asarray(p2[name]), np.asarray(p4[name])
        assert np.isfinite(b).all(), name
        scale = max(np.abs(a).max(), 1e-12)
        # interior agreement (walls differ by design of the one-sided forms)
        err = np.abs(a[4:-4] - b[4:-4]).max() / scale
        assert err < 0.1, (name, err)
