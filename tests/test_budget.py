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


def test_budget_profiles_on_4th_order_grid(tmp_path):
    """The budget machinery must produce finite profiles on a 4th-order
    grid (swbudget=4 currently evaluates the 2nd-order forms; the grid
    carries kgc=3 ghosts, which the kernels must tolerate)."""
    import jax.numpy as jnp
    from microhh_tpu.budget import budget2_profiles
    m = _model4(tmp_path)
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
    prof = budget2_profiles(ctx, s, aux, None, 1e-5)
    for name, val in prof.items():
        assert np.isfinite(np.asarray(val)).all(), name
    assert np.asarray(prof["tke_diss"]).max() <= 1e-14


def test_budget_closure_channel():
    """Gold-standard consistency check: in a decaying turbulent channel
    the tke budget terms must sum to d<tke>/dt measured by stepping the
    model (central difference over one small step).  Closure holds to a
    few percent of the dominant term away from the walls."""
    import jax.numpy as jnp
    from microhh_tpu.budget import budget2_profiles
    ini = """
[grid]
itot=16
jtot=16
ktot=16
xsize=6.28
ysize=3.14
zsize=2.
swspatialorder=2
[advec]
swadvec=2
cflmax=1.0
[diff]
swdiff=2
dnmax=0.3
[thermo]
swthermo=0
[fields]
visc=3e-2
svisc=3e-2
rndseed=4
rndamp=0.1
rndz=2.0
rndexp=0.
[boundary]
mbcbot=noslip
mbctop=noslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
[time]
starttime=0
endtime=1
savetime=1
dt=0.005
adaptivestep=false
"""
    m = Model(Ini(ini), "run", "bcl")
    m.finish_setup()
    m.build_step()
    g = m.grid
    ks, ke = g.kstart, g.kend
    s = m.fields.create(None)
    s = {k: jnp.asarray(v) for k, v in s.items()}
    s = m.boundary.set_ghost_cells(m.ctx, s, {})

    dt = 0.005
    # spin up so the field is divergence-free and smooth (closure error is
    # the truncation/commutation residual, which shrinks with smoothness);
    # the last step's aux carries the diagnostic pressure the budget uses
    aux = {}
    for _ in range(60):
        s, _sfc, aux = m._step_fn(s, {}, m.pres_params, jnp.asarray(dt),
                                  jnp.asarray(0.))

    prof = budget2_profiles(m.ctx, s, aux, None, m.fields.visc)

    def tke_prof(state):
        p = budget2_profiles(m.ctx, state, None, None, m.fields.visc)
        return np.asarray(p["tke"])

    # _step_fn donates its state buffers: take tke before stepping
    tke0 = tke_prof(s)
    s1, _sfc, _aux = m._step_fn(s, {}, m.pres_params, jnp.asarray(dt),
                                jnp.asarray(0.))
    dtke_dt = (tke_prof(s1) - tke0) / dt

    total = sum(np.asarray(prof[k]) for k in
                ("tke_shear", "tke_turb", "tke_pres", "tke_visc", "tke_diss"))
    scale = np.abs(np.asarray(prof["tke_diss"])).max()
    err = np.abs(total - dtke_dt)[2:-2]
    assert scale > 0.
    assert err.max() < 0.15 * scale, (err.max(), scale)


def test_budget4_closure_channel():
    """Order-4 closure: the true 4th-order tke budget terms
    (microhh_tpu/budget4.py) must sum to d<tke>/dt measured by stepping
    the 4th-order model."""
    import jax.numpy as jnp
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    from microhh_tpu.budget4 import budget4_profiles
    ini = """
[grid]
itot=16
jtot=16
ktot=16
xsize=6.28
ysize=3.14
zsize=2.
swspatialorder=4
[advec]
swadvec=4
cflmax=1.0
[diff]
swdiff=4
dnmax=0.3
[thermo]
swthermo=0
[fields]
visc=3e-2
svisc=3e-2
rndseed=4
rndamp=0.1
rndz=2.0
rndexp=0.
[boundary]
mbcbot=noslip
mbctop=noslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
[time]
starttime=0
endtime=1
savetime=1
dt=0.005
adaptivestep=false
"""
    m = Model(Ini(ini), "run", "bcl4")
    m.finish_setup()
    m.build_step()
    g = m.grid
    s = m.fields.create(None)
    s = {k: jnp.asarray(v) for k, v in s.items()}
    s = m.boundary.set_ghost_cells(m.ctx, s, {})

    dt = 0.005
    aux = {}
    for _ in range(60):
        s, _sfc, aux = m._step_fn(s, {}, m.pres_params, jnp.asarray(dt),
                                  jnp.asarray(0.))

    s_g = m.boundary.set_ghost_cells(m.ctx, s, {})
    prof = budget4_profiles(m.ctx, s_g, aux, None, m.fields.visc)
    for name, val in prof.items():
        assert np.isfinite(np.asarray(val)).all(), name
    assert np.asarray(prof["tke_diss"]).max() <= 1e-12

    def tke_prof(state):
        state = m.boundary.set_ghost_cells(m.ctx, state, {})
        p = budget4_profiles(m.ctx, state, None, None, m.fields.visc)
        return np.asarray(p["tke"])

    tke0 = tke_prof(s)
    s1, _sfc, _aux = m._step_fn(s, {}, m.pres_params, jnp.asarray(dt),
                                jnp.asarray(0.))
    dtke_dt = (tke_prof(s1) - tke0) / dt

    total = sum(np.asarray(prof[k]) for k in
                ("tke_shear", "tke_turb", "tke_pres", "tke_visc",
                 "tke_diss"))
    scale = np.abs(np.asarray(prof["tke_diss"])).max()
    err = np.abs(total - dtke_dt)[3:-3]
    assert scale > 0.
    # commutation/truncation residual: measured 0.28 at 16^3, 0.15 at
    # 24^3 (converging ~2nd order in the mean) -- bound with headroom
    assert err.max() < 0.35 * scale, (err.max(), scale)


def _sorted_prof_scalar(data, z, dz, ks, ke, nmax):
    """Scalar transliteration of calc_sorted_prof (budget_4.cxx:2565-2692),
    interior rows only."""
    vals = data[ks:ke]
    ktot, jtot, itot = vals.shape
    minval = vals.min()
    maxval = vals.max() * (1. + 1e-9)
    rng = maxval - minval
    prof = np.zeros(ktot)
    if rng < 1e-16:
        prof[:] = minval
        return prof
    dbin = rng / (nmax - 1)
    minv = minval - 0.5 * dbin
    bins = np.zeros(nmax)
    nslice = itot * jtot
    for k in range(ks, ke):
        dzs = dz[k] / nslice
        for j in range(jtot):
            for i in range(itot):
                bins[int((data[k, j, i] - minv) / dbin)] += dzs
    index = 0
    zbin = 0.5 * bins[0]
    profval = minv + 0.5 * dbin
    for kk, k in enumerate(range(ks, ke)):
        while zbin < z[k]:
            zbin += 0.5 * (bins[index] + bins[index + 1])
            profval += dbin
            index += 1
        if index == 0:
            prof[kk] = profval
        else:
            dzfrac = (zbin - z[k]) / (0.5 * (bins[index - 1] + bins[index]))
            prof[kk] = profval - dzfrac * dbin
    return prof


def test_sorted_buoyancy_profile_matches_reference_binning():
    import jax.numpy as jnp
    from microhh_tpu.budget4 import sorted_buoyancy_prof

    class Ctx:
        pass

    rng = np.random.default_rng(7)
    kgc, ktot, jtot, itot = 3, 12, 6, 8
    kc = ktot + 2 * kgc
    ctx = Ctx()
    ctx.ks, ctx.ke = kgc, kgc + ktot
    dz = np.full(kc, 0.1)
    z = np.zeros(kc)
    z[kgc:kgc + ktot] = 0.05 + 0.1 * np.arange(ktot)
    ctx.dz = jnp.asarray(dz)
    ctx.z = jnp.asarray(z)

    # stably-stratified buoyancy + noise; raw field incl. garbage ghosts
    b = rng.normal(size=(kc, jtot, itot))
    b[kgc:kgc + ktot] += np.linspace(0., 1., ktot)[:, None, None]

    want = _sorted_prof_scalar(b, z, dz, ctx.ks, ctx.ke,
                               nmax=itot * jtot * ktot)
    got = np.asarray(sorted_buoyancy_prof(ctx, jnp.asarray(b)))
    assert got.shape == (ktot,)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)

    # near-uniform field still goes through the binning (the reference's
    # uniform guard only fires below 1e-16); a zero field takes the guard
    bu = np.full((kc, jtot, itot), 0.3)
    gu = np.asarray(sorted_buoyancy_prof(ctx, jnp.asarray(bu)))
    wu = _sorted_prof_scalar(bu, z, dz, ctx.ks, ctx.ke,
                             nmax=itot * jtot * ktot)
    np.testing.assert_allclose(gu, wu, rtol=1e-12, atol=1e-14)
    b0 = np.zeros((kc, jtot, itot))
    g0 = np.asarray(sorted_buoyancy_prof(ctx, jnp.asarray(b0)))
    np.testing.assert_allclose(g0, 0.0, atol=0.)

    # monotone ordering: sorted profile of a stratified field increases
    assert (np.diff(got) > -1e-12).all()
