"""Fused Pallas LES kernels vs the reference jnp op pipeline: the fused
evisc and tendency passes must match advec_2 + diff_smag2 + thermo_dry
exactly (same math, same order of operations up to fusion)."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.ops.pallas_fused import (FusedLES2, fused_exec_viscosity,
                                          fused_tendencies)

INI = """
[grid]
itot=16
jtot=16
ktot=16
xsize=3200.
ysize=3200.
zsize=1200.
swspatialorder=2

[advec]
swadvec=2
cflmax=1.2

[diff]
swdiff=smag2
dnmax=0.3

[thermo]
swthermo=dry
swbasestate=boussinesq
thref0=300.
pbot=100000.

[boundary]
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot=0.1
stop=0.003
swboundary=surface
z0m=0.1
z0h=0.1

[fields]
visc=1.e-5
svisc=1.e-5

[time]
starttime=0
endtime=3600
savetime=3600
dt=6.
"""


@pytest.fixture(scope="module")
def setup():
    m = Model(Ini(INI), "run", "fused")
    m.finish_setup()
    g = m.grid
    rng = np.random.RandomState(3)
    s = {}
    for name in m.fields.prognostic_names:
        a = np.zeros((g.kcells, g.jtot, g.itot))
        a[g.kstart:g.kend] = 0.3 * rng.randn(g.ktot, g.jtot, g.itot)
        s[name] = a
    s["th"][g.kstart:g.kend] += 300. + 0.003 * g.z[g.kstart:g.kend, None, None]
    s["w"][g.kstart] = 0.
    s["w"][g.kend] = 0.
    s = {k: jnp.asarray(v) for k, v in s.items()}
    sfc_np = m.boundary.init_surface_state()
    sfc = {k: jnp.asarray(v) for k, v in sfc_np.items()}
    ctx = m.ctx
    s = m.boundary.set_ghost_cells(ctx, s, sfc)
    sfc = m.boundary.exec(ctx, s, sfc, {})
    s = m.boundary.set_ghost_cells(ctx, s, sfc)
    fused = FusedLES2(ctx, m.diff, m.thermo, True, interpret=True)
    return m, ctx, s, sfc, fused


def test_fused_evisc_matches(setup):
    m, ctx, s, sfc, fused = setup
    aux_ref = m.diff.exec_viscosity(ctx, s, sfc, {})
    aux_fused = fused_exec_viscosity(fused, ctx, s, sfc, {})
    a = np.asarray(aux_ref["evisc"])
    b = np.asarray(aux_fused["evisc"])
    ks, ke = ctx.ks, ctx.ke
    assert np.allclose(a[ks:ke], b[ks:ke], rtol=1e-12, atol=1e-14), \
        np.abs(a[ks:ke] - b[ks:ke]).max()


def test_tiled_evisc_matches(setup):
    m, ctx, s, sfc, fused = setup
    tiled = FusedLES2(ctx, m.diff, m.thermo, True, interpret=True,
                      tiled=True, tj=8)
    aux_ref = m.diff.exec_viscosity(ctx, s, sfc, {})
    aux_t = fused_exec_viscosity(tiled, ctx, s, sfc, {})
    a = np.asarray(aux_ref["evisc"])
    b = np.asarray(aux_t["evisc"])
    ks, ke = ctx.ks, ctx.ke
    assert np.allclose(a[ks:ke], b[ks:ke], rtol=1e-12, atol=1e-14), \
        np.abs(a[ks:ke] - b[ks:ke]).max()


def test_tiled_tendencies_match(setup):
    m, ctx, s, sfc, fused = setup
    tiled = FusedLES2(ctx, m.diff, m.thermo, True, interpret=True,
                      tiled=True, tj=8)
    aux = m.diff.exec_viscosity(ctx, s, sfc, {})
    t0 = {n: jnp.zeros_like(s[n]) for n in s}

    t_ref = m.thermo.exec(ctx, s, dict(t0), aux)
    t_ref = m.advec.exec(ctx, s, t_ref, aux)
    t_ref = m.diff.exec(ctx, s, t_ref, aux, sfc)

    t_t = fused_tendencies(tiled, ctx, s, dict(t0), aux, sfc)

    ks, ke = ctx.ks, ctx.ke
    for name in ("u", "v", "w", "th"):
        a = np.asarray(t_ref[name])[ks:ke]
        b = np.asarray(t_t[name])[ks:ke]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-12, (name, err)


def test_fused_tendencies_match(setup):
    m, ctx, s, sfc, fused = setup
    aux = m.diff.exec_viscosity(ctx, s, sfc, {})
    t0 = {n: jnp.zeros_like(s[n]) for n in s}

    # reference pipeline
    t_ref = m.thermo.exec(ctx, s, dict(t0), aux)
    t_ref = m.advec.exec(ctx, s, t_ref, aux)
    t_ref = m.diff.exec(ctx, s, t_ref, aux, sfc)

    # fused pipeline
    t_f = fused_tendencies(fused, ctx, s, dict(t0), aux, sfc)

    ks, ke = ctx.ks, ctx.ke
    for name in ("u", "v", "w", "th"):
        a = np.asarray(t_ref[name])[ks:ke]
        b = np.asarray(t_f[name])[ks:ke]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-12, (name, err)


def test_folded_buffer_coriolis_match(setup):
    """Folding the Rayleigh sponge and the geostrophic Coriolis term into
    the merged tendency kernel must reproduce the separate jnp Buffer and
    Force ops exactly (full-plane and j-tiled variants)."""
    m, ctx, s, sfc, _ = setup
    g = m.grid
    kt = g.ktot

    class FakeBuffer:
        fac_z = (0.001 * np.linspace(0., 1., kt) ** 2)[:, None, None]
        fac_zh = (0.001 * np.linspace(0.1, 1.1, kt) ** 2)[:, None, None]
        profs = {"u": np.linspace(1., 2., kt)[:, None, None],
                 "v": np.zeros((kt, 1, 1)),
                 "th": (300. + 0.003 * g.z[g.kstart:g.kend])[:, None, None]}
        swupdate = False

    class FakeForce:
        fc = 1.2e-4
        ug = np.linspace(3., 8., kt)[:, None, None]
        vg = np.linspace(-1., 1., kt)[:, None, None]

    aux = m.diff.exec_viscosity(ctx, s, sfc, {})
    t0 = {n: jnp.zeros_like(s[n]) for n in s}

    # reference: separate ops
    t_ref = m.thermo.exec(ctx, s, dict(t0), aux)
    t_ref = m.advec.exec(ctx, s, t_ref, aux)
    t_ref = m.diff.exec(ctx, s, t_ref, aux, sfc)
    ks, ke = ctx.ks, ctx.ke
    facz = jnp.asarray(FakeBuffer.fac_z)
    faczh = jnp.asarray(FakeBuffer.fac_zh)
    for n in ("u", "v", "th"):
        ref = jnp.asarray(FakeBuffer.profs[n])
        t_ref[n] = t_ref[n].at[ks:ke].add(-facz * (s[n][ks:ke] - ref))
    t_ref["w"] = t_ref["w"].at[ks:ke].add(-faczh * s["w"][ks:ke])
    from microhh_tpu.ops.stencil import im, ip, jm, jp
    fc = FakeForce.fc
    v_at_u = 0.25 * (s["v"] + ip(s["v"]) + jm(s["v"]) + jm(ip(s["v"])))[ks:ke]
    u_at_v = 0.25 * (s["u"] + im(s["u"]) + jp(s["u"]) + im(jp(s["u"])))[ks:ke]
    t_ref["u"] = t_ref["u"].at[ks:ke].add(fc * (v_at_u - jnp.asarray(FakeForce.vg)))
    t_ref["v"] = t_ref["v"].at[ks:ke].add(-fc * (u_at_v - jnp.asarray(FakeForce.ug)))
    t_ref["w"] = t_ref["w"].at[ks].set(0.)

    for tiled in (False, True):
        f = FusedLES2(ctx, m.diff, m.thermo, True, interpret=True,
                      tiled=tiled, tj=8, buffer=FakeBuffer(), force=FakeForce())
        t_f = fused_tendencies(f, ctx, s, dict(t0), aux, sfc)
        for name in ("u", "v", "w", "th"):
            a = np.asarray(t_ref[name])[ks:ke]
            b = np.asarray(t_f[name])[ks:ke]
            err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
            assert err < 1e-12, (tiled, name, err)


def test_fold_ghosts_matches(setup):
    """Ghost-free clamped-index kernels + wall patches must reproduce the
    ghost-filled pipeline exactly — proven with NaN ghost planes, so ANY
    accidental ghost read would poison the result."""
    m, ctx, s, sfc, fused = setup
    aux = m.diff.exec_viscosity(ctx, s, sfc, {})
    t0 = {n: jnp.zeros_like(s[n]) for n in s}

    # reference (ghost-filled) pipeline
    t_ref = m.thermo.exec(ctx, s, dict(t0), aux)
    t_ref = m.advec.exec(ctx, s, t_ref, aux)
    t_ref = m.diff.exec(ctx, s, t_ref, aux, sfc)

    # poison the ghost planes
    ks, ke = ctx.ks, ctx.ke
    s_bad = {}
    for n, a in s.items():
        a = a.at[:ks].set(jnp.nan)
        a = a.at[ke + (1 if n == "w" else 0):].set(jnp.nan)
        s_bad[n] = a

    for tiled in (False, True):
        f = FusedLES2(ctx, m.diff, m.thermo, True, interpret=True,
                      tiled=tiled, tj=8, fold_ghosts=True,
                      top_grad_th=float(m.boundary.bcs["th"].top))
        aux_f = fused_exec_viscosity(f, ctx, s_bad, sfc, {})
        assert np.all(np.isfinite(np.asarray(aux_f["evisc_int"])))
        ev_ref = np.asarray(aux["evisc"])[ks:ke]
        ev_f = np.asarray(aux_f["evisc_int"])
        assert np.allclose(ev_ref, ev_f, rtol=1e-12, atol=1e-14), \
            (tiled, np.abs(ev_ref - ev_f).max())

        t_f = fused_tendencies(f, ctx, s_bad, dict(t0), aux_f, sfc)
        for name in ("u", "v", "w", "th"):
            a = np.asarray(t_ref[name])[ks:ke]
            b = np.asarray(t_f[name])[ks:ke]
            assert np.all(np.isfinite(b)), (tiled, name)
            err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
            assert err < 1e-12, (tiled, name, err)


def test_sharded_fused_matches_single_device():
    """Fused kernels under a 2x4 mesh (shard_map + ppermute halo exchange)
    must reproduce the single-device fused step bitwise (f64, CPU)."""
    import jax
    from microhh_tpu.parallel import mesh as pmesh

    INI_RUN = INI.replace("endtime=3600", "endtime=12").replace(
        "savetime=3600", "savetime=12")

    def build(mesh):
        m = Model(Ini(INI_RUN), "run", "fused_sh")
        m.force_fused = True
        if mesh is not None:
            m.set_mesh(mesh)
        m.finish_setup()
        m.build_step()
        return m

    def initial(m):
        g = m.grid
        rng = np.random.RandomState(7)
        s = {}
        for name in m.fields.prognostic_names:
            a = np.zeros((g.kcells, g.jtot, g.itot))
            a[g.kstart:g.kend] = 0.2 * rng.randn(g.ktot, g.jtot, g.itot)
            s[name] = a
        s["th"][g.kstart:g.kend] += 300. + 0.003 * g.z[g.kstart:g.kend, None, None]
        s["w"][g.kstart] = 0.
        s["w"][g.kend] = 0.
        s = {k: jnp.asarray(v) for k, v in s.items()}
        sfc = {k: jnp.asarray(v) for k, v in
               m.boundary.init_surface_state().items()}
        return s, sfc

    # single device
    m1 = build(None)
    assert m1._maybe_build_fused() is not None
    s1, sfc1 = initial(m1)
    dt = jnp.asarray(0.5)
    o1 = m1._step_raw(s1, sfc1, m1.pres_params, dt, jnp.asarray(0.0))
    u1 = np.asarray(o1[0]["u"])
    th1 = np.asarray(o1[0]["th"])

    # 2x4 mesh
    mesh = pmesh.make_mesh(2, 4)
    m2 = build(mesh)
    f2 = m2._maybe_build_fused()
    assert f2 is not None and f2.sharded_mesh is mesh
    # the production multi-chip path folds the RK update into the sharded
    # kernels too — pin it so a silent fallback regression fails here
    assert m2._use_rkfold
    s2, sfc2 = initial(m2)
    s2, _t, sfc2 = pmesh.shard_state(s2, {k: jnp.zeros_like(v) for k, v in s2.items()}, sfc2, mesh)
    with mesh:
        o2 = jax.jit(m2._step_raw)(s2, sfc2, m2.pres_params, dt,
                                   jnp.asarray(0.0))
    u2 = np.asarray(o2[0]["u"])
    th2 = np.asarray(o2[0]["th"])

    # interior only: the ghost planes differ by design (the single-device
    # fold_ghosts path leaves them stale; the sharded path fills them)
    ks, ke = m1.ctx.ks, m1.ctx.ke
    assert np.allclose(u1[ks:ke], u2[ks:ke], rtol=0, atol=1e-13), \
        np.abs(u1[ks:ke] - u2[ks:ke]).max()
    assert np.allclose(th1[ks:ke], th2[ks:ke], rtol=0, atol=1e-11), \
        np.abs(th1[ks:ke] - th2[ks:ke]).max()


MOIST_INI = INI.replace("""[thermo]
swthermo=dry
swbasestate=boussinesq
thref0=300.
pbot=100000.""", """[thermo]
swthermo=moist
swbasestate=boussinesq
thvref0=300.
pbot=100000.""").replace("sbot=0.1", "sbot[thl]=0.1\nsbot[qt]=4e-5") \
    .replace("stop=0.003", "stop[thl]=0.003\nstop[qt]=0.")


def test_generic_fused_moist_matches():
    """Generic fused mode (evisc_n2 + per-field uv/w/scalar kernels) must
    reproduce the jnp DiffSmag2 + Advec2 pipeline exactly for a MOIST
    config (thl + qt, sat_adjust N2 in XLA)."""
    m = Model(Ini(MOIST_INI), "run", "fusedm")
    m.force_fused = True
    m.finish_setup()
    ctx = m.ctx
    g = m.grid
    rng = np.random.RandomState(11)
    s = {}
    for name in m.fields.prognostic_names:
        a = np.zeros((g.kcells, g.jtot, g.itot))
        a[g.kstart:g.kend] = 0.2 * rng.randn(g.ktot, g.jtot, g.itot)
        s[name] = a
    s["thl"][g.kstart:g.kend] += 295. + 0.003 * g.z[g.kstart:g.kend, None, None]
    s["qt"][g.kstart:g.kend] = np.abs(s["qt"][g.kstart:g.kend]) * 1e-3 + 5e-3
    s["w"][g.kstart] = 0.
    s["w"][g.kend] = 0.
    s = {k: jnp.asarray(v) for k, v in s.items()}
    sfc = {k: jnp.asarray(v) for k, v in m.boundary.init_surface_state().items()}
    s = m.boundary.set_ghost_cells(ctx, s, sfc)
    sfc = m.boundary.exec(ctx, s, sfc, {})
    s = m.boundary.set_ghost_cells(ctx, s, sfc)

    fused = m._maybe_build_fused()
    assert fused is not None and fused.generic

    from microhh_tpu.ops.pallas_fused import (fused_generic_viscosity,
                                              fused_generic_tendencies)
    aux_ref = m.diff.exec_viscosity(ctx, s, sfc, {})
    aux_f = fused_generic_viscosity(fused, ctx, s, sfc, {}, m.thermo)
    ks, ke = ctx.ks, ctx.ke
    a = np.asarray(aux_ref["evisc"])
    b = np.asarray(aux_f["evisc"])
    assert np.allclose(a[ks:ke], b[ks:ke], rtol=1e-12, atol=1e-14), \
        np.abs(a[ks:ke] - b[ks:ke]).max()

    t0 = {n: jnp.zeros_like(s[n]) for n in s}
    t_ref = m.advec.exec(ctx, s, dict(t0), aux_ref)
    t_ref = m.diff.exec(ctx, s, t_ref, aux_ref, sfc)
    t_f = fused_generic_tendencies(fused, ctx, s, dict(t0), aux_f, sfc)
    for name in ("u", "v", "w", "thl", "qt"):
        ar = np.asarray(t_ref[name])[ks:ke]
        bf = np.asarray(t_f[name])[ks:ke]
        err = np.abs(ar - bf).max() / max(np.abs(ar).max(), 1e-30)
        assert err < 1e-12, (name, err)


def test_sharded_generic_moist_matches():
    """Generic (moist) fused mode under a 2x4 mesh must match the
    single-device generic step bitwise in the interior."""
    import jax
    from microhh_tpu.parallel import mesh as pmesh

    INI_RUN = MOIST_INI.replace("endtime=3600", "endtime=12").replace(
        "savetime=3600", "savetime=12")

    def build(mesh):
        m = Model(Ini(INI_RUN), "run", "fused_shm")
        m.force_fused = True
        if mesh is not None:
            m.set_mesh(mesh)
        m.finish_setup()
        m.build_step()
        return m

    def initial(m):
        g = m.grid
        rng = np.random.RandomState(13)
        s = {}
        for name in m.fields.prognostic_names:
            a = np.zeros((g.kcells, g.jtot, g.itot))
            a[g.kstart:g.kend] = 0.2 * rng.randn(g.ktot, g.jtot, g.itot)
            s[name] = a
        s["thl"][g.kstart:g.kend] += 295.
        s["qt"][g.kstart:g.kend] = np.abs(s["qt"][g.kstart:g.kend]) * 1e-3 + 5e-3
        s["w"][g.kstart] = 0.
        s["w"][g.kend] = 0.
        s = {k: jnp.asarray(v) for k, v in s.items()}
        sfc = {k: jnp.asarray(v) for k, v in
               m.boundary.init_surface_state().items()}
        return s, sfc

    m1 = build(None)
    f1 = m1._maybe_build_fused()
    assert f1 is not None and f1.generic and f1.sharded_mesh is None
    s1, sfc1 = initial(m1)
    dt = jnp.asarray(0.5)
    o1 = m1._step_raw(s1, sfc1, m1.pres_params, dt, jnp.asarray(0.0))

    mesh = pmesh.make_mesh(2, 4)
    m2 = build(mesh)
    f2 = m2._maybe_build_fused()
    assert f2 is not None and f2.generic and f2.sharded_mesh is mesh
    s2, sfc2 = initial(m2)
    s2, _t, sfc2 = pmesh.shard_state(
        s2, {k: jnp.zeros_like(v) for k, v in s2.items()}, sfc2, mesh)
    with mesh:
        o2 = jax.jit(m2._step_raw)(s2, sfc2, m2.pres_params, dt,
                                   jnp.asarray(0.0))

    ks, ke = m1.ctx.ks, m1.ctx.ke
    for name in ("u", "w", "thl", "qt"):
        a = np.asarray(o1[0][name])[ks:ke]
        b = np.asarray(o2[0][name])[ks:ke]
        assert np.allclose(a, b, rtol=0, atol=1e-11), \
            (name, np.abs(a - b).max())
