"""4th-order scalar in/outflow oracle: the tendency-correction path must
reproduce a numpy ghost-cell transliteration of the reference kernels
(``boundary_outflow.cxx`` compute_inflow_4th/compute_outflow_4th at
:151-196 feeding advec_4's flux form and diff_4's cdg Laplacian) to
f64 round-off on random fields."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu import fd
from microhh_tpu.config import Ini
from microhh_tpu.model import Model

INI = """
[grid]
itot=32
jtot=4
ktot=8
xsize=32.
ysize=4.
zsize=8.
swspatialorder=4

[advec]
swadvec=4
cflmax=1.0

[diff]
swdiff=4
dnmax=0.4

[pres]
swpres=0

[fields]
visc=0.05
svisc=0.07
slist=s1

[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
scalar_outflow=s1

[time]
starttime=0
endtime=8
savetime=8
dt=0.25
dtmax=0.25
adaptivestep=false
"""


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from microhh_tpu.utils import nc
    wd = str(tmp_path_factory.mktemp("outflow4"))
    ktot = 8
    z = np.linspace(0.5, 7.5, ktot)
    f = nc.Dataset(os.path.join(wd, "of4_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    g = f.createGroup("init")
    g.createVariable("u", "f8", ("z",))[:] = np.ones(ktot)
    g.createVariable("v", "f8", ("z",))[:] = np.zeros(ktot)
    g.createVariable("s1", "f8", ("z",))[:] = np.zeros(ktot)
    f.close()
    with open(os.path.join(wd, "of4.ini"), "w") as fh:
        fh.write(INI)
    m = Model(Ini(INI), "run", "of4", workdir=wd)
    m.finish_setup()
    return m


def _ghosts_np(A):
    """Reference ghost columns from the interior (west inflow value 0,
    east outflow), boundary_outflow.cxx:151-196."""
    a0, a1, a2 = A[..., 0], A[..., 1], A[..., 2]
    b0, b1, b2 = A[..., -1], A[..., -2], A[..., -3]
    gm1 = 9. / 8. * a0 - 14. / 8. * a1 + 5. / 8. * a2
    gm2 = 33. / 8. * a0 - 54. / 8. * a1 + 21. / 8. * a2
    gm3 = 65. / 8. * a0 - 110. / 8. * a1 + 45. / 8. * a2
    ge1 = 2. * b0 - 3. / 2. * b1 + 1. / 2. * b2
    ge2 = 3. * b0 - 7. / 2. * b1 + 3. / 2. * b2
    ge3 = 5. * b0 - 15. / 2. * b1 + 7. / 2. * b2
    return np.stack([gm3, gm2, gm1], -1), np.stack([ge1, ge2, ge3], -1)


def _x_tendency_np(A, U, dxi, svisc):
    """Non-periodic x advection + diffusion on the ghost-extended array."""
    gw, ge = _ghosts_np(A)
    Ag = np.concatenate([gw, A, ge], axis=-1)        # index i+3
    Ug = np.concatenate([U[..., -3:], U, U[..., :3]], axis=-1)
    N = A.shape[-1]
    ci = [float(fd.ci0), float(fd.ci1), float(fd.ci2), float(fd.ci3)]
    cg = [float(fd.cg0), float(fd.cg1), float(fd.cg2), float(fd.cg3)]
    cdg = [float(fd.cdg0), float(fd.cdg1), float(fd.cdg2), float(fd.cdg3)]
    # face fluxes F[j] at j-1/2 for j = -1..N+1 (extended index j+3)
    F = np.zeros(A.shape[:-1] + (N + 3,))
    for j in range(-1, N + 2):
        F[..., j + 1] = Ug[..., j + 3] * (
            ci[0] * Ag[..., j + 1] + ci[1] * Ag[..., j + 2]
            + ci[2] * Ag[..., j + 3] + ci[3] * Ag[..., j + 4])
    T = np.zeros_like(A)
    for i in range(N):
        T[..., i] = -(cg[0] * F[..., i] + cg[1] * F[..., i + 1]
                      + cg[2] * F[..., i + 2] + cg[3] * F[..., i + 3]) * dxi
        T[..., i] += svisc * dxi * dxi * (
            cdg[3] * (Ag[..., i] + Ag[..., i + 6])
            + cdg[2] * (Ag[..., i + 1] + Ag[..., i + 5])
            + cdg[1] * (Ag[..., i + 2] + Ag[..., i + 4])
            + cdg[0] * Ag[..., i + 3])
    return T


def test_outflow4_matches_ghost_oracle(model):
    m = model
    g, ctx = m.grid, m.ctx
    ks, ke = g.kstart, g.kend
    rng = np.random.default_rng(7)
    # scalar uniform in (y, z) so every y/z stencil term vanishes exactly
    # and the total tendency is the x part the oracle computes; u is fully
    # 3-D random (the face fluxes must pick up the right u planes).
    ax = rng.normal(size=g.itot)
    u_int = rng.normal(size=(g.ktot, g.jtot, g.itot))

    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot)) for n in
         m.fields.prognostic_names}
    s["u"] = s["u"].at[ks:ke].set(jnp.asarray(u_int))
    s["s1"] = s["s1"].at[:].set(jnp.asarray(
        np.broadcast_to(ax, (g.kcells, g.jtot, g.itot))))

    t = {n: jnp.zeros_like(v) for n, v in s.items()}
    t = m.advec.exec(ctx, s, t, {})
    t = m.diff.exec(ctx, s, t, {})
    t = m.outflow.correct(ctx, s, t, {}, sviscs=m.diff.viscs)
    got = np.asarray(t["s1"])[ks:ke]

    A = np.broadcast_to(ax, (g.ktot, g.jtot, g.itot)).copy()
    want = _x_tendency_np(A, u_int, float(ctx.dxi), 0.07)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_outflow4_blob_exits(model):
    """Functional: a blob advected east must leave, not wrap."""
    m = model
    m.build_step()
    g = m.grid
    ks, ke = g.kstart, g.kend
    s = {n: jnp.zeros((g.kcells, g.jtot, g.itot))
         for n in m.fields.prognostic_names}
    s["u"] = s["u"].at[ks:ke].set(1.0)
    x = np.arange(g.itot) + 0.5
    blob = np.exp(-0.5 * ((x - 24.) / 2.) ** 2)
    s["s1"] = s["s1"].at[ks:ke].set(jnp.asarray(blob)[None, None, :])
    dt = jnp.asarray(0.25)
    tz = jnp.asarray(0.0)
    for _ in range(64):
        out = m._step_fn(s, {}, m.pres_params, dt, tz)
        s = out[0]
    s1 = np.asarray(s["s1"])[ks:ke]
    assert s1[:, :, 5:11].max() < 0.5, "plume wrapped around the seam"
    assert np.isfinite(s1).all()
