"""Pressure solver correctness: after the projection, the updated velocity
field must be divergence-free to machine precision (reference guarantees
DIV ~ 1e-12 in double precision; see check_divergence, pres_2.cxx:389-423)."""

import numpy as np
import jax.numpy as jnp

from microhh_tpu.config import Ini
from microhh_tpu.model import Model


INI = """
[grid]
itot=16
jtot=12
ktot=10
xsize=1.
ysize=1.
zsize=0.5
swspatialorder=2

[advec]
swadvec=0

[diff]
swdiff=0

[fields]
visc=0.001

[boundary]
mbcbot=freeslip
mbctop=freeslip

[time]
starttime=0
endtime=1.
savetime=1.
dt=0.01
"""


def make_model():
    m = Model(Ini(INI), "run", "testcase")
    m.finish_setup()
    return m


def test_projection_divergence_free():
    m = make_model()
    g = m.grid
    rng = np.random.RandomState(1)
    s = {}
    for name in ("u", "v", "w"):
        a = np.zeros((g.kcells, g.jtot, g.itot))
        a[g.kstart:g.kend] = rng.randn(g.ktot, g.jtot, g.itot)
        s[name] = a
    # no-penetration walls
    s["w"][g.kstart] = 0.
    s["w"][g.kend] = 0.
    s = {k: jnp.asarray(v) for k, v in s.items()}
    t = {k: jnp.zeros_like(v) for k, v in s.items()}

    ctx = m.ctx
    subdt = 0.01
    t2, aux = m.pres.exec(ctx, s, t, {}, subdt)
    s_new = {n: s[n] + subdt * t2[n] for n in s}

    div = float(m.pres.divergence_max(ctx, s_new))
    assert div < 1e-11, div


def test_mean_pressure_mode_bounded():
    """The kx=ky=0 mode must stay bounded (p_top=0 BC, pres_2.cxx:317-323)."""
    m = make_model()
    g = m.grid
    rhs = jnp.asarray(np.random.RandomState(2).randn(g.ktot, g.jtot, g.itot))
    p = m.pres.solve(m.ctx, rhs)
    assert np.all(np.isfinite(np.asarray(p)))


def test_poisson_operator_inverse():
    """solve() must invert the discrete Laplacian: applying the 2nd-order
    Laplacian with Neumann-bottom/Neumann-top (mean-mode pinned) to the
    solution reproduces the RHS."""
    m = make_model()
    g, ctx = m.grid, m.ctx
    ks, ke = g.kstart, g.kend
    rng = np.random.RandomState(3)
    rhs = rng.randn(g.ktot, g.jtot, g.itot)
    rhs -= rhs.mean()  # solvable RHS

    p_int = np.asarray(m.pres.solve(ctx, jnp.asarray(rhs)))

    # Build ghosted p: dp/dz = 0 at both walls for every mode except the mean
    # mode top (p ghost = -p interior, giving p=0 at the wall).
    p = np.zeros((g.kcells, g.jtot, g.itot))
    p[ks:ke] = p_int
    p[ks - 1] = p[ks]
    p[ke] = p[ke - 1]
    pmean = p_int.mean(axis=(1, 2))
    p[ke] -= 2 * pmean[-1] / 1.0  # top BC for the mean mode: p_top = 0

    dxidxi = g.dxi ** 2
    dyidyi = g.dyi ** 2
    lap = np.zeros_like(rhs)
    for k in range(ks, ke):
        kk = k - ks
        lap[kk] = ((np.roll(p[k], -1, -1) - 2 * p[k] + np.roll(p[k], 1, -1)) * dxidxi
                   + (np.roll(p[k], -1, -2) - 2 * p[k] + np.roll(p[k], 1, -2)) * dyidyi
                   + ((p[k + 1] - p[k]) * g.dzhi[k + 1]
                      - (p[k] - p[k - 1]) * g.dzhi[k]) * g.dzi[k])
    assert np.allclose(lap, rhs, atol=1e-9), np.abs(lap - rhs).max()


def test_slab_transpose_sharded_parity():
    """The multi-chip slab-transpose solve (z-slabs around the FFTs,
    mode-slabs around the tridiagonal solve; parallel/mesh.py SlabPlan,
    reference transpose.cxx) matches the single-device solve exactly on an
    8-device virtual mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from microhh_tpu.parallel import mesh as pmesh

    ini = INI.replace("itot=16", "itot=16").replace("jtot=12", "jtot=16")
    ini = ini.replace("ktot=10", "ktot=16")
    m = Model(Ini(ini), "run", "slab")
    m.finish_setup()
    rng = np.random.RandomState(7)
    rhs_np = rng.randn(m.grid.ktot, m.grid.jtot, m.grid.itot)

    p_ref = np.asarray(m.pres.solve(m.ctx, jnp.asarray(rhs_np)))

    npy, npx = pmesh.auto_mesh_shape(8)
    mesh = pmesh.make_mesh(npy, npx)
    m.set_mesh(mesh)
    assert pmesh.spectral_slab_plan(mesh, m.grid.ktot, m.grid.jtot) is not None
    rhs = jax.device_put(jnp.asarray(rhs_np), NamedSharding(mesh, P(None, "y", "x")))
    p_sh = jax.jit(lambda r: m.pres.solve(m.ctx, r))(rhs)
    # output keeps the production pencil layout
    assert p_sh.sharding.is_equivalent_to(
        NamedSharding(mesh, P(None, "y", "x")), p_sh.ndim)
    err = np.abs(np.asarray(p_sh) - p_ref).max()
    assert err < 1e-10, err


def test_slab_plan_divisibility_guard():
    """Indivisible k/j extents fall back to plain GSPMD (plan is None)."""
    from microhh_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(*pmesh.auto_mesh_shape(8))
    assert pmesh.spectral_slab_plan(mesh, 10, 16) is None
    assert pmesh.spectral_slab_plan(mesh, 16, 12) is None
    assert pmesh.spectral_slab_plan(None, 16, 16) is None


def test_pallas_tdma_parity():
    """The opt-in one-pass Pallas Thomas solve matches the associative-scan
    path to roundoff (interpret mode; MICROHH_PALLAS_TDMA=1)."""
    import os
    import jax.numpy as jnp
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    ini = """
[grid]
itot=256
jtot=16
ktot=12
xsize=1.
ysize=1.
zsize=1.
swspatialorder=2
[fields]
visc=0.1
[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
[advec]
cflmax=1.
[diff]
swdiff=0
[time]
starttime=0
endtime=1
savetime=1
dt=0.1
"""
    m = Model(Ini(ini), "run", "tdma")
    m.finish_setup()
    rng = np.random.RandomState(0)
    rhs = jnp.asarray(rng.randn(m.grid.ktot, 16, 256))
    p_ref = m.pres.solve(m.ctx, rhs)
    m.pres._tdma_interpret = True
    os.environ["MICROHH_PALLAS_TDMA"] = "1"
    try:
        p_new = m.pres.solve(m.ctx, rhs)
    finally:
        os.environ["MICROHH_PALLAS_TDMA"] = "0"
    err = float(jnp.abs(p_ref - p_new).max() / jnp.abs(p_ref).max())
    assert err < 1e-12, err


def test_pres4_eigen_matches_lu():
    """pres_4 fast-diagonalization (two k-axis matmuls) must reproduce the
    heptadiagonal LU scan solve on a stretched grid, and must actually
    engage (_eig_ok) — it is the production 4th-order path."""
    import os
    from microhh_tpu.config import Ini
    from microhh_tpu.grid import Grid
    from microhh_tpu.fields import Fields
    from microhh_tpu.ops.pres_4 import Pres4

    kmax = 48
    ini = Ini("""
[grid]
itot=32
jtot=16
ktot=%d
xsize=6.28
ysize=3.14
zsize=2.
swspatialorder=4
[fields]
visc=1e-5
[boundary]
mbcbot=noslip
mbctop=noslip
sbcbot=neumann
sbctop=neumann
sbot=0
stop=0
[time]
endtime=1
savetime=1
dt=0.1
""" % kmax)
    g = Grid(ini)
    # tanh-stretched z like the channel cases
    n = np.linspace(1. / kmax, 1. - 1. / kmax, kmax)
    dz = 0.5 + 0.5 * np.tanh((n - 0.5) / 0.25) * 0.  # uniform start
    z = 2. * (np.cumsum(np.ones(kmax)) - 0.5) / kmax
    z = 1. + np.tanh(2. * (z - 1.)) / np.tanh(2.)  # moser-style stretching
    g.set_z(z)
    f = Fields(ini, g)
    p4 = Pres4(ini, g, f, dtype=np.float64)
    p4.set_values()
    assert p4._eig_ok, "eigen path must engage on a stretched channel grid"

    rng = np.random.RandomState(7)
    rhs = jnp.asarray(rng.randn(kmax, g.jtot, g.itot))

    class Ctx:
        pass

    ctx = Ctx()
    pp = p4.device_params()
    x_eig = np.asarray(p4.solve(ctx, rhs, pp))
    os.environ["MICROHH_EIGEN_POISSON"] = "0"
    try:
        x_lu = np.asarray(p4.solve(ctx, rhs, pp))
    finally:
        os.environ["MICROHH_EIGEN_POISSON"] = "1"
    scale = np.abs(x_lu).max()
    assert np.abs(x_eig - x_lu).max() / scale < 1e-10, \
        np.abs(x_eig - x_lu).max() / scale


def test_multislice_mesh_step():
    """3-axis ('dcn','y','x') multi-slice mesh: a jitted LES step with
    fields sharded P(None, ('dcn','y'), 'x') compiles and runs on the
    virtual 8-device mesh (DCN as the outer axis, SURVEY §5.8)."""
    import jax
    import jax.numpy as jnp
    from microhh_tpu.parallel import mesh as pmesh
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model

    mesh = pmesh.make_multislice_mesh(2, 2, 2)
    assert mesh.axis_names == ("dcn", "y", "x")

    ini = Ini("""
[grid]
itot=8
jtot=8
ktot=8
xsize=1.
ysize=1.
zsize=1.
swspatialorder=2
[fields]
visc=0.01
slist=s1
[boundary]
mbcbot=noslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
[time]
starttime=0
endtime=1.
savetime=1.
dt=0.1
""")
    m = Model(ini, "run", "ms")
    m.finish_setup()
    m.build_step()
    fs = pmesh.multislice_field_sharding(mesh)
    rng = np.random.RandomState(0)
    s = {}
    for name in m.fields.all_prognostic_names:
        a = np.zeros((m.grid.kcells, 8, 8))
        a[m.grid.kstart:m.grid.kend] = 0.1 * rng.randn(m.grid.ktot, 8, 8)
        s[name] = jax.device_put(jnp.asarray(a), fs)
    with mesh:
        out = jax.jit(m._step_raw)(s, {}, m.pres_params,
                                   jnp.asarray(0.05), jnp.asarray(0.0))
        jax.block_until_ready(out[0]["u"])
    assert np.isfinite(np.asarray(out[0]["u"])).all()


def test_pres2_dft_matches_fft():
    """The DFT-by-matmul spectral path must reproduce the rfft2 + eigen
    solve to roundoff (f64)."""
    import os
    from microhh_tpu.config import Ini
    from microhh_tpu.grid import Grid
    from microhh_tpu.fields import Fields
    from microhh_tpu.ops.pres_2 import Pres2

    ini = Ini("""
[grid]
itot=32
jtot=24
ktot=20
xsize=6.28
ysize=3.14
zsize=2.
swspatialorder=2
[fields]
visc=1e-5
[boundary]
mbcbot=noslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0
stop=0
[time]
endtime=1
savetime=1
dt=0.1
""")
    g = Grid(ini)
    kt = g.ktot
    dz = g.zsize / kt
    g.set_z(np.linspace(0.5 * dz, g.zsize - 0.5 * dz, kt))
    f = Fields(ini, g)
    p2 = Pres2(ini, g, f, dtype=np.float64)
    p2.set_values()
    pp = p2.device_params()

    rng = np.random.RandomState(3)
    rhs = jnp.asarray(rng.randn(kt, g.jtot, g.itot))

    class Ctx:
        pass

    os.environ["MICROHH_DFT_POISSON"] = "1"
    try:
        x_dft = np.asarray(p2.solve(Ctx(), rhs, pp))
    finally:
        os.environ["MICROHH_DFT_POISSON"] = "0"
    try:
        x_fft = np.asarray(p2.solve(Ctx(), rhs, pp))
    finally:
        os.environ.pop("MICROHH_DFT_POISSON", None)
    scale = np.abs(x_fft).max()
    assert np.abs(x_dft - x_fft).max() / scale < 1e-11, \
        np.abs(x_dft - x_fft).max() / scale


def test_pres2_dft_tdma_matches_eigen():
    """The DFT path's vertical Thomas solve (Pallas, real/imag separated)
    must match the DFT + eigen path to roundoff (interpret mode)."""
    import os
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    ini = """
[grid]
itot=256
jtot=16
ktot=12
xsize=1.
ysize=1.
zsize=1.
swspatialorder=2
[fields]
visc=0.1
[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.
[advec]
cflmax=1.
[diff]
swdiff=0
[time]
starttime=0
endtime=1
savetime=1
dt=0.1
"""
    m = Model(Ini(ini), "run", "dfttdma")
    m.finish_setup()
    pp = m.pres.device_params()
    rng = np.random.RandomState(1)
    rhs = jnp.asarray(rng.randn(m.grid.ktot, 16, 256))
    os.environ["MICROHH_DFT_POISSON"] = "1"
    os.environ["MICROHH_DFT_TDMA"] = "0"
    try:
        p_eig = m.pres.solve(m.ctx, rhs, pp)
        m.pres._tdma_interpret = True
        os.environ["MICROHH_DFT_TDMA"] = "1"
        p_tdma = m.pres.solve(m.ctx, rhs, pp)
    finally:
        os.environ.pop("MICROHH_DFT_POISSON", None)
        os.environ.pop("MICROHH_DFT_TDMA", None)
    err = float(jnp.abs(p_eig - p_tdma).max() / jnp.abs(p_eig).max())
    assert err < 1e-11, err


def test_pres4_dft_matches_fft():
    """pres_4's DFT-by-matmul path must reproduce the rfft2 eigen solve."""
    import os
    from microhh_tpu.config import Ini
    from microhh_tpu.grid import Grid
    from microhh_tpu.fields import Fields
    from microhh_tpu.ops.pres_4 import Pres4

    kmax = 24
    ini = Ini("""
[grid]
itot=32
jtot=16
ktot=%d
xsize=6.28
ysize=3.14
zsize=2.
swspatialorder=4
[fields]
visc=1e-5
[boundary]
mbcbot=noslip
mbctop=noslip
sbcbot=neumann
sbctop=neumann
sbot=0
stop=0
[time]
endtime=1
savetime=1
dt=0.1
""" % kmax)
    g = Grid(ini)
    dz = g.zsize / kmax
    g.set_z(np.linspace(0.5 * dz, g.zsize - 0.5 * dz, kmax))
    f = Fields(ini, g)
    p4 = Pres4(ini, g, f, dtype=np.float64)
    p4.set_values()
    assert p4._eig_ok
    pp = p4.device_params()
    rng = np.random.RandomState(9)
    rhs = jnp.asarray(rng.randn(kmax, g.jtot, g.itot))

    class Ctx:
        pass

    os.environ["MICROHH_DFT_POISSON"] = "1"
    try:
        x_dft = np.asarray(p4.solve(Ctx(), rhs, pp))
    finally:
        os.environ["MICROHH_DFT_POISSON"] = "0"
    try:
        x_fft = np.asarray(p4.solve(Ctx(), rhs, pp))
    finally:
        os.environ.pop("MICROHH_DFT_POISSON", None)
    scale = np.abs(x_fft).max()
    assert np.abs(x_dft - x_fft).max() / scale < 1e-11, \
        np.abs(x_dft - x_fft).max() / scale


def test_sharded_fast_path_parity():
    """The mesh-attached FAST spectral solve (MXU-DFT einsums or radix-4
    Pallas DFT + Pallas Thomas under shard_map, between the slab
    reshards) matches the single-device fast solve — the round-4 item
    that the perf stack must not fall back to rfft2 when a mesh is
    attached."""
    import os
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from microhh_tpu.parallel import mesh as pmesh

    ini = INI.replace("jtot=12", "jtot=16").replace("ktot=10", "ktot=16")
    m = Model(Ini(ini), "run", "slabfast")
    m.finish_setup()
    rng = np.random.RandomState(11)
    rhs_np = rng.randn(m.grid.ktot, m.grid.jtot, m.grid.itot)
    pp = m.pres.device_params()
    assert "dftC" in pp

    p_ref = np.asarray(m.pres.solve(m.ctx, jnp.asarray(rhs_np), pp))

    mesh = pmesh.make_mesh(*pmesh.auto_mesh_shape(8))
    m.set_mesh(mesh)
    rhs = jax.device_put(jnp.asarray(rhs_np),
                         NamedSharding(mesh, P(None, "y", "x")))

    # dense MXU-DFT variant
    old = os.environ.pop("MICROHH_DFT_PALLAS", None)
    try:
        os.environ["MICROHH_DFT_PALLAS"] = "0"
        p_sh = jax.jit(lambda r: m.pres.solve(m.ctx, r, pp))(rhs)
        assert p_sh.sharding.is_equivalent_to(
            NamedSharding(mesh, P(None, "y", "x")), p_sh.ndim)
        err = np.abs(np.asarray(p_sh) - p_ref).max()
        assert err < 1e-10, err

        # radix-4 Pallas DFT + Pallas Thomas variant (interpret on CPU)
        if "plxf_c0" in pp and "winv_pl" in pp:
            os.environ["MICROHH_DFT_PALLAS"] = "1"
            p_pl = jax.jit(lambda r: m.pres.solve(m.ctx, r, pp))(rhs)
            err = np.abs(np.asarray(p_pl) - p_ref).max()
            assert err < 1e-10, err
    finally:
        if old is None:
            os.environ.pop("MICROHH_DFT_PALLAS", None)
        else:
            os.environ["MICROHH_DFT_PALLAS"] = old


def test_sharded_pallas_dft_path_parity():
    """The radix-4 Pallas DFT + Pallas Thomas legs of the sharded fast
    path (shard_map over the slab shardings) match the single-device
    fast solve, at the 512-aligned sizes the radix-4 tables require
    (interpret mode on CPU)."""
    import os
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from microhh_tpu.parallel import mesh as pmesh

    ini = INI.replace("itot=16", "itot=512").replace("jtot=12", "jtot=512")
    ini = ini.replace("ktot=10", "ktot=8")
    m = Model(Ini(ini), "run", "slabpl")
    m.finish_setup()
    rng = np.random.RandomState(13)
    rhs_np = rng.randn(m.grid.ktot, m.grid.jtot, m.grid.itot)
    pp = m.pres.device_params()
    assert "plxf_c0" in pp and "winv_pl" in pp

    old = os.environ.pop("MICROHH_DFT_PALLAS", None)
    try:
        os.environ["MICROHH_DFT_PALLAS"] = "1"
        p_ref = np.asarray(m.pres._solve_dft_pallas(
            m.ctx, jnp.asarray(rhs_np), pp))

        mesh = pmesh.make_mesh(*pmesh.auto_mesh_shape(8))
        m.set_mesh(mesh)
        rhs = jax.device_put(jnp.asarray(rhs_np),
                             NamedSharding(mesh, P(None, "y", "x")))
        p_sh = jax.jit(lambda r: m.pres.solve(m.ctx, r, pp))(rhs)
        err = np.abs(np.asarray(p_sh) - p_ref).max()
        assert err < 1e-10, err
    finally:
        if old is None:
            os.environ.pop("MICROHH_DFT_PALLAS", None)
        else:
            os.environ["MICROHH_DFT_PALLAS"] = old
