"""Reference-discretization parity: NSW6 conversion terms.

The full vectorized `_conversion` pass (all Tomita accretion /
autoconversion / phase-change / melt-freeze terms plus the two-stage
availability limiter) must match the scalar transliteration of
microphys_nsw6.cxx:125-650 per cell at f64 ~1e-12."""

import numpy as np
import jax.numpy as jnp

from microhh_tpu.config import Ini
from microhh_tpu.model import Model

from oracle_ref import microphys_nsw6_ref as ref
from oracle_ref.thermo_moist_ref import exner as ref_exner

INI = """
[grid]
itot=10
jtot=6
ktot=6
xsize=1000.
ysize=600.
zsize=6000.
swspatialorder=2

[advec]
swadvec=2

[diff]
swdiff=0

[pres]
swpres=0

[thermo]
swthermo=moist
swbasestate=anelastic
pbot=101500.
thvref0=300.

[micro]
swmicro=nsw6
Nc0=70e6

[boundary]
mbcbot=freeslip
mbctop=freeslip
sbcbot=neumann
sbctop=neumann
sbot=0.
stop=0.

[fields]
visc=1.e-5
svisc=1.e-5

[time]
starttime=0
endtime=10
savetime=10
dt=2.
"""


class FakeThermo:
    scalars = ("thl", "qt")

    def __init__(self, ql, qi, p, exn):
        self._ql, self._qi = ql, qi
        self._p, self._exn = p, exn

    def get_ql_qi(self, ctx, s, aux):
        return self._ql, self._qi

    def _p_profiles(self, ctx, aux):
        return self._p, self._exn, None, None


def test_nsw6_conversion_matches_reference(tmp_path):
    import os
    from microhh_tpu.utils import nc
    wd = str(tmp_path)
    ktot, zsize = 6, 6000.
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    f = nc.Dataset(os.path.join(wd, "onsw6_input.nc"), "w")
    f.createDimension("z", ktot)
    f.createVariable("z", "f8", ("z",))[:] = z
    grp = f.createGroup("init")
    for name, prof in (("thl", 298. + 0.003 * z),
                       ("qt", np.maximum(0.016 - 3e-6 * z, 0.002)),
                       ("u", np.zeros(ktot)), ("v", np.zeros(ktot))):
        grp.createVariable(name, "f8", ("z",))[:] = prof
    f.close()
    m = Model(Ini(INI), "run", "onsw6", workdir=wd)
    m.finish_setup()
    g = m.grid
    ks, ke = g.kstart, g.kend
    kt, jt, it = g.ktot, g.jtot, g.itot
    rng = np.random.RandomState(5)

    # states spanning every species-presence combination, both T regimes,
    # sub/super-saturation, and the qr/qs >= 1e-4 delta switches
    shape = (kt, jt, it)

    def sprinkle(hi, frac_zero):
        a = hi * rng.rand(*shape) ** 2
        a[rng.rand(*shape) < frac_zero] = 0.
        return a

    ql = sprinkle(2e-3, 0.4)
    qi = sprinkle(1e-3, 0.4)
    qr = sprinkle(5e-4, 0.4)
    qs = sprinkle(8e-4, 0.4)
    qg = sprinkle(5e-4, 0.4)
    qv = 1e-3 + 0.015 * rng.rand(*shape)
    qt = qv + ql + qi

    # temperature spanning ~233..303 K via thl at fixed exner profile
    p = 1.015e5 * np.exp(-np.linspace(0., 1.0, g.kcells))
    exn = ref_exner(p)
    T_target = 233. + 70. * rng.rand(*shape)
    thl = (T_target - ref.LV / ref.CP * ql - ref.LS / ref.CP * qi) / exn[ks:ke, None, None]

    rho = np.exp(-0.12 * np.arange(g.kcells))
    m.ctx.rhoref = jnp.asarray(rho)

    s = {n: np.zeros((g.kcells, jt, it)) for n in
         ("u", "v", "w", "thl", "qt", "qr", "qs", "qg")}
    s["thl"][ks:ke] = thl
    s["qt"][ks:ke] = qt
    s["qr"][ks:ke] = qr
    s["qs"][ks:ke] = qs
    s["qg"][ks:ke] = qg

    dt = 2.0
    m.micro.thermo = FakeThermo(jnp.asarray(ql), jnp.asarray(qi),
                                jnp.asarray(p), jnp.asarray(exn))
    sj = {k: jnp.asarray(v) for k, v in s.items()}
    qtt, thlt, qrt, qst, qgt = (np.asarray(a) for a in
                                m.micro._conversion(m.ctx, sj, dt, {}))

    qrt_o = np.zeros(shape)
    qst_o = np.zeros(shape)
    qgt_o = np.zeros(shape)
    qtt_o = np.zeros(shape)
    thlt_o = np.zeros(shape)
    for k in range(kt):
        for j in range(jt):
            for i in range(it):
                (qrt_o[k, j, i], qst_o[k, j, i], qgt_o[k, j, i],
                 qtt_o[k, j, i], thlt_o[k, j, i]) = ref.conversion_cell(
                    qr[k, j, i], qs[k, j, i], qg[k, j, i],
                    qt[k, j, i], thl[k, j, i], ql[k, j, i], qi[k, j, i],
                    rho[ks + k], rho[ks], exn[ks + k], p[ks + k],
                    70e6, dt)

    scale = max(np.abs(qrt_o).max(), 1e-10)
    for name, mine, orac in (("qr", qrt, qrt_o), ("qs", qst, qst_o),
                             ("qg", qgt, qgt_o), ("qt", qtt, qtt_o)):
        np.testing.assert_allclose(mine, orac, rtol=1e-10, atol=1e-12 * scale,
                                   err_msg="nsw6 %s tendency" % name)
    np.testing.assert_allclose(thlt, thlt_o, rtol=1e-10,
                               atol=1e-12 * max(np.abs(thlt_o).max(), 1e-10))

    # branch coverage: both delta switches, both T regimes, both saturations
    T = exn[ks:ke, None, None] * thl + ref.LV / ref.CP * ql + ref.LS / ref.CP * qi
    assert (qr >= 1e-4).any() and (qr < 1e-4).any()
    assert (T >= 273.15).any() and (T < 273.15).any()
    assert (np.abs(qrt_o) > 0).mean() > 0.3
