"""Oracle test for the DNN closure's calc_Tau pipeline.

A direct numpy transliteration of the reference kernel
``src/diff_dnn_local.cxx:813-939`` (patch packing with local TKE/TPE
normalization, batched network forward, TKE denormalization with optional
deviatoric trace removal) is evaluated point-by-point with explicit loops
and modular periodic indexing, and compared against
``DiffDNN._calc_tau``'s vectorized TPU formulation at f64.

This is the single-step Tau parity check of VERDICT r2 item 8: any change
to the channel/spatial flattening order, the normalizer choice per
channel, or the denormalization would fail at 1e-12.
"""

import numpy as np
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.ops.diff_dnn import DSMALLER, DTINY

from test_diff_dnn import SBL_INI, make_sbl_input

NH = 3  # horizontal patch size (fixed, like the reference's nh=3 cases)


def _net_forward_np(net, x):
    """(n, 108) -> (n, 6): relu-matmul chain + change of basis, numpy."""
    h = x
    for w in [np.asarray(wi, np.float64) for wi in net.weights[:-1]]:
        h = np.maximum(h @ w.T, 0.)
    h = h @ np.asarray(net.weights[-1], np.float64).T
    return h @ np.asarray(net.change_basis, np.float64).T


def calc_tau_ref(net, uc, vc, wc, b, TKEh, TKEv, TKEhf, TKEvf, TPE,
                 swdeviatoric, dz, ks, kendBL, jtot, itot):
    """Transliteration of calc_Tau (diff_dnn_local.cxx:836-939), with the
    horizontal ghost reads replaced by modular periodic indexing (the
    reference fills its ghost cells from periodic halos first)."""
    iv, ih = 1, NH // 2
    nbox = 3 * NH * NH
    klo, khi = ks + 1, kendBL - 1         # k_offset=1 (surface model on)
    nk = khi - klo
    nbatch = nk * jtot * itot
    x = np.zeros((nbatch, 12, NH, NH))

    def at(f, k, j, i):
        return f[k, j % jtot, i % itot]

    n = 0
    for k in range(klo, khi):
        for j in range(jtot):
            for i in range(itot):
                rootki = (TKEh[k, j, i] + TKEv[k, j, i] + DSMALLER) ** -0.5
                rootkvi = (TKEv[k, j, i] + DSMALLER) ** -0.5
                bscalei = dz[k] / (TPE[k, j, i] + DTINY)
                ubar = vbar = wbar = bbar = 0.
                for ix in range(-ih, ih + 1):
                    for iy in range(-ih, ih + 1):
                        for iz in (-1, 0, 1):
                            ubar += at(uc, k + iz, j + iy, i + ix)
                            vbar += at(vc, k + iz, j + iy, i + ix)
                            wbar += at(wc, k + iz, j + iy, i + ix)
                            bbar += at(b, k + iz, j + iy, i + ix)
                ubar /= nbox
                vbar /= nbox
                wbar /= nbox
                bbar /= nbox
                for iz in (-1, 0, 1):
                    for ix in range(-ih, ih + 1):
                        for iy in range(-ih, ih + 1):
                            x[n, 2 * (iz + iv), ih + ix, ih + iy] = \
                                (at(uc, k + iz, j + iy, i + ix) - ubar) * rootki
                            x[n, 2 * (iz + iv) + 1, ih + ix, ih + iy] = \
                                (at(vc, k + iz, j + iy, i + ix) - vbar) * rootki
                            x[n, 6 + (iz + iv), ih + ix, ih + iy] = \
                                (at(wc, k + iz, j + iy, i + ix) - wbar) * rootkvi
                            x[n, 9 + (iz + iv), ih + ix, ih + iy] = \
                                (at(b, k + iz, j + iy, i + ix) - bbar) * bscalei
                n += 1

    tau = _net_forward_np(net, x.reshape(nbatch, -1))

    n = 0
    out = np.zeros((6, nk, jtot, itot))
    for k in range(klo, khi):
        for j in range(jtot):
            for i in range(itot):
                ktot_e = TKEhf[k, j, i] + TKEvf[k, j, i]
                kv = TKEvf[k, j, i]
                rootkkv = np.sqrt(ktot_e * kv)
                t = tau[n]
                if swdeviatoric:
                    third = (t[0] * ktot_e + t[3] * ktot_e + t[5] * kv) / 3.
                else:
                    third = 0.
                out[0, k - klo, j, i] = t[0] * ktot_e - third
                out[1, k - klo, j, i] = t[1] * ktot_e
                out[2, k - klo, j, i] = t[2] * rootkkv
                out[3, k - klo, j, i] = t[3] * ktot_e - third
                out[4, k - klo, j, i] = t[4] * rootkkv
                out[5, k - klo, j, i] = t[5] * kv - third
                n += 1
    return out


@pytest.mark.parametrize("swdeviatoric", [True, False])
def test_calc_tau_matches_reference(tmp_path, swdeviatoric):
    wd = str(tmp_path)
    ini_text = SBL_INI % {"swdiff": "dnn_local", "endtime": "2.0"}
    ini_text = ini_text.replace(
        "[diff]", "[diff]\nswdeviatoric=%d" % int(swdeviatoric))
    with open(tmp_path / "sbl.ini", "w") as f:
        f.write(ini_text)
    make_sbl_input(wd)

    m = Model(Ini(ini_text), "init", "sbl", workdir=wd)
    m.finish_setup()
    m.save_initial_state()
    m = Model(Ini(ini_text), "run", "sbl", workdir=wd)
    m.finish_setup()
    ctx = m.ctx
    assert bool(m.diff.swdeviatoric) == swdeviatoric

    g = m.grid
    ks, ke = g.kstart, g.kend
    kBL = m.diff.kendBL(ctx)
    shape = (g.kcells, g.jtot, g.itot)
    rng = np.random.RandomState(7)

    def fld(scale=1., positive=False):
        a = rng.randn(*shape) * scale
        if positive:
            a = np.abs(a) + 0.05 * scale
        return a

    uf, vf, wf, bf = fld(0.1), fld(0.1), fld(0.05), fld(0.01)
    tkeh, tkev = fld(1e-3, True), fld(1e-3, True)
    tkehf, tkevf = fld(1e-3, True), fld(1e-3, True)
    tpe = fld(1e-4, True)

    import jax.numpy as jnp
    to = lambda a: jnp.asarray(a, ctx.dtype)
    tau = np.asarray(m.diff._calc_tau(
        ctx, to(uf), to(vf), to(wf), to(bf), to(tkeh), to(tkev),
        to(tkehf), to(tkevf), to(tpe)))

    ref = calc_tau_ref(m.diff.net, uf, vf, wf, bf, tkeh, tkev, tkehf,
                       tkevf, tpe, swdeviatoric, np.asarray(ctx.dz),
                       ks, kBL, g.jtot, g.itot)

    assert tau.shape == ref.shape
    err = np.abs(tau - ref).max() / (np.abs(ref).max() + 1e-300)
    assert err < 1e-12, err
