"""Pallas-fused interpolated advection (2i4 / 2i5 / 2i53 / 2i62).

The XLA form (advec_interp.AdvecInterp.exec) materializes the horizontal
face values, upwind corrections, vertical ladders and flux divergences as
separate HBM arrays: at 384^3 the 2i5 wide-stencil intermediates exhaust a
16 GB chip, and even when they fit, every term costs a full-array pass.
These kernels compute the complete tendency contribution of the scheme in
ONE pass per field group:

* momentum kernel — tu, tv, tw for one k-plane from 7-plane windows of
  (u, v, w); the vertical ladder (2nd / 4th-WS / 6th order from the walls
  inward, reference src/advec_2i5.cxx:197-610) is applied as per-level
  6-tap weight columns read from SMEM, so ONE generic body covers every
  ladder rung, wall included (out-of-range taps carry zero weight against
  k-clamped plane specs).  Density factors (rhorefh for face fluxes, rhoref
  for the w-equation center fluxes) are prescaled into the weight rows.
* scalar kernel — all non-fluxlimited scalars in one pass: the shared
  advecting planes (u, v, w, w+1) are read once per plane, each scalar
  adds a 7-plane window + its carried tendency.

Horizontal terms are cyclic in-plane rolls (periodic BC), identical to the
reference's i +/- 3 stencils (advec_2i5.cxx:155-320).  The tendency arrays
are accumulated in place via input_output_aliases — the kernels read the
carried RK tendency plane and write back t + adv, so no intermediate
tendency array or separate XLA add pass exists.

Scalars listed in ``fluxlimit_list`` (Koren monotone fluxes) stay on the
XLA path (advec_interp._advec_s_lim); the kernels skip them.

Parity: tests/test_advec_interp_pallas.py checks 1e-12 f64 agreement with
the XLA scheme classes for all four schemes on a stretched grid.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import fd
from .pallas_fused import _pallas_call

# cc columns: face-X weights (6), face-U weights (6), center-X (6),
# center-U (6), then per-level scalars.
_WXF, _WUF, _WXC, _WUC = 0, 6, 12, 18
_RCDZI, _RHDZHI, _WMASK, _NC = 24, 25, 26, 27


def _roll(a, n, axis):
    return jnp.roll(a, n, axis=axis)


def _np_col(ctx, name):
    """Host copy of a per-level profile.  NEVER np.asarray(<device
    array>, dtype=...) here: the dtype cast compiles on the device,
    which costs minutes through a tunneled chip."""
    v = getattr(ctx, "np_" + name, None)
    if v is None:
        v = np.asarray(getattr(ctx, name))
    return np.asarray(v, dtype=np.float64)


def build_interp_tables(scheme, ctx, dtype):
    """Per-level ladder weight tables, density-prescaled.

    Row m of the face tables holds the 6 taps (d = -3..+2 relative to the
    half level) of the transported-quantity interpolation at half level m
    (m = 0..kt, walls zero), times rhorefh[m].  Row c of the center tables
    holds the 6 taps (d = -2..+3) of the w-ladder at center c, times
    rhoref[c].  Mirrors advec_interp._zh_ladder / the w-center ladder in
    AdvecInterp.exec exactly, including the small-kt guards.
    """
    ks, ke = ctx.ks, ctx.ke
    kt = ke - ks
    cc = np.zeros((kt + 1, _NC), dtype=np.float64)

    WXf = np.zeros((kt + 1, 6))   # taps d=-3..2 -> col d+3
    WUf = np.zeros((kt + 1, 6))

    def setf(W, m, taps):
        W[m, :] = 0.
        for d, w in taps.items():
            W[m, d + 3] = w

    i2f = {-1: .5, 0: .5}
    i4f = {-2: fd.ci0, -1: fd.ci1, 0: fd.ci2, 1: fd.ci3}
    i4wsf = {-2: -1. / 12., -1: 7. / 12., 0: 7. / 12., 1: -1. / 12.}
    i3wsf = {-2: 1. / 12., -1: -3. / 12., 0: 3. / 12., 1: -1. / 12.}
    i6f = {-3: 1. / 60., -2: -8. / 60., -1: 37. / 60.,
           0: 37. / 60., 1: -8. / 60., 2: 1. / 60.}
    i5f = {-3: -1. / 60., -2: 5. / 60., -1: -10. / 60.,
           0: 10. / 60., 1: -5. / 60., 2: 1. / 60.}

    if scheme == "2i62":
        for m in range(1, kt):
            setf(WXf, m, i2f)
    elif scheme == "2i53":
        setf(WXf, 1, i2f)
        setf(WXf, kt - 1, i2f)
        if kt > 3:
            for m in range(2, kt - 1):
                setf(WXf, m, i4wsf)
                setf(WUf, m, i3wsf)
    elif scheme == "2i4":
        setf(WXf, 1, i2f)
        setf(WXf, kt - 1, i2f)
        if kt > 3:
            for m in range(2, kt - 1):
                setf(WXf, m, i4f)
    elif scheme == "2i5":
        setf(WXf, 1, i2f)
        setf(WXf, kt - 1, i2f)
        if kt > 3:
            setf(WXf, 2, i4wsf)
            setf(WUf, 2, i3wsf)
            setf(WXf, kt - 2, i4wsf)
            setf(WUf, kt - 2, i3wsf)
        if kt > 5:
            for m in range(3, kt - 2):
                setf(WXf, m, i6f)
                setf(WUf, m, i5f)
    else:
        raise ValueError(scheme)

    # center (w-equation) tables, taps d=-2..3 -> col d+2
    WXc = np.zeros((kt + 1, 6))
    WUc = np.zeros((kt + 1, 6))

    def setc(W, c, taps):
        W[c, :] = 0.
        for d, w in taps.items():
            W[c, d + 2] = w

    i2c = {0: .5, 1: .5}
    i4c = {-1: fd.ci0, 0: fd.ci1, 1: fd.ci2, 2: fd.ci3}
    i4wsc = {-1: -1. / 12., 0: 7. / 12., 1: 7. / 12., 2: -1. / 12.}
    i3wsc = {-1: 1. / 12., 0: -3. / 12., 1: 3. / 12., 2: -1. / 12.}
    i6c = {-2: 1. / 60., -1: -8. / 60., 0: 37. / 60.,
           1: 37. / 60., 2: -8. / 60., 3: 1. / 60.}
    i5c = {-2: -1. / 60., -1: 5. / 60., 0: -10. / 60.,
           1: 10. / 60., 2: -5. / 60., 3: 1. / 60.}

    setc(WXc, 0, i2c)
    setc(WXc, kt - 1, i2c)
    if scheme == "2i62":
        for c in range(1, kt - 1):
            setc(WXc, c, i2c)
    elif scheme == "2i53":
        if kt > 2:
            for c in range(1, kt - 1):
                setc(WXc, c, i4wsc)
                setc(WUc, c, i3wsc)
    elif scheme == "2i4":
        if kt > 2:
            for c in range(1, kt - 1):
                setc(WXc, c, i4c)
    else:  # 2i5
        if kt > 2:
            setc(WXc, 1, i4wsc)
            setc(WUc, 1, i3wsc)
            setc(WXc, kt - 2, i4wsc)
            setc(WUc, kt - 2, i3wsc)
        if kt > 4:
            for c in range(2, kt - 2):
                setc(WXc, c, i6c)
                setc(WUc, c, i5c)

    rho = _np_col(ctx, "rhoref")
    rhoh = _np_col(ctx, "rhorefh")
    dzi = _np_col(ctx, "dzi")
    dzhi = _np_col(ctx, "dzhi")

    for m in range(kt + 1):
        WXf[m] *= rhoh[ks + m]
        WUf[m] *= rhoh[ks + m]
    for c in range(kt):
        WXc[c] *= rho[ks + c]
        WUc[c] *= rho[ks + c]

    cc[:, _WXF:_WXF + 6] = WXf
    cc[:, _WUF:_WUF + 6] = WUf
    cc[:, _WXC:_WXC + 6] = WXc
    cc[:, _WUC:_WUC + 6] = WUc
    for k in range(kt):
        cc[k, _RCDZI] = dzi[ks + k] / rho[ks + k]
        cc[k, _RHDZHI] = dzhi[ks + k] / rhoh[ks + k]
        cc[k, _WMASK] = 0. if k == 0 else 1.
    return cc.astype(dtype)


def _hface(scheme, q, axis):
    """Left-face value (+ upwind part or None) at -1/2 along ``axis``."""
    r = functools.partial(_roll, q, axis=axis)
    if scheme == "2i4":
        return (fd.ci0 * r(2) + fd.ci1 * r(1) + fd.ci2 * q
                + fd.ci3 * r(-1)), None
    c = ((37. / 60.) * (r(1) + q) - (8. / 60.) * (r(2) + r(-1))
         + (1. / 60.) * (r(3) + r(-2)))
    if scheme == "2i62":
        return c, None
    u = ((10. / 60.) * (q - r(1)) - (5. / 60.) * (r(-1) - r(2))
         + (1. / 60.) * (r(-2) - r(3)))
    return c, u


def _hterms(scheme, velRx, velRy, q, dxi, dyi):
    """Horizontal flux divergence (+ upwind) given RIGHT-face advecting
    velocities; mirrors advec_interp.AdvecInterp._hterms."""
    qx, ux = _hface(scheme, q, -1)
    Fx = velRx * _roll(qx, -1, -1)
    out = -(Fx - _roll(Fx, 1, -1))
    if ux is not None:
        Gx = jnp.abs(velRx) * _roll(ux, -1, -1)
        out = out + (Gx - _roll(Gx, 1, -1))
    res = out * dxi
    qy, uy = _hface(scheme, q, -2)
    Fy = velRy * _roll(qy, -1, -2)
    out = -(Fy - _roll(Fy, 1, -2))
    if uy is not None:
        Gy = jnp.abs(velRy) * _roll(uy, -1, -2)
        out = out + (Gy - _roll(Gy, 1, -2))
    return res + out * dyi


def _wsum(cc_ref, row, base, planes):
    """sum_j cc[row, base+j] * planes[j] (6 taps)."""
    acc = cc_ref[row, base] * planes[0]
    for j in range(1, 6):
        acc = acc + cc_ref[row, base + j] * planes[j]
    return acc


def _vterm_c(scheme, cc_ref, k, planes, wf0, wf1):
    """Vertical flux divergence for a cell-centered quantity at cell k:
    faces k (advecting wf0) and k+1 (wf1); ``planes`` = q at k-3..k+3."""
    X0 = _wsum(cc_ref, k, _WXF, planes[0:6])
    X1 = _wsum(cc_ref, k + 1, _WXF, planes[1:7])
    adv = -(wf1 * X1 - wf0 * X0)
    if scheme in ("2i5", "2i53"):
        U0 = _wsum(cc_ref, k, _WUF, planes[0:6])
        U1 = _wsum(cc_ref, k + 1, _WUF, planes[1:7])
        adv = adv + (jnp.abs(wf1) * U1 - jnp.abs(wf0) * U0)
    return adv * cc_ref[k, _RCDZI]


def _mom_body(scheme, dxi, dyi, cc_ref, *refs):
    k = pl.program_id(0)
    u = [r[0] for r in refs[0:7]]
    v = [r[0] for r in refs[7:14]]
    w = [r[0] for r in refs[14:21]]
    tu_in, tv_in, tw_in = refs[21][0], refs[22][0], refs[23][0]
    tu_o, tv_o, tw_o = refs[24], refs[25], refs[26]
    u0, v0, w0 = u[3], v[3], w[3]
    um1, vm1, wm1, wp1 = u[2], v[2], w[2], w[4]

    # ---- u ----
    velRx = 0.5 * (u0 + _roll(u0, -1, -1))
    velRy = 0.5 * _roll(_roll(v0, 1, -1) + v0, -1, -2)
    tu = _hterms(scheme, velRx, velRy, u0, dxi, dyi)
    wf0 = 0.5 * (_roll(w0, 1, -1) + w0)
    wf1 = 0.5 * (_roll(wp1, 1, -1) + wp1)
    tu = tu + _vterm_c(scheme, cc_ref, k, u, wf0, wf1)
    tu_o[0] = tu_in + tu

    # ---- v ----
    velRx = _roll(0.5 * (_roll(u0, 1, -2) + u0), -1, -1)
    velRy = 0.5 * (v0 + _roll(v0, -1, -2))
    tv = _hterms(scheme, velRx, velRy, v0, dxi, dyi)
    wf0 = 0.5 * (_roll(w0, 1, -2) + w0)
    wf1 = 0.5 * (_roll(wp1, 1, -2) + wp1)
    tv = tv + _vterm_c(scheme, cc_ref, k, v, wf0, wf1)
    tv_o[0] = tv_in + tv

    # ---- w (half level k; k = 0 is the wall, masked) ----
    velRx = _roll(0.5 * (um1 + u0), -1, -1)
    velRy = _roll(0.5 * (vm1 + v0), -1, -2)
    tw = _hterms(scheme, velRx, velRy, w0, dxi, dyi)
    velw0 = 0.5 * (wm1 + w0)          # center k-1
    velw1 = 0.5 * (w0 + wp1)          # center k
    row0 = jnp.maximum(k - 1, 0)
    Xc0 = _wsum(cc_ref, row0, _WXC, w[0:6])
    Xc1 = _wsum(cc_ref, k, _WXC, w[1:7])
    adv = -(velw1 * Xc1 - velw0 * Xc0)
    if scheme in ("2i5", "2i53"):
        Uc0 = _wsum(cc_ref, row0, _WUC, w[0:6])
        Uc1 = _wsum(cc_ref, k, _WUC, w[1:7])
        adv = adv + (jnp.abs(velw1) * Uc1 - jnp.abs(velw0) * Uc0)
    tw = tw + adv * cc_ref[k, _RHDZHI]
    tw_o[0] = tw_in + tw * cc_ref[k, _WMASK]


def _scalar_body(scheme, dxi, dyi, ns, cc_ref, *refs):
    k = pl.program_id(0)
    u0, v0 = refs[0][0], refs[1][0]
    w0, w1 = refs[2][0], refs[3][0]
    velRx = _roll(u0, -1, -1)
    velRy = _roll(v0, -1, -2)
    outs = refs[4 + 8 * ns:]
    for i in range(ns):
        a = [r[0] for r in refs[4 + 8 * i:4 + 8 * i + 7]]
        t_in = refs[4 + 8 * i + 7][0]
        ts = _hterms(scheme, velRx, velRy, a[3], dxi, dyi)
        ts = ts + _vterm_c(scheme, cc_ref, k, a, w0, w1)
        outs[i][0] = t_in + ts


ADV_HALO = 3  # deepest horizontal tap chain of the 2i* stencils


class AdvecInterpPallas:
    """Pallas executor for an advec_interp scheme instance.

    ``exec`` matches AdvecInterp.exec's contract (adds interior tendencies
    into t); fluxlimited scalars stay on the XLA Koren path.  Under a mesh
    the kernels run per shard on ADV_HALO-padded planes (parallel/halo.py
    ppermute exchange — wider than the fused-kernel HALO because the 6th-
    order stencils tap i/j +/- 3); single-device they run on the full
    planes with cyclic rolls.
    """

    def __init__(self, advec, ctx, dtype, interpret=False, mesh=None):
        self.advec = advec
        self.scheme = advec.scheme
        self.mesh = mesh
        if mesh is not None:
            import copy
            npy = mesh.shape.get("y", 1)
            npx = mesh.shape.get("x", 1)
            ctx_k = copy.copy(ctx)
            ctx_k.jtot = ctx.jtot // npy + 2 * ADV_HALO
            ctx_k.itot = ctx.itot // npx + 2 * ADV_HALO
            self.ctx = ctx_k
        else:
            self.ctx = ctx
        self.interpret = interpret
        self.cc = jnp.asarray(build_interp_tables(self.scheme, ctx, dtype))

    # -- spec helpers ------------------------------------------------------
    def _specs(self, kind):
        """7 plane specs at offsets -3..+3 with wall-clamped k maps."""
        ctx = self.ctx
        ks, ke = ctx.ks, ctx.ke
        hi = ke if kind == "w" else ke - 1

        def mk(off):
            def imap(k, o=off):
                return (jnp.clip(k + ks + o, ks, hi), 0, 0)
            return pl.BlockSpec((1, ctx.jtot, ctx.itot), imap,
                                memory_space=pltpu.VMEM)
        return [mk(o) for o in range(-3, 4)]

    def _spec_at(self, off=0):
        ctx = self.ctx
        ks = ctx.ks
        return pl.BlockSpec((1, ctx.jtot, ctx.itot),
                            functools.partial(
                                lambda k, o: (k + ks + o, 0, 0), o=off),
                            memory_space=pltpu.VMEM)

    def _core(self, *arrays):
        """Kernel pipeline on (possibly halo-padded) plane arrays:
        (u, v, w, tu, tv, tw, s_1..s_n, ts_1..ts_n) -> (tu', tv', tw',
        ts_1'..ts_n')."""
        ctx = self.ctx
        kt = ctx.ke - ctx.ks
        dxi, dyi = float(ctx.dxi), float(ctx.dyi)
        cc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        u, v, w, tu, tv, tw = arrays[:6]
        ns_all = (len(arrays) - 6) // 2
        svals = arrays[6:6 + ns_all]
        tvals = arrays[6 + ns_all:]
        shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
        t_spec = self._spec_at(0)
        cs, ws = self._specs("c"), self._specs("w")

        body = functools.partial(_mom_body, self.scheme, dxi, dyi)
        tu, tv, tw = _pallas_call(
            body, grid=(kt,),
            in_specs=[cc_spec] + cs + cs + ws + [t_spec] * 3,
            out_specs=[t_spec] * 3, out_shape=[shape] * 3,
            input_output_aliases={22: 0, 23: 1, 24: 2},
            interpret=self.interpret,
        )(self.cc, *([u] * 7 + [v] * 7 + [w] * 7), tu, tv, tw)

        # ---- scalars (chunked to bound VMEM) -----------------------------
        plane = ctx.jtot * ctx.itot * u.dtype.itemsize
        per = max(1, int((45 * 1024 * 1024 // max(plane, 1) - 4) // 9))
        outs_s = []
        for i0 in range(0, ns_all, per):
            grp = list(range(i0, min(i0 + per, ns_all)))
            ns = len(grp)
            body = functools.partial(_scalar_body, self.scheme, dxi, dyi, ns)
            ins = [self.cc, u, v, w, w]
            in_specs = [cc_spec, self._spec_at(0), self._spec_at(0),
                        self._spec_at(0), self._spec_at(1)]
            aliases = {}
            for j, idx in enumerate(grp):
                ins += [svals[idx]] * 7 + [tvals[idx]]
                in_specs += cs + [t_spec]
                aliases[12 + 8 * j] = j  # 5 fixed operands + 7 planes
            outs = _pallas_call(
                body, grid=(kt,), in_specs=in_specs,
                out_specs=[t_spec] * ns, out_shape=[shape] * ns,
                input_output_aliases=aliases,
                interpret=self.interpret,
            )(*ins)
            outs_s.extend(outs)
        return (tu, tv, tw) + tuple(outs_s)

    def exec(self, ctx, s, t, aux):
        t = dict(t)
        u, v, w = s["u"], s["v"], s["w"]
        names = [n for n in ctx.scalar_names
                 if n not in self.advec.fluxlimit_list]
        arrays = ([u, v, w, t["u"], t["v"], t["w"]]
                  + [s[n] for n in names] + [t[n] for n in names])
        if self.mesh is None:
            outs = self._core(*arrays)
        else:
            from ..parallel.halo import sharded_planes_call
            outs = sharded_planes_call(self.mesh, self._core,
                                       3 + len(names), *arrays,
                                       halo=ADV_HALO)
        t["u"], t["v"], t["w"] = outs[0], outs[1], outs[2]
        for n, o in zip(names, outs[3:]):
            t[n] = o

        # Koren-limited scalars: XLA fallback (advec_monotonic.h) on the
        # global arrays (GSPMD lowers the rolls to collective permutes)
        from .advec_interp import _advec_s_lim
        ks, ke = ctx.ks, ctx.ke
        for n in ctx.scalar_names:
            if n in self.advec.fluxlimit_list:
                t[n] = t[n].at[ks:ke].add(
                    _advec_s_lim(ctx, s[n], u, v, w))
        return t

    def cfl_max(self, ctx, s):
        return self.advec.cfl_max(ctx, s)
