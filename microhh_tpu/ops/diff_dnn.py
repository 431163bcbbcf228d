"""Deep-neural-network subgrid-stress diffusion (fork-specific).

Reference: ``src/diff_dnn_local.cxx`` / ``diff_dnn_global.cxx`` /
``diff_dnn_stats.cxx`` — the three normalization variants of the CNN SGS
closure for stably-stratified boundary layers.

TPU-first pipeline (everything fused into the jitted step, no libtorch
boundary):
  1. Smagorinsky eddy viscosity (shared machinery; used for scalars and the
     diffusion-number dt limit, diff_dnn_local.cxx:1689-1840).
  2. Destagger u,v,w to cell centers + 27-point top-hat filters (:422-614);
     Taylor-microscale energy estimates TKEh/TKEv/TPE (:615-810).
  3. Patch extraction as 27 rolled copies x 4 fields = a (108, ...) stack,
     per-point normalization by the variant's scales (:813-889), then the
     CNN as an MXU batched matmul chain (models/dnn.py) over all points
     below kendBL = ks + 3/4*ktot (:891-894).
  4. Denormalize the 6 stress components, optional deviatoric trace removal
     (:896-939); scatter to T11..T33 with surface-flux blending (:942-1030).
  5. Tendencies = -dTau_ij/dx_j (:1060-1210) + molecular diffusion; scalars
     diffuse with the Smagorinsky evisc.
"""

import numpy as np
import jax.numpy as jnp

from .. import constants as cst
from ..models.dnn import TauDNN
from .diff_smag2 import DiffSmag2
from .diff_2 import diff_c as molecular_diff_c, diff_w as molecular_diff_w
from .stencil import im, ip, jm, jp

DSMALLER = 1.e-16   # Constants::dsmaller (constants.h:96)
DTINY = 1.e-30      # Constants::dtiny (constants.h:95)


def _hsum9(a):
    row = im(a) + a + ip(a)
    return jm(row) + row + jp(row)


class DiffDNN:
    def __init__(self, ini, grid, fields, boundary, variant="dnn_local"):
        self.variant = variant
        self.smag = DiffSmag2(ini, grid, fields, boundary)
        self.dnmax = self.smag.dnmax
        self.tPr = self.smag.tPr
        self.grid = grid
        self.fields = fields
        self.boundary = boundary
        self.visc = fields.visc
        self.viscs = self.smag.viscs
        self.swdeviatoric = ini.get_bool("diff", "swdeviatoric", default=True)
        # [diff] ce (diff_dnn_local.cxx:1446): coefficient of the TKE-based
        # eddy-viscosity variant whose call site is commented out upstream
        # (:1807-1817); accepted for ini parity, unused like the reference.
        self.ce = ini.get_float("diff", "ce", default=0.15)
        dnnpath = ini.get_str("diff", "dnnpath", default="")
        allow_random = ini.get_bool("diff", "swdnnrandom", default=False)
        self.net = TauDNN.load(dnnpath, allow_random=allow_random)
        self.surface = getattr(boundary, "is_surface", False)
        if not self.surface:
            raise NotImplementedError("diff_dnn currently requires swboundary=surface")

        if variant == "dnn_global":
            # diff_dnn_global.cxx:1247-1259
            Re = ini.get_float("diff", "Re", default=20000.0)
            Ug = ini.get_float("diff", "Ug", default=0.05)
            b0 = ini.get_float("diff", "b0", default=-0.0044)
            self.ivel_scale = np.sqrt(Re) / Ug
            self.stress_scale = Ug * Ug / Re
            self.ib_scale = 1.0 / (0. - b0)
        elif variant == "dnn_stats":
            # diff_dnn_stats.cxx:1250-1262
            self.iuvStd = 1.0 / ini.get_float("diff", "uvStd", default=1.0)
            self.iwStd = 1.0 / ini.get_float("diff", "wStd", default=1.0)
            self.ibStd = 1.0 / ini.get_float("diff", "bStd", default=1.0)
            self.ThStd = ini.get_float("diff", "ThStd", default=1.0)
            self.Ti3Std = ini.get_float("diff", "Ti3Std", default=1.0)
            self.T33Std = ini.get_float("diff", "T33Std", default=1.0)

        self._thermo = None

    @property
    def thermo(self):
        return self._thermo

    @thermo.setter
    def thermo(self, value):
        self._thermo = value
        self.smag.thermo = value

    def kendBL(self, ctx):
        return ctx.ks + (3 * ctx.ktot) // 4

    # ------------------------------------------------------------------
    def _box_filter(self, ctx, a, lo):
        """27-point top-hat from level lo+1 up; 9-point 2-D at level lo;
        zero above interior like the reference's zero-initialized temps."""
        ks, ke = ctx.ks, ctx.ke
        h = _hsum9(a)
        out = jnp.zeros_like(a)
        out = out.at[lo].set(h[lo] / 9.)
        out = out.at[lo + 1:ke].set((h[lo:ke - 1] + h[lo + 1:ke] + h[lo + 2:ke + 1]) / 27.)
        return out

    def exec_viscosity(self, ctx, s, sfc, aux):
        aux = self.smag.exec_viscosity(ctx, s, sfc, aux)
        ks, ke = ctx.ks, ctx.ke
        kBL = self.kendBL(ctx)

        u, v, w = s["u"], s["v"], s["w"]
        # Destagger to centers; interior only, ghosts zero (diagnostic-field
        # semantics of the reference).
        zero = jnp.zeros_like(u)
        uc = zero.at[ks:ke].set(0.5 * (u + ip(u))[ks:ke])
        vc = zero.at[ks:ke].set(0.5 * (v + jp(v))[ks:ke])
        wc = zero.at[ks:ke].set(0.5 * (w[ks:ke] + w[ks + 1:ke + 1]))
        b_full = self._thermo.get_buoyancy(ctx, s)
        b = zero.at[ks:ke].set(b_full[ks:ke])

        uf = self._box_filter(ctx, uc, ks)
        vf = self._box_filter(ctx, vc, ks)
        wf = self._box_filter(ctx, wc, ks)
        bf = self._box_filter(ctx, b, ks)

        if self.variant == "dnn_local":
            # Taylor-estimate energies (diff_dnn_local.cxx:615-810).
            def tkeh_point(ucq, vcq):
                return 0.25 * ((ip(ucq) - im(ucq)) ** 2 + (ip(vcq) - im(vcq)) ** 2
                               + (jp(ucq) - jm(ucq)) ** 2 + (jp(vcq) - jm(vcq)) ** 2)

            tkeh = jnp.zeros_like(u)
            interior = (tkeh_point(uc, vc)[ks + 1:ke]
                        + 0.25 * ((uc[ks + 2:ke + 1] - uc[ks:ke - 1]) ** 2
                                  + (vc[ks + 2:ke + 1] - vc[ks:ke - 1]) ** 2))
            tkeh = tkeh.at[ks + 1:ke].set(interior)
            tkehf = self._box_filter(ctx, tkeh, ks + 1)

            tkev = jnp.zeros_like(u)
            tv = 0.25 * ((ip(wc) - im(wc)) ** 2 + (jp(wc) - jm(wc)) ** 2)[ks + 1:ke]
            tv = tv + 0.25 * (wc[ks + 2:ke + 1] - wc[ks:ke - 1]) ** 2
            tkev = tkev.at[ks + 1:ke].set(tv)
            tkevf = self._box_filter(ctx, tkev, ks + 1)

            tpe = jnp.zeros_like(u)
            n2loc = (bf[ks + 2:ke + 1] - bf[ks:ke - 1]) / (ctx.z[ks + 2:ke + 1] - ctx.z[ks:ke - 1])[:, None, None]
            tp = (0.25 * ((ip(bf) - im(bf)) ** 2 + (jp(bf) - jm(bf)) ** 2)[ks + 1:ke]
                  + 0.25 * (bf[ks + 2:ke + 1] - bf[ks:ke - 1]) ** 2) / n2loc
            tpe = tpe.at[ks + 1:ke].set(tp)
        else:
            tkeh = tkev = tkehf = tkevf = tpe = None

        tau = self._calc_tau(ctx, uf, vf, wf, bf, tkeh, tkev, tkehf, tkevf, tpe)

        aux = dict(aux)
        aux["Tau"] = tau
        return aux

    def _calc_tau(self, ctx, uf, vf, wf, bf, tkeh, tkev, tkehf, tkevf, tpe):
        """Return Tau (6, nkBL, jtot, itot) for levels ks+1 .. kendBL-2."""
        ks = ctx.ks
        kBL = self.kendBL(ctx)
        lo, hi = ks + 1, kBL - 1  # target center levels (exclusive hi)

        # 27 shifted copies of the 4 fields, channel order matching the
        # reference patch layout (diff_dnn_local.cxx:870-886):
        # per vertical offset iz: channels [u, v] pairs then w block then b.
        def patch_stack(a):
            """(27, nk, j, i): offsets ordered (iz, ix, iy)."""
            planes = []
            for iz in (-1, 0, 1):
                az = a[lo + iz:hi + iz]
                for ix in (-1, 0, 1):
                    for iy in (-1, 0, 1):
                        planes.append(jnp.roll(jnp.roll(az, -ix, axis=-1), -iy, axis=-2))
            return jnp.stack(planes)

        pu = patch_stack(uf)
        pv = patch_stack(vf)
        pw = patch_stack(wf)
        pb = patch_stack(bf)

        ubar = jnp.mean(pu, axis=0)
        vbar = jnp.mean(pv, axis=0)
        wbar = jnp.mean(pw, axis=0)
        bbar = jnp.mean(pb, axis=0)

        if self.variant == "dnn_local":
            rootki = (tkeh[lo:hi] + tkev[lo:hi] + DSMALLER) ** -0.5
            rootkvi = (tkev[lo:hi] + DSMALLER) ** -0.5
            bscalei = ctx.dz[lo:hi][:, None, None] / (tpe[lo:hi] + DTINY)
            su, sv, sw, sb = rootki, rootki, rootkvi, bscalei
        elif self.variant == "dnn_global":
            su = sv = sw = ctx.dtype(self.ivel_scale)
            sb = ctx.dtype(self.ib_scale)
        else:  # dnn_stats
            su = sv = ctx.dtype(self.iuvStd)
            sw = ctx.dtype(self.iwStd)
            sb = ctx.dtype(self.ibStd)

        xu = (pu - ubar) * su
        xv = (pv - vbar) * sv
        xw = (pw - wbar) * sw
        xb = (pb - bbar) * sb

        # Assemble the 108-dim input in the exact channel/spatial order of
        # the reference tensor x[n, 12, nh, nh] flattened C-contiguously:
        # channel c, spatial (ih+ix, ih+iy).  Channels: 2*(iz+1)=u(iz),
        # 2*(iz+1)+1=v(iz), 6+(iz+1)=w(iz), 9+(iz+1)=b(iz).
        def block(p, iz):
            # offsets in patch_stack order: index = (iz+1)*9 + (ix+1)*3 + (iy+1)
            return [p[(iz + 1) * 9 + (ix + 1) * 3 + (iy + 1)]
                    for ix in (-1, 0, 1) for iy in (-1, 0, 1)]

        # channel order: [u(-1), v(-1), u(0), v(0), u(1), v(1), w(-1), w(0),
        # w(1), b(-1), b(0), b(1)], each flattened over its 9 spatial taps.
        ordered = []
        for iz in (-1, 0, 1):
            ordered.extend(block(xu, iz))
            ordered.extend(block(xv, iz))
        for iz in (-1, 0, 1):
            ordered.extend(block(xw, iz))
        for iz in (-1, 0, 1):
            ordered.extend(block(xb, iz))

        X = jnp.stack(ordered)  # (108, nk, j, i)
        nk, nj, ni = X.shape[1:]
        Xf = X.reshape(108, -1).T  # (points, 108)

        tau_flat = self.net(Xf)  # (points, 6)
        tau = tau_flat.T.reshape(6, nk, nj, ni)

        # Denormalize (diff_dnn_local.cxx:896-939 / variants).
        if self.variant == "dnn_local":
            ktot_e = tkehf[lo:hi] + tkevf[lo:hi]
            kv = tkevf[lo:hi]
            rootkkv = jnp.sqrt(ktot_e * kv)
            t11 = tau[0] * ktot_e
            t12 = tau[1] * ktot_e
            t13 = tau[2] * rootkkv
            t22 = tau[3] * ktot_e
            t23 = tau[4] * rootkkv
            t33 = tau[5] * kv
            if self.swdeviatoric:
                third = (tau[0] * ktot_e + tau[3] * ktot_e + tau[5] * kv) / 3.
                t11 = t11 - third
                t22 = t22 - third
                t33 = t33 - third
        elif self.variant == "dnn_global":
            sc = ctx.dtype(self.stress_scale)
            if self.swdeviatoric:
                third = (tau[0] + tau[3] + tau[5]) / 3.
                t11 = (tau[0] - third) * sc
                t22 = (tau[3] - third) * sc
                t33 = (tau[5] - third) * sc
            else:
                t11, t22, t33 = tau[0] * sc, tau[3] * sc, tau[5] * sc
            t12, t13, t23 = tau[1] * sc, tau[2] * sc, tau[4] * sc
        else:  # dnn_stats
            if self.swdeviatoric:
                third = ((tau[0] + tau[3]) * self.ThStd + tau[5] * self.T33Std) / 3.
                t11 = tau[0] * self.ThStd - third
                t22 = tau[3] * self.ThStd - third
                t33 = tau[5] * self.T33Std - third
            else:
                t11 = tau[0] * self.ThStd
                t22 = tau[3] * self.ThStd
                t33 = tau[5] * self.T33Std
            t12 = tau[1] * self.ThStd
            t13 = tau[2] * self.Ti3Std
            t23 = tau[4] * self.Ti3Std

        return jnp.stack([t11, t12, t13, t22, t23, t33])

    # ------------------------------------------------------------------
    def _set_flux(self, ctx, tau_k, dim, sfc):
        """Expand one stress component to a full (kcells,...) field with
        surface blending (diff_dnn_local.cxx set_flux, :942-1030)."""
        ks = ctx.ks
        kBL = self.kendBL(ctx)
        T = jnp.zeros((ctx.kcells,) + tau_k.shape[1:], dtype=tau_k.dtype)
        T = T.at[ks + 1:kBL - 1].set(tau_k)

        z, zh = ctx.z, ctx.zh
        fac = (z[ks] - zh[ks]) / (z[ks + 1] - zh[ks])
        if dim == 2:
            fb = 0.5 * (sfc["u_fluxbot"] + ip(sfc["u_fluxbot"]))
            T = T.at[ks].set(fb + fac * (T[ks + 1] - fb))
        elif dim == 4:
            fb = 0.5 * (sfc["v_fluxbot"] + jp(sfc["v_fluxbot"]))
            T = T.at[ks].set(fb + fac * (T[ks + 1] - fb))
        else:
            T = T.at[ks].set(fac * T[ks + 1])
        # zero-gradient top of the DNN region
        T = T.at[kBL - 1].set(T[kBL - 2])
        T = T.at[kBL].set(T[kBL - 1])
        return T

    def exec(self, ctx, s, t, aux, sfc):
        ks, ke = ctx.ks, ctx.ke
        kBL = self.kendBL(ctx)
        tau = aux["Tau"]
        t = dict(t)

        T11 = self._set_flux(ctx, tau[0], 0, sfc)
        T12 = self._set_flux(ctx, tau[1], 1, sfc)
        T13 = self._set_flux(ctx, tau[2], 2, sfc)
        T22 = self._set_flux(ctx, tau[3], 3, sfc)
        T23 = self._set_flux(ctx, tau[4], 4, sfc)
        T33 = self._set_flux(ctx, tau[5], 5, sfc)

        dxi, dyi = ctx.dxi, ctx.dyi
        z, zh = ctx.z, ctx.zh

        # ---- u tendency (diff_dnn_local.cxx diff_u) ----
        dz2 = (z[ks + 2:kBL + 1] - z[ks:kBL - 1])[:, None, None]
        du = (-dxi * (T11 - im(T11))[ks + 1:kBL]
              - 0.25 * dyi * (jp(T12) + im(jp(T12)) - jm(T12) - im(jm(T12)))[ks + 1:kBL]
              - 0.5 * ((T13 + im(T13))[ks + 2:kBL + 1] - (T13 + im(T13))[ks:kBL - 1]) / dz2)
        t["u"] = t["u"].at[ks + 1:kBL].add(du)
        # bottom row (surface)
        du_bot = (-dxi * (ip(T11) - T11)[ks]
                  - 0.25 * dyi * (jp(T12) + ip(jp(T12)) - jm(T12) - ip(jm(T12)))[ks]
                  - (0.5 * (T13 + im(T13))[ks + 1] - sfc["u_fluxbot"]) / (z[ks + 1] - zh[ks]))
        t["u"] = t["u"].at[ks].add(du_bot)

        # ---- v tendency ----
        dv = (-0.25 * dxi * (ip(T12) + jm(ip(T12)) - im(T12) - jm(im(T12)))[ks + 1:kBL]
              - dyi * (T22 - jm(T22))[ks + 1:kBL]
              - 0.5 * ((T23 + jm(T23))[ks + 2:kBL + 1] - (T23 + jm(T23))[ks:kBL - 1]) / dz2)
        t["v"] = t["v"].at[ks + 1:kBL].add(dv)
        dv_bot = (-0.25 * dxi * (ip(T12) + jp(ip(T12)) - im(T12) - jp(im(T12)))[ks]
                  - dyi * (jp(T22) - T22)[ks]
                  - (0.5 * (T23 + jm(T23))[ks + 1] - sfc["v_fluxbot"]) / (z[ks + 1] - zh[ks]))
        t["v"] = t["v"].at[ks].add(dv_bot)

        # ---- w tendency (half levels ks+1..kBL-1) ----
        dzw = (z[ks + 1:kBL] - z[ks:kBL - 1])[:, None, None]
        dw = (-0.25 * dxi * ((ip(T13))[ks + 1:kBL] + (ip(T13))[ks:kBL - 1]
                             - (im(T13))[ks + 1:kBL] - (im(T13))[ks:kBL - 1])
              - 0.25 * dyi * ((jp(T23))[ks + 1:kBL] + (jp(T23))[ks:kBL - 1]
                              - (jm(T23))[ks + 1:kBL] - (jm(T23))[ks:kBL - 1])
              - (T33[ks + 1:kBL] - T33[ks:kBL - 1]) / dzw)
        t["w"] = t["w"].at[ks + 1:kBL].add(dw)

        # ---- scalars: Smagorinsky evisc diffusion (incl. molecular) ----
        t_sc = {name: t[name] for name in ctx.scalar_names}
        t_sc.update({"u": jnp.zeros_like(t["u"]), "v": jnp.zeros_like(t["v"]),
                     "w": jnp.zeros_like(t["w"])})
        t_sc = self.smag.exec(ctx, s, t_sc, aux, sfc)
        for name in ctx.scalar_names:
            t[name] = t_sc[name]

        # ---- molecular diffusion on momentum (diff_dnn_local.cxx:1662-1676) ----
        t["u"] = t["u"].at[ks:ke].add(molecular_diff_c(ctx, s["u"], self.visc))
        t["v"] = t["v"].at[ks:ke].add(molecular_diff_c(ctx, s["v"], self.visc))
        t["w"] = t["w"].at[ks + 1:ke].add(molecular_diff_w(ctx, s["w"], self.visc))
        return t

    def get_dn(self, ctx, s, aux):
        return self.smag.get_dn(ctx, s, aux)
