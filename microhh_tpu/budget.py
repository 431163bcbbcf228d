"""Second-order TKE / variance budget statistics (reference
``src/budget_2.cxx``).

Computes the budget terms of <u'2>, <v'2>, <w'2>, tke = (u'2+v'2+w'2)/2 and
<b'2> as horizontally-averaged profiles in the "budget" stats group:

  *_shear  — production against the mean shear
  *_turb   — turbulent (triple-moment) transport
  *_visc   — viscous transport (constant molecular viscosity)
  *_diss   — viscous dissipation
  *_pres   — pressure transport (w2/tke) / redistribution terms
  *_buoy   — buoyancy production (w2/tke)

Discretizations follow the 2nd-order staggered forms of the reference; all
reductions run on device in one jitted pass per sample.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .ops.stencil import im, ip, jm, jp, i2


def _hm(a):
    return jnp.mean(a, axis=(1, 2))


def budget_profiles(ctx, s, aux, thermo, visc, order=2):
    """Return dict of (ktot,) budget profiles.

    ``order=4`` (reference ``src/budget_4.cxx``) swaps the interpolations
    and gradients for their 4th-order forms — the same physical terms, the
    DNS-grade discretization."""
    ks, ke = ctx.ks, ctx.ke
    u, v, w = s["u"], s["v"], s["w"]
    out = {}

    from . import fd

    def i2z_c(a):
        """half->full interpolation at centers ks..ke-1."""
        if order == 2:
            return i2(a[ks:ke], a[ks + 1:ke + 1])
        return (fd.ci0 * a[ks - 1:ke - 1] + fd.ci1 * a[ks:ke]
                + fd.ci2 * a[ks + 1:ke + 1] + fd.ci3 * a[ks + 2:ke + 2])

    def ddz_c(prof):
        """d/dz of a full-level (kcells,) mean profile at centers."""
        if order == 2:
            return (prof[ks + 1:ke + 1] - prof[ks - 1:ke - 1]) * 0.5 * np.asarray(ctx.dzi)[ks:ke]
        return (-fd.cg0 * (prof[ks + 2:ke + 2] - prof[ks - 1:ke - 1])
                - fd.cg1 * (prof[ks + 1:ke + 1] - prof[ks:ke])) * np.asarray(ctx.dzi4)[ks:ke]

    def gradx(a):
        if order == 2:
            return (ip(a) - a) * ctx.dxi
        return (fd.cg0 * im(a) + fd.cg1 * a + fd.cg2 * ip(a)
                + fd.cg3 * ip(a, 2)) * ctx.dxi

    def grady(a):
        if order == 2:
            return (jp(a) - a) * ctx.dyi
        return (fd.cg0 * jm(a) + fd.cg1 * a + fd.cg2 * jp(a)
                + fd.cg3 * jp(a, 2)) * ctx.dyi

    umean = jnp.mean(u, axis=(1, 2), keepdims=True)
    vmean = jnp.mean(v, axis=(1, 2), keepdims=True)
    uf = u - umean
    vf = v - vmean
    wf = w  # <w> ~ 0 on the staggered anelastic grid

    dzi = ctx.dzi[:, None, None]
    dzhi = ctx.dzhi[:, None, None]

    # interpolate w to full levels (order-matched; at 4th order the w ghost
    # levels exist, kgc=3)
    wc = jnp.zeros_like(u)
    if order == 2:
        wc = wc.at[ks:ke].set(i2(wf[ks:ke], wf[ks + 1:ke + 1]))
    else:
        wc = wc.at[ks:ke].set(i2z_c(wf))

    # --- shear production: -2 <u'w'> dU/dz (budget_2.cxx calc_shear) ---
    dudz = (i2(umean[ks + 1:ke + 1, 0, 0], umean[ks:ke, 0, 0])
            - i2(umean[ks:ke, 0, 0], umean[ks - 1:ke - 1, 0, 0])) * ctx.dzi[ks:ke]
    # u'w' at centers
    uw = _hm((i2(im(wc), wc) * uf)[ks:ke])
    vw = _hm((i2(jm(wc), wc) * vf)[ks:ke])
    dumdz = ddz_c(umean[:, 0, 0])
    dvmdz = ddz_c(vmean[:, 0, 0])
    out["u2_shear"] = -2. * uw * dumdz
    out["v2_shear"] = -2. * vw * dvmdz
    out["tke_shear"] = 0.5 * (out["u2_shear"] + out["v2_shear"])
    out["uw_shear"] = -_hm((wf * wf)[ks:ke]) * dumdz

    # --- turbulent transport: -d<q w>/dz ---
    def turb(qc):
        """qc: fluctuation-squared at centers; returns -d<qc w>/dz."""
        flux = jnp.zeros(ke - ks + 1)
        qh = i2(qc[ks - 1:ke], qc[ks:ke + 1])
        flux = _hm(qh * wf[ks:ke + 1])
        return -(flux[1:] - flux[:-1]) * ctx.dzi[ks:ke]

    out["u2_turb"] = turb(uf * uf)
    out["v2_turb"] = turb(vf * vf)
    w2c = wc * wc
    out["w2_turb"] = turb(w2c)
    out["tke_turb"] = 0.5 * (out["u2_turb"] + out["v2_turb"] + out["w2_turb"])

    # --- pressure terms ---
    if aux is not None and "p" in aux:
        p = aux["p"]
        pmean = jnp.mean(p, axis=(1, 2), keepdims=True)
        pf = p - pmean
        # transport: -2 d<w'p'>/dz at centers
        wp = _hm(pf * i2(wf, jnp.roll(wf, -1, axis=0)))  # approx at centers
        wp_h = _hm(i2(pf[ks - 1:ke], pf[ks:ke + 1]) * wf[ks:ke + 1])
        out["w2_pres"] = -2. * (wp_h[1:] - wp_h[:-1]) * ctx.dzi[ks:ke]
        out["tke_pres"] = -(wp_h[1:] - wp_h[:-1]) * ctx.dzi[ks:ke]
        # redistribution: 2<p' du'/dx> etc.
        out["u2_rdstr"] = _hm((2. * pf * (ip(uf) - uf) * ctx.dxi)[ks:ke])
        out["v2_rdstr"] = _hm((2. * pf * (jp(vf) - vf) * ctx.dyi)[ks:ke])
        out["w2_rdstr"] = _hm((2. * pf[ks:ke] * (wf[ks + 1:ke + 1] - wf[ks:ke])
                               * ctx.dzi[ks:ke][:, None, None]))

    # --- viscous transport and dissipation (constant molecular visc) ---
    def visc_terms(qc):
        qm = _hm(qc)
        d2 = jnp.zeros(ke - ks)
        d2 = (qm[ks + 1:ke + 1] - 2. * qm[ks:ke] + qm[ks - 1:ke - 1]) * ctx.dzi[ks:ke] ** 2
        return visc * d2

    out["u2_visc"] = visc_terms(uf * uf)
    out["v2_visc"] = visc_terms(vf * vf)
    out["w2_visc"] = visc_terms(w2c)
    out["tke_visc"] = 0.5 * (out["u2_visc"] + out["v2_visc"] + out["w2_visc"])

    def dissipation(qf, stag="u"):
        gx = gradx(qf)
        gy = grady(qf)
        if order == 2:
            gz = (qf[ks + 1:ke + 1] - qf[ks - 1:ke - 1]) * 0.5 * dzi[ks:ke]
        else:
            dzi4 = ctx.dzi4[ks:ke][:, None, None]
            gz = (-fd.cg0 * (qf[ks + 2:ke + 2] - qf[ks - 1:ke - 1])
                  - fd.cg1 * (qf[ks + 1:ke + 1] - qf[ks:ke])) * dzi4
        return -2. * visc * (_hm(gx[ks:ke] ** 2) + _hm(gy[ks:ke] ** 2)
                             + _hm(gz ** 2))

    out["u2_diss"] = dissipation(uf)
    out["v2_diss"] = dissipation(vf)
    out["w2_diss"] = dissipation(wc)
    out["tke_diss"] = 0.5 * (out["u2_diss"] + out["v2_diss"] + out["w2_diss"])

    # --- buoyancy ---
    if thermo is not None and getattr(thermo, "scalars", ()):
        b = thermo.get_buoyancy(ctx, s)
        bmean = jnp.mean(b, axis=(1, 2), keepdims=True)
        bf = b - bmean
        out["w2_buoy"] = 2. * _hm((wc * bf)[ks:ke])
        out["tke_buoy"] = _hm((wc * bf)[ks:ke])
        # b variance budget
        dbmdz = ddz_c(bmean[:, 0, 0])
        out["b2_shear"] = -2. * _hm((wc * bf)[ks:ke]) * dbmdz
        out["b2_turb"] = turb(bf * bf)
    return out


class Budget:
    """Attachable to Stats: registers and fills the 'budget' group."""

    def __init__(self, model):
        sw = model.ini.get_str("budget", "swbudget", default="0")
        self.sw = sw not in ("0", "false")
        if not self.sw:
            return
        if sw == "4" and model.grid.spatial_order != 4:
            raise ValueError("swbudget=4 requires swspatialorder=4")
        if sw == "2" and model.grid.spatial_order != 2:
            raise ValueError("swbudget=2 requires swspatialorder=2")
        self.model = model
        self._names = None

    def register(self, stats):
        if not self.sw:
            return
        # names determined on first exec; pre-register the known set
        base = []
        for q in ("u2", "v2", "w2", "tke"):
            for term in ("shear", "turb", "visc", "diss", "pres", "rdstr", "buoy"):
                base.append("%s_%s" % (q, term))
        base += ["uw_shear", "b2_shear", "b2_turb"]
        for name in base:
            stats.add_prof(name, name.replace("_", " "), "-", "z", group="budget")

    def profiles(self, ctx, s, aux):
        m = self.model
        sw = m.ini.get_str("budget", "swbudget", default="0")
        order = 4 if sw == "4" or (sw not in ("0", "false", "2")
                                   and m.grid.spatial_order == 4) else 2
        return budget_profiles(ctx, s, aux, m.thermo, m.fields.visc,
                               order=order)
