"""Open lateral boundaries (in/outflow) for selected scalars.

Reference: ``src/boundary_outflow.cxx`` + ``src/boundary.cxx:271-272,410-470``.
The reference overwrites the horizontal ghost cells of each scalar in
``[boundary] scalar_outflow`` after the cyclic exchange: outflow edges copy
the interior value (zero-gradient), inflow edges extrapolate through a
prescribed profile ``<scalar>_inflow`` from the ``init`` group
(``compute_inoutflow_2nd``, boundary_outflow.cxx:84-150).

TPU re-design: this framework has NO horizontal ghost cells — periodicity is
``jnp.roll``.  A ghost value with igc=1 influences exactly one thing: the
advective/diffusive flux through the open face of the first/last column.  So
the open BC becomes an exact tendency correction: after the roll-based
advec/diff pass, replace the wrapped-face flux with the open-boundary flux
on the four edge columns.  For 2nd order this reproduces the reference ghost
semantics bit-for-bit for Advec_2 + Diff_2/Diff_smag2:

* outflow ghost g = a_edge  -> advective face value a_edge, diffusive flux 0;
* inflow ghost g = 2*prof - a_edge -> advective face value prof, diffusive
  gradient 2*(a_edge - prof)*dxi.

Face velocities and evisc stay periodic, exactly as in the reference (only
the scalars' ghosts are overwritten there).

4th order: the reference specializes to a Dirichlet-0 inflow at the WEST
edge and extrapolated outflow at the EAST edge, cyclic in y, regardless of
the ``flow_direction`` config (``boundary_outflow.cxx:244-258``, kernels
``compute_inflow_4th``/``compute_outflow_4th`` at ``:151-196``).  The same
tendency-correction trick applies: the ghost columns influence the first /
last three columns' x-advection (advec_4 flux faces reach i±3) and
x-diffusion (diff_4 cdg stencil reaches i±3) LINEARLY, so the correction is
the stencil applied to (ghost_open - ghost_wrapped) deltas.
"""

import jax.numpy as jnp

from .. import fd

EDGES = ("west", "east", "south", "north")


class BoundaryOutflow:
    def __init__(self, ini, grid, spatial_order):
        self.grid = grid
        self.spatial_order = spatial_order
        self.scalars = ini.get_list(str, "boundary", "scalar_outflow", default=[])
        self.direction = {}
        self.inflow_profiles = {}
        if not self.scalars:
            return
        if spatial_order == 4:
            swadvec = ini.get_str("advec", "swadvec", default="4")
            if swadvec not in ("4", "disabled", "0"):
                raise NotImplementedError(
                    "4th-order scalar_outflow supports swadvec=4 only")
            # reference hardcodes west=inflow(0), east=outflow at order 4
            self.direction = {"west": "inflow", "east": "outflow"}
        else:
            for edge in EDGES:
                d = ini.get_str("boundary", "flow_direction", subitem=edge)
                if d not in ("inflow", "outflow"):
                    raise ValueError("flow direction %r is invalid" % d)
                self.direction[edge] = d
        self.swtimedep = ini.get_bool("boundary", "swtimedep_outflow", default=False)

    @property
    def active(self):
        return bool(self.scalars)

    def create(self, input_nc):
        """Load constant inflow profiles (boundary.cxx:418-426)."""
        import numpy as np
        if not self.scalars or self.swtimedep:
            return
        if self.spatial_order == 4:
            return  # order-4 inflow is Dirichlet 0 (boundary_outflow.cxx:247)
        g = self.grid
        init = input_nc.groups["init"]
        for name in self.scalars:
            prof = np.zeros(g.kcells)
            prof[g.kstart:g.kend] = np.asarray(
                init.variables[name + "_inflow"][:g.ktot])
            self.inflow_profiles[name] = prof

    # -- tendency corrections ----------------------------------------------
    def correct(self, ctx, s, t, aux, tPr=None, sviscs=None):
        """Replace the wrapped-face advective+diffusive fluxes with the
        open-boundary fluxes on the edge columns of each outflow scalar."""
        if not self.scalars:
            return t
        if self.spatial_order == 4:
            return self._correct_4th(ctx, s, t, sviscs)
        ks, ke = ctx.ks, ctx.ke
        dxi, dyi = ctx.dxi, ctx.dyi
        u, v = s["u"], s["v"]
        evisc = aux.get("evisc")
        t = dict(t)
        for name in self.scalars:
            a = s[name]
            prof = jnp.asarray(self.inflow_profiles.get(name),
                               dtype=ctx.dtype)[:, None] \
                if name in self.inflow_profiles else jnp.zeros((a.shape[0], 1), ctx.dtype)
            svisc = (sviscs or {}).get(name, 0.)
            ta = t[name]

            def dcoef(ev_face):
                # scalar diffusivity on a face (diff_smag2 diff_c face coeff)
                if evisc is None:
                    return svisc
                return ev_face / tPr + svisc

            # ---- west face of column 0 (x direction, velocity u[...,0]) --
            if "west" in self.direction:
                uf = u[:, :, 0]
                aw = a[:, :, -1]      # wrapped neighbor used by the rolls
                a0 = a[:, :, 0]
                ev_face = dcoef(0.5 * (evisc[:, :, -1] + evisc[:, :, 0])) \
                    if evisc is not None else svisc
                adv_wrap = uf * 0.5 * (aw + a0)
                dif_wrap = ev_face * (a0 - aw) * dxi
                if self.direction["west"] == "inflow":
                    adv_open = uf * prof
                    dif_open = ev_face * 2. * (a0 - prof) * dxi
                else:
                    adv_open = uf * a0
                    dif_open = jnp.zeros_like(dif_wrap)
                # t_a -= (F_e - F_w)*dxi + (D_e - D_w)... replacing F_w,D_w:
                ta = ta.at[:, :, 0].add((adv_open - adv_wrap) * dxi
                                        + (dif_wrap - dif_open) * dxi)

            # ---- east face of column itot-1 (velocity u[...,0] wrapped) --
            if "east" in self.direction:
                uf = u[:, :, 0]
                ae = a[:, :, -1]
                ag = a[:, :, 0]       # wrapped neighbor
                ev_face = dcoef(0.5 * (evisc[:, :, -1] + evisc[:, :, 0])) \
                    if evisc is not None else svisc
                adv_wrap = uf * 0.5 * (ae + ag)
                dif_wrap = ev_face * (ag - ae) * dxi
                if self.direction["east"] == "inflow":
                    adv_open = uf * prof
                    dif_open = ev_face * 2. * (prof - ae) * dxi
                else:
                    adv_open = uf * ae
                    dif_open = jnp.zeros_like(dif_wrap)
                ta = ta.at[:, :, -1].add((adv_wrap - adv_open) * dxi
                                         + (dif_open - dif_wrap) * dxi)

            # ---- south face of row 0 (velocity v[:,0,:]) -----------------
            if "south" in self.direction:
                vf = v[:, 0, :]
                as_ = a[:, -1, :]
                a0 = a[:, 0, :]
                ev_face = dcoef(0.5 * (evisc[:, -1, :] + evisc[:, 0, :])) \
                    if evisc is not None else svisc
                adv_wrap = vf * 0.5 * (as_ + a0)
                dif_wrap = ev_face * (a0 - as_) * dyi
                if self.direction["south"] == "inflow":
                    adv_open = vf * prof
                    dif_open = ev_face * 2. * (a0 - prof) * dyi
                else:
                    adv_open = vf * a0
                    dif_open = jnp.zeros_like(dif_wrap)
                ta = ta.at[:, 0, :].add((adv_open - adv_wrap) * dyi
                                        + (dif_wrap - dif_open) * dyi)

            # ---- north face of row jtot-1 (velocity v[:,0,:] wrapped) ----
            if "north" in self.direction:
                vf = v[:, 0, :]
                an = a[:, -1, :]
                ag = a[:, 0, :]
                ev_face = dcoef(0.5 * (evisc[:, -1, :] + evisc[:, 0, :])) \
                    if evisc is not None else svisc
                adv_wrap = vf * 0.5 * (an + ag)
                dif_wrap = ev_face * (ag - an) * dyi
                if self.direction["north"] == "inflow":
                    adv_open = vf * prof
                    dif_open = ev_face * 2. * (prof - an) * dyi
                else:
                    adv_open = vf * an
                    dif_open = jnp.zeros_like(dif_wrap)
                ta = ta.at[:, -1, :].add((adv_wrap - adv_open) * dyi
                                         + (dif_open - dif_wrap) * dyi)

            t[name] = ta
        return t

    def _correct_4th(self, ctx, s, t, sviscs):
        """4th-order x-direction in/outflow as exact linear corrections.

        Ghost deltas d_m = ghost_open(m) - ghost_wrapped(m) feed the
        advec_4 face fluxes (faces -3/2, -1/2, 1/2 west; N-3/2, N-1/2,
        N+1/2 east; u faces stay periodic like the reference) and the
        diff_4 cdg Laplacian on the three edge columns each side."""
        dxi = ctx.dxi
        dxidxi = ctx.dxi ** 2
        u = s["u"]
        t = dict(t)
        for name in self.scalars:
            a = s[name]
            ta = t[name]
            svisc = (sviscs or {}).get(name, 0.)

            # -- ghost deltas (k, j) planes -------------------------------
            # west inflow, Dirichlet value 0 (compute_inflow_4th):
            a0, a1, a2 = a[:, :, 0], a[:, :, 1], a[:, :, 2]
            d1 = (9. / 8. * a0 - 14. / 8. * a1 + 5. / 8. * a2) - a[:, :, -1]
            d2 = (33. / 8. * a0 - 54. / 8. * a1 + 21. / 8. * a2) - a[:, :, -2]
            d3 = (65. / 8. * a0 - 110. / 8. * a1 + 45. / 8. * a2) - a[:, :, -3]
            # east outflow extrapolation (compute_outflow_4th):
            b0, b1, b2 = a[:, :, -1], a[:, :, -2], a[:, :, -3]
            e1 = (2. * b0 - 3. / 2. * b1 + 1. / 2. * b2) - a[:, :, 0]
            e2 = (3. * b0 - 7. / 2. * b1 + 3. / 2. * b2) - a[:, :, 1]
            e3 = (5. * b0 - 15. / 2. * b1 + 7. / 2. * b2) - a[:, :, 2]

            # -- advection: delta face fluxes (u[..., i] is face i-1/2) ---
            f_m1 = u[:, :, -1] * (fd.ci0 * d3 + fd.ci1 * d2 + fd.ci2 * d1)
            f_0 = u[:, :, 0] * (fd.ci0 * d2 + fd.ci1 * d1)
            f_1 = u[:, :, 1] * (fd.ci0 * d1)
            ta = ta.at[:, :, 0].add(-(fd.cg0 * f_m1 + fd.cg1 * f_0
                                      + fd.cg2 * f_1) * dxi)
            ta = ta.at[:, :, 1].add(-(fd.cg0 * f_0 + fd.cg1 * f_1) * dxi)
            ta = ta.at[:, :, 2].add(-(fd.cg0 * f_1) * dxi)

            g_n1 = u[:, :, -1] * (fd.ci3 * e1)
            g_n = u[:, :, 0] * (fd.ci2 * e1 + fd.ci3 * e2)
            g_p1 = u[:, :, 1] * (fd.ci1 * e1 + fd.ci2 * e2 + fd.ci3 * e3)
            ta = ta.at[:, :, -3].add(-(fd.cg3 * g_n1) * dxi)
            ta = ta.at[:, :, -2].add(-(fd.cg2 * g_n1 + fd.cg3 * g_n) * dxi)
            ta = ta.at[:, :, -1].add(-(fd.cg1 * g_n1 + fd.cg2 * g_n
                                       + fd.cg3 * g_p1) * dxi)

            # -- diffusion: cdg Laplacian deltas (diff_4 _lap_h) ----------
            c = svisc * dxidxi
            ta = ta.at[:, :, 0].add(c * (fd.cdg1 * d1 + fd.cdg2 * d2
                                         + fd.cdg3 * d3))
            ta = ta.at[:, :, 1].add(c * (fd.cdg2 * d1 + fd.cdg3 * d2))
            ta = ta.at[:, :, 2].add(c * (fd.cdg3 * d1))
            ta = ta.at[:, :, -1].add(c * (fd.cdg1 * e1 + fd.cdg2 * e2
                                          + fd.cdg3 * e3))
            ta = ta.at[:, :, -2].add(c * (fd.cdg2 * e1 + fd.cdg3 * e2))
            ta = ta.at[:, :, -3].add(c * (fd.cdg3 * e1))
            t[name] = ta
        return t
