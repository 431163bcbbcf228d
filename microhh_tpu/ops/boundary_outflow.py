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
"""

import jax.numpy as jnp

EDGES = ("west", "east", "south", "north")


class BoundaryOutflow:
    def __init__(self, ini, grid, spatial_order):
        self.grid = grid
        self.scalars = ini.get_list(str, "boundary", "scalar_outflow", default=[])
        self.direction = {}
        self.inflow_profiles = {}
        if not self.scalars:
            return
        if spatial_order != 2:
            raise NotImplementedError(
                "scalar_outflow is only implemented at 2nd spatial order")
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
