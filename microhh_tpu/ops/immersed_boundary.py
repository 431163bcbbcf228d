"""Immersed boundaries via the ghost-cell method.

Reference: ``src/immersed_boundary.cxx``.  A 2-D digital elevation map (DEM,
read from ``dem.0000000``) defines terrain; grid points inside the terrain
whose 3x3x3 neighborhood pokes outside are IB ghost cells.  Each substep the
ghost cells are set from an inverse-distance-weighted (IDW) interpolation of
the image point (ghost mirrored across the boundary), imposing no-slip
momentum and Dirichlet/Neumann/flux scalar conditions at the wall
(immersed_boundary.cxx:441-487).

TPU re-design: all geometry (ghost search, nearest-wall search, image
points, IDW neighbor selection and coefficients) is a one-time numpy
precomputation at ``create()``, exactly following the reference host code
(:108-430).  The per-substep runtime reduces to ONE vectorized gather of the
(nghost, n_idw) neighbor values, a weighted reduction, and ONE scatter into
the ghost locations — no data-dependent control flow under jit.  Horizontal
periodicity is handled with modular indices and unwrapped virtual
coordinates (this build has no horizontal ghost cells).

Geometry modes: the reference declares ``IB_type {Disabled, DEM, User}``
(immersed_boundary.h:34) but its ini factory only constructs Disabled or
DEM (immersed_boundary.cxx:606-616) — ``User`` is dead code in this fork,
and even the sinusoidal-wall case encodes its geometry as a DEM
(cases/ib_sine/sine_input.py upstream).  DEM is therefore the complete
supported surface.
"""

import numpy as np
import jax.numpy as jnp

DIRICHLET, NEUMANN, FLUX = "dirichlet", "neumann", "flux"


class _GhostSet:
    """Precomputed ghost-cell geometry for one staggered location."""

    __slots__ = ("n", "gi", "gj", "gk", "ip_i", "ip_j", "ip_k",
                 "c_idw", "c_sum", "di", "bval", "xb", "yb", "sbot")


class ImmersedBoundary:
    def __init__(self, ini, grid, fields):
        self.grid = grid
        self.fields = fields
        sw = ini.get_str("IB", "sw_immersed_boundary",
                         default=ini.get_str("IB", "swib", default="0"))
        if sw in ("0", "false", "disabled"):
            self.active = False
            return
        if sw != "dem":
            raise NotImplementedError("swib=%s (only 'dem' is supported)" % sw)
        self.active = True
        self.n_idw = ini.get_int("IB", "n_idw_points")
        self.sbcbot = None
        self.sbc = {}
        if fields.sp:
            self.sbcbot = ini.get_str("IB", "sbcbot")
            if self.sbcbot not in (DIRICHLET, NEUMANN, FLUX):
                raise ValueError("IB sbcbot=%s is not a valid choice "
                                 "(options: dirichlet, neumann, flux)" % self.sbcbot)
            for name in fields.sp:
                self.sbc[name] = ini.get_float("IB", "sbot", subitem=name)
            self.sbot_spatial = ini.get_list(str, "IB", "sbot_spatial",
                                             default=[])
        self.ghost = {}

    # ------------------------------------------------------------------
    #  host-side geometry precomputation
    # ------------------------------------------------------------------
    def _interp2_dem(self, xg, yg):
        """Bilinear DEM interpolation with periodic wrapping
        (immersed_boundary.cxx:65-105); xg/yg may be scalars or arrays."""
        g = self.grid
        dx, dy = g.dx, g.dy
        i0 = np.floor((np.asarray(xg) - 0.5 * dx) / dx).astype(int)
        j0 = np.floor((np.asarray(yg) - 0.5 * dy) / dy).astype(int)
        x0 = (i0 + 0.5) * dx      # unwrapped virtual coordinates
        y0 = (j0 + 0.5) * dy
        f1x = (xg - x0) / dx
        f1y = (yg - y0) / dy
        f0x, f0y = 1. - f1x, 1. - f1y
        d = self.dem
        i0m, i1m = i0 % g.itot, (i0 + 1) % g.itot
        j0m, j1m = j0 % g.jtot, (j0 + 1) % g.jtot
        return (f0y * (f0x * d[j0m, i0m] + f1x * d[j0m, i1m])
                + f1y * (f1x * d[j1m, i1m] + f0x * d[j1m, i0m]))

    def _coord(self, base, idx, delta):
        """Unwrapped coordinate of a (possibly out-of-range) index."""
        return base[0] + (idx) * delta

    def _calc_ghost_set(self, x, y, z, bc, dzs):
        """Mirror of calc_ghost_cells (immersed_boundary.cxx:334-427) in
        this build's ghost-free horizontal index space."""
        g = self.grid
        ks, ke = g.kstart, g.kend
        itot, jtot = g.itot, g.jtot
        dx, dy = g.dx, g.dy
        n_idw = self.n_idw

        def xc(i):   # virtual x of (possibly wrapped) index at this location
            return x[0] + i * dx

        def yc(j):
            return y[0] + j * dy

        # 1. find ghost cells
        gi, gj, gk = [], [], []
        for k in range(ks, ke):
            for j in range(jtot):
                for i in range(itot):
                    if z[k] > self._interp2_dem(xc(i), yc(j)):
                        continue
                    found = False
                    for dj in (-1, 0, 1):
                        for di_ in (-1, 0, 1):
                            zd = self._interp2_dem(xc(i + di_), yc(j + dj))
                            for dk in (-1, 0, 1):
                                if z[k + dk] > zd:
                                    found = True
                    if found:
                        gi.append(i)
                        gj.append(j)
                        gk.append(k)
        n = len(gi)
        gs = _GhostSet()
        gs.n = n
        gs.gi = np.asarray(gi, dtype=np.int32)
        gs.gj = np.asarray(gj, dtype=np.int32)
        gs.gk = np.asarray(gk, dtype=np.int32)
        if n == 0:
            gs.ip_i = np.zeros((0, n_idw), np.int32)
            gs.ip_j = np.zeros((0, n_idw), np.int32)
            gs.ip_k = np.zeros((0, n_idw), np.int32)
            gs.c_idw = np.zeros((0, n_idw))
            gs.c_sum = np.zeros((0,))
            gs.di = np.zeros((0,))
            return gs

        # 2. nearest wall + image point (41x41 search over +-dx, +-dy)
        nn = 40
        off = 2. * np.arange(-nn // 2, nn // 2 + 1) / nn
        OX, OY = np.meshgrid(off * dx, off * dy, indexing="ij")
        xb = np.zeros(n)
        yb = np.zeros(n)
        zb = np.zeros(n)
        for m in range(n):
            x0, y0, z0 = xc(gi[m]), yc(gj[m]), z[gk[m]]
            xs, ys = x0 + OX, y0 + OY
            zs = self._interp2_dem(xs, ys)
            dsq = (xs - x0) ** 2 + (ys - y0) ** 2 + (zs - z0) ** 2
            am = np.unravel_index(np.argmin(dsq), dsq.shape)
            xb[m], yb[m], zb[m] = xs[am], ys[am], zs[am]
        gs.xb, gs.yb = xb, yb
        xi = 2. * xb - xc(gs.gi)
        yi = 2. * yb - yc(gs.gj)
        zi = 2. * zb - z[gs.gk]
        gs.di = np.sqrt((xi - xc(gs.gi)) ** 2 + (yi - yc(gs.gj)) ** 2
                        + (zi - z[gs.gk]) ** 2)

        # 3. IDW neighbor selection (find_interpolation_points)
        ip_i = np.zeros((n, n_idw), np.int32)
        ip_j = np.zeros((n, n_idw), np.int32)
        ip_k = np.zeros((n, n_idw), np.int32)
        c_idw = np.zeros((n, n_idw))
        c_sum = np.zeros(n)
        nloc = n_idw - 1 if bc == DIRICHLET else n_idw
        for m in range(n):
            i, j, k = int(gs.gi[m]), int(gs.gj[m]), int(gs.gk[m])
            cand = []
            dk0 = max(-2, ks - k)
            for dk in range(dk0, 6):
                for dj in (-1, 0, 1):
                    for di_ in (-1, 0, 1):
                        zd = self._interp2_dem(xc(i + di_), yc(j + dj))
                        if z[k + dk] > zd:
                            dist = np.sqrt((di_ * dx) ** 2 + (dj * dy) ** 2
                                           + (z[k + dk] - z[k]) ** 2)
                            cand.append((dist, i + di_, j + dj, k + dk))
            cand.sort(key=lambda c: c[0])
            if len(cand) < n_idw:
                raise RuntimeError(
                    "IB: only %d interpolation points at i=%d j=%d k=%d"
                    % (len(cand), i, j, k))
            tmp = np.zeros(n_idw)
            for q in range(n_idw):
                _, ii, jj, kk = cand[q]
                ip_i[m, q] = ii % self.grid.itot
                ip_j[m, q] = jj % self.grid.jtot
                ip_k[m, q] = kk
                if q < nloc:
                    tmp[q] = np.sqrt((xc(ii) - xi[m]) ** 2 + (yc(jj) - yi[m]) ** 2
                                     + (z[kk] - zi[m]) ** 2)
            if bc == DIRICHLET:
                tmp[n_idw - 1] = max(np.sqrt((xb[m] - xi[m]) ** 2
                                             + (yb[m] - yi[m]) ** 2
                                             + (zb[m] - zi[m]) ** 2), 1e-9)
            dist_max = tmp[:n_idw].max() if bc == DIRICHLET else tmp[:nloc].max()
            for q in range(n_idw):
                if q < nloc or bc == DIRICHLET:
                    c = ((dist_max - tmp[q]) / (dist_max * tmp[q])) ** 0.5 + 1e-9
                else:
                    c = 0.
                c_idw[m, q] = c
                c_sum[m] += c
        gs.ip_i, gs.ip_j, gs.ip_k = ip_i, ip_j, ip_k
        gs.c_idw, gs.c_sum = c_idw, c_sum
        gs.gi = gs.gi % self.grid.itot
        gs.gj = gs.gj % self.grid.jtot
        return gs

    def create(self, workdir="."):
        """Read the DEM and precompute all ghost-cell sets."""
        if not self.active:
            return
        g = self.grid
        fname = "%s/dem.%07d" % (workdir, 0)
        self.dem = np.fromfile(fname, dtype=np.float64).reshape(g.jtot, g.itot)

        self.ghost["u"] = self._calc_ghost_set(g.xh, g.y, g.z, DIRICHLET, g.dz)
        self.ghost["v"] = self._calc_ghost_set(g.x, g.yh, g.z, DIRICHLET, g.dz)
        self.ghost["w"] = self._calc_ghost_set(g.x, g.y, g.zh, DIRICHLET, g.dzh)
        for gsname in ("u", "v", "w"):
            self.ghost[gsname].bval = np.zeros(self.ghost[gsname].n)
        if self.fields.sp:
            gset = self._calc_ghost_set(g.x, g.y, g.z, self.sbcbot, g.dz)
            self.ghost["s"] = gset
            # per-scalar boundary values; spatially varying ones come from a
            # <scalar>_sbot.0000000 plane interpolated onto the wall points
            # (immersed_boundary.cxx:871-903)
            gset.sbot = {}
            for name in self.fields.sp:
                if name in self.sbot_spatial:
                    plane = np.fromfile("%s/%s_sbot.%07d" % (workdir, name, 0),
                                        dtype=np.float64).reshape(g.jtot, g.itot)
                    dem_save = self.dem
                    self.dem = plane        # reuse the bilinear interpolator
                    gset.sbot[name] = np.asarray(
                        self._interp2_dem(gset.xb, gset.yb))
                    self.dem = dem_save
                else:
                    gset.sbot[name] = np.full(gset.n, self.sbc[name])

    # ------------------------------------------------------------------
    #  runtime: vectorized gather + scatter (set_ghost_cells kernel)
    # ------------------------------------------------------------------
    def _apply(self, fld, gs, bc, bval, visc):
        if gs.n == 0:
            return fld
        c = jnp.asarray(gs.c_idw, dtype=fld.dtype)
        csum = jnp.asarray(gs.c_sum, dtype=fld.dtype)
        di = jnp.asarray(gs.di, dtype=fld.dtype)
        vals = fld[gs.ip_k, gs.ip_j, gs.ip_i]          # (nghost, n_idw) gather
        nloc = self.n_idw - 1 if bc == DIRICHLET else self.n_idw
        vI = jnp.sum(c[:, :nloc] * vals[:, :nloc], axis=1)
        if bc == DIRICHLET:
            vI = vI + c[:, -1] * bval
        vI = vI / csum
        if bc == DIRICHLET:
            gv = 2. * bval - vI
        elif bc == NEUMANN:
            gv = vI - bval * di
        else:  # flux
            gv = vI - (-bval / visc) * di
        return fld.at[gs.gk, gs.gj, gs.gi].set(gv)

    def exec_momentum(self, ctx, s):
        """No-slip u/v/w inside the terrain (immersed_boundary.cxx:640-675)."""
        if not self.active:
            return s
        s = dict(s)
        for name in ("u", "v", "w"):
            gs = self.ghost[name]
            bval = jnp.asarray(gs.bval, dtype=s[name].dtype)
            s[name] = self._apply(s[name], gs, DIRICHLET, bval,
                                  self.fields.visc)
        return s

    def exec_scalars(self, ctx, s):
        """Scalar IB conditions (immersed_boundary.cxx:677-696)."""
        if not self.active or "s" not in self.ghost:
            return s
        s = dict(s)
        gs = self.ghost["s"]
        for name in self.fields.sp:
            bval = jnp.asarray(gs.sbot[name], dtype=s[name].dtype)
            s[name] = self._apply(s[name], gs, self.sbcbot, bval,
                                  self.fields.sp[name].visc)
        return s
