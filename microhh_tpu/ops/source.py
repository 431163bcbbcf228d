"""Gaussian point/line scalar emission sources (reference ``src/source.cxx``).

Each source adds ``strength/norm * exp(-((x-x0)/sx)^2 - ...)`` to one
scalar's tendency; ``norm`` is the discrete blob integral so the emitted
mass rate equals ``strength`` exactly (source.cxx:110-165).  Line sources
flatten the Gaussian over [x0, x0+line_x].

Time-dependent location/strength (``swtimedep_location``/``swtimedep_strength``,
NetCDF timedep vars ``source_{x0,y0,z0,strength}_<n>`` over ``time_source``;
source.cxx:215-236,318-404): the reference recomputes the blob and its norm on
the host every step — here the interpolated parameters enter the jitted step
as scalars (``sfc["__src_<n>_*"]``) and the blob + norm are TRACED, so the
per-step work is one fused elementwise pass with no recompilation.
"""

import numpy as np
import jax.numpy as jnp


class Source:
    def __init__(self, ini, grid, fields, input_nc=None):
        self.sw = ini.get_str("source", "swsource", default="0") not in ("0", "false")
        self.tdep = {}
        if not self.sw:
            return
        self.sourcelist = ini.get_list(str, "source", "sourcelist")
        g = grid

        def getlist(name):
            return ini.get_list(float, "source", name)

        x0 = getlist("source_x0")
        y0 = getlist("source_y0")
        z0 = getlist("source_z0")
        sx = getlist("sigma_x")
        sy = getlist("sigma_y")
        sz = getlist("sigma_z")
        strength = getlist("strength")
        line_x = ini.get_list(float, "source", "line_x", default=[0.] * len(x0))
        line_y = ini.get_list(float, "source", "line_y", default=[0.] * len(x0))
        line_z = ini.get_list(float, "source", "line_z", default=[0.] * len(x0))
        # swvmr=true: strength in kmol(tracer)/s — the norm integral gets a
        # rho/xmair weighting so the tendency is a volume mixing ratio
        # (source.cxx:217-221, 450-460).
        swvmr = ini.get_list(str, "source", "swvmr",
                             default=["false"] * len(x0))
        swvmr = [v.lower() in ("1", "true") for v in swvmr]

        self._params = (x0, y0, z0, sx, sy, sz, strength,
                        line_x, line_y, line_z, swvmr)
        self._grid = g
        self._fields = fields
        self.blobs = None   # built lazily: the anelastic rhoref (for the
                            # vmr scaling) only exists after create_basestate

        # sw_profile: z-shape from init-group profiles instead of the
        # Gaussian in z (source.cxx:224-244,276-287; blob =
        # exp(-x^2-y^2) * emission_profile[k], kernel :182)
        self.sw_profile = ini.get_bool("source", "sw_profile", default=False)
        self.profiles = None
        if self.sw_profile:
            if any(v != 0. for v in line_x + line_y + line_z):
                raise ValueError("Emission profiles with line emissions are "
                                 "not supported (source.cxx:242)")
            idx = ini.get_list(int, "source", "profile_index")
            init = input_nc.groups["init"]
            kt = grid.ktot
            self.profiles = [np.asarray(
                init.variables["emission_profile_%d" % i][:kt],
                dtype=np.float64) for i in idx]

        # swtimedep_location / swtimedep_strength (source.cxx:318-348)
        self.swtimedep_location = ini.get_bool(
            "source", "swtimedep_location", default=False)
        self.swtimedep_strength = ini.get_bool(
            "source", "swtimedep_strength", default=False)
        if self.sw_profile and (self.swtimedep_location
                                or self.swtimedep_strength):
            raise ValueError("Emission profiles with time dependent location/"
                             "strength are not supported (source.cxx:383)")
        if self.swtimedep_location or self.swtimedep_strength:
            from ..timedep import Timedep
            for n in range(len(x0)):
                if self.swtimedep_location:
                    for c in ("x0", "y0", "z0"):
                        key = "source_%s_%d" % (c, n)
                        self.tdep[key] = Timedep(input_nc, key, "time_source")
                if self.swtimedep_strength:
                    key = "source_strength_%d" % n
                    self.tdep[key] = Timedep(input_nc, key, "time_source")

    def update_timedep(self, sfc, itime):
        """Host-side interpolation -> traced scalars (cf. Force.update_timedep)."""
        if not self.tdep:
            return sfc
        sfc = dict(sfc)
        for key, td in self.tdep.items():
            sfc["__src_" + key] = jnp.asarray(float(td.interpolate(itime)))
        return sfc

    def _build(self):
        g = self._grid
        (x0, y0, z0, sx, sy, sz, strength,
         line_x, line_y, line_z, swvmr) = self._params
        ks, ke = g.kstart, g.kend
        X = g.x[None, None, :]
        Y = g.y[None, :, None]
        Z = g.z[ks:ke][:, None, None]
        dV = g.dx * g.dy * g.dz[ks:ke][:, None, None]

        def axis_dist(c, c0, line):
            if line == 0.:
                return c - c0
            # flat inside [c0, c0+line]
            return np.where(c < c0, c - c0, np.where(c > c0 + line, c - c0 - line, 0.))

        from .. import constants as cst
        rho = self._fields.rhoref[ks:ke][:, None, None]
        self.blobs = []  # (scalar_name, precomputed 3-D source field)
        for n in range(len(x0)):
            ex = axis_dist(X, x0[n], line_x[n]) / sx[n]
            ey = axis_dist(Y, y0[n], line_y[n]) / sy[n]
            if self.sw_profile:
                blob = (np.exp(-ex ** 2 - ey ** 2)
                        * self.profiles[n][:, None, None])
            else:
                ez = axis_dist(Z, z0[n], line_z[n]) / sz[n]
                blob = np.exp(-ex ** 2 - ey ** 2 - ez ** 2)
            scaling = rho / cst.xmair if swvmr[n] else 1.
            norm = float(np.sum(blob * scaling * dV))
            self.blobs.append((self.sourcelist[n], (strength[n] / norm) * blob))

    def __call__(self, ctx, s, t, aux, sfc=None):
        if not self.sw:
            return t
        if self.tdep:
            return self._exec_timedep(ctx, t, sfc)
        if self.blobs is None:
            self._build()
        if not self.blobs:
            return t
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)
        for name, blob in self.blobs:
            t[name] = t[name].at[ks:ke].add(jnp.asarray(blob, dtype=ctx.dtype))
        return t

    def _exec_timedep(self, ctx, t, sfc):
        """Traced blob + norm with per-step interpolated parameters
        (source.cxx:362-404 recomputes these on the host every step)."""
        g = self._grid
        (x0s, y0s, z0s, sx, sy, sz, strength,
         line_x, line_y, line_z, swvmr) = self._params
        ks, ke = ctx.ks, ctx.ke
        X = jnp.asarray(g.x, ctx.dtype)[None, None, :]
        Y = jnp.asarray(g.y, ctx.dtype)[None, :, None]
        Z = jnp.asarray(g.z[ks:ke], ctx.dtype)[:, None, None]
        dV = g.dx * g.dy * jnp.asarray(g.dz[ks:ke], ctx.dtype)[:, None, None]
        from .. import constants as cst
        rho = jnp.asarray(self._fields.rhoref[ks:ke], ctx.dtype)[:, None, None]

        def param(c, n, default):
            key = "__src_source_%s_%d" % (c, n)
            if sfc is not None and key in sfc:
                return sfc[key].astype(ctx.dtype)
            return jnp.asarray(default, dtype=ctx.dtype)

        def axis_dist(c, c0, line):
            if line == 0.:
                return c - c0
            return jnp.where(c < c0, c - c0,
                             jnp.where(c > c0 + line, c - c0 - line, 0.))

        t = dict(t)
        for n, name in enumerate(self.sourcelist):
            x0 = param("x0", n, x0s[n])
            y0 = param("y0", n, y0s[n])
            z0 = param("z0", n, z0s[n])
            st_ = param("strength", n, strength[n])
            blob = jnp.exp(-(axis_dist(X, x0, line_x[n]) / sx[n]) ** 2
                           - (axis_dist(Y, y0, line_y[n]) / sy[n]) ** 2
                           - (axis_dist(Z, z0, line_z[n]) / sz[n]) ** 2)
            scaling = rho / cst.xmair if swvmr[n] else 1.
            norm = jnp.sum(blob * scaling * dV)
            t[name] = t[name].at[ks:ke].add((st_ / norm) * blob)
        return t


def make_source(ini, grid, fields, input_nc=None):
    src = Source(ini, grid, fields, input_nc)
    if not src.sw:
        return lambda ctx, s, t, aux, sfc=None: t
    return src
