"""Gaussian point/line scalar emission sources (reference ``src/source.cxx``).

Each source adds ``strength/norm * exp(-((x-x0)/sx)^2 - ...)`` to one
scalar's tendency; ``norm`` is the discrete blob integral so the emitted
mass rate equals ``strength`` exactly (source.cxx:110-165).  Line sources
flatten the Gaussian over [x0, x0+line_x].
"""

import numpy as np
import jax.numpy as jnp


class Source:
    def __init__(self, ini, grid, fields):
        self.sw = ini.get_str("source", "swsource", default="0") not in ("0", "false")
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
            ez = axis_dist(Z, z0[n], line_z[n]) / sz[n]
            blob = np.exp(-ex ** 2 - ey ** 2 - ez ** 2)
            scaling = rho / cst.xmair if swvmr[n] else 1.
            norm = float(np.sum(blob * scaling * dV))
            self.blobs.append((self.sourcelist[n], (strength[n] / norm) * blob))

    def __call__(self, ctx, s, t, aux):
        if not self.sw:
            return t
        if self.blobs is None:
            self._build()
        if not self.blobs:
            return t
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)
        for name, blob in self.blobs:
            t[name] = t[name].at[ks:ke].add(jnp.asarray(blob, dtype=ctx.dtype))
        return t


def make_source(ini, grid, fields):
    src = Source(ini, grid, fields)
    if not src.sw:
        return lambda ctx, s, t, aux: t
    return src
