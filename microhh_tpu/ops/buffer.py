"""Rayleigh sponge layer (reference ``src/buffer.cxx``).

Relaxes fields above zstart towards their reference profiles with strength
sigma * ((z - zstart)/(ztop - zstart))**beta (reference ``include/buffer.h:52-60``).
"""

import numpy as np
import jax.numpy as jnp


class Buffer:
    def __init__(self, ini, grid, fields, input_nc):
        self.zstart = ini.get_float("buffer", "zstart")
        self.sigma = ini.get_float("buffer", "sigma")
        self.beta = ini.get_float("buffer", "beta", default=2.)
        self.swupdate = ini.get_bool("buffer", "swupdate", default=False)
        g = grid
        ks, ke = g.kstart, g.kend

        zsize = g.zsize

        def damping(zarr):
            with np.errstate(invalid="ignore"):
                fac = self.sigma * ((zarr - self.zstart) / (zsize - self.zstart)) ** self.beta
            return np.where(zarr >= self.zstart, fac, 0.)

        self.fac_z = damping(g.z[ks:ke])[:, None, None]
        self.fac_zh = damping(g.zh[ks:ke])[:, None, None]

        # Reference profiles: from input nc init group (u, v, scalars); w -> 0.
        self.profs = {}
        names = ["u", "v"] + list(fields.sp.keys())
        init = input_nc.groups["init"] if (input_nc is not None and "init" in input_nc.groups) else None
        for n in names:
            if init is not None and n in init.variables:
                p = np.asarray(init.variables[n][:g.ktot], dtype=np.float64)
            else:
                p = np.zeros(g.ktot)
            off = g.utrans if n == "u" else (g.vtrans if n == "v" else 0.)
            self.profs[n] = (p - off)[:, None, None]

    def __call__(self, ctx, s, t, aux):
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)
        facz = jnp.asarray(self.fac_z, dtype=ctx.dtype)
        faczh = jnp.asarray(self.fac_zh, dtype=ctx.dtype)
        for n in ["u", "v"] + list(ctx.scalar_names):
            if self.swupdate:
                ref = jnp.mean(s[n][ks:ke], axis=(1, 2), keepdims=True)
            else:
                ref = jnp.asarray(self.profs[n], dtype=ctx.dtype)
            t[n] = t[n].at[ks:ke].add(-facz * (s[n][ks:ke] - ref))
        t["w"] = t["w"].at[ks:ke].add(-faczh * s["w"][ks:ke])
        return t


class _NoBuffer:
    def __call__(self, ctx, s, t, aux):
        return t


def make_buffer(ini, grid, fields, input_nc):
    if ini.get_str("buffer", "swbuffer", default="0") in ("0", "false"):
        return _NoBuffer()
    return Buffer(ini, grid, fields, input_nc)
