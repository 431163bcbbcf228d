"""Exponential scalar decay (reference ``src/decay.cxx``).

``st -= s / timescale`` per listed scalar; also provides the ``couvreux``
statistics-mask scalar semantics of the reference."""

import jax.numpy as jnp


class Decay:
    def __init__(self, ini, fields):
        self.dmap = {}
        for name in fields.sp:
            sw = ini.get_str("decay", "swdecay", subitem=name, default="0")
            if sw == "exponential":
                self.dmap[name] = ini.get_float("decay", "timescale", subitem=name)
            elif sw not in ("0", "false"):
                raise ValueError("%s is an illegal value for swdecay" % sw)

    def __call__(self, ctx, s, t, aux):
        if not self.dmap:
            return t
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)
        for name, timescale in self.dmap.items():
            # enforce_exponential_decay (decay.cxx:36-60)
            t[name] = t[name].at[ks:ke].add(-s[name][ks:ke] / timescale)
        return t


def make_decay(ini, fields):
    d = Decay(ini, fields)
    if not d.dmap:
        return lambda ctx, s, t, aux: t
    return d
