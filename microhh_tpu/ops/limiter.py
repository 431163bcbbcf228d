"""Positive-definite tendency limiter (reference ``src/limiter.cxx``).

Applied as the very last tendency: clips the total tendency of listed scalars
so the RK update cannot drive them negative (``include/limiter.h:36-57``).
"""

import jax.numpy as jnp


class Limiter:
    def __init__(self, ini, fields):
        self.limitlist = ini.get_list(str, "limiter", "limitlist", default=[])

    def __call__(self, ctx, s, t, aux, subdt):
        if not self.limitlist:
            return t
        ks, ke = ctx.ks, ctx.ke
        t = dict(t)
        for name in self.limitlist:
            if name not in t:
                continue
            # tendency >= -value/dt so value + dt*tend >= 0
            min_tend = -s[name][ks:ke] / subdt
            t[name] = t[name].at[ks:ke].set(jnp.maximum(t[name][ks:ke], min_tend))
        return t
