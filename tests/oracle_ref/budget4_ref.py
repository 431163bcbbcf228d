"""Runner for the auto-generated budget_4 kernel transliterations
(budget4_ref_gen.py): builds the exec namespace — periodic-wrap field
closures, profile closures, O4 coefficients — and returns the output
arrays.  Reference: src/budget_4.cxx (see _b4_generate.py)."""

import numpy as np

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from microhh_tpu import fd  # noqa: E402
from .budget4_ref_gen import KERNELS, ARGS  # noqa: E402

_COEFFS = ("ci0", "ci1", "ci2", "ci3", "cg0", "cg1", "cg2", "cg3",
           "bi0", "bi1", "bi2", "bi3", "ti0", "ti1", "ti2", "ti3",
           "bg0", "bg1", "bg2", "bg3", "tg0", "tg1", "tg2", "tg3",
           "cdg0", "cdg1", "cdg2", "cdg3")


def run_kernel(name, arrays, profiles, scalars, kstart, kend):
    """Execute kernel `name`.

    arrays:   input fields {name: (kcells, jtot, itot) np.ndarray}
    profiles: input vertical profiles {name: (kcells,) or (kcells+1,)}
    scalars:  plain floats (dxi, visc, ...)
    Returns {output_name: np.ndarray} for every ARGS entry that was not
    supplied as an input."""
    kcells, jtot, itot = next(iter(arrays.values())).shape
    ns = {c: float(getattr(fd, c)) for c in _COEFFS}
    ns.update(_pow=lambda x, n: x ** n, pow2=lambda x: x * x, TF=float)
    ns.update(istart=0, iend=itot, jstart=0, jend=jtot,
              kstart=kstart, kend=kend)

    def fld_closure(F):
        def f(k, j, i, F=F):
            return F[k, j % jtot, i % itot]
        return f

    def prof_closure(P):
        def f(k, P=P):
            return P[k]
        return f

    outs = {}
    for a in ARGS[name]:
        if a in arrays:
            ns[a] = fld_closure(arrays[a])
        elif a in profiles:
            ns[a] = prof_closure(np.asarray(profiles[a], dtype=np.float64))
        elif a in scalars:
            ns[a] = float(scalars[a])
        elif a in ("istart", "iend", "jstart", "jend", "kstart", "kend",
                   "icells", "jcells", "ijcells"):
            continue
        else:
            arr = np.zeros((kcells, jtot, itot))
            outs[a] = arr
            ns[a + "_o"] = arr
            ns[a] = fld_closure(arr)
    exec(KERNELS[name], ns)
    return outs
