"""Emit microhh_tpu/budget4_kernels.py: jnp-VECTORIZED versions of the
budget_4 kernels, generated from the same scalar transliteration source
as the oracle (budget4_ref_gen.py).  The scalar oracle and this
vectorized code share the expression text but use entirely different
index machinery (per-point loops vs k-slices + rolls), so the oracle
test catches vectorization/slicing mistakes.

Run:  python tests/oracle_ref/_b4_vectorize.py > microhh_tpu/budget4_kernels.py
"""

import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from budget4_ref_gen import KERNELS, ARGS  # noqa: E402

PROFILES = {"umean", "vmean", "bmean", "pmean", "umodel", "vmodel", "wmodel",
            "dzi4", "dzhi4"}
SCALARS = {"dxi", "dyi", "visc", "utrans", "vtrans", "dzhi4bot",
           "dzhi4top"}
BOUNDS = {"istart", "iend", "jstart", "jend", "kstart", "kend",
          "icells", "jcells", "ijcells"}


def vectorize_expr(expr):
    expr = re.sub(
        r"\b(\w+)\(k([+-]\d+),j([+-]\d+),i([+-]\d+)\)",
        lambda m: "R(%s,%d,%d,%d,_a,_b)" % (m.group(1), int(m.group(2)),
                                          int(m.group(3)), int(m.group(4))),
        expr)
    expr = re.sub(
        r"\b(\w+)\(k([+-]\d+)?\s*\)",
        lambda m: "PR(%s,%d,_a,_b)" % (m.group(1), int(m.group(2) or 0)),
        expr)
    expr = expr.replace("TF(0.5)", "0.5")
    return expr


def vectorize_kernel(name):
    src = KERNELS[name]
    lines = src.splitlines()
    body = []
    outputs = []
    for line in lines:
        t = line.strip()
        if not t:
            continue
        m = re.match(r"for k in (\[.*\]|range\(.*\)):$", t)
        if m:
            rng = m.group(1)
            if rng.startswith("["):
                body.append("    _a = %s" % rng[1:-1])
                body.append("    _b = _a + 1")
            else:
                args = rng[len("range("):-1]
                lo, hi = args.split(",", 1)
                body.append("    _a = %s" % lo.strip())
                body.append("    _b = %s" % hi.strip())
            continue
        if t.startswith("for j in") or t.startswith("for i in"):
            continue
        mo = re.match(r"(\w+)_o\[k([+-]\d+), j, i\] (\+?=) (.*)", t)
        if mo:
            fld, dk, op, rhs = mo.group(1), int(mo.group(2)), mo.group(3), \
                mo.group(4)
            if fld not in outputs:
                outputs.append(fld)
            meth = "add" if op == "+=" else "set"
            body.append("    %s = %s.at[_a%+d:_b%+d].%s(%s)"
                        % (fld, fld, dk, dk, meth, vectorize_expr(rhs)))
            continue
        ml = re.match(r"(\w+) = (.*)", t)
        if ml:
            body.append("    %s = %s" % (ml.group(1),
                                         vectorize_expr(ml.group(2))))
            continue
        raise ValueError("unhandled line in %s: %r" % (name, t))

    hdr = ["def %s(A):" % name]
    hdr.append('    """Vectorized budget_4 kernel (see module header)."""')
    for arg in ARGS[name]:
        if arg in BOUNDS or arg in outputs:
            continue
        hdr.append("    %s = A[%r]" % (arg, arg))
    hdr.append("    kstart = A['kstart']")
    hdr.append("    kend = A['kend']")
    # declare outputs as zero arrays
    pre = []
    for fld in outputs:
        if fld in ARGS[name]:
            pre.append("    %s = jnp.zeros_like(A['_tmpl'])" % fld)
    ret = "    return {%s}" % ", ".join("%r: %s" % (f, f) for f in outputs
                                        if f in ARGS[name])
    return "\n".join(hdr + pre + body + [ret])


def main():
    print('"""AUTO-GENERATED jnp-vectorized budget_4 kernels; regenerate')
    print('with tests/oracle_ref/_b4_vectorize.py.  Vertical boundary')
    print('ladders follow reference src/budget_4.cxx exactly; validated')
    print('against the scalar-loop oracle in tests/test_oracle_budget4.py.')
    print('"""')
    print()
    print("import jax.numpy as jnp")
    print()
    print("from .fd import (ci0, ci1, ci2, ci3, cg0, cg1, cg2, cg3,")
    print("                 bi0, bi1, bi2, bi3, ti0, ti1, ti2, ti3,")
    print("                 bg0, bg1, bg2, bg3, tg0, tg1, tg2, tg3)")
    print()
    print()
    print("def _pow(x, n):")
    print("    return x ** n")
    print()
    print()
    print("def pow2(x):")
    print("    return x * x")
    print()
    print()
    print("def R(f, dk, dj, di, a, b):")
    print('    """Field window: rows a+dk..b+dk with horizontal offset')
    print('    (dj, di) as a periodic roll."""')
    print("    if dj or di:")
    print("        f = jnp.roll(f, (-dj, -di), axis=(1, 2))")
    print("    return f[a + dk:b + dk]")
    print()
    print()
    print("def PR(p, dk, a, b):")
    print("    return p[a + dk:b + dk, None, None]")
    print()
    for name in KERNELS:
        print()
        print(vectorize_kernel(name))


if __name__ == "__main__":
    main()
