"""Mechanical C++->numpy expression converter used ONCE to generate the
budget_4 oracle (tests/oracle_ref/budget4_ref.py) from the upstream kernel
bodies (/root/reference/src/budget_4.cxx), per the round-2 verdict's
oracle-suite directive.  The production implementation
(microhh_tpu/budget4.py) is written independently and validated against
the generated oracle.

Converts expressions like
    cg0<TF>*((ci0<TF>*(u[ijk-ii3]-umean[k]) + ...)) * dzi4[k]
    std::pow(X, 2)
into scalar-python equivalents evaluated inside explicit (k, j, i) loops
with periodic horizontal wrap:
    cg0*((ci0*(u(k,j,i-3)-umean(k)) + ...)) * dzi4(k)
where u/umean/dzi4 are closures doing the index arithmetic.
"""

import re


def convert_expr(cpp):
    """C++ kernel expression -> python expression string."""
    s = cpp
    s = s.replace("<TF>", "")
    s = re.sub(r"std::pow\s*\(", "_pow(", s)
    s = re.sub(r"(\d)\.\*", r"\1.*", s)

    # field[ijk +- iiN +- jjM +- kkP] -> field(k+P, j+M, i+N)
    def field_idx(m):
        name, inner = m.group(1), m.group(2)
        di = dj = dk = 0
        for sign, ax, n in re.findall(r"([+-])\s*(ii|jj|kk)(\d)", inner):
            v = int(n) * (1 if sign == "+" else -1)
            if ax == "ii":
                di += v
            elif ax == "jj":
                dj += v
            else:
                dk += v
        rest = re.sub(r"([+-])\s*(ii|jj|kk)(\d)", "", inner).replace("ijk", "").strip()
        if rest:
            raise ValueError("unparsed index %r in %r" % (rest, m.group(0)))
        return "%s(k%+d,j%+d,i%+d)" % (name, dk, dj, di)

    s = re.sub(r"\b(\w+)\[ijk([^\]]*)\]", field_idx, s)

    # profile[k+-n] -> profile(k+-n); dzi4[k+1] etc.
    s = re.sub(r"\b(\w+)\[(k[^\]]*)\]", r"\1(\2)", s)
    return s


def convert_block(cpp_lines):
    """A full multi-line RHS (everything after '=' up to ';')."""
    body = " ".join(line.strip() for line in cpp_lines)
    body = body.rstrip(";").strip()
    return convert_expr(body)
