"""Generate tests/oracle_ref/budget4_ref_gen.py from the upstream budget_4
kernels (see _b4_translit.py).  Run once:

    python tests/oracle_ref/_b4_generate.py /root/reference/src/budget_4.cxx
"""

import re
import sys

from _b4_translit import convert_expr

KERNELS = [
    "calc_ke", "calc_tke_budget_shear", "calc_tke_budget_turb",
    "calc_tke_budget_pres", "calc_tke_budget_visc", "calc_tke_budget_diss",
    "calc_tke_budget_rdstr", "calc_tke_budget_buoy", "calc_b2_budget",
    "calc_bw_budget_shear_turb_visc", "calc_bw_budget_buoy_rdstr_diss_pres",
]

TRIPLE = "'" * 3


def extract_function(src, name):
    m = re.search(r"void %s\(" % name, src)
    if not m:
        raise ValueError(name)
    i = src.index("{", m.end())
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return src[m.start():j + 1]
    raise ValueError("unbalanced braces in " + name)


def parse_args(fn_src):
    sig = fn_src[:fn_src.index(")")]
    args = []
    for part in sig.split("(", 1)[1].split(","):
        mm = re.search(r"(\w+)\s*$", part.strip())
        if mm:
            args.append(mm.group(1))
    return args


def translate_body(fn_src, name):
    """Emit python loop code for the kernel body (exec-able string)."""
    body = fn_src[fn_src.index("{") + 1:]
    lines = body.splitlines()
    out = []
    k_ctx = None
    stmt = None
    stmt_lhs = None
    stmt_op = None
    stmt_local = False

    def flush(stmt, lhs, op, local):
        rhs = convert_expr(stmt).rstrip().rstrip(";")
        if local:
            return "            %s = %s" % (lhs, rhs)
        m = re.match(r"(\w+)\(k([+-]\d+)?,j([+-]\d+)?,i([+-]\d+)?\)$",
                     convert_expr(lhs))
        if not m:
            raise ValueError("bad LHS %r" % lhs)
        fld, dk = m.group(1), m.group(2) or "+0"
        dj, di = m.group(3) or "+0", m.group(4) or "+0"
        if dj != "+0" or di != "+0":
            raise ValueError("horizontal LHS offset unsupported: %r" % lhs)
        py_op = "+=" if op == "+=" else "="
        return "            %s_o[k%s, j, i] %s %s" % (fld, dk, py_op, rhs)

    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("//") or line.startswith("#pragma"):
            continue
        if line.startswith("using namespace"):
            continue
        if line.startswith("const int"):
            # `const int ijk = i + j*jj1 + EXPR*kk1;` fixes the k row when
            # EXPR is not the loop variable (the wz/uz ghost loops).
            mijk = re.match(
                r"const int ijk = i \+ j\*jj1 \+ ([^;]+?)\*kk1;", line)
            if mijk and stmt is None:
                expr = mijk.group(1).strip()
                if expr != "k":
                    k_ctx = "[%s]" % expr.strip("()")
            continue
        if stmt is None:
            mk = re.match(r"(?:int\s+)?k\s*=\s*([^;]+);$", line)
            if mk:
                k_ctx = "[%s]" % mk.group(1)
                continue
            mf = re.match(r"for \(int k=([^;]+); k<([^;]+); \+\+k\)", line)
            if mf:
                k_ctx = "range(%s, %s)" % (mf.group(1), mf.group(2))
                continue
            if re.match(r"for \(int [ji]=", line) or line in ("{", "}"):
                continue
            ml = re.match(r"const TF (\w+)\s*=\s*(.*)", line)
            if ml:
                stmt_lhs, stmt_op, stmt_local = ml.group(1), "=", True
                stmt = ml.group(2)
            else:
                ms = re.match(r"(\w+\[[^\]]+\])\s*(\+?=)\s*(.*)", line)
                if not ms:
                    continue
                stmt_lhs, stmt_op, stmt_local = ms.group(1), ms.group(2), False
                stmt = ms.group(3)
        else:
            stmt += " " + line
        if stmt is not None and stmt.rstrip().endswith(";"):
            out.append((k_ctx, flush(stmt, stmt_lhs, stmt_op, stmt_local)))
            stmt = None

    emitted = []
    cur = None
    for k_ctx, code in out:
        if k_ctx != cur:
            emitted.append("for k in %s:" % k_ctx)
            emitted.append("    for j in range(jstart, jend):")
            emitted.append("        for i in range(istart, iend):")
            cur = k_ctx
        emitted.append(code)
    return "\n".join(emitted)


def main(path):
    src = open(path).read()
    print('"""AUTO-GENERATED mechanical transliteration of the upstream')
    print('budget_4 kernels (reference src/budget_4.cxx) for ORACLE testing')
    print('of microhh_tpu/budget4.py -- regenerate with _b4_generate.py."""')
    print()
    print("KERNELS = {}")
    print("ARGS = {}")
    for name in KERNELS:
        fn = extract_function(src, name)
        print()
        print("ARGS[%r] = %r" % (name, parse_args(fn)))
        code = translate_body(fn, name)
        print("KERNELS[%r] = r%s" % (name, TRIPLE))
        print(code)
        print(TRIPLE)


if __name__ == "__main__":
    main(sys.argv[1])
