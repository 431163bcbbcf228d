"""Per-substep cost decomposition of the MOIST (generic fused) path.

Builds the rico op set (thermo_moist + 2mom_warm + limiter +
geo/ls/subsidence, advec 2) at a given cube size, then times each
substep component with the DCE-proof scan probe from roofline.py
(every output leaf coupled into the carry — see that file's note).
This is the tool that exposed the fixed-iteration sat_adjust cost
(thermo.exec 53 ms -> 4 ms at 384^3) and the 2mom transcendental
budget documented in ARCHITECTURE.md.

Usage:  python python/moist_decomp.py [size=384] [nscan=8]
Needs a case dir with rico.ini + rico_input.nc; builds one under
/tmp/mh_moist_decomp if absent (reference hot loop analogue:
src/model.cxx:366-415).
"""

import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from roofline import _timeit  # noqa: E402  (same DCE-proof probe)


def _build_case(size, ktot, wd):
    os.makedirs(wd, exist_ok=True)
    ini_txt = open(os.path.join(REPO, "cases/rico/rico.ini")).read()
    for key, val in (("itot", size), ("jtot", size), ("ktot", ktot)):
        ini_txt = re.sub(r"(?m)^%s=.*$" % key, "%s=%d" % (key, val), ini_txt)
    for key in ("swstats", "swcross", "swdump", "swcolumn", "swbudget"):
        ini_txt = re.sub(r"(?m)^%s=.*$" % key, "%s=0" % key, ini_txt)
    ini_txt = re.sub(r"(?m)^swadvec=.*$", "swadvec=2", ini_txt)
    open(os.path.join(wd, "rico.ini"), "w").write(ini_txt)
    shutil.copy(os.path.join(REPO, "cases/rico/rico_input.py"), wd)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "rico_input.py"], cwd=wd, env=env,
                   check=True, capture_output=True)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    nscan = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    wd = os.environ.get("MOIST_DECOMP_DIR", "/tmp/mh_moist_decomp_%d" % size)
    if not os.path.exists(os.path.join(wd, "rico_input.nc")):
        _build_case(size, size, wd)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    from microhh_tpu.ops.pallas_fused import (fused_generic_tendencies_rk,
                                              fused_generic_viscosity,
                                              fused_pressure_rk)

    m = Model(Ini(os.path.join(wd, "rico.ini")), "run", "rico",
              workdir=wd, dtype=np.float32)
    m.finish_setup()
    m.build_step()
    fused = m._fused
    ctx = m.ctx if hasattr(m, "ctx") else m._ctx
    st = m.fields.create(m.input_nc, dtype=m.dtype)
    s, _, sfc = m.as_device_state(st)
    pp = m.pres_params
    dt = jnp.asarray(1.0, m.dtype)
    tz = jnp.asarray(0.0, m.dtype)
    print("generic fused: %s  rkfold_generic: %s"
          % (getattr(fused, "generic", None) if fused else None,
             m._use_rkfold_generic))

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print("%-44s %7.1f ms" % (name, ms), flush=True)

    add("whole step (RK3)", _timeit(
        lambda sd: m._step_raw(sd, sfc, pp, dt, tz)[0], s, n=nscan))

    aux = jax.jit(lambda sd: fused_generic_viscosity(
        fused, ctx, sd, sfc, {}, m.thermo))(s) if fused is not None else {}
    zt = {n: jnp.zeros_like(s[n]) for n in s}
    add("micro.exec (per substep)", _timeit(
        lambda sd: m.micro.exec(ctx, sd, dict(zt), aux, 1.0)[0], s, n=nscan))
    add("thermo.exec (per substep)", _timeit(
        lambda sd: m.thermo.exec(ctx, sd, dict(zt), aux), s, n=nscan))
    if fused is not None:
        add("evisc + N2 (per substep)", _timeit(
            lambda sd: fused_generic_viscosity(fused, ctx, sd, sfc, {},
                                               m.thermo), s, n=nscan))
        aux2 = dict(aux)
        aux2["subdt"] = jnp.asarray(0.3, m.dtype)
        add("generic rk tendency kernels (per substep)", _timeit(
            lambda sd: fused_generic_tendencies_rk(
                fused, ctx, sd, dict(zt), aux2, sfc, 0.3, 0.5, carry=True),
            s, n=nscan))
        s_star, t_s = jax.jit(lambda sd: fused_generic_tendencies_rk(
            fused, ctx, sd, dict(zt), aux2, sfc, 0.3, 0.5, carry=True))(s)
        glue = getattr(m, "pres_glue", None) or getattr(m, "_pres_glue", None)
        if glue is not None:
            add("projection (rhs+solve+apply, per substep)", _timeit(
                lambda sd: fused_pressure_rk(glue, ctx, m.pres, sd, t_s,
                                             aux2, 0.3, 0.5, pp, True)[:2],
                s_star, n=nscan))
    add("force (geo+ls+subsidence, per substep)", _timeit(
        lambda sd: m.force(ctx, sd, dict(zt), aux, sfc), s, n=nscan))
    add("boundary MOST (per substep)", _timeit(
        lambda sd: m.boundary.exec(ctx, sd, sfc, aux), s, n=nscan))
    add("ghost refill, flux names (per substep)", _timeit(
        lambda sd: m.boundary.set_ghost_cells(
            ctx, sd, sfc, names=m.boundary.flux_ghost_names()), s, n=nscan))


if __name__ == "__main__":
    main()
