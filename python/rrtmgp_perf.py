"""RRTMGP radiation cost at realistic spectral width (round-5 item 6).

Builds the rcemip column setup at a chosen horizontal size, then times
one full radiation solve (`RadiationRrtmgp._compute`: LW + SW per-g-point
gas optics + cloud optics + solvers, background column included) with

* the in-repo REDUCED k-distribution (4 LW bands x 2 gpt / 3 SW x 2), and
* the FULL-width synthetic set (16 x 16 = 256 LW gpt / 14 x 16 = 224 SW
  on the rte-rrtmgp (ntemp=14, npress=59, neta=9) grid —
  ``make_rrtmgp_coefficients.configure(full=True)``),

so the production radiation cost has a measured analog of the
reference's rte-rrtmgp configuration (radiation_rrtmgp.cxx:775-900).
The solve is amortized over dt_rad in a real run; the per-step charge is
ms_per_call * dt / dt_rad.

Usage: python python/rrtmgp_perf.py [size=128] [ktot=72] [nrep=5]
"""

import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "python"))


def build_case(size, ktot, wd):
    os.makedirs(wd, exist_ok=True)
    ini = open(os.path.join(REPO, "cases/rcemip/rcemip.ini")).read()
    for key, val in (("itot", size), ("jtot", size), ("ktot", ktot)):
        ini = re.sub(r"(?m)^%s=.*$" % key, "%s=%d" % (key, val), ini)
    open(os.path.join(wd, "rcemip.ini"), "w").write(ini)
    shutil.copy(os.path.join(REPO, "cases/rcemip/rcemip_input.py"), wd)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "rcemip_input.py"], cwd=wd, env=env,
                   check=True, capture_output=True)


def time_compute(wd, label, nrep):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model

    m = Model(Ini(os.path.join(wd, "rcemip.ini")), "run", "rcemip",
              workdir=wd, dtype=np.float32)
    m.finish_setup()
    rad = m.radiation
    ctx = m.ctx
    st = m.fields.create(m.input_nc, dtype=m.dtype)
    s, _, _sfc = m.as_device_state(st)
    rad._latlon = (rad.lat, rad.lon)

    fn = jax.jit(lambda sd: rad._compute(ctx, sd, jnp.asarray(0., m.dtype),
                                         m.thermo))
    out = fn(s)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(s)
    jax.block_until_ready(out[0])
    dt_call = (time.perf_counter() - t0) / nrep
    ncol = ctx.itot * ctx.jtot
    print("%-28s LW gpt %3d  SW gpt %3d  %8.1f ms/call  %6.0f ns/col/gpt"
          % (label, rad.kdist_lw.n_gpt, rad.kdist_sw.n_gpt,
             dt_call * 1e3,
             dt_call / ncol / (rad.kdist_lw.n_gpt + rad.kdist_sw.n_gpt)
             * 1e9), flush=True)
    olr = float(np.asarray(out[0]).sum())  # keep outputs alive
    del m, s, fn, out
    return dt_call


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ktot = int(sys.argv[2]) if len(sys.argv) > 2 else 72
    nrep = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    wd = "/tmp/rrtmgp_perf_%d_%d" % (size, ktot)
    build_case(size, ktot, wd)

    import make_rrtmgp_coefficients as mk
    mk.configure(full=False)
    mk.main(wd)
    t_red = time_compute(wd, "reduced (in-repo default)", nrep)

    mk.configure(full=True)
    mk.main(wd)
    t_full = time_compute(wd, "full width (rte-rrtmgp dims)", nrep)
    mk.configure(full=False)

    print("full/reduced cost ratio: %.1fx  (gpt ratio %.1fx)"
          % (t_full / t_red, (256 + 224) / (8 + 6)))


if __name__ == "__main__":
    main()
