"""Device-side chunked time loop (model._run_chunked): the event-driven
lax.while_loop must reproduce the per-step host loop — same adaptive-dt
decisions (CFL-limited here), same event alignment, same restart output —
to roundoff, on a small CBL case."""

import os
import re
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CASE = os.path.join(REPO, "cases", "drycblles")


def _prep(d, n=12):
    for f in ("drycblles.ini", "drycblles_input.py"):
        shutil.copy(os.path.join(CASE, f), d)
    ini = open(os.path.join(d, "drycblles.ini")).read()
    ini = re.sub(r"itot=\d+", "itot=%d" % n, ini)
    ini = re.sub(r"jtot=\d+", "jtot=%d" % n, ini)
    ini = re.sub(r"ktot=\d+", "ktot=%d" % n, ini)
    ini = re.sub(r"endtime=\S+", "endtime=90", ini)
    ini = re.sub(r"savetime=\S+", "savetime=90", ini)
    ini = re.sub(r"sampletime=\S+", "sampletime=45", ini)
    # cflmax small enough that dt is CFL-limited -> the device-side
    # adaptive-dt path is actually exercised (not just dt=dtmax)
    ini = re.sub(r"cflmax=\S+", "cflmax=0.002", ini)
    open(os.path.join(d, "drycblles.ini"), "w").write(ini)
    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, "drycblles_input.py"], check=True,
                   capture_output=True, cwd=d, env=env)


@pytest.mark.parametrize("dummy", [0])
def test_chunked_matches_per_step(tmp_path, dummy):
    from microhh_tpu.model import run_case
    out = {}
    for tag, chunk in (("chunked", "1"), ("perstep", "0")):
        d = str(tmp_path / tag)
        os.makedirs(d)
        _prep(d)
        os.environ["MICROHH_CHUNK"] = chunk
        try:
            run_case(d, "drycblles", "init")
            run_case(d, "drycblles", "run")
        finally:
            os.environ.pop("MICROHH_CHUNK", None)
        out[tag] = {
            "u": np.fromfile(os.path.join(d, "u.0000090"), dtype=np.float64),
            "th": np.fromfile(os.path.join(d, "th.0000090"), dtype=np.float64),
            "status": open(os.path.join(d, "drycblles.out")).read(),
        }

    # the per-step host loop quantizes dt to 1e-9 s inside the horizon while
    # the device loop keeps the float dt, so allow roundoff-level drift
    for f in ("u", "th"):
        np.testing.assert_allclose(out["chunked"][f], out["perstep"][f],
                                   rtol=0, atol=1e-9)
    # both loops must report the same final integer time and iteration count
    last_c = out["chunked"]["status"].strip().splitlines()[-1].split()
    last_p = out["perstep"]["status"].strip().splitlines()[-1].split()
    assert last_c[0] == last_p[0], "iteration counts diverged"
    assert last_c[1] == last_p[1], "final times diverged"
    # adaptive stepping must actually have engaged (dt << dtmax)
    assert float(last_c[3]) < 10.
