"""Bitwise-restart sweep: run 0->T and T/2->T for a set of cases and
compare every restart file bitwise (reference ``cases/run_restart_set.py``
over microhh_tools.run_restart).

Usage: python cases/run_restart_set.py [--cases a,b,c] [--precision double]

Each case is shrunk to smoke size and endtime = 2*savetime so leg 2 starts
from the mid-time save.  Bitwise equality holds per topology (XLA is
deterministic on a fixed device set), mirroring the reference's
FFTW-wisdom-pinned restarts.
"""

import argparse
import os
import re
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "python"))
import microhh_tools as mht  # noqa: E402

# cases with cheap, restart-complete state (incl. LSM/soil and moist)
DEFAULT_CASES = ["taylorgreen", "drycblles", "bomex", "cabauw_lsm", "gabls1"]

SMOKE = {"itot": 16, "jtot": 8, "ktot": 24}
ENDTIME = {"taylorgreen": 0.5, "drycblles": 120., "bomex": 120.,
           "cabauw_lsm": 120., "gabls1": 120.}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", default=",".join(DEFAULT_CASES))
    p.add_argument("--precision", default="double")
    args = p.parse_args()

    nerror_tot = 0
    for case in args.cases.split(","):
        cdir = os.path.join(REPO, "cases", case)
        if not os.path.isdir(cdir):
            print("%-16s SKIP (no case dir)" % case)
            continue
        endtime = ENDTIME.get(case, 60.)
        opts = {
            "grid": dict(SMOKE),
            "time": {"endtime": endtime, "savetime": endtime / 2.},
        }
        scratch = tempfile.mkdtemp(prefix="restart_%s_" % case)
        # stage the case files into the scratch dir (run_case copies from
        # case_dir, which must hold <case>.ini etc.)
        for fname in os.listdir(cdir):
            if os.path.isfile(os.path.join(cdir, fname)):
                shutil.copy(os.path.join(cdir, fname), scratch)
        try:
            nerror, w1, w2 = mht.run_restart(case, opts, case_dir=scratch,
                                             precision=args.precision)
            print("%-16s %s" % (case, "OK" if nerror == 0
                                else "FAIL (%d files differ)" % nerror))
            nerror_tot += nerror
        except Exception as e:
            print("%-16s ERROR: %s" % (case, e))
            nerror_tot += 1
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    sys.exit(1 if nerror_tot else 0)


if __name__ == "__main__":
    main()
