"""Sweep every case at smoke size: init + a short run each, report a table
(reference ``cases/run_small_set.py`` / ``run_all.py``).

Usage: python cases/run_small_set.py [--cases a,b,c] [--platform cpu]
Runs each case in a scratch dir with the grid shrunk and a short endtime;
exits nonzero if any case fails.
"""

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (smoke overrides applied to every ini)
SMOKE = {
    "itot": 32, "jtot": 8, "ktot": 32,
    "endtime": "SHORT", "savetime": "SHORT",
}
# per-case short endtimes (roughly a few dozen steps each)
ENDTIME = {
    "taylorgreen": 1., "conservation": 20., "drycblles": 60., "drycbl": 1.,
    "bomex": 60., "rico": 60., "dycoms": 30., "arm": 120., "gabls1": 60.,
    "cabauw_lsm": 60., "ib_sine": 5., "moser180": 1., "moser600": 1.,
    "prandtlslope": 1., "ekman": 2., "rayleighbenard": 1.,
    "rayleightaylor": 1., "andren1994": 20., "eady": 400., "SBL_DNN": 2.,
    "jaenschwalde": 60., "drycblslope": 0.2, "vanheerwaarden2016": 2.,
    "weakscaling": 0.1, "sullivan2011": 60., "gabls4s3": 60.,
    "rcemip": 100.,   # iotimeprec=2: io times must be multiples of 100 s
    "SBL_Smag": 2., "SBL_DNNglobalScales": 2., "SBL_DNNstatsScales": 2.,
}


def smoke_ini(src, case):
    txt = open(src).read()
    et = ENDTIME.get(case, 10.)
    # only shrink the [grid] ktot (the land_surface section has its own)
    txt = re.sub(r"(?m)^itot=.*$", "itot=%d" % SMOKE["itot"], txt, count=1)
    txt = re.sub(r"(?m)^jtot=.*$", "jtot=%d" % SMOKE["jtot"], txt, count=1)
    txt = re.sub(r"(?m)^ktot=.*$", "ktot=%d" % SMOKE["ktot"], txt, count=1)
    txt = re.sub(r"(?m)^endtime=.*$", "endtime=%s" % et, txt)
    txt = re.sub(r"(?m)^savetime=.*$", "savetime=%s" % et, txt)
    # the shrunken smoke domain may not reach 500 hPa
    txt = re.sub(r"w500hpa,|,w500hpa|w500hpa", "", txt)
    return txt


def run(cmd, cwd, env):
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=1200)
    out = r.stdout + r.stderr
    unused = ""
    for line in out.splitlines():
        if "WARNING unused ini options" in line:
            unused = line.split("unused ini options:", 1)[1].strip()
    return r.returncode, out.strip().splitlines()[-3:], unused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", default="")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    cases_dir = os.path.join(REPO, "cases")
    names = (args.cases.split(",") if args.cases else
             sorted(d for d in os.listdir(cases_dir)
                    if os.path.isdir(os.path.join(cases_dir, d))))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MICROHH_PLATFORM"] = args.platform

    failed = []
    for case in names:
        cdir = os.path.join(cases_dir, case)
        ini_src = os.path.join(cdir, "%s.ini" % case)
        if not os.path.exists(ini_src):
            inis = [f for f in os.listdir(cdir) if f.endswith(".ini")]
            if not inis:
                continue
            ini_src = os.path.join(cdir, inis[0])
        casename = os.path.basename(ini_src)[:-4]
        wd = tempfile.mkdtemp(prefix="smoke_%s_" % case)
        try:
            with open(os.path.join(wd, "%s.ini" % casename), "w") as f:
                f.write(smoke_ini(ini_src, case))
            # generate inputs (generator knows its own ktot; the model only
            # reads the first ktot levels, so full-size profiles are fine
            # as long as ktot_smoke <= ktot_case)
            gen = os.path.join(cdir, "%s_input.py" % casename)
            if os.path.exists(gen):
                rc, tail, _ = run([sys.executable, gen], wd, env)
                if rc != 0:
                    failed.append((case, "input", tail))
                    print("%-16s INPUT FAIL" % case)
                    continue
            unused = {}
            for mode in ("init", "run"):
                rc, tail, unused[mode] = run(
                    [sys.executable, "-m", "microhh_tpu", mode, casename],
                    wd, env)
                if rc != 0:
                    failed.append((case, mode, tail))
                    print("%-16s %s FAIL: %s" % (case, mode.upper(),
                                                 tail[-1] if tail else "?"))
                    break
            else:
                # config-lifecycle parity: options are consumed at
                # component construction (reference ctor order), so the
                # unused set must be MODE-INDEPENDENT.  (A nonempty but
                # identical set mirrors the reference: e.g. crosslist
                # under swcross=0 is unread upstream too.)
                if unused["init"] != unused["run"]:
                    failed.append((case, "unused-options",
                                   ["init: %s" % unused["init"],
                                    "run:  %s" % unused["run"]]))
                    print("%-16s UNUSED-OPTIONS MISMATCH (init vs run)"
                          % case)
                else:
                    extra = (" (unused: %s)" % unused["init"]
                             if unused["init"] else "")
                    print("%-16s OK%s" % (case, extra))
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    if failed:
        print("\n%d case(s) failed" % len(failed))
        sys.exit(1)
    print("\nall cases OK")


if __name__ == "__main__":
    main()
