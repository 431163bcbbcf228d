"""Full sweep: every case, init + run, over a precision list (reference
``cases/run_all.py`` sweeps {dp,sp}x{cpu,cpumpi,gpu} executables; the TPU
build sweeps {double,single} precision on whatever backend jax exposes).

Usage: python cases/run_all.py [--cases a,b,c] [--precisions double,single]
                               [--smoke]

Without --smoke every case runs at its shipped size (can be hours);
--smoke shrinks grids the same way run_small_set.py does.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", default="")
    p.add_argument("--precisions", default="double,single")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    cases_dir = os.path.join(REPO, "cases")
    names = (args.cases.split(",") if args.cases else
             sorted(d for d in os.listdir(cases_dir)
                    if os.path.isdir(os.path.join(cases_dir, d))))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    failed = []
    for prec in args.precisions.split(","):
        for case in names:
            if args.smoke:
                cmd = [sys.executable, os.path.join(cases_dir, "run_small_set.py"),
                       "--cases", case]
                r = subprocess.run(cmd, env=env, capture_output=True, text=True)
                ok = r.returncode == 0
            else:
                sys.path.insert(0, os.path.join(REPO, "python"))
                import microhh_tools as mht
                cdir = os.path.join(cases_dir, case)
                if not os.path.exists(os.path.join(cdir, "%s.ini" % case)):
                    continue
                try:
                    mht.run_case(case, {}, case_dir=cdir,
                                 experiment="runall_%s" % prec, precision=prec)
                    ok = True
                except Exception as e:
                    ok = False
                    print("  %s" % e)
            print("%-20s %-8s %s" % (case, prec, "OK" if ok else "FAIL"))
            if not ok:
                failed.append((case, prec))

    if failed:
        print("\n%d run(s) failed: %s" % (len(failed), failed))
        sys.exit(1)
    print("\nall runs OK")


if __name__ == "__main__":
    main()
