"""Case-running and comparison utilities (reference ``python/microhh_tools.py``).

Works against the TPU framework's CLI (``python -m microhh_tpu``): ini
read/write with per-field subscripts, case runner, restart runner with
bitwise comparison, NetCDF statistics comparison.
"""

import filecmp
import os
import shutil
import subprocess
import sys

import numpy as np


# ---------------------------------------------------------------------------
#  ini handling
# ---------------------------------------------------------------------------

class Read_namelist:
    """Read a .ini into nested dict-like access: nl['grid']['itot']."""

    def __init__(self, namelist_file):
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from microhh_tpu.config import Ini
        self._ini = Ini(namelist_file)
        self.groups = {}
        for sec, items in self._ini.items.items():
            g = {}
            for key, subs in items.items():
                for sub, val in subs.items():
                    name = key if not sub else "%s[%s]" % (key, sub)
                    g[name] = _parse(val)
            self.groups[sec] = g

    def __getitem__(self, name):
        return self.groups[name]


def _parse(v):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def replace_namelist_value(namelist_file, variable, new_value, group=None):
    """In-place edit of one ini value (same semantics as the reference)."""
    out = []
    cur = None
    done = False
    with open(namelist_file) as f:
        for line in f:
            s = line.strip()
            if s.startswith("[") and s.endswith("]"):
                cur = s[1:-1]
            elif "=" in s and not s.startswith("#"):
                key = s.split("=", 1)[0].strip()
                if key == variable and (group is None or cur == group):
                    line = "%s=%s\n" % (variable, new_value)
                    done = True
            out.append(line)
    if not done:
        raise KeyError("%s not found in %s" % (variable, namelist_file))
    with open(namelist_file, "w") as f:
        f.writelines(out)


def merge_options(base, *updates):
    """Recursively merge {section: {key: value}} option dicts."""
    out = {k: dict(v) for k, v in base.items()}
    for upd in updates:
        for sec, items in upd.items():
            out.setdefault(sec, {})
            out[sec].update(items)
    return out


def write_namelist(path, options):
    with open(path, "w") as f:
        for sec, items in options.items():
            f.write("[%s]\n" % sec)
            for k, v in items.items():
                f.write("%s=%s\n" % (k, v))
            f.write("\n")


# ---------------------------------------------------------------------------
#  case running
# ---------------------------------------------------------------------------

def _python_exe():
    return sys.executable


def run_case(case_name, case_options, mpi_options=None, case_dir=".",
             experiment="local", executable=None, precision="single"):
    """Init + run one case in a scratch subdirectory (reference run_case,
    microhh_tools.py:923-1003).  ``executable`` is ignored (kept for call
    compatibility); the TPU CLI is always used."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wdir = os.path.join(case_dir, "%s_%s" % (case_name, experiment))
    os.makedirs(wdir, exist_ok=True)

    src_dir = case_dir
    for fname in os.listdir(src_dir):
        if fname.startswith(case_name) and os.path.isfile(os.path.join(src_dir, fname)):
            shutil.copy(os.path.join(src_dir, fname), wdir)

    ini = os.path.join(wdir, "%s.ini" % case_name)
    for sec, items in (case_options or {}).items():
        for key, val in items.items():
            try:
                replace_namelist_value(ini, key, val, sec)
            except KeyError:
                with open(ini, "a") as f:
                    f.write("\n[%s]\n%s=%s\n" % (sec, key, val))

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    gen = os.path.join(wdir, "%s_input.py" % case_name)
    if os.path.exists(gen):
        subprocess.check_call([_python_exe(), os.path.basename(gen)], cwd=wdir, env=env)

    for mode in ("init", "run"):
        subprocess.check_call(
            [_python_exe(), "-m", "microhh_tpu", mode, case_name,
             "--precision", precision],
            cwd=wdir, env=env)
    return wdir


def permute_options(permutations):
    """Expand lists of named option-dicts into the cross product of
    (suffix, merged-options) pairs (reference
    generator_parameter_permutations, microhh_tools.py:852-886).

    ``permutations`` is a list of dicts (or one dict), each mapping a
    variant name to an option dict ``{section: {key: value}}``; the result
    takes one variant from every list::

        permute_options([{"rk3": {"time": {"rkorder": "3"}},
                          "rk4": {"time": {"rkorder": "4"}}},
                         {"adv2": {"advec": {"swadvec": "2"}}}])
        -> [("rk3_adv2", {...}), ("rk4_adv2", {...})]
    """
    import itertools
    if isinstance(permutations, dict):
        permutations = [permutations]
    out = []
    for combo in itertools.product(*(list(p.items()) for p in permutations)):
        suffix = "_".join(name for name, _ in combo)
        merged = {}
        for _, opts in combo:
            for sec, items in opts.items():
                merged.setdefault(sec, {}).update(items)
        out.append((suffix, merged))
    return out


def run_permutations(case_name, case_options, mpi_options, permutations,
                     case_dir=".", experiment="local", precision="single",
                     outputfile=None):
    """Run every permutation of the option lists and log a CSV summary
    (reference run_permutations + run_cases csv output,
    microhh_tools.py:694-701,974-1003).  Returns the number of failures."""
    import csv
    import timeit
    rows = []
    nerror = 0
    for suffix, opts in permute_options(permutations):
        merged = merge_options(case_options or {}, opts)
        tag = "%s_%s" % (experiment, suffix)
        t0 = timeit.default_timer()
        try:
            wdir = run_case(case_name, merged, mpi_options, case_dir,
                            tag, precision=precision)
            ok = True
        except subprocess.CalledProcessError:
            wdir = os.path.join(case_dir, "%s_%s" % (case_name, tag))
            ok = False
            nerror += 1
        rows.append([case_name, wdir, ok,
                     timeit.default_timer() - t0, merged])
    if outputfile is None:
        outputfile = os.path.join(
            case_dir, "%s_%s.csv" % (case_name, experiment))
    with open(outputfile, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Name", "Run Dir", "Success", "Time", "Options"])
        w.writerows(rows)
    return nerror


def run_restart(case_name, case_options, mpi_options=None, case_dir=".",
                experiment="restart", precision="double"):
    """Run 0->T, then T/2->T from the mid-time restart, and compare every
    restart file bitwise (reference run_restart + compare_bitwise)."""
    import re
    wdir = run_case(case_name, case_options, mpi_options, case_dir,
                    experiment, precision=precision)

    # find endtime/savetime from the ini
    nl = Read_namelist(os.path.join(wdir, "%s.ini" % case_name))
    endtime = float(nl["time"]["endtime"])
    savetime = float(nl["time"]["savetime"])
    halftime = endtime / 2.
    assert abs(halftime / savetime - round(halftime / savetime)) < 1e-12, \
        "endtime/2 must be a multiple of savetime for the restart test"

    wdir2 = wdir + "_leg2"
    os.makedirs(wdir2, exist_ok=True)
    iotimeprec = int(nl["time"].get("iotimeprec", 0))
    fac = 10.0 ** iotimeprec
    half_iotime = int(round(halftime / fac))
    suffix = "%07d" % half_iotime
    for fname in os.listdir(wdir):
        if fname.endswith(suffix) or fname.endswith(".ini") or \
           fname.endswith("_input.nc") or fname.startswith("grid."):
            shutil.copy(os.path.join(wdir, fname), wdir2)

    ini2 = os.path.join(wdir2, "%s.ini" % case_name)
    replace_namelist_value(ini2, "starttime", halftime, "time")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.check_call(
        [_python_exe(), "-m", "microhh_tpu", "run", case_name,
         "--precision", precision],
        cwd=wdir2, env=env)

    # compare final restart files bitwise
    end_suffix = "%07d" % int(round(endtime / fac))
    nerror = 0
    for fname in sorted(os.listdir(wdir)):
        if fname.endswith(end_suffix) and not fname.startswith("time."):
            same = filecmp.cmp(os.path.join(wdir, fname),
                               os.path.join(wdir2, fname), shallow=False)
            if not same:
                print("MISMATCH:", fname)
                nerror += 1
    return nerror, wdir, wdir2


# ---------------------------------------------------------------------------
#  comparisons
# ---------------------------------------------------------------------------

def compare_bitwise(file1, file2):
    return filecmp.cmp(file1, file2, shallow=False)


def compare(file1, file2, rtol=1e-3, atol=1e-8):
    """Compare time-averaged stats NetCDF variables (reference compare,
    microhh_tools.py:553-577)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from microhh_tpu.utils import nc

    f1 = nc.Dataset(file1, "r")
    f2 = nc.Dataset(file2, "r")
    bad = []

    def walk(g1, g2, prefix=""):
        for name, v1 in g1.variables.items():
            if name in g2.variables:
                a = np.asarray(v1[:])
                b = np.asarray(g2.variables[name][:])
                if a.shape == b.shape and not np.allclose(
                        np.nanmean(a, axis=0) if a.ndim > 1 else a,
                        np.nanmean(b, axis=0) if b.ndim > 1 else b,
                        rtol=rtol, atol=atol, equal_nan=True):
                    bad.append(prefix + name)
        for name, sub1 in g1.groups.items():
            if name in g2.groups:
                walk(sub1, g2.groups[name], prefix + name + "/")

    walk(f1, f2)
    f1.close()
    f2.close()
    return bad
