"""Python tooling layer: case runner + bitwise restart test (the reference's
central regression machinery, microhh_tools.py run_case/run_restart)."""

import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "python"))
import microhh_tools as mht

CASES = os.path.join(os.path.dirname(__file__), "..", "cases")


@pytest.mark.slow
def test_run_case_and_restart_bitwise(tmp_path):
    # CLI subprocesses must run on CPU (bitwise determinism + test speed)
    os.environ["MICROHH_PLATFORM"] = "cpu"
    # stage the taylorgreen case into tmp
    for f in os.listdir(os.path.join(CASES, "taylorgreen")):
        shutil.copy(os.path.join(CASES, "taylorgreen", f), tmp_path)

    opts = {
        "grid": {"itot": 32, "ktot": 16},
        "time": {"endtime": 0.5, "savetime": 0.125, "iotimeprec": -3,
                 "outputiter": 20},
    }
    nerror, wdir, wdir2 = mht.run_restart(
        "taylorgreen", opts, case_dir=str(tmp_path), precision="double")
    assert nerror == 0, "restart files differ bitwise"

    # the runner produced a status file and restart chain
    assert os.path.exists(os.path.join(wdir, "taylorgreen.out"))
    assert os.path.exists(os.path.join(wdir, "u.0000500"))
    assert os.path.exists(os.path.join(wdir2, "u.0000500"))


def test_namelist_roundtrip(tmp_path):
    ini = tmp_path / "x.ini"
    ini.write_text("[grid]\nitot=16\nktot=8\n\n[fields]\nrndamp[th]=0.1\n")
    nl = mht.Read_namelist(str(ini))
    assert nl["grid"]["itot"] == 16
    assert nl["fields"]["rndamp[th]"] == 0.1
    mht.replace_namelist_value(str(ini), "itot", 64, "grid")
    nl = mht.Read_namelist(str(ini))
    assert nl["grid"]["itot"] == 64


@pytest.mark.slow
def test_restart_bitwise_moist(tmp_path):
    """Two-leg bitwise restart for a MOIST run (bomex-style: saturation
    adjustment, anelastic basestate, thl/qt state) — covers the restart
    chain beyond the dry default-boundary case."""
    os.environ["MICROHH_PLATFORM"] = "cpu"
    for f in os.listdir(os.path.join(CASES, "bomex")):
        shutil.copy(os.path.join(CASES, "bomex", f), tmp_path)
    opts = {
        "grid": {"itot": 8, "jtot": 8, "ktot": 16},
        "time": {"endtime": 60., "savetime": 30., "outputiter": 10},
        "stats": {"swstats": 0},
    }
    nerror, wdir, wdir2 = mht.run_restart(
        "bomex", opts, case_dir=str(tmp_path), precision="double")
    assert nerror == 0, "moist restart files differ bitwise"
    assert os.path.exists(os.path.join(wdir2, "qt.0000060"))


@pytest.mark.slow
def test_restart_bitwise_lsm(tmp_path):
    """Two-leg bitwise restart for a LAND-SURFACE run (cabauw-style): soil
    temperature/moisture columns, the wl reservoir and the skin/flux 2-D
    state must all round-trip through the restart files
    (boundary_surface_lsm save/load)."""
    os.environ["MICROHH_PLATFORM"] = "cpu"
    for f in os.listdir(os.path.join(CASES, "cabauw_lsm")):
        shutil.copy(os.path.join(CASES, "cabauw_lsm", f), tmp_path)
    opts = {
        "grid": {"itot": 8, "jtot": 8, "ktot": 16},
        "time": {"endtime": 60., "savetime": 30., "outputiter": 10},
        "stats": {"swstats": 0},
        "cross": {"swcross": 0},
    }
    nerror, wdir, wdir2 = mht.run_restart(
        "cabauw_lsm", opts, case_dir=str(tmp_path), precision="double")
    assert nerror == 0, "LSM restart files differ bitwise"
    # soil + reservoir state files exist and were compared
    names = os.listdir(mht_dir := wdir)
    assert any(n.startswith("t_soil.") for n in names), names
    assert any(n.startswith("wl.") for n in names), names


def test_permute_options():
    """Cross-product expansion with stable suffixes and deep-merged options
    (reference generator_parameter_permutations)."""
    perms = [{"rk3": {"time": {"rkorder": "3"}},
              "rk4": {"time": {"rkorder": "4"}}},
             {"adv2": {"advec": {"swadvec": "2"}, "time": {"cflmax": "1.0"}}}]
    out = mht.permute_options(perms)
    assert [s for s, _ in out] == ["rk3_adv2", "rk4_adv2"]
    assert out[0][1] == {"time": {"rkorder": "3", "cflmax": "1.0"},
                         "advec": {"swadvec": "2"}}
    # single dict == one-element list
    assert len(mht.permute_options(perms[0])) == 2


def test_run_permutations_csv(tmp_path):
    """run_permutations runs each variant through the real CLI and logs a
    csv summary (reference run_cases outputfile, microhh_tools.py:694-701)."""
    import csv
    case_dir = str(tmp_path)
    for f in os.listdir(os.path.join(CASES, "taylorgreen")):
        src = os.path.join(CASES, "taylorgreen", f)
        if os.path.isfile(src):
            shutil.copy(src, case_dir)
    os.environ["MICROHH_PLATFORM"] = "cpu"
    small = {"grid": {"itot": "16", "ktot": "8", "jtot": "1"},
             "time": {"endtime": "0.4", "savetime": "0.4",
                      "iotimeprec": "-3"}}
    nerr = mht.run_permutations(
        "taylorgreen", small, None,
        [{"rk3": {"time": {"rkorder": "3"}},
          "rk4": {"time": {"rkorder": "4"}}}],
        case_dir=case_dir, experiment="perm", precision="double")
    assert nerr == 0
    rows = list(csv.reader(open(os.path.join(case_dir, "taylorgreen_perm.csv"))))
    assert rows[0] == ["Name", "Run Dir", "Success", "Time", "Options"]
    assert len(rows) == 3
    assert all(r[2] == "True" for r in rows[1:])
