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
