"""Convert raw binary cross-section files to NetCDF
(reference ``python/cross_to_nc.py``).

Usage: python cross_to_nc.py <casename> <variable> <mode: xy|xz|yz> [--dir D]
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from microhh_tpu.utils import nc
from microhh_tpu.config import Ini
from microhh_tpu.grid import Grid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("casename")
    p.add_argument("variable")
    p.add_argument("mode", choices=["xy", "xz", "yz"])
    p.add_argument("--dir", default=".")
    p.add_argument("--precision", choices=["single", "double"], default="double")
    args = p.parse_args()

    dtype = np.float32 if args.precision == "single" else np.float64
    ini = Ini(os.path.join(args.dir, "%s.ini" % args.casename))
    grid = Grid(ini)
    # the grid file precision is independent of the field precision
    try:
        grid.load(os.path.join(args.dir, "grid.0000000"), dtype=np.float64)
    except ValueError:
        grid.load(os.path.join(args.dir, "grid.0000000"), dtype=np.float32)

    pattern = re.compile(r"^%s\.%s\.(\d{5})\.(\d{7})$"
                         % (re.escape(args.variable), args.mode))
    files = sorted(f for f in os.listdir(args.dir) if pattern.match(f))
    iotimeprec = ini.get_int("time", "iotimeprec", default=0)

    # index-less surface planes (<var>.xy.<iotime>: bot/fluxbot/path/ustar…)
    plane_pat = re.compile(r"^%s\.xy\.(\d{7})$" % re.escape(args.variable))
    plane_files = sorted(f for f in os.listdir(args.dir) if plane_pat.match(f))
    if not files and plane_files and args.mode == "xy":
        times = sorted(int(plane_pat.match(f).group(1)) for f in plane_files)
        out = nc.Dataset(os.path.join(args.dir, "%s_xy.nc" % args.variable), "w")
        out.createDimension("time", None)
        out.createDimension("y", grid.jtot)
        out.createDimension("x", grid.itot)
        vt = out.createVariable("time", "f8", ("time",))
        vv = out.createVariable(args.variable, "f8", ("time", "y", "x"))
        for it, t in enumerate(times):
            vt[it] = t * 10.0 ** iotimeprec
            raw = np.fromfile(os.path.join(
                args.dir, "%s.xy.%07d" % (args.variable, t)), dtype=dtype)
            vv[it] = raw.reshape(grid.jtot, grid.itot)
        out.close()
        print("wrote %s_xy.nc (surface planes)" % args.variable)
        return

    if not files:
        raise SystemExit("no matching cross files found")

    indexes = sorted({int(pattern.match(f).group(1)) for f in files})
    times = sorted({int(pattern.match(f).group(2)) for f in files})

    if args.mode == "xy":
        dims = ("y", "x")
        shape = (grid.jtot, grid.itot)
    elif args.mode == "xz":
        dims = ("z", "x")
        shape = (grid.ktot, grid.itot)
    else:
        dims = ("z", "y")
        shape = (grid.ktot, grid.jtot)

    out = nc.Dataset(os.path.join(args.dir, "%s_%s.nc" % (args.variable, args.mode)), "w")
    out.createDimension("time", None)
    out.createDimension("index", len(indexes))
    for d, n in zip(dims, shape):
        out.createDimension(d, n)
    vt = out.createVariable("time", "f8", ("time",))
    vv = out.createVariable(args.variable, "f8", ("time", "index") + dims)

    for it, t in enumerate(times):
        vt[it] = t * 10.0 ** iotimeprec
        for ii, idx in enumerate(indexes):
            fname = "%s.%s.%05d.%07d" % (args.variable, args.mode, idx, t)
            raw = np.fromfile(os.path.join(args.dir, fname), dtype=dtype)
            vv[it, ii] = raw.reshape(shape)
    out.close()
    print("wrote %s_%s.nc" % (args.variable, args.mode))


if __name__ == "__main__":
    main()
