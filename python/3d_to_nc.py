"""Convert raw binary 3-D dump files to NetCDF
(reference ``python/3d_to_nc.py``).

Usage: python 3d_to_nc.py <casename> <variable> [t0 t1] [--dir D]
Reads grid.0000000 + <var>.<iotime> binaries, writes <var>.nc with
(time, z, y, x) layout.
"""

import argparse
import glob
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
    p.add_argument("--dir", default=".")
    p.add_argument("--precision", choices=["single", "double"], default="double")
    args = p.parse_args()

    dtype = np.float32 if args.precision == "single" else np.float64
    ini = Ini(os.path.join(args.dir, "%s.ini" % args.casename))
    grid = Grid(ini)
    grid.load(os.path.join(args.dir, "grid.0000000"), dtype=dtype)

    pattern = re.compile(r"^%s\.(\d{7})$" % re.escape(args.variable))
    files = sorted(f for f in os.listdir(args.dir) if pattern.match(f))
    if not files:
        raise SystemExit("no %s.<iotime> files found" % args.variable)

    iotimeprec = ini.get_int("time", "iotimeprec", default=0)
    times = [int(pattern.match(f).group(1)) * 10.0 ** iotimeprec for f in files]

    zdim = "zh" if args.variable == "w" else "z"
    xdim = "xh" if args.variable == "u" else "x"
    ydim = "yh" if args.variable == "v" else "y"

    out = nc.Dataset(os.path.join(args.dir, "%s.nc" % args.variable), "w")
    out.createDimension("time", None)
    out.createDimension(zdim, grid.ktot)
    out.createDimension(ydim, grid.jtot)
    out.createDimension(xdim, grid.itot)
    vt = out.createVariable("time", "f8", ("time",))
    zvals = grid.z[grid.kstart:grid.kend] if zdim == "z" else grid.zh[grid.kstart:grid.kend]
    out.createVariable(zdim, "f8", (zdim,))[:] = zvals
    out.createVariable(ydim, "f8", (ydim,))[:] = grid.y if ydim == "y" else grid.yh
    out.createVariable(xdim, "f8", (xdim,))[:] = grid.x if xdim == "x" else grid.xh
    vv = out.createVariable(args.variable, "f8", ("time", zdim, ydim, xdim))

    for i, (f, t) in enumerate(zip(files, times)):
        raw = np.fromfile(os.path.join(args.dir, f), dtype=dtype)
        vt[i] = t
        vv[i] = raw.reshape(grid.ktot, grid.jtot, grid.itot)
    out.close()
    print("wrote %s.nc with %d times" % (args.variable, len(files)))


if __name__ == "__main__":
    main()
