"""CLI: ``python -m microhh_tpu {init,run,post} casename`` (reference
``main/microhh.cxx``)."""

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="microhh_tpu")
    p.add_argument("mode", choices=["init", "run", "post"])
    p.add_argument("casename")
    p.add_argument("--precision", choices=["single", "double"], default="single")
    p.add_argument("--dir", default=".")
    args = p.parse_args(argv)

    if args.precision == "double":
        import jax
        jax.config.update("jax_enable_x64", True)
        dtype = np.float64
    else:
        dtype = np.float32

    from .model import run_case
    run_case(args.dir, args.casename, args.mode, dtype=dtype)


if __name__ == "__main__":
    main()
