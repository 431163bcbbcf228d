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

    import jax
    # MICROHH_PLATFORM=cpu forces the CPU backend (the axon harness
    # force-prepends its TPU platform to JAX_PLATFORMS, so an env var at the
    # jax level is not enough).
    platform = os.environ.get("MICROHH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    if args.precision == "double":
        jax.config.update("jax_enable_x64", True)
        dtype = np.float64
    else:
        dtype = np.float32

    from .model import run_case
    run_case(args.dir, args.casename, args.mode, dtype=dtype)


if __name__ == "__main__":
    main()
