"""Measured per-kernel roofline of the drycblles step on the real chip.

Times each hot component of the production rkfold step IN ISOLATION
(jitted, donated, block_until_ready) at the bench size, attaches the
analytic bytes-moved model of each kernel, and prints a markdown table
with achieved GB/s and % of HBM peak — the quantified version of
ARCHITECTURE.md's "VPU-limited / near the read+write floor" claims
(round-4 item 5).  A whole-step wall-clock (no profiler) anchors the sum.

Usage (on the TPU):  python python/roofline.py [size] [nsteps]
"""

import gc
import os
import sys
import time

import numpy as np

HBM_GBS = float(os.environ.get("ROOFLINE_HBM_GBS", "819"))  # v5e


def _p(msg):
    """Progress line, unbuffered — partial results survive a timeout."""
    print("[roofline] " + msg, file=sys.stderr, flush=True)


def _timeit(fn, *args, n=10):
    """One dispatch of a lax.scan over n dependent iterations: the remote
    dispatch/fetch latency (tens of ms through the tunnel) amortizes away,
    so the result is DEVICE kernel time per call.  ``fn(*args)`` must
    return a pytree whose first leaf has the shape of args[0]'s first
    leaf, which is threaded back as the next iteration's input (a real
    data dependence, so XLA cannot CSE the repeats)."""
    import jax
    import jax.numpy as jnp

    def scan_fn(a0, rest):
        # a0 is a traced ARGUMENT pytree: never close over it, or its
        # non-threaded leaves become multi-GB executable constants (the
        # compile then grinds for tens of minutes through the tunnel).
        leaves, treedef = jax.tree_util.tree_flatten(a0)

        def body(x, _):
            cur = jax.tree_util.tree_unflatten(treedef, [x] + leaves[1:])
            out = fn(cur, *rest)
            outs = jax.tree_util.tree_leaves(out)
            y = outs[0]
            nxt = (y.astype(x.dtype).reshape(x.shape)
                   if y.shape == x.shape else x + 1e-30 * jnp.sum(y))
            # couple EVERY output leaf into the carry: a probe that only
            # threads its first output lets XLA dead-code-eliminate the
            # work feeding the others (separable multi-output fns would
            # time as a fraction of themselves)
            for l in outs[1:]:
                nxt = nxt + 1e-30 * jnp.sum(l).astype(x.dtype)
            return nxt, 0
        x, _ = jax.lax.scan(body, leaves[0], None, length=n)
        return x

    sj = jax.jit(scan_fn)
    out = sj(args[0], args[1:])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = sj(args[0], args[1:])
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    del out
    gc.collect()
    return ms


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    import jax
    import jax.numpy as jnp

    _p("building model %d^3" % size)
    model = ge._build_model(size, size, size)
    model.build_step()
    s, t, sfc = ge._initial_state(model)
    dt = jnp.asarray(2.0, dtype=model.dtype)
    time0 = jnp.asarray(0.0, dtype=model.dtype)
    pp = model.pres_params
    fused = model._fused
    ctx = model.ctx
    pts = size ** 3
    B = 4 * pts / 1e9   # GB per full-field pass (f32)

    # ---- whole step (scan of nsteps, no profiler) ----
    def chunk(s, sfc, pp):
        def body(carry, _):
            s, sfc = carry
            s, sfc, _aux = model._step_raw(s, sfc, pp, dt, time0)
            return (s, sfc), 0
        (s, sfc), _ = jax.lax.scan(body, (s, sfc), None, length=nsteps)
        return s, sfc

    _p("compiling whole step (scan of %d)" % nsteps)
    cj = jax.jit(chunk, donate_argnums=(0, 1))
    s1, sfc1 = cj(s, sfc, pp)
    jax.block_until_ready(s1["u"])
    t0 = time.perf_counter()
    s1, sfc1 = cj(s1, sfc1, pp)
    jax.block_until_ready(s1["u"])
    step_ms = (time.perf_counter() - t0) / nsteps * 1e3
    _p("whole step: %.1f ms" % step_ms)
    del s, t, sfc
    gc.collect()

    rows = []

    def add(name, ms, nbytes):
        rows.append((name, ms, nbytes))
        _p("%-42s %7.2f ms" % (name, ms))

    # ---- rkfold tendency sweep (one substep) ----
    if fused is not None and model._use_rkfold:
        from microhh_tpu.ops.pallas_fused import (_surface_evisc_row,
                                                  fused_tendencies_rk)
        aux = {}
        if getattr(fused, "fold_evisc", False) and fused.smag.surface:
            aux["se_row"] = _surface_evisc_row(fused.smag, ctx, s1, sfc1,
                                               fused.has_thermo)

        def sweep(sd, auxd):
            return fused_tendencies_rk(fused, ctx, sd, {}, auxd, sfc1,
                                       0.3 * 2.0, 0.5, first=True,
                                       rhs_dti=1. / 0.6)

        ms = _timeit(jax.jit(sweep), s1, aux)
        # reads u,v,w,th (ring: 1 pass each) + writes s*4 + t4 + rhs + evisc
        nbytes = (4 + 4 + 4 + 1 + 1) * B
        add("rkfold tendency sweep (per substep)", ms, nbytes)

    # ---- Poisson: rhs glue + spectral solve + gradient apply ----
    from microhh_tpu.ops.pallas_fused import PresGlue
    glue = PresGlue(fused.ctx, fused.interpret) if fused is not None else None
    rhs = None
    if glue is not None:
        g_rhs = jax.jit(lambda sd: glue.rhs(sd["u"], sd["v"], sd["w"], 1.))
        ms = _timeit(g_rhs, s1)
        add("pres glue: divergence rhs", ms, 4 * B)
        rhs = g_rhs(s1)
    if rhs is None:
        rhs = jnp.zeros((ctx.ktot, ctx.jtot, ctx.itot), model.dtype)

    solve = jax.jit(lambda r, p: model.pres.solve(ctx, r, p))
    ms_solve = _timeit(solve, rhs, pp)
    # fwd DFT reads rhs writes 2 spectra; TDMA r/w 2; inv reads 2 writes 1
    add("spectral solve (DFT+Thomas+iDFT)", ms_solve, 10 * B)
    p_int = solve(rhs, pp)

    if glue is not None:
        t_s = {n: jnp.zeros_like(s1[n]) for n in ("u", "v", "w")}
        g_app = jax.jit(lambda p, sd: glue.apply(
            p, {n: sd[n] for n in ("u", "v", "w")}, t_s, 0.6, 0.5, True))
        ms = _timeit(g_app, p_int, s1)
        add("pres glue: gradient apply", ms, (1 + 6 + 6) * B)

    # ---- MOST surface + ghost fill (XLA) ----
    gh = jax.jit(lambda sd: model.boundary.set_ghost_cells(ctx, sd, sfc1))
    add("ghost fill (XLA, when not folded)", _timeit(gh, s1), None)
    bexec = jax.jit(lambda sd: model.boundary.exec(ctx, sd, sfc1, {}))
    add("MOST surface layer (2-D)", _timeit(bexec, s1), None)

    # ---- CFL/dn limits ----
    ms = _timeit(jax.jit(model._limits_fn), s1, sfc1)
    add("limits (CFL + dnmul, per STEP)", ms, None)

    print("\n## Measured roofline — drycblles %d^3 (1 chip, f32)" % size)
    print("\nwhole step (RK3, %d-step scan): **%.1f ms/step**"
          % (nsteps, step_ms))
    print()
    print("| component | ms/call | bytes (model) | GB/s | %% of %d GB/s |"
          % HBM_GBS)
    print("|---|---|---|---|---|")
    acc = 0.
    for name, ms, nbytes in rows:
        if nbytes is not None:
            gbs = nbytes / (ms / 1e3)
            print("| %s | %.2f | %.1f GB | %.0f | %.0f%% |"
                  % (name, ms, nbytes, gbs, 100. * gbs / HBM_GBS))
        else:
            print("| %s | %.2f | - | - | - |" % (name, ms))
    sub3 = sum(ms for name, ms, _ in rows
               if "substep" in name or "glue" in name or "solve" in name) * 3
    print("\n3 substeps of (sweep + rhs + solve + apply) = %.1f ms; "
          "measured step = %.1f ms (rest: wall patches, MOST, limits, "
          "host gaps)." % (sub3, step_ms))


if __name__ == "__main__":
    main()
