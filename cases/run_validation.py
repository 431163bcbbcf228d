"""Automated physics-validation envelopes (reference analogue: the
per-case ``<case>_test.py`` runners, e.g.
``cases/drycblles/drycblles_test.py:11-49`` upstream).

Runs three canonical cases end-to-end through the real CLI (init + run),
reads the stats NetCDF, and asserts the published intercomparison
envelopes that previously lived only as tables in the case READMEs:

* drycblles  — CBL growth: zi(t) rises and tracks the encroachment
               prediction zi = sqrt(zi0^2 + 2*wth_s*t/gamma).
* bomex      — GCSS shallow cumulus (Siebesma et al. 2003): cloud cover,
               cloud base / top from the mean ql profile.
* gabls1     — Beare et al. (2006) SBL: supergeostrophic low-level jet,
               surface-layer cooling, stable stratification.  The jet
               needs most of the 9 h spin-up, so its envelope checks are
               only armed when the (possibly overridden) endtime covers
               at least 7 h; shorter runs still assert stability/cooling.

Exit status is nonzero on any failed check, so this gates CI.  The
default grids are coarse enough for minutes on a TPU chip and an
overnight CPU run; ``--quick`` shrinks further (smoke scale: plumbing +
sign checks only, loosened envelopes).

Usage:
  python cases/run_validation.py [--cases drycblles,bomex,gabls1]
      [--quick] [--workdir /tmp/mh_validation] [--precision single]
"""

import argparse
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

FAILURES = []


def check(name, val, lo, hi):
    ok = lo <= val <= hi
    print("  %-38s %12.4g  in [%g, %g]  %s"
          % (name, val, lo, hi, "ok" if ok else "FAIL"), flush=True)
    if not ok:
        FAILURES.append(name)


def run_case(case, overrides, workdir, precision, ininame=None):
    """Patch the ini, generate input, init + run through the CLI.
    ``ininame``: the case's ini/input basename when it differs from the
    directory name (e.g. SBL_DNN/SBL.ini)."""
    name = ininame or case
    src = os.path.join(REPO, "cases", case)
    wd = os.path.join(workdir, case)
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    ini = open(os.path.join(src, "%s.ini" % name)).read()
    for key, val in overrides.items():
        ini, n = re.subn(r"(?m)^%s=\S*" % key, "%s=%s" % (key, val), ini)
        if n == 0:
            raise RuntimeError("%s: override %s not found in ini" % (case, key))
    open(os.path.join(wd, "%s.ini" % name), "w").write(ini)
    shutil.copy(os.path.join(src, "%s_input.py" % name), wd)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.check_call([sys.executable, "%s_input.py" % name],
                          cwd=wd, env=env)
    for mode in ("init", "run"):
        cmd = [sys.executable, "-m", "microhh_tpu", mode, name,
               "--precision", precision]
        print("+ %s  (in %s)" % (" ".join(cmd), wd), flush=True)
        proc = subprocess.run(cmd, cwd=wd, env=env, text=True,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
        sys.stdout.write(proc.stdout)
        sys.stdout.flush()
        if proc.returncode != 0:
            raise subprocess.CalledProcessError(proc.returncode, cmd)
        # parity with the reference's clean startup: every option the case
        # ini carries must be consumed (model.cxx:218 report stays empty)
        for line in proc.stdout.splitlines():
            if "unused ini options" in line:
                FAILURES.append("%s/%s: %s" % (case, mode, line.strip()))
                print("  FAIL (unused ini options): %s" % line.strip())
    from microhh_tpu.utils import nc
    return nc.Dataset(os.path.join(wd, "%s.default.0000000.nc" % name), "r")


def _prof(group, name, tavg=1):
    a = np.asarray(group.variables[name][:])
    return a[-tavg:].mean(axis=0)


# ---------------------------------------------------------------------------
def validate_drycblles(args):
    itot = 32 if args.quick else 64
    endtime = 1800. if args.quick else 3600.
    f = run_case("drycblles",
                 {"itot": itot, "jtot": itot, "ktot": itot,
                  "endtime": "%g" % endtime, "savetime": "%g" % endtime,
                  "sampletime": "60."},
                 args.workdir, args.precision)
    th_grp = f.groups["thermo"]
    t = np.asarray(f.variables["time"][:])
    zi = np.asarray(th_grp.variables["zi"][:])
    wth = np.asarray(th_grp.variables["th_flux"][:]) \
        if "th_flux" in th_grp.variables else None
    f.close()

    print("drycblles: zi(0)=%.0f m -> zi(end)=%.0f m" % (zi[0], zi[-1]))
    # growth: monotone up to sampling noise
    check("zi grows", float(zi[-1] - zi[len(zi) // 4]), 1., 1e9)
    # encroachment: zi ~ sqrt(zi0^2 + 2*F0*t/gamma); drycblles surface flux
    # sbot[th]=0.1 Km/s, lapse 0.003 K/m (drycblles_input.py)
    f0, gamma = 0.1, 0.003
    zi_pred = np.sqrt(zi[1] ** 2 + 2. * f0 * (t[-1] - t[1]) / gamma)
    rt = 0.45 if args.quick else 0.30
    check("zi vs encroachment", float(zi[-1]),
          (1 - rt) * zi_pred, (1 + rt) * zi_pred)


def validate_bomex(args):
    itot = 32 if args.quick else 64
    ktot = 32 if args.quick else 48
    endtime = 3600. if args.quick else 7200.
    f = run_case("bomex",
                 {"itot": itot, "jtot": itot, "ktot": ktot,
                  "endtime": "%g" % endtime, "savetime": "%g" % endtime,
                  "sampletime": "60."},
                 args.workdir, args.precision)
    thermo = f.groups["thermo"]
    z = np.asarray(f.variables["z"][:])
    navg = max(1, int(endtime / 60. / 4))      # final quarter of samples
    cover = np.asarray(thermo.variables["ql_cover"][:])[-navg:].mean()
    ql = _prof(thermo, "ql", navg)
    f.close()

    cloudy = np.where(ql > 1e-7)[0]
    base = z[cloudy[0]] if cloudy.size else np.nan
    top = z[cloudy[-1]] if cloudy.size else np.nan
    print("bomex: cover=%.3f base=%.0f m top=%.0f m" % (cover, base, top))
    if args.quick:
        check("cloud cover", float(cover), 0.01, 0.45)
        check("cloud base [m]", float(base), 200., 1000.)
    else:
        # GCSS envelope 8-20% plus coarse-grid headroom
        check("cloud cover", float(cover), 0.04, 0.30)
        check("cloud base [m]", float(base), 300., 800.)
        check("cloud top [m]", float(top), 1200., 2200.)


def validate_gabls1(args):
    itot = 32 if args.quick else 64
    endtime = 3600. if args.quick else 32400.
    f = run_case("gabls1",
                 {"itot": itot, "jtot": itot, "ktot": itot,
                  "endtime": "%g" % endtime, "savetime": "%g" % endtime,
                  "sampletime": "600."},
                 args.workdir, args.precision)
    grp = f.groups["default"]
    z = np.asarray(f.variables["z"][:])
    u = _prof(grp, "u")
    v = _prof(grp, "v")
    th = _prof(grp, "th")
    f.close()

    ug = 8.0                       # GABLS1 geostrophic wind
    wind = np.hypot(u, v)
    jet = float(wind.max())
    zjet = float(z[int(np.argmax(wind))])
    print("gabls1: jet=%.2f m/s at %.0f m; th(sfc air)=%.2f K"
          % (jet, zjet, th[0]))
    # stability holds at any horizon: cooled surface air + positive lapse
    check("surface-air cooling [K]", float(265. - th[0]), 0.05, 6.)
    check("stable stratification", float(np.mean(np.diff(th[:len(th) // 2])
                                                 > -1e-3)), 0.75, 1.)
    if endtime >= 7 * 3600.:
        # Beare et al. (2006) envelope: supergeostrophic jet near the
        # BL top (130-180 m at 3.1 m resolution, lower when coarser)
        check("LLJ supergeostrophic ratio", jet / ug, 1.02, 1.25)
        check("LLJ height [m]", zjet, 60., 250.)


def validate_rcemip(args):
    """RCEMIP protocol column through the FULL RRTMGP spectral path: the
    in-repo reduced k-distribution files (written by rcemip_input.py)
    must drive the per-g-point gas+cloud optics end to end with sane
    radiative fluxes (round-4 item 6)."""
    itot = 8
    ktot = 48 if args.quick else 144
    endtime = 600.                  # iotimeprec=2: multiples of 100 s
    f = run_case("rcemip",
                 {"itot": itot, "jtot": itot, "ktot": ktot,
                  "endtime": "%g" % endtime, "savetime": "%g" % endtime,
                  "sampletime": "300."},
                 args.workdir, args.precision)
    # the spectral path must actually be active (coefficient files landed)
    wd = os.path.join(args.workdir, "rcemip")
    for name in ("coefficients_lw.nc", "coefficients_sw.nc",
                 "cloud_coefficients_lw.nc", "cloud_coefficients_sw.nc"):
        assert os.path.exists(os.path.join(wd, name)), name
    rad = f.groups["radiation"]
    lw_up = _prof(rad, "lw_flux_up")
    lw_dn = _prof(rad, "lw_flux_dn")
    sw_dn = _prof(rad, "sw_flux_dn")
    toa = float(np.asarray(rad.variables["sw_flux_dn_toa"][:])[-1])
    f.close()
    olr = float(lw_up[-1])
    print("rcemip(spectral): OLR=%.0f W/m2, LW_dn(sfc)=%.0f, SW_dn(sfc)=%.0f,"
          " TOA SW=%.0f" % (olr, lw_dn[0], sw_dn[0], toa))
    # The RCEMIP protocol (Wing et al. 2018) fixes the insolation at
    # S0=551.58 W/m2, sza=42.05 deg -> 409.6 W/m2 (the case ini carries
    # tsi_scaling=0.40532, identical to the reference's rcemip.ini), so
    # the surface envelope is relative to the RECORDED TOA flux, not TSI.
    mu0 = np.cos(0.7339109504636155)
    check("OLR [W m-2]", olr, 120., 360.)
    check("surface LW down [W m-2]", float(lw_dn[0]), 200., 480.)
    check("TOA insolation matches protocol [W m-2]", toa,
          0.4053176301654965 * 1361 * mu0 * 0.98,
          0.4053176301654965 * 1368 * mu0 * 1.02)
    check("surface SW down [W m-2]", float(sw_dn[0]), 0.25 * toa, toa)
    check("LW up decreases with height (cooling to space)",
          float(lw_up[0] - olr), -40., 400.)

    # ---- cloudy spectral column (round-5 item 7): seed a saturated layer
    # so the LUT cloud optics fire, and assert the cloud radiative effect
    # signs/magnitudes (cloudy vs clear=True fluxes; reference analog:
    # radiation_rrtmgp.cxx cloud optics in exec_longwave/shortwave +
    # swclearskystats).
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    m = Model(Ini(os.path.join(wd, "rcemip.ini")), "run", "rcemip",
              workdir=wd, dtype=(np.float64 if args.precision == "double"
                                 else np.float32))
    m.finish_setup()
    st = m.fields.create(m.input_nc, dtype=m.dtype)
    g = m.grid
    ks, ke = g.kstart, g.kend
    zc = np.asarray(g.z)
    cloud_lay = (zc > 1000.) & (zc < 2500.)
    # push qt well past saturation in the layer -> ql > 0 through
    # sat_adjust; the LUT path sees a real liquid water path
    st["qt"][cloud_lay] += 0.004
    s, _t, _sfc = m.as_device_state(st)
    ql = np.asarray(m.thermo.get_ql(m.ctx, s))
    assert ql.max() > 1e-5, "seeded layer failed to condense"
    rad = m.radiation
    rad._latlon = (rad.lat, rad.lon)
    cloudy = {k: np.asarray(v) for k, v in rad.flux_profiles(
        m.ctx, s, 0., m.thermo).items()}
    clearf = {k.replace("_clear", ""): np.asarray(v)
              for k, v in rad.flux_profiles(
                  m.ctx, s, 0., m.thermo, clear=True).items()}
    sw_cre_sfc = float(clearf["sw_flux_dn"][0] - cloudy["sw_flux_dn"][0])
    lw_cre_toa = float(clearf["lw_flux_up"][-1] - cloudy["lw_flux_up"][-1])
    lw_cre_sfc = float(cloudy["lw_flux_dn"][0] - clearf["lw_flux_dn"][0])
    print("rcemip cloudy column: SW CRE(sfc)=%.0f W/m2, LW CRE(TOA)=%.0f,"
          " LW CRE(sfc)=%.0f" % (sw_cre_sfc, lw_cre_toa, lw_cre_sfc))
    check("SW cloud shading at surface [W m-2]", sw_cre_sfc, 3., 450.)
    check("LW OLR reduction by cloud [W m-2]", lw_cre_toa, 1., 200.)
    check("LW surface warming by cloud [W m-2]", lw_cre_sfc, 1., 250.)


def validate_sbl_dnn(args):
    """Stably-stratified Ekman layer with the DNN SGS closure end to end
    (round-5 item 8): TorchScript weights go through the full
    export -> from_torchscript round trip, then drive the complete
    destagger/filter/normalize/infer/divergence pipeline
    (ops/diff_dnn.py) inside a real case run.  Weights are seeded-random
    at the reference's scale (no trained nets ship — the reference's
    inis point at absent .pt files too, SBL_DNNlocalScales/SBL1800.ini);
    the envelopes assert SBL physics the resolved dynamics must keep:
    stability, Ekman turning, bounded closure tendencies."""
    import numpy as np
    import torch

    from microhh_tpu.models import dnn as dnn_mod

    # --- export a CNDNN-style TorchScript module (e2cnn 'filter' buffer
    # layout, like the reference's analysis/util.py exports)
    rng = np.random.RandomState(7)
    dims = [108, 64, 64, 64, 64, 6]
    filts = []
    for i in range(len(dims) - 1):
        scale = np.sqrt(2. / dims[i]) * 0.1
        kh = 3 if i == 0 else 1
        cin = 12 if i == 0 else dims[i]
        filts.append((rng.randn(dims[i + 1], cin, kh, kh)
                      * scale).astype(np.float32))
    cb = np.asarray(dnn_mod.PINV, dtype=np.float32)

    class CNDNNExport(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for i, f in enumerate(filts):
                self.register_buffer("c%d_filter" % i, torch.from_numpy(f))
            self.register_buffer("change_basis", torch.from_numpy(cb))

        def forward(self, x):
            # unrolled (TorchScript cannot close over the filts list)
            h = torch.relu(torch.nn.functional.conv2d(x, self.c0_filter))
            h = torch.relu(torch.nn.functional.conv2d(h, self.c1_filter))
            h = torch.relu(torch.nn.functional.conv2d(h, self.c2_filter))
            h = torch.relu(torch.nn.functional.conv2d(h, self.c3_filter))
            h = torch.nn.functional.conv2d(h, self.c4_filter)
            h = h.squeeze(-1).squeeze(-1)
            return h @ self.change_basis.t()

    os.makedirs(args.workdir, exist_ok=True)
    pt_path = os.path.join(args.workdir, "sbl_dnn_weights.pt")
    torch.jit.script(CNDNNExport().eval()).save(pt_path)

    itot = 16 if args.quick else 32
    ktot = 32 if args.quick else 64
    endtime = 100. if args.quick else 400.
    run_case("SBL_DNN",
             {"itot": itot, "jtot": itot, "ktot": ktot,
              "endtime": "%g" % endtime, "savetime": "%g" % endtime,
              "sampletime": "%g" % (endtime / 2),
              "dnnpath": pt_path, "swdnnrandom": "0"},
             args.workdir, args.precision, ininame="SBL")

    # final state from the restart files (robust to stats whitelists)
    from microhh_tpu.config import Ini
    from microhh_tpu.model import Model
    wd = os.path.join(args.workdir, "SBL_DNN")
    ini = Ini(os.path.join(wd, "SBL.ini"))
    m = Model(ini, "run", "SBL", workdir=wd)
    m.finish_setup()
    m.timeloop.istarttime = int(endtime * 1e9)
    m.timeloop.itime = m.timeloop.istarttime
    st = m.fields.load(int(endtime * 10), wd, dtype=m.dtype)  # iotimeprec=-1
    g = m.grid
    ks, ke = g.kstart, g.kend
    u = np.asarray(st["u"])[ks:ke].mean(axis=(1, 2))
    v = np.asarray(st["v"])[ks:ke].mean(axis=(1, 2))
    b = np.asarray(st["b"])[ks:ke].mean(axis=(1, 2))
    for n in ("u", "v", "w", "b"):
        assert np.isfinite(np.asarray(st[n])).all(), n
    ug = 0.05
    print("SBL_DNN: u(sfc)=%.4f v(sfc)=%.5f ug=%.2f" % (u[0], v[0], ug))
    # stable stratification holds through the run (db/dz > 0 everywhere
    # up to sampling noise; the initial profile is linearly stable)
    check("stable stratification fraction",
          float(np.mean(np.diff(b) > -1e-9)), 0.9, 1.)
    # Ekman turning: surface friction drives cross-isobar flow to the
    # LEFT of the geostrophic wind (v > 0 for ug > 0, fc > 0) and an
    # ageostrophic deficit near the wall
    check("Ekman cross-isobar v (near sfc) [m/s]",
          float(v[:ktot // 8].mean()), 1e-6, 0.05)
    check("near-wall u deficit [m/s]", float(ug - u[0]), 1e-5, 0.05)
    # the DNN closure's tendencies stayed bounded: winds within physical
    # range of the geostrophic forcing
    check("max |u|/ug", float(np.abs(u).max() / ug), 0.2, 2.0)


# ---------------------------------------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="drycblles,bomex,gabls1,rcemip,sbl_dnn")
    ap.add_argument("--quick", action="store_true",
                    help="smoke scale: small grids, short horizons")
    ap.add_argument("--workdir", default="/tmp/mh_validation")
    ap.add_argument("--precision", default="single")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    fns = {"drycblles": validate_drycblles,
           "bomex": validate_bomex,
           "gabls1": validate_gabls1,
           "rcemip": validate_rcemip,
           "sbl_dnn": validate_sbl_dnn}
    for case in args.cases.split(","):
        print("\n=== %s ===" % case, flush=True)
        fns[case](args)

    if FAILURES:
        print("\nVALIDATION FAILED: %s" % ", ".join(FAILURES))
        return 1
    print("\nVALIDATION PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
