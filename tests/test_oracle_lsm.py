"""LSM / soil kernels vs the scalar transliteration oracle
(tests/oracle_ref/lsm_ref.py): SEB tile fluxes, interception reservoir,
van Genuchten hydraulics with clipping, IFS thermal properties, root
water extraction, and infiltration — pinned at 1e-13 on random inputs
covering every branch (dew / no-dew, stable / unstable, reservoir limits,
clip floors/ceilings)."""

import numpy as np
import jax.numpy as jnp

from microhh_tpu.ops import boundary_surface_lsm as lsm
from tests.oracle_ref import lsm_ref as ref

N = 256          # points; enough to hit all branches


def _rng(seed):
    return np.random.default_rng(seed)


def test_seb_fluxes_matches_reference():
    rng = _rng(3)
    T_a = 270. + 30. * rng.random(N)
    qt1 = 0.002 + 0.015 * rng.random(N)
    T_b = T_a + rng.normal(0., 4., N)
    T_soil = 275. + 15. * rng.random(N)
    qsat_bot = 0.002 + 0.02 * rng.random(N)        # both dew and no-dew
    dqs = 1e-4 + 1e-3 * rng.random(N)
    ra = 20. + 150. * rng.random(N)
    rs = 100. * rng.random(N)
    lam = 3. + 7. * rng.random(N)
    cs = np.where(rng.random(N) < 0.5, 0., 2e4 * rng.random(N))
    sw_dn = 800. * rng.random(N)
    sw_up = 0.2 * sw_dn
    lw_dn = 250. + 150. * rng.random(N)
    lw_up = 300. + 200. * rng.random(N)
    rhoh, emis, dt = 1.15, 0.97, 5.

    rs_lim = jnp.where(jnp.asarray(qsat_bot) < jnp.asarray(qt1), 0.,
                       jnp.asarray(rs))
    got = lsm.seb_fluxes(*(jnp.asarray(a) for a in
                           (T_a, qt1, T_b, T_soil, qsat_bot, dqs, ra)),
                         rs_lim, jnp.asarray(lam), jnp.asarray(cs),
                         *(jnp.asarray(a) for a in (sw_dn, sw_up, lw_dn, lw_up)),
                         rhoh, emis, dt)
    H, LE, G, S, T_new, _ = (np.asarray(a) for a in got)
    qt_bot = np.asarray(qt1 + np.asarray(got[1]) * ra / (rhoh * ref.LV))

    assert (qsat_bot < qt1).any() and (qsat_bot >= qt1).any()
    assert (cs == 0.).any() and (cs > 0.).any()
    for n in range(N):
        h, le, g0, s0, tn, qb = ref.seb_fluxes(
            T_a[n], qt1[n], T_b[n], T_soil[n], qsat_bot[n], dqs[n], ra[n],
            rs[n], lam[n], cs[n], sw_dn[n], sw_up[n], lw_dn[n], lw_up[n],
            rhoh, emis, dt, dew=qsat_bot[n] < qt1[n])
        for a, b in ((H[n], h), (LE[n], le), (G[n], g0), (S[n], s0),
                     (T_new[n], tn), (qt_bot[n], qb)):
            assert abs(a - b) <= 1e-13 * max(abs(b), 1.), (n, a, b)


def test_liquid_water_reservoir_matches_reference():
    rng = _rng(5)
    wl = ref.WLMAX * 3. * rng.random(N)            # some beyond wlm: limiter
    wl_t0 = rng.normal(0., 1e-7, N)
    c_veg = rng.random(N)
    lai = 0.5 + 4. * rng.random(N)
    LE = {t: rng.normal(0., 200., N) for t in ("veg", "soil", "wet")}
    rain = np.where(rng.random(N) < 0.5, 0., 2e-3 * rng.random(N))
    subdt = 5.

    f_veg = np.zeros(N)
    f_soil = np.zeros(N)
    f_wet = np.zeros(N)
    for n in range(N):
        f_veg[n], f_soil[n], f_wet[n] = ref.tile_fractions(
            wl[n], c_veg[n], lai[n])
    frac = {"veg": jnp.asarray(f_veg), "soil": jnp.asarray(f_soil),
            "wet": jnp.asarray(f_wet)}
    LE_j = {t: jnp.asarray(v) for t, v in LE.items()}
    wl_lim, thr, intc = lsm.liquid_water_reservoir(
        jnp.asarray(wl), jnp.asarray(wl_t0), frac, LE_j, jnp.asarray(rain),
        jnp.asarray(c_veg), jnp.asarray(lai), subdt)
    wl_out = np.asarray(wl_t0 + np.asarray(wl_lim))
    thr = np.asarray(thr)
    intc = np.asarray(intc)

    hit_lim = 0
    for n in range(N):
        wo, ic, tf = ref.liquid_water_reservoir(
            wl_t0[n], wl[n], LE["veg"][n], LE["soil"][n], LE["wet"][n],
            f_veg[n], f_soil[n], f_wet[n], rain[n], c_veg[n], lai[n], subdt)
        assert abs(wl_out[n] - wo) <= 1e-13 * max(abs(wo), 1e-12)
        assert abs(thr[n] - tf) <= 1e-13 * max(abs(tf), 1e-12)
        assert abs(intc[n] - ic) <= 1e-13 * max(abs(ic), 1e-12)
        if tf < -1e-30 or ic > 1e-30:
            hit_lim += 1
    assert hit_lim > 5


def test_soil_hydraulics_and_thermal_match_reference():
    rng = _rng(7)
    # one van Genuchten parameter set per point (vary like soil types)
    tsat = 0.3 + 0.3 * rng.random(N)
    tres = 0.01 + 0.08 * rng.random(N)
    vg_a = 0.5 + 7. * rng.random(N)
    vg_l = -2. + 4. * rng.random(N)
    vg_n = 1.1 + 1.5 * rng.random(N)
    vg_m = 1. - 1. / vg_n
    gam_sat = 1e-6 + 5e-6 * rng.random(N)
    theta = tres * 0.9 + (tsat - tres * 0.9) * rng.random(N)  # below res too

    # reference min/max clip bounds (calc_soil_properties :93-107)
    tn_min = (1.001 * tres - tres) / (tsat - tres)
    tn_max = (0.999 * tsat - tres) / (tsat - tres)
    kmin = np.array([ref.vg_diffusivity(vg_a[n], vg_l[n], vg_m[n],
                                        gam_sat[n], tres[n], tsat[n], tn_min[n])
                     for n in range(N)])
    kmax = np.array([ref.vg_diffusivity(vg_a[n], vg_l[n], vg_m[n],
                                        gam_sat[n], tres[n], tsat[n], tn_max[n])
                     for n in range(N)])

    th_lim = jnp.maximum(jnp.asarray(theta), 1.001 * jnp.asarray(tres))
    tn = (th_lim - tres) / (tsat - tres)
    kap = lsm._vg_diffusivity(*(jnp.asarray(a) for a in
                                (vg_a, vg_l, vg_m, gam_sat, tres, tsat)), tn)
    kap = np.asarray(jnp.clip(kap, jnp.asarray(kmin), jnp.asarray(kmax)))
    gam = lsm._vg_conductivity(tn, *(jnp.asarray(a) for a in
                                     (vg_l, vg_m, gam_sat)))
    gam = np.asarray(jnp.clip(gam, 0., jnp.asarray(gam_sat)))

    for n in range(N):
        k_o, g_o = ref.hydraulic_properties(
            theta[n], tsat[n], tres[n], vg_a[n], vg_l[n], vg_m[n],
            gam_sat[n], 0., gam_sat[n], kmin[n], kmax[n])
        assert abs(kap[n] - k_o) <= 1e-13 * max(abs(k_o), 1e-20), n
        assert abs(gam[n] - g_o) <= 1e-13 * max(abs(g_o), 1e-20), n

    # thermal properties (incl. the kersten log floor)
    gdry = 0.1 + 0.3 * rng.random(N)
    rhoC = 1.5e6 + 2e6 * rng.random(N)
    kapT, gamT = lsm.soil_thermal_diffusivity(
        jnp.asarray(theta), jnp.asarray(tsat), jnp.asarray(gdry),
        jnp.asarray(rhoC))
    kapT, gamT = np.asarray(kapT), np.asarray(gamT)
    for n in range(N):
        k_o, g_o = ref.thermal_properties(theta[n], tsat[n], gdry[n], rhoC[n])
        assert abs(kapT[n] - k_o) <= 1e-13 * max(abs(k_o), 1e-20)
        assert abs(gamT[n] - g_o) <= 1e-13 * max(abs(g_o), 1e-20)
    assert (theta / tsat < 0.1).any()     # kersten floor exercised


def test_root_extraction_and_infiltration_match_reference():
    rng = _rng(11)
    kts = 4
    theta = 0.1 + 0.3 * rng.random((kts, N))
    rf = rng.random((kts, N))
    rf /= rf.sum(axis=0)
    LE_veg_frac = rng.normal(0., 150., N)
    dzi = 1. / (0.05 + 0.5 * rng.random(kts))

    fac = 1. / (ref.RHO_W * ref.LV)
    tot = jnp.sum(jnp.asarray(rf) * jnp.asarray(theta), axis=0)
    theta_frac = jnp.asarray(rf) * jnp.asarray(theta) / tot
    got = np.asarray(-jnp.maximum(0., jnp.asarray(LE_veg_frac)) * fac
                     * jnp.asarray(dzi)[:, None] * theta_frac)
    for n in range(N):
        want = ref.root_water_extraction(theta[:, n], rf[:, n],
                                         LE_veg_frac[n], dzi)
        np.testing.assert_allclose(got[:, n], want, rtol=1e-13, atol=1e-30)

    # infiltration
    thr = np.where(rng.random(N) < 0.5, 0., -5e-6 * rng.random(N))
    tsat = 0.45
    th_top = 0.2 + 0.25 * rng.random(N)
    kmax, gmax, dz_top = 2e-6, 3e-6, 0.07
    i_max = jnp.minimum(0., -(kmax * (tsat - jnp.asarray(th_top))
                              / (0.5 * dz_top) + gmax))
    infil = np.asarray(jnp.minimum(0., jnp.maximum(jnp.asarray(thr), i_max)))
    runoff = np.asarray(jnp.minimum(0., jnp.asarray(thr) - infil))
    for n in range(N):
        i_o, r_o = ref.infiltration(thr[n], th_top[n], tsat, kmax, gmax,
                                    dz_top)
        assert abs(infil[n] - i_o) <= 1e-15
        assert abs(runoff[n] - r_o) <= 1e-15
