"""Fused Pallas kernel for the Seifert-Beheng 2-moment warm-rain scheme.

The jnp pipeline in ``microphys.Microphys2momWarm.exec`` (reference
``src/microphys_2mom_warm.cxx:89-238``) materializes dozens of full-field
intermediates: the NSED-deep unrolled sedimentation sweep, the
cumsum/cummin positivity limiter, and every masked conversion rate each
produce their own HBM arrays.  The measured cost at 384^3 was ~71 ms per
substep — dominated by HBM traffic, not by the ~10 transcendentals/cell
the scheme intrinsically needs (ARCHITECTURE.md moist table).

This kernel computes the WHOLE scheme — autoconversion, accretion,
evaporation, selfcollection/breakup, the SS08 sedimentation flux and its
downward positivity limiter — in ONE pass over the fields.  The grid
walks k DESCENDING (top -> bottom) because

* the SS08 flux at row k gathers contributions from the <= NSED rows
  ABOVE it (a drop falls through several cells per dt): a 4-slot VMEM
  ring of the per-row (a, slope, cfl) planes holds exactly those rows;
* the positivity limiter is a top-down prefix recurrence
  (ft = S + min(0, cummin(ftot - S)), see microphys.ss08_flux_tendency):
  two running planes (S, M) update sequentially as the sweep descends.

Fall speeds at row k-1 are computed one iteration EARLY (from the k-1
input blocks) so the half-weights CFL interpolation
0.25*(w[k-1] + 2 w[k] + w[k+1]) never waits on a row below; the rain
properties (mr, dr, lamr) ride a 1-slot scratch so each plane's
transcendental chain runs once.

All math mirrors microphys.py expression-for-expression (same masks,
same op order) so the kernel is bit-comparable to the jnp path; the
tests assert 1e-12 agreement in interpret mode.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as cst
from .microphys import (A_R, B_R, MR_MAX, MR_MIN, PIRHOW, QL_MIN, QR_MIN,
                        RHO_0, W_MAX, X_STAR, _sedi_pow_pair, _tanh2)
from .pallas_fused import _VMEM_LIMIT, _pallas_call
from .thermo_moist import esat_liq, qsat_liq

# per-row constant slots (built per call: p/exner follow the traced
# basestate update)
(M_RHO, M_RHODZ, M_DZ, M_DZI, M_P, M_EXN, M_LVCPE, M_SQR, M_RHON,
 M_RRHO, N_M) = range(11)


def _props(qr, nr, rho):
    """calc_rain_props on planes (mirrors microphys.calc_rain_props)."""
    mr = rho * qr / jnp.maximum(nr, 1.)
    mr = jnp.clip(mr, MR_MIN, MR_MAX)
    dr = (mr / PIRHOW) ** (1. / 3.)
    mur = 10. * (1. + _tanh2(1200. * (dr - 0.0015)))
    lamr = ((mur + 3.) * (mur + 2.) * (mur + 1.)) ** (1. / 3.) / dr
    return mr, dr, mur, lamr


def _fall_speeds(qr, nr, rho, rho_n):
    """(w_qr, w_nr, mr, dr, lamr) for one row (microphys._sedimentation)."""
    mr, dr, mur, lamr = _props(qr, nr, rho)
    has_qr = qr > QR_MIN
    p4, p1 = _sedi_pow_pair(mur, lamr)
    w_qr = jnp.where(has_qr, jnp.clip(rho_n * A_R - B_R * p4, 0.1, W_MAX), 0.)
    w_nr = jnp.where(has_qr, jnp.clip(rho_n * A_R - B_R * p1, 0.1, W_MAX), 0.)
    return w_qr, w_nr, mr, dr, lamr


def _minmod(x, y):
    return jnp.sign(x) * jnp.maximum(
        0., jnp.minimum(jnp.abs(x), jnp.sign(x) * y))


def _micro2_body(kt, nsed, Nc0, cc_ref, dt_ref,
                 qr_m, qr_c, qr_p, nr_m, nr_c, nr_p, qt_c, thl_c, ql_c,
                 tqr, tnr, tqt, tthl,
                 oqr, onr, oqt, othl, orr,
                 prop_ref, wring_ref, a_ref, sl_ref, c_ref, lim_ref):
    g = pl.program_id(0)
    k = kt - 1 - g                       # output row (descending)
    dt = dt_ref[0]

    def cc(row, slot):
        return cc_ref[row, slot]

    rho = cc(k, M_RHO)
    dzi = cc(k, M_DZI)
    p = cc(k, M_P)
    exn = cc(k, M_EXN)
    lv_cpe = cc(k, M_LVCPE)
    rho_n_m = cc(jnp.maximum(k - 1, 0), M_RHON)

    qr = qr_c[0]
    nr = nr_c[0]
    qt = qt_c[0]
    thl = thl_c[0]
    ql = ql_c[0]

    # ---- bootstrap: row kt-1's props/fall speeds + the w(kt) = 0 top BC
    @pl.when(g == 0)
    def _boot():
        w_qr0, w_nr0, mr0, dr0, lamr0 = _fall_speeds(
            qr, nr, rho, cc(k, M_RHON))
        prop_ref[0] = mr0
        prop_ref[1] = dr0
        prop_ref[2] = lamr0
        top = jax.lax.rem(jnp.int32(k + 1), jnp.int32(2))
        wring_ref[0, top] = jnp.zeros_like(qr)
        wring_ref[1, top] = jnp.zeros_like(qr)
        cur = jax.lax.rem(jnp.int32(k), jnp.int32(2))
        wring_ref[0, cur] = w_qr0
        wring_ref[1, cur] = w_nr0
        # limiter state: S = 0, M = +inf, flux_above = 0
        for s in range(2):
            lim_ref[s, 0] = jnp.zeros_like(qr)
            lim_ref[s, 1] = jnp.full_like(qr, jnp.inf)
            lim_ref[s, 2] = jnp.zeros_like(qr)

    # ---- row k's rain properties (written by the previous iteration) ----
    mr_c = prop_ref[0]
    dr_c = prop_ref[1]
    lamr_c = prop_ref[2]

    # ---- fall speed at k-1 (one iteration early; k-1 inputs are clamped
    # to row 0 at the bottom, matching ss08_cfl's wp[-1] = wp[0]) ----
    w_qr_m, w_nr_m, mr_m, dr_m, lamr_m = _fall_speeds(
        qr_m[0], nr_m[0], cc(jnp.maximum(k - 1, 0), M_RHO), rho_n_m)

    slot_c = jax.lax.rem(jnp.int32(k), jnp.int32(2))
    slot_p = jax.lax.rem(jnp.int32(k + 1), jnp.int32(2))
    cq = 0.25 * (w_qr_m + 2. * wring_ref[0, slot_c] + wring_ref[0, slot_p]) \
        * dzi * dt
    cn = 0.25 * (w_nr_m + 2. * wring_ref[1, slot_c] + wring_ref[1, slot_p]) \
        * dzi * dt
    # push w(k-1) over the dead w(k+1) slot
    wring_ref[0, slot_p] = w_qr_m
    wring_ref[1, slot_p] = w_nr_m
    prop_ref[0] = mr_m
    prop_ref[1] = dr_m
    prop_ref[2] = lamr_m

    # ================= conversion rates (microphys.exec order) ============
    qrt = jnp.zeros_like(qr)
    nrt = jnp.zeros_like(qr)
    qtt = jnp.zeros_like(qr)
    thlt = jnp.zeros_like(qr)

    # autoconversion (SB06 eq 4)
    nu_c, k_cc = 1., 9.44e9
    kccxs = k_cc / (20. * X_STAR) * (nu_c + 2.) * (nu_c + 4.) / (nu_c + 1.) ** 2
    has_ql = ql > QL_MIN
    xc = rho * ql / Nc0
    tau = 1. - ql / (ql + qr + cst.dsmall)
    phi_au = 600. * tau ** 0.68 * (1. - tau ** 0.68) ** 3
    au = RHO_0 * kccxs * ql ** 2 * xc ** 2 * (1. + phi_au / (1. - tau) ** 2)
    au = jnp.where(has_ql, au, 0.)
    qrt += au
    nrt += au * rho / X_STAR
    qtt -= au
    thlt += lv_cpe * au

    # accretion (SB06 eq 7)
    has_both = has_ql & (qr > QR_MIN)
    tau_ac = 1. - ql / jnp.maximum(ql + qr, cst.dsmall)
    phi_ac = (tau_ac / (tau_ac + 5e-5)) ** 4
    sq_rho = cc(k, M_SQR)
    ac = 5.25 * ql * qr * phi_ac * sq_rho
    ac = jnp.where(has_both, ac, 0.)
    qrt += ac
    qtt -= ac
    thlt += lv_cpe * ac

    has_qr = qr > QR_MIN

    # evaporation
    D_V, K_T = 3.e-5, 2.5e-2
    T = thl * exn + cst.Lv * ql / (cst.cp * exn)
    Glv = 1. / (cst.Rv * T / (esat_liq(T) * D_V)
                + (cst.Lv / (K_T * T)) * (cst.Lv / (cst.Rv * T) - 1.))
    S = (qt - ql) / qsat_liq(p, T) - 1.
    ev = 2. * np.pi * dr_c * Glv * S * nr / rho
    ev = jnp.where(has_qr, ev, 0.)
    qrt += ev
    nrt += 1.0 * ev * rho / mr_c
    qtt -= ev
    thlt += lv_cpe * ev

    # selfcollection & breakup (SB06 p49-50)
    k_rr, kappa_rr, D_eq = 7.12, 60.7, 0.9e-3
    sc = (-k_rr * nr * qr * rho
          / (1. + kappa_rr / lamr_c * PIRHOW ** (1. / 3.)) ** 9 * sq_rho)
    sc = jnp.where(has_qr, sc, 0.)
    dDr = dr_c - D_eq
    phi_br = jnp.where(dr_c <= D_eq, 1.0e3 * dDr,
                       2. * jnp.exp(2.3e3 * dDr) - 1.)
    br = jnp.where(has_qr & (dr_c > 0.35e-3), -(phi_br + 1.) * sc, 0.)
    nrt += sc + br

    # ================= SS08 sedimentation ================================
    # slope at row k (minmod; clamped k+-1 inputs give 0 at the edges,
    # matching the concat semantics of ss08_flux_tendency)
    sl_q = _minmod(qr - qr_m[0], qr_p[0] - qr)
    sl_n = _minmod(nr - nr_m[0], nr_p[0] - nr)

    slot0 = jax.lax.rem(jnp.int32(g), jnp.int32(nsed))
    a_ref[0, slot0] = qr
    a_ref[1, slot0] = nr
    sl_ref[0, slot0] = sl_q
    sl_ref[1, slot0] = sl_n
    c_ref[0, slot0] = cq
    c_ref[1, slot0] = cn

    def _ftot(s, dzi_at_out):
        """Limited upward-gather flux sum for species s at row k (exactly
        the unrolled loop of ss08_flux_tendency; rows above the domain
        top enter as zeros)."""
        ccm = jnp.minimum(1., c_ref[s, slot0])
        dzz = jnp.zeros_like(qr)
        ftot = jnp.zeros_like(qr)
        for m in range(nsed):
            valid = m <= g                     # row k+m exists
            row_m = jnp.minimum(k + m, kt - 1)
            slot_m = jax.lax.rem(jnp.int32(g - m + 2 * nsed), jnp.int32(nsed))
            a_m = jnp.where(valid, a_ref[s, slot_m], 0.)
            sl_m = jnp.where(valid, sl_ref[s, slot_m], 0.)
            rhodz_m = jnp.where(valid, cc(row_m, M_RHODZ), 0.)
            dz_m = jnp.where(valid, cc(row_m, M_DZ), 0.)
            active = ccm > 0.
            ftot = ftot + jnp.where(
                active, rhodz_m * (a_m + 0.5 * sl_m * (1. - ccm)) * ccm, 0.)
            dzz = dzz + jnp.where(active, dz_m, 0.)
            if dzi_at_out:
                dzi_nxt = dzi
            else:
                valid1 = m + 1 <= g
                dzi_nxt = jnp.where(
                    valid1, cc(jnp.minimum(k + m + 1, kt - 1), M_DZI), 0.)
            c_m = jnp.where(valid, c_ref[s, slot_m], 0.)
            ccm = jnp.where(active,
                            jnp.minimum(1., c_m - dzz * dzi_nxt), 0.)
        return ftot

    rrho = cc(k, M_RRHO)

    def _sed_tend(s, a_val, dzi_at_out):
        """Advance the limiter state and emit the flux-divergence tendency
        for row k (top-down closed form of the cumsum+cummin limiter)."""
        ftot = _ftot(s, dzi_at_out)
        mass = cc(k, M_RHODZ) * a_val
        S_run = lim_ref[s, 0] + mass
        M_run = jnp.minimum(lim_ref[s, 1], ftot - S_run)
        ft = S_run + jnp.minimum(0., M_run)
        flux_k = -ft / dt
        flux_above = lim_ref[s, 2]
        tend = -(flux_above - flux_k) * rrho * dzi
        lim_ref[s, 0] = S_run
        lim_ref[s, 1] = M_run
        lim_ref[s, 2] = flux_k
        return tend, flux_k

    sed_q, flux_q = _sed_tend(0, qr, False)
    # quirk: the reference nr loop advances cc with dzi at the OUTPUT row
    # (microphys_2mom_warm.cxx:508), unlike the qr loop
    sed_n, _ = _sed_tend(1, nr, True)
    qrt += sed_q
    nrt += sed_n

    # ================= outputs ===========================================
    oqr[0] = tqr[0] + qrt
    onr[0] = tnr[0] + nrt
    oqt[0] = tqt[0] + qtt
    othl[0] = tthl[0] + thlt
    # surface rain rate: the bottom row's (last iteration's) value wins
    orr[0] = -flux_q


class Micro2Fused:
    """Builder/caller for the fused 2mom_warm kernel.

    ``exec`` has the same contract as Microphys2momWarm.exec: adds the
    interior tendencies into t (aliased, in-kernel) and returns
    (t, aux with rr_bot)."""

    def __init__(self, micro, ctx, interpret=False):
        self.micro = micro
        self.ctx = ctx
        self.interpret = interpret
        self.nsed = int(np.ceil(micro.cflmax)) + 2

    def vmem_ok(self):
        """73 plane buffers (36 operand blocks double-buffered + 37 scratch
        ring/limiter planes) must fit the raised scoped-vmem cap."""
        ctx = self.ctx
        plane = ctx.jtot * ctx.itot * np.dtype(ctx.dtype).itemsize
        return plane * (36 + 8 * self.nsed + 13) <= int(0.9 * _VMEM_LIMIT)

    def _cc_table(self, pref_a, exnref_a, dtype):
        ctx = self.ctx
        ks, ke = ctx.ks, ctx.ke
        kt = ke - ks
        rho = ctx.rhoref[ks:ke].astype(dtype)
        dz = ctx.dz[ks:ke].astype(dtype)
        dzi = ctx.dzi[ks:ke].astype(dtype)
        p = pref_a[ks:ke].astype(dtype)
        exn = exnref_a[ks:ke].astype(dtype)
        cols = [None] * N_M
        cols[M_RHO] = rho
        cols[M_RHODZ] = rho * dz
        cols[M_DZ] = dz
        cols[M_DZI] = dzi
        cols[M_P] = p
        cols[M_EXN] = exn
        cols[M_LVCPE] = cst.Lv / (cst.cp * exn)
        cols[M_SQR] = jnp.sqrt(RHO_0 / rho).astype(dtype)
        cols[M_RHON] = jnp.sqrt(1.2 / rho).astype(dtype)
        cols[M_RRHO] = 1. / rho
        assert all(c is not None for c in cols)
        return jnp.stack(cols, axis=1)

    def exec(self, ctx, s, t, aux, dt):
        micro = self.micro
        ks, ke = ctx.ks, ctx.ke
        kt = ke - ks
        ql = micro.thermo.get_ql(ctx, s, aux)          # (kt, j, i)
        pref_a, exnref_a, _, _ = micro.thermo._p_profiles(ctx, aux)
        dtype = s["qr"].dtype
        cc = self._cc_table(pref_a, exnref_a, dtype)
        dt_op = jnp.asarray(dt, dtype).reshape((1,))

        arrays = (s["qr"], s["nr"], s["qt"], s["thl"], ql,
                  t["qr"], t["nr"], t["qt"], t["thl"])
        mesh = getattr(micro, "mesh", None)
        if mesh is not None:
            # The scheme is column-local (no horizontal stencil), so the
            # sharded form is a plain shard_map with no halo exchange.
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            sp = P(None, "y", "x")

            def local(qr, nr, qt, thl, ql_l, tqr, tnr, tqt, tthl,
                      cc_l, dt_l):
                return self._call(ctx, kt,
                                  (qr, nr, qt, thl, ql_l,
                                   tqr, tnr, tqt, tthl), cc_l, dt_l)

            try:
                outs = shard_map(local, mesh=mesh,
                                 in_specs=(sp,) * 9 + (P(), P()),
                                 out_specs=(sp,) * 5, check_vma=False)(
                    *arrays, cc, dt_op)
            except TypeError:  # older jax spells it check_rep
                outs = shard_map(local, mesh=mesh,
                                 in_specs=(sp,) * 9 + (P(), P()),
                                 out_specs=(sp,) * 5, check_rep=False)(
                    *arrays, cc, dt_op)
        else:
            outs = self._call(ctx, kt, arrays, cc, dt_op)
        oqr, onr, oqt, othl, orr = outs

        t = dict(t)
        t["qr"], t["nr"], t["qt"], t["thl"] = oqr, onr, oqt, othl
        aux = dict(aux)
        aux["rr_bot"] = orr[0]
        return t, aux

    def _call(self, ctx, kt, arrays, cc, dt_op):
        micro = self.micro
        ks = ctx.ks
        dtype = arrays[0].dtype
        # local (possibly per-shard) horizontal extents from the operands
        kc, jt, it = arrays[0].shape

        def rev(off, lo, hi):
            # interior row k = kt-1-g at offset off, clamped like the
            # concat edge semantics of the jnp path
            def imap(g, o=off, lo=lo, hi=hi):
                return (jnp.clip(kt - 1 - g + o, lo, hi) + ks, 0, 0)
            return pl.BlockSpec((1, jt, it), imap, memory_space=pltpu.VMEM)

        def rev_int():
            # interior-only (kt, j, i) arrays (ql)
            return pl.BlockSpec((1, jt, it), lambda g: (kt - 1 - g, 0, 0),
                                memory_space=pltpu.VMEM)

        t_spec = rev(0, 0, kt - 1)
        t_shape = jax.ShapeDtypeStruct((kc, jt, it), dtype)
        rr_spec = pl.BlockSpec((1, jt, it), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        rr_shape = jax.ShapeDtypeStruct((1, jt, it), dtype)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)

        body = functools.partial(_micro2_body, kt, self.nsed,
                                 float(micro.Nc0))
        in_specs = ([smem, smem]
                    + [rev(-1, 0, kt - 1), rev(0, 0, kt - 1), rev(1, 0, kt - 1)] * 2
                    + [rev(0, 0, kt - 1)] * 2 + [rev_int()]
                    + [t_spec] * 4)
        scratch = [
            pltpu.VMEM((3, jt, it), dtype),              # mr, dr, lamr @ k
            pltpu.VMEM((2, 2, jt, it), dtype),           # w rings (qr, nr)
            pltpu.VMEM((2, self.nsed, jt, it), dtype),   # a rings
            pltpu.VMEM((2, self.nsed, jt, it), dtype),   # slope rings
            pltpu.VMEM((2, self.nsed, jt, it), dtype),   # cfl rings
            pltpu.VMEM((2, 3, jt, it), dtype),           # S, M, flux_above
        ]
        qr_a, nr_a, qt_a, thl_a, ql_a, tqr, tnr, tqt, tthl = arrays
        return _pallas_call(
            body, grid=(kt,),
            in_specs=in_specs,
            out_specs=[t_spec] * 4 + [rr_spec],
            out_shape=[t_shape] * 4 + [rr_shape],
            scratch_shapes=scratch,
            input_output_aliases={11: 0, 12: 1, 13: 2, 14: 3},
            interpret=self.interpret,
        )(cc, dt_op,
          qr_a, qr_a, qr_a, nr_a, nr_a, nr_a,
          qt_a, thl_a, ql_a,
          tqr, tnr, tqt, tthl)
