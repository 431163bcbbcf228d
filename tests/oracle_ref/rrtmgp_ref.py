"""Oracle transliteration of the rte-rrtmgp gas-optics kernels.

The reference (src/radiation_rrtmgp.cxx) drives the rte-rrtmgp-cpp
implementation of RRTMGP; that submodule is empty in the checkout, so this
oracle transliterates the canonical kernel definitions of the RRTMGP
scheme (mo_gas_optics_kernels: `interpolation`, `gas_optical_depths_major`,
`gas_optical_depths_minor`, Planck-fraction interpolation; mo_cloud_optics:
`compute_cld_from_table`) as scalar per-cell numpy, against which the
vectorized JAX implementation in microhh_tpu/ops/rrtmgp_optics.py is
checked.

All functions take the table data as plain numpy and operate on ONE
(layer) sample; loops live in the tests.
"""

import numpy as np


def interpolation_cell(kd, play, tlay, band, col_gas):
    """Temperature/pressure/eta interpolation state for one cell and one
    band's flavor.  kd: dict with temp_ref, press_ref, press_ref_trop,
    vmr_ref (T, ext, layer), key_species (bnd, layer, 2), gas_names.
    col_gas: dict name -> column amount.  Returns dict."""
    temp_ref = kd["temp_ref"]
    press_ref_log = np.log(kd["press_ref"])
    npres = len(press_ref_log)
    ntemp = len(temp_ref)
    neta = kd["n_eta"]

    tropo = play > kd["press_ref_trop"]
    itropo = 0 if tropo else 1          # 0 = lower, 1 = upper

    # temperature index (clamped input, like the JAX path; the Fortran
    # kernel extrapolates but Gas_optics rejects out-of-range input)
    t = min(max(tlay, temp_ref[0]), temp_ref[-1])
    dt = temp_ref[1] - temp_ref[0]
    loct = (t - temp_ref[0]) / dt
    jtemp = min(int(loct), ntemp - 2)
    ftemp = loct - jtemp

    logp = np.log(min(max(play, kd["press_ref"].min()),
                      kd["press_ref"].max()))
    dlp = press_ref_log[1] - press_ref_log[0]
    locp = (logp - press_ref_log[0]) / dlp
    jpress = min(max(int(locp), 0), npres - 2)
    fpress = locp - jpress

    ig1 = int(kd["key_species"][band, itropo, 0])
    ig2 = int(kd["key_species"][band, itropo, 1])
    feta, jeta, col_mix = [], [], []
    for it in range(2):
        if ig1 == 0 and ig2 == 0:
            eta, cm = 0.5, 1.0
        else:
            g1 = col_gas[kd["gas_names"][ig1 - 1]]
            if ig2 == 0:
                eta, cm = 0.5, g1
            else:
                g2 = col_gas[kd["gas_names"][ig2 - 1]]
                r = (kd["vmr_ref"][jtemp + it, ig1, itropo]
                     / kd["vmr_ref"][jtemp + it, ig2, itropo])
                cm = g1 + r * g2
                eta = g1 / cm if cm > 0. else 0.5
        loce = eta * (neta - 1)
        je = min(int(loce), neta - 2)
        feta.append(loce - je)
        jeta.append(je)
        col_mix.append(cm)
    return {"jtemp": jtemp, "ftemp": ftemp, "jpress": jpress,
            "fpress": fpress, "tropo": tropo, "itropo": itropo,
            "jeta": jeta, "feta": feta, "col_mix": col_mix}


def tau_major_cell(kd, st, g):
    """gas_optical_depths_major for one cell/g-point: trilinear kmajor
    times col_mix, upper atmosphere shifted one pressure row."""
    km = kd["kmajor"]                                   # (T, p+1, eta, gpt)
    jp0 = st["jpress"] + (0 if st["tropo"] else 1)
    acc = 0.
    for it in range(2):
        wt = (1. - st["ftemp"]) if it == 0 else st["ftemp"]
        for ip in range(2):
            wp = (1. - st["fpress"]) if ip == 0 else st["fpress"]
            for ie in range(2):
                we = (1. - st["feta"][it]) if ie == 0 else st["feta"][it]
                acc += (wt * wp * we
                        * km[st["jtemp"] + it, jp0 + ip, st["jeta"][it] + ie, g]
                        * st["col_mix"][it])
    return acc


def tau_minor_cell(kd, st, g, col_gas, col_dry, play, tlay):
    """gas_optical_depths_minor for one cell/g-point: every minor interval
    of the cell's atmosphere covering g contributes a bilinear (eta, T)
    kminor interpolation times the scaled minor-gas column."""
    atm = "lower" if st["tropo"] else "upper"
    mn = kd["minor"][atm]
    if mn is None:
        return 0.
    acc = 0.
    n_int = len(mn["gases"])
    for i in range(n_int):
        lo, hi = mn["limits"][i]                        # 1-based inclusive
        if not (lo - 1 <= g <= hi - 1):
            continue
        gas = mn["gases"][i]
        if gas not in col_gas:
            continue
        scaling = col_gas[gas]
        if mn["scales_with_density"][i]:
            scaling = scaling * (0.01 * play / tlay)    # PaTohPa * p/T
            sgas = mn["scaling_gas"][i]
            if sgas:
                vmr_fact = 1. / col_dry
                dry_fact = 1. / (1. + col_gas["h2o"] * vmr_fact)
                sg_col = col_gas.get(sgas, 0.)
                if mn["scale_by_complement"][i]:
                    scaling = scaling * (1. - sg_col * vmr_fact * dry_fact)
                else:
                    scaling = scaling * sg_col * vmr_fact * dry_fact
        contrib = mn["kminor_start"][i] - 1 + (g - (lo - 1))
        kint = 0.
        for it in range(2):
            wt = (1. - st["ftemp"]) if it == 0 else st["ftemp"]
            for ie in range(2):
                we = (1. - st["feta"][it]) if ie == 0 else st["feta"][it]
                kint += wt * we * mn["kminor"][st["jtemp"] + it,
                                               st["jeta"][it] + ie, contrib]
        acc += kint * scaling
    return acc


def planck_frac_cell(kd, st, g):
    """Planck-fraction trilinear interpolation (same weights as kmajor,
    no col_mix)."""
    pf = kd["plank_fraction"]
    jp0 = st["jpress"] + (0 if st["tropo"] else 1)
    acc = 0.
    for it in range(2):
        wt = (1. - st["ftemp"]) if it == 0 else st["ftemp"]
        for ip in range(2):
            wp = (1. - st["fpress"]) if ip == 0 else st["fpress"]
            for ie in range(2):
                we = (1. - st["feta"][it]) if ie == 0 else st["feta"][it]
                acc += (wt * wp * we
                        * pf[st["jtemp"] + it, jp0 + ip, st["jeta"][it] + ie, g])
    return acc


def rayleigh_cell(kd, st, g, col_dry):
    """Rayleigh (T, eta) bilinear times the dry column."""
    tab = kd["rayl_lower"] if st["tropo"] else kd["rayl_upper"]
    acc = 0.
    for it in range(2):
        wt = (1. - st["ftemp"]) if it == 0 else st["ftemp"]
        for ie in range(2):
            we = (1. - st["feta"][it]) if ie == 0 else st["feta"][it]
            acc += wt * we * tab[st["jtemp"] + it, st["jeta"][it] + ie, g]
    return acc * col_dry


def cloud_from_table_cell(wp, re, lwr, upr, ext, ssa, asy):
    """mo_cloud_optics compute_cld_from_table, one phase, one cell, all
    bands.  ext/ssa/asy: (nsize, nband)."""
    nsize = ext.shape[0]
    if wp <= 0.:
        nb = ext.shape[1]
        return np.zeros(nb), np.zeros(nb), np.zeros(nb)
    step = (upr - lwr) / (nsize - 1)
    j = min(int((re - lwr) / step), nsize - 2)
    f = (re - lwr) / step - j
    tau = wp * (ext[j] + f * (ext[j + 1] - ext[j]))
    taussa = tau * (ssa[j] + f * (ssa[j + 1] - ssa[j]))
    taussag = taussa * (asy[j] + f * (asy[j + 1] - asy[j]))
    return tau, taussa, taussag
