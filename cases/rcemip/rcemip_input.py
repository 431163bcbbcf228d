"""RCEMIP radiative-convective equilibrium: analytic protocol profiles.

The RCEMIP protocol (Wing et al. 2018, GMD 11, 793) specifies the whole
initial state analytically — moisture double-exponential, virtual-
temperature lapse capped at the 15 km tropopause, hydrostatic pressure,
and the analytic ozone profile — so this case needs NO external data.
Reference: ``cases/rcemip/rcemip_input.py`` upstream.  RRTMGP runs the
table-driven k-distribution when ``coefficients_{lw,sw}.nc`` (standard
rte-rrtmgp schema, see upstream ``link_coefficients.py``) sit in this
directory, and the documented two-band stand-in otherwise.
"""
import numpy as np
from microhh_tpu.utils import nc

# protocol constants for the 300 K SST member
T_0 = 300.          # SST [K]
q_0 = 0.01864       # surface specific humidity [kg/kg]
P_0 = 101480.       # surface pressure [Pa]
Z_Q1, Z_Q2 = 4.0e3, 7.5e3
Z_T = 15.e3         # tropopause height
Q_T = 1.e-14        # stratospheric specific humidity
GAMMA = 6.7e-3      # virtual-temperature lapse rate [K/m]
GRAV, RD, CP, P00 = 9.79764, 287.04, 1005., 1.e5


def protocol_profiles(z):
    """p, qv, T, thl, o3 at heights z — RCEMIP protocol eqs. (1)-(5)."""
    q = q_0 * np.exp(-z / Z_Q1) * np.exp(-(z / Z_Q2) ** 2)
    # remove the moisture jump at the tropopause (upstream "CvH hack")
    q -= q_0 * np.exp(-Z_T / Z_Q1) * np.exp(-(Z_T / Z_Q2) ** 2) + Q_T
    strat = z >= Z_T
    q[strat] = Q_T

    Tv0 = (1. + 0.608 * q_0) * T_0
    Tv = np.where(strat, Tv0 - GAMMA * Z_T, Tv0 - GAMMA * z)
    T = Tv / (1. + 0.608 * q)

    p = P_0 * (Tv / Tv0) ** (GRAV / (RD * GAMMA))
    Tv_t = Tv0 - GAMMA * Z_T
    p_t = P_0 * (Tv_t / Tv0) ** (GRAV / (RD * GAMMA))
    p[strat] = (p_t * np.exp(-GRAV * (z[strat] - Z_T) / (RD * Tv_t)))

    thl = T * (P00 / p) ** (RD / CP)
    # analytic ozone (protocol eq. 5), p in hPa -> vmr
    ph = p / 100.
    o3 = 3.6478 * ph ** 0.83209 * np.exp(-ph / 11.3515) * 1e-6
    return p, q, T, thl, o3


# official RCEMIP LES vertical grid (protocol Table 2), truncated like the
# upstream generator to match ktot=144 / zsize=32250 in rcemip.ini
Z_LES = np.array([
    20, 60, 107, 160, 220, 286, 359, 439, 525, 618, 717, 823, 936, 1055,
    1181, 1314, 1453, 1599, 1751, 1910, 2076, 2248, 2427, 2612, 2804,
    3000, 3200, 3400, 3600, 3800, 4000, 4200, 4400, 4600, 4800, 5000,
    5200, 5400, 5600, 5800, 6000, 6200, 6400, 6600, 6800, 7000, 7200,
    7400, 7600, 7800, 8000, 8200, 8400, 8600, 8800, 9000, 9200, 9400,
    9600, 9800, 10000, 10200, 10400, 10600, 10800, 11000, 11200, 11400,
    11600, 11800, 12000, 12200, 12400, 12600, 12800, 13000, 13200, 13400,
    13600, 13800, 14000, 14200, 14400, 14600, 14800, 15000, 15200, 15400,
    15600, 15800, 16000, 16200, 16400, 16600, 16800, 17000, 17200, 17400,
    17600, 17800, 18000, 18200, 18400, 18600, 18800, 19000, 19200, 19400,
    19600, 19800, 20000, 20200, 20400, 20600, 20800, 21000, 21200, 21400,
    21600, 21800, 22000, 22220, 22463, 22730, 23023, 23347, 23703, 24096,
    24527, 25000, 25500, 26000, 26500, 27000, 27500, 28000, 28500, 29000,
    29500, 30000, 30500, 31000, 31500, 32000, 32500, 33000], dtype=float)

GASES = {"co2": 348.e-6, "ch4": 1650.e-9, "n2o": 306.e-9,
         "n2": 0.7808, "o2": 0.2095,
         "cfc11": 0., "cfc12": 0., "cfc22": 0., "ccl4": 0.}


def main():
    z = Z_LES[:-2]
    _, qt, _, thl, o3 = protocol_profiles(z)

    f = nc.Dataset("rcemip_input.nc", "w")
    f.createDimension("z", z.size)
    f.createVariable("z", "f8", ("z",))[:] = z

    g = f.createGroup("init")
    g.createVariable("thl", "f8", ("z",))[:] = thl
    g.createVariable("qt", "f8", ("z",))[:] = qt
    g.createVariable("o3", "f8", ("z",))[:] = o3
    g.createVariable("h2o", "f8", ("z",))[:] = qt
    for name, vmr in GASES.items():
        g.createVariable(name, "f8", ())[:] = vmr

    # radiation background column to 70 km (500 m layers)
    dz = 500.
    z_lay = np.arange(dz / 2, 70.e3, dz)
    z_lev = np.append(np.arange(0., 70.e3 - dz / 2, dz), 70.e3)
    p_lay, h2o, T_lay, _, o3_lay = protocol_profiles(z_lay)
    p_lev, _, T_lev, _, _ = protocol_profiles(z_lev)

    r = f.createGroup("radiation")
    r.createDimension("lay", z_lay.size)
    r.createDimension("lev", z_lev.size)
    for name, dim, val in (("z_lay", "lay", z_lay), ("z_lev", "lev", z_lev),
                           ("p_lay", "lay", p_lay), ("p_lev", "lev", p_lev),
                           ("t_lay", "lay", T_lay), ("t_lev", "lev", T_lev),
                           ("o3", "lay", o3_lay), ("h2o", "lay", h2o)):
        r.createVariable(name, "f8", (dim,))[:] = val
    for name, vmr in GASES.items():
        r.createVariable(name, "f8", ())[:] = vmr
    f.close()
    print("wrote rcemip_input.nc")

    # Reduced physically-plausible k-distribution + cloud LUTs so the run
    # takes the FULL RRTMGP spectral path instead of the two-band stand-in
    # (the reference's rte-rrtmgp data files are absent from its checkout).
    import os
    import sys
    import microhh_tpu
    repo = os.path.dirname(os.path.dirname(
        os.path.abspath(microhh_tpu.__file__)))
    sys.path.insert(0, os.path.join(repo, "python"))
    import make_rrtmgp_coefficients
    make_rrtmgp_coefficients.main(".")


if __name__ == "__main__":
    main()
