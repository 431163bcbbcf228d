"""Monin-Obukhov similarity functions, vectorized (reference
``include/monin_obukhov.h``: Wilson 2001 unstable / IFS stable forms).

All functions are pure jnp elementwise ops so they run on the VPU over whole
(jtot, itot) surface planes at once — the reference's per-point scalar code
becomes a handful of fused vector ops.

The Obukhov-length solve uses the reference's z/L lookup table
(``include/boundary_surface_kernels.h:84-133`` ``prepare_lut``) but replaces
the per-point linear search with a single vectorized ``searchsorted`` — a
branch-free O(log n) solve per surface point with bit-identical interpolation.
"""

import numpy as np
import jax.numpy as jnp

from .. import constants as cst

NZL_LUT = 10000


# --- gradient functions ----------------------------------------------------

def phim_unstable(zeta):
    return (1. + 3.6 * jnp.abs(zeta) ** (2. / 3.)) ** -0.5


def phim_stable(zeta):
    return 1. + 5. * zeta


def phim(zeta):
    return jnp.where(zeta <= 0., phim_unstable(zeta), phim_stable(zeta))


def phih_unstable(zeta):
    return (1. + 7.9 * jnp.abs(zeta) ** (2. / 3.)) ** -0.5


def phih_stable(zeta):
    return (1. + 4. * zeta) ** 2


def phih(zeta):
    return jnp.where(zeta <= 0., phih_unstable(zeta), phih_stable(zeta))


# --- integrated functions --------------------------------------------------

def psim_unstable(zeta):
    return 3. * jnp.log((1. + 1. / phim_unstable(zeta)) / 2.)


def psim_stable(zeta):
    a, b, c, d = 1., 2. / 3., 5., 0.35
    zeta = jnp.maximum(zeta, 0.)  # guard: only evaluated for zeta > 0
    return -b * (zeta - c / d) * jnp.exp(-d * zeta) - a * zeta - (b * c) / d


def psih_unstable(zeta):
    return 3. * jnp.log((1. + 1. / phih_unstable(zeta)) / 2.)


def psih_stable(zeta):
    a, b, c, d = 1., 2. / 3., 5., 0.35
    zeta = jnp.maximum(zeta, 0.)  # guard: only evaluated for zeta > 0
    return (-b * (zeta - c / d) * jnp.exp(-d * zeta)
            - (1. + b * a * zeta) ** 1.5 - (b * c) / d + 1.)


def fm(zsl, z0m, L):
    """kappa / (log(zsl/z0m) - psim(zsl/L) + psim(z0m/L))."""
    # Evaluate both branches; where() picks (both are finite everywhere).
    unstable = cst.kappa / (jnp.log(zsl / z0m) - psim_unstable(zsl / L) + psim_unstable(z0m / L))
    stable = cst.kappa / (jnp.log(zsl / z0m) - psim_stable(zsl / L) + psim_stable(z0m / L))
    return jnp.where(L <= 0., unstable, stable)


def fh(zsl, z0h, L):
    unstable = cst.kappa / (jnp.log(zsl / z0h) - psih_unstable(zsl / L) + psih_unstable(z0h / L))
    stable = cst.kappa / (jnp.log(zsl / z0h) - psih_stable(zsl / L) + psih_stable(z0h / L))
    return jnp.where(L <= 0., unstable, stable)


# --- numpy versions for LUT construction -----------------------------------

def _np_psim(zeta):
    unst = 3. * np.log((1. + (1. + 3.6 * np.abs(zeta) ** (2. / 3.)) ** 0.5) / 2.)
    a, b, c, d = 1., 2. / 3., 5., 0.35
    zs = np.maximum(zeta, 0.)  # stable branch only evaluated for zeta > 0
    st = -b * (zs - c / d) * np.exp(-d * zs) - a * zs - (b * c) / d
    return np.where(zeta <= 0., unst, st)


def _np_psih(zeta):
    unst = 3. * np.log((1. + (1. + 7.9 * np.abs(zeta) ** (2. / 3.)) ** 0.5) / 2.)
    a, b, c, d = 1., 2. / 3., 5., 0.35
    zs = np.maximum(zeta, 0.)
    st = -b * (zs - c / d) * np.exp(-d * zs) - (1. + b * a * zs) ** 1.5 - (b * c) / d + 1.
    return np.where(zeta <= 0., unst, st)


def _np_fm(zsl, z0m, L):
    return cst.kappa / (np.log(zsl / z0m) - _np_psim(zsl / L) + _np_psim(z0m / L))


def _np_fh(zsl, z0h, L):
    return cst.kappa / (np.log(zsl / z0h) - _np_psih(zsl / L) + _np_psih(z0h / L))


def prepare_lut(z0m, z0h, zsl, mbcbot_dirichlet, thermobc_flux):
    """Build the (zL_sl, f_sl) lookup table exactly like the reference
    (boundary_surface_kernels.h:84-133): 9/10 of the points linear in
    [-zL_max, 5], last 1/10 geometrically stretched to -zL_min."""
    n = NZL_LUT
    zL_tmp = np.zeros(n)
    zLrange_min = -5.

    dzL = (cst.zL_max - zLrange_min) / (9. * n / 10. - 1.)
    zL_tmp[0] = -cst.zL_max
    for i in range(1, 9 * n // 10):
        zL_tmp[i] = zL_tmp[i - 1] + dzL

    zLend = -(cst.zL_min - zLrange_min)
    r, r0 = 1.01, cst.dhuge
    while abs((r - r0) / r0) > 1.e-10:
        r0 = r
        r = (1. - (zLend / dzL) * (1. - r)) ** (1. / (n / 10.))
    for i in range(9 * n // 10, n):
        zL_tmp[i] = zL_tmp[i - 1] + dzL
        dzL *= r

    zL_sl = -zL_tmp[::-1].copy()

    L = zsl / zL_sl
    if mbcbot_dirichlet and thermobc_flux:
        f_sl = zL_sl * _np_fm(zsl, z0m, L) ** 3
    elif mbcbot_dirichlet and not thermobc_flux:
        f_sl = zL_sl * _np_fm(zsl, z0m, L) ** 2 / _np_fh(zsl, z0h, L)
    else:
        raise ValueError("unsupported LUT combination")

    # f_sl is non-monotonic for very stable zL (f -> 0 as zL -> zL_max); the
    # reference's linear search walks to the table end there, returning
    # zL_max.  Make f_sl non-decreasing (running max) so the vectorized
    # searchsorted reproduces that clamping behavior.
    f_sl = np.maximum.accumulate(f_sl)

    # float32 like the reference (it stores the LUT in float).
    return zL_sl.astype(np.float32), f_sl.astype(np.float32)


def lookup_zL(zL_sl, f_sl, Ri):
    """Vectorized find_zL (boundary_surface_kernels.h:246-260): f_sl is
    monotonically increasing; searchsorted + linear interpolation."""
    Ri = Ri.astype(jnp.float32)
    n = jnp.searchsorted(f_sl, Ri)
    n = jnp.clip(n, 0, NZL_LUT - 1)
    nm = jnp.maximum(n - 1, 0)
    interp = zL_sl[nm] + (Ri - f_sl[nm]) / (f_sl[n] - f_sl[nm] + 1e-30) * (zL_sl[n] - zL_sl[nm])
    edge = (n == 0) | (n == NZL_LUT - 1)
    return jnp.where(edge, zL_sl[n], interp)


# --- direct Newton solvers (TPU-fast path) ---------------------------------
#
# The reference's per-point warm-started linear LUT search maps to gathers on
# TPU, which are slow; these fixed-iteration vectorized Newton solvers invert
# the same monotone relations (boundary_surface_kernels.h
# calc_obuk_noslip_*_iterative) with elementwise VPU math only.  Warm-started
# from the previous step's Obukhov length, 8 iterations reach float32
# roundoff.

_ZL_EPS = 1e-8


def _seed_zL(zL0, Ri):
    """Previous-step z/L if the stability regime matches, else a small seed
    of the correct sign (the reference resets L on regime change too)."""
    same_sign = jnp.sign(zL0) == jnp.sign(Ri)
    seed = jnp.sign(Ri) * 0.05
    zL = jnp.where(same_sign, zL0, seed)
    mag = jnp.clip(jnp.abs(zL), _ZL_EPS, -cst.zL_min)
    return jnp.sign(zL) * mag


def _stable_peak(fn):
    """Peak of the stable branch of fn(zL): beyond it the relation is not
    invertible (computed in numpy at trace time; zsl/z0 are static)."""
    zg = np.linspace(1e-3, cst.zL_max, 4000)
    fv = fn(zg)
    ipk = int(np.argmax(fv))
    return float(zg[ipk]), float(fv[ipk])


def _stable_peak_plane(zsl, z0m):
    """Pointwise stable-branch peak of zL*fm^3 for a heterogeneous 2-D z0m
    plane (jnp evaluation on a fixed zL grid at trace time)."""
    zg = jnp.linspace(1e-3, cst.zL_max, 128)[:, None, None]
    fv = zg * fm(zsl, z0m[None], zsl / zg) ** 3
    ipk = jnp.argmax(fv, axis=0)
    zL_pk = jnp.squeeze(zg, (1, 2))[ipk]
    f_pk = jnp.max(fv, axis=0)
    return zL_pk, f_pk


def solve_zL_flux(Ri, zL0, zsl, z0m, niter=8):
    """Solve zL * fm(zL)^3 = Ri (flux thermal BC).  Beyond the stable-branch
    peak the relation has no root; clamp to zL_max like the reference's LUT
    walk-to-end behavior (find_zL returning the last table entry)."""
    if getattr(z0m, "ndim", 0) == 2:
        zL_pk, f_pk = _stable_peak_plane(zsl, z0m)
    else:
        zL_pk, f_pk = _stable_peak(lambda z: z * _np_fm(zsl, z0m, zsl / z) ** 3)
    no_solution = Ri >= f_pk
    Ri = jnp.where(no_solution, 0.5 * f_pk, Ri)
    Ri = jnp.where(jnp.abs(Ri) < 1e-12, jnp.sign(Ri) * 1e-12 + (Ri == 0.) * 1e-12, Ri)
    zL = _seed_zL(zL0, Ri)
    zL = jnp.minimum(zL, zL_pk)

    def f(zL_):
        return zL_ * fm(zsl, z0m, zsl / zL_) ** 3 - Ri

    for _ in range(niter):
        h = 0.001 * jnp.abs(zL) + 1e-10
        fp = (f(zL + h) - f(zL - h)) / (2. * h)
        step = f(zL) / jnp.where(jnp.abs(fp) < 1e-30, 1e-30, fp)
        zL_new = zL - step
        # keep the iterate on the correct branch
        zL_new = jnp.where(jnp.sign(zL_new) == jnp.sign(Ri), zL_new,
                           0.5 * zL)
        zL = jnp.clip(zL_new, cst.zL_min, zL_pk)
        zL = jnp.sign(zL) * jnp.clip(jnp.abs(zL), _ZL_EPS, -cst.zL_min)
    return jnp.where(no_solution, cst.zL_max, zL)


def solve_zL_dirichlet(Ri, zL0, zsl, z0m, z0h, niter=8):
    """Solve zL * fm(zL)^2 / fh(zL) = Ri (Dirichlet thermal BC).  For
    Ri > 0.13 the system has no solution; clamp to zL_max like the
    reference (L_min_stable)."""
    no_solution = Ri > 0.13
    Ri_c = jnp.where(no_solution, 0.12, Ri)
    Ri_c = jnp.where(jnp.abs(Ri_c) < 1e-12, 1e-12, Ri_c)
    zL = _seed_zL(zL0, Ri_c)

    def f(zL_):
        L = zsl / zL_
        return zL_ * fm(zsl, z0m, L) ** 2 / fh(zsl, z0h, L) - Ri_c

    for _ in range(niter):
        h = 0.001 * jnp.abs(zL) + 1e-10
        fp = (f(zL + h) - f(zL - h)) / (2. * h)
        step = f(zL) / jnp.where(jnp.abs(fp) < 1e-30, 1e-30, fp)
        zL_new = zL - step
        zL_new = jnp.where(jnp.sign(zL_new) == jnp.sign(Ri_c), zL_new, 0.5 * zL)
        zL = jnp.clip(zL_new, cst.zL_min, cst.zL_max)
        zL = jnp.sign(zL) * jnp.clip(jnp.abs(zL), _ZL_EPS, -cst.zL_min)
    return jnp.where(no_solution, cst.zL_max, zL)
