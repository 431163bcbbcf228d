"""budget_4 production kernels (microhh_tpu/budget4_kernels.py, an
independent ladder-primitive composition) vs the scalar-loop
transliteration oracle (tests/oracle_ref/budget4_ref*) — pure-math f64
agreement on random fields to 1e-12.  The two implementations share
nothing but the finite-difference coefficients, so this pins every
boundary-row ladder and every deliberate reference quirk."""

import numpy as np
import jax.numpy as jnp
import pytest

from microhh_tpu import budget4_kernels as vk
from tests.oracle_ref import budget4_ref as sk
from tests.oracle_ref.budget4_ref_gen import ARGS

KGC = 3
KTOT, JTOT, ITOT = 8, 6, 8
KCELLS = KTOT + 2 * KGC
KSTART, KEND = KGC, KGC + KTOT

FIELDS3 = {"u", "v", "w", "wx", "wy", "p", "b", "wz", "uz"}
PROFS = {"umean", "vmean", "bmean", "pmean", "umodel", "vmodel", "wmodel",
         "dzi4", "dzhi4"}
SCALARS = {"dxi": 1.7, "dyi": 2.3, "visc": 0.11, "utrans": 0.4,
           "vtrans": -0.2, "dzhi4bot": 3.3, "dzhi4top": 2.9}


def _inputs(rng, args):
    arrays, profiles, scalars = {}, {}, {}
    for a in args:
        if a in FIELDS3 and a not in ("wz", "uz"):
            arrays[a] = rng.normal(size=(KCELLS, JTOT, ITOT))
        elif a in PROFS:
            profiles[a] = rng.normal(size=(KCELLS + 2,))
        elif a in SCALARS:
            scalars[a] = SCALARS[a]
    return arrays, profiles, scalars


@pytest.mark.parametrize("name", sorted(vk.__dict__)and[
    "calc_ke", "calc_tke_budget_shear", "calc_tke_budget_turb",
    "calc_tke_budget_pres", "calc_tke_budget_visc", "calc_tke_budget_diss",
    "calc_tke_budget_rdstr", "calc_tke_budget_buoy", "calc_b2_budget",
    "calc_bw_budget_shear_turb_visc",
    "calc_bw_budget_buoy_rdstr_diss_pres"])
def test_budget4_vectorized_matches_scalar(name):
    rng = np.random.default_rng(abs(hash(name)) % 2 ** 31)
    args = ARGS[name]
    arrays, profiles, scalars = _inputs(rng, args)
    if name == "calc_bw_budget_buoy_rdstr_diss_pres":
        # bz (b interpolated to half levels) is produced by the sibling
        # shear_turb_visc kernel and consumed here as an input
        arrays["bz"] = rng.normal(size=(KCELLS, JTOT, ITOT))

    # visc kernel computes wz/uz internally in both paths (outputs)
    want = sk.run_kernel(name, arrays, profiles, scalars, KSTART, KEND)

    A = {k: jnp.asarray(v) for k, v in arrays.items()}
    A.update({k: jnp.asarray(v) for k, v in profiles.items()})
    A.update(scalars)
    A["kstart"], A["kend"] = KSTART, KEND
    A["_tmpl"] = jnp.zeros((KCELLS, JTOT, ITOT))
    got = getattr(vk, name)(A)

    assert set(got) == set(want), (set(got), set(want))
    for fld in want:
        a = np.asarray(got[fld])
        b = want[fld]
        scale = max(np.abs(b).max(), 1e-30)
        err = np.abs(a - b).max() / scale
        assert err < 1e-12, (fld, err)
