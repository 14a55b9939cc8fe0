"""RRTMG-SW setcoef (rrtmg_sw_setcoef.F90:7-302), batched, mask-based.

Same interpolation machinery as the LW variant but without Planck tables;
the tropopause split is again a per-layer boolean mask.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ...constants import GRAV, AVOGAD, AMD, AMW
from .tables_sw import sw_tables

_STPFAC = 296.0 / 1013.0


class SWCoefs(NamedTuple):
    lower: jnp.ndarray
    jp: jnp.ndarray
    jt: jnp.ndarray
    jt1: jnp.ndarray
    fac00: jnp.ndarray
    fac01: jnp.ndarray
    fac10: jnp.ndarray
    fac11: jnp.ndarray
    selffac: jnp.ndarray
    selffrac: jnp.ndarray
    indself: jnp.ndarray
    forfac: jnp.ndarray
    forfrac: jnp.ndarray
    indfor: jnp.ndarray
    coldry: jnp.ndarray
    colh2o: jnp.ndarray
    colco2: jnp.ndarray
    colo3: jnp.ndarray
    colch4: jnp.ndarray
    colo2: jnp.ndarray
    colmol: jnp.ndarray
    pavel: jnp.ndarray


def setcoef_sw(pavel, tavel, pz, h2ovmr, o3vmr, co2vmr, ch4vmr, o2vmr):
    """pavel/tavel [..., nlay] (hPa, K); pz [..., nlay+1] (hPa, TOA-first).

    Gas inputs are vmr; converted to column densities here (the reference
    does this in rrtmg_sw_rad.F90 before setcoef).
    """
    dtype = pavel.dtype
    t = sw_tables()
    preflog = jnp.asarray(t["preflog"], dtype)
    tref = jnp.asarray(t["tref"], dtype)

    amm = (1.0 - h2ovmr) * AMD + h2ovmr * AMW
    dpz = jnp.abs(pz[..., 1:] - pz[..., :-1])
    coldry = dpz * 1.0e3 * AVOGAD / (1.0e2 * GRAV * amm * (1.0 + h2ovmr))

    plog = jnp.log(pavel)
    jp = jnp.clip(jnp.floor(36.0 - 5.0 * (plog + 0.04)).astype(jnp.int32),
                  1, 58)
    fp = 5.0 * (preflog[jp - 1] - plog)
    tj = (tavel - tref[jp - 1]) / 15.0
    jt = jnp.clip(jnp.floor(3.0 + tj).astype(jnp.int32), 1, 4)
    ft = tj - (jt - 3).astype(dtype)
    tj1 = (tavel - tref[jp]) / 15.0
    jt1 = jnp.clip(jnp.floor(3.0 + tj1).astype(jnp.int32), 1, 4)
    ft1 = tj1 - (jt1 - 3).astype(dtype)

    lower = plog > 4.56

    water = h2ovmr
    scalefac = pavel * _STPFAC / tavel
    forfac = scalefac / (1.0 + water)
    fac_lo = (332.0 - tavel) / 36.0
    indfor_lo = jnp.clip(jnp.floor(fac_lo).astype(jnp.int32), 1, 2)
    forfrac_lo = fac_lo - indfor_lo.astype(dtype)
    fac_up = (tavel - 188.0) / 36.0
    indfor = jnp.where(lower, indfor_lo, 3)
    forfrac = jnp.where(lower, forfrac_lo, fac_up - 1.0)

    fac_s = (tavel - 188.0) / 7.2
    indself = jnp.where(
        lower, jnp.clip(jnp.floor(fac_s).astype(jnp.int32) - 7, 1, 9), 1)
    selffrac = jnp.where(lower, fac_s - (indself + 7).astype(dtype), 0.0)
    selffac = jnp.where(lower, water * forfac, 0.0)

    colh2o = 1.0e-20 * h2ovmr * coldry
    colmol = 1.0e-20 * coldry + colh2o

    def col_floor(vmr):
        c = 1.0e-20 * vmr * coldry
        return jnp.where(c == 0.0, 1.0e-32 * coldry, c)

    compfp = 1.0 - fp
    fac10 = compfp * ft
    fac00 = compfp * (1.0 - ft)
    fac11 = fp * ft1
    fac01 = fp * (1.0 - ft1)

    return SWCoefs(
        lower=lower, jp=jp, jt=jt, jt1=jt1,
        fac00=fac00, fac01=fac01, fac10=fac10, fac11=fac11,
        selffac=selffac, selffrac=selffrac, indself=indself,
        forfac=forfac, forfrac=forfrac, indfor=indfor,
        coldry=coldry, colh2o=colh2o, colco2=col_floor(co2vmr),
        colo3=1.0e-20 * o3vmr * coldry, colch4=col_floor(ch4vmr),
        colo2=col_floor(o2vmr), colmol=colmol, pavel=pavel)
