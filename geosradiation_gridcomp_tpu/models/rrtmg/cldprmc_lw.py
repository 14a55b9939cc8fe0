"""RRTMG-LW McICA cloud optical depths (cldprmc).

Re-derivation of rrtmg_lw_cldprmc.F90:26-380: per-g-point absorption-only
cloud optical depth from in-cloud ice/liquid water paths and particle sizes.
Ice parameterizations: 0 constant, 1 Ebert-Curry 5-band, 2 Key (Streamer),
3 Fu (1998), 4 (extended table); liquid: Hu & Stamnes (1993).
Vectorized over [..., nlay, ngpt]; iceflag/liqflag are static.
"""

import jax.numpy as jnp
import numpy as np

from ...tables import load
from .tables_lw import NG_LW

# band -> 5-band index for iceflag==1 (rrlw_cld.F90:21-22)
_ICE1B = np.array([1, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5]) - 1
_NGB = np.repeat(np.arange(16), NG_LW)    # g-point -> band (0-based)


def cldprmc_lw(cldymc, ciwpmc, clwpmc, reice, reliq, iceflag=3, liqflag=1):
    """Cloud optical depth per g-point.

    cldymc: [..., ngpt, nlay] bool; ciwpmc/clwpmc same shape (g/m^2);
    reice/reliq: [..., nlay] microns.

    Returns (taucmc [..., ngpt, nlay], cloudy [..., nlay] bool).
    """
    t = load("rrtmg_lw_cld")
    dtype = ciwpmc.dtype
    re_i = reice[..., None, :]
    re_l = reliq[..., None, :]

    if iceflag == 0:
        a = jnp.asarray(t["absice0"], dtype)
        abscoice = a[0] + a[1] / jnp.maximum(re_i, 1e-6)
        abscoice = jnp.broadcast_to(abscoice, ciwpmc.shape)
    elif iceflag == 1:
        a = jnp.asarray(t["absice1"], dtype)      # (2, 5)
        band5 = _ICE1B[_NGB]                      # [ngpt]
        c1 = jnp.asarray(a[0][band5], dtype)[:, None]
        c2 = jnp.asarray(a[1][band5], dtype)[:, None]
        abscoice = c1 + c2 / jnp.maximum(re_i, 1e-6)
    else:
        tab_name = {2: "absice2", 3: "absice3", 4: "absice4"}[iceflag]
        tab = jnp.asarray(t[tab_name], dtype)     # (n, 16)
        n = tab.shape[0]
        factor = (re_i - 2.0) / 3.0
        index = jnp.clip(jnp.floor(factor).astype(jnp.int32), 1, n - 1)
        fint = factor - index.astype(dtype)
        # gather per (index, g): index [..., ngpt(broadcast), nlay]
        idx = jnp.broadcast_to(index, ciwpmc.shape)
        g_idx = jnp.asarray(_NGB)[..., :, None]
        g_idx = jnp.broadcast_to(g_idx, ciwpmc.shape)
        t_lo = tab[idx - 1, g_idx]
        t_hi = tab[idx, g_idx]
        abscoice = t_lo + fint * (t_hi - t_lo)

    tau_ice = jnp.where(cldymc & (ciwpmc > 0.0), ciwpmc * abscoice, 0.0)

    assert liqflag == 1
    tabl = jnp.asarray(t["absliq1"], dtype)       # (58, 16)
    nl = tabl.shape[0]
    factor = re_l - 1.5
    index = jnp.clip(jnp.floor(factor).astype(jnp.int32), 1, nl - 1)
    fint = factor - index.astype(dtype)
    idx = jnp.broadcast_to(index, clwpmc.shape)
    g_idx = jnp.broadcast_to(jnp.asarray(_NGB)[..., :, None], clwpmc.shape)
    t_lo = tabl[idx - 1, g_idx]
    t_hi = tabl[idx, g_idx]
    abscoliq = t_lo + fint * (t_hi - t_lo)
    tau_liq = jnp.where(cldymc & (clwpmc > 0.0), clwpmc * abscoliq, 0.0)

    taucmc = tau_ice + tau_liq
    cloudy = jnp.any(taucmc > 0.0, axis=-2)
    return taucmc, cloudy
