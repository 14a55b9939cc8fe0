"""Chou-Suarez cloud optical properties (the reference's gettau module).

Vectorized re-derivations of getirtau/getvistau/getnirtau
(/root/reference/GEOS_RadiationShared/gettau.F90:33-227 and the *.code
includes): polynomial fits in hydrometeor effective radius for optical depth,
single-scattering albedo, and asymmetry, for 4 hydrometeor classes
(ice, liquid, rain, snow). All math is elementwise over [..., nlev] arrays;
the spectral band axis is vectorized rather than looped.

Table layout note: coefficient tables are loaded with Fortran index order
preserved, e.g. aib_ir has shape (3, 10) = (coef, band).
"""

import jax.numpy as jnp

from ..constants import GRAV, DIFFUSIVITY
from ..tables import load


def _poly3(c0, c1, c2, c3, r):
    """c0 + (c1 + (c2 + c3*r)*r)*r  (Chou TM eq. 6.5/6.6 form)."""
    return c0 + (c1 + (c2 + c3 * r) * r) * r


def getirtau(dp_pa, fcld, reff, cwc, dtype=jnp.float32):
    """IR cloud optical depth, layer transmittance and effective cloud cover.

    Mirrors getirtau.code: tau from Eqs. (6.4a,b)/(6.7) of the Chou TM, LW
    scattering parameterized by the similarity transform (Eqs. 6.11-6.12),
    diffuse transmittance exp(-1.66 tau), enn = fcld*(1-transmittance).

    Args:
      dp_pa: [..., nlev] layer pressure thickness (Pa)
      fcld:  [..., nlev] cloud fraction
      reff:  [..., nlev, 4] effective radii (micron): ice, liquid, rain, snow
      cwc:   [..., nlev, 4] hydrometeor mass mixing ratios (kg/kg)

    Returns:
      tcldlyr: [..., 10, nlev] layer diffuse transmittance per band
      enn:     [..., 10, nlev] effective cloud cover per band
      taudiag: [..., 10, nlev] total cloud optical depth per band (diagnostic)
    """
    t = load("chou_rad_constants")
    aib = jnp.asarray(t["aib_ir"], dtype)   # (3, 10)
    awb = jnp.asarray(t["awb_ir"], dtype)   # (4, 10)
    aiw = jnp.asarray(t["aiw_ir"], dtype)
    aww = jnp.asarray(t["aww_ir"], dtype)
    aig = jnp.asarray(t["aig_ir"], dtype)
    awg = jnp.asarray(t["awg_ir"], dtype)

    # water path per layer in g/m^2: dp[Pa] * 1e3 / g * q[kg/kg]
    wp = (dp_pa * 1.0e3 / GRAV)[..., None, :, None] * cwc[..., None, :, :]
    # wp shape [..., 1, nlev, 4]; band axis broadcast to 10 below.

    re_ice = reff[..., None, :, 0]
    re_liq = reff[..., None, :, 1]
    re_snow = jnp.minimum(reff[..., None, :, 3], 112.0)  # getirtau.code:31

    # per-band coefficients broadcast as [10, 1]
    def band(c, i):
        return c[i][:, None]

    tau_ice = jnp.where(
        re_ice > 0.0,
        wp[..., 0] * (band(aib, 0) + band(aib, 1)
                      / jnp.maximum(re_ice, 1e-6) ** band(aib, 2)),
        0.0)
    tau_liq = wp[..., 1] * _poly3(band(awb, 0), band(awb, 1), band(awb, 2),
                                  band(awb, 3), re_liq)
    tau_rain = 0.00307 * wp[..., 2]
    tau_snow = jnp.where(
        re_snow > 0.0,
        wp[..., 3] * (band(aib, 0) + band(aib, 1)
                      / jnp.maximum(re_snow, 1e-6) ** band(aib, 2)),
        0.0)

    tauc = tau_ice + tau_liq + tau_rain + tau_snow
    taudiag = tauc

    w1 = tau_ice * _poly3(band(aiw, 0), band(aiw, 1), band(aiw, 2),
                          band(aiw, 3), re_ice)
    w2 = tau_liq * _poly3(band(aww, 0), band(aww, 1), band(aww, 2),
                          band(aww, 3), re_liq)
    w3 = tau_rain * 0.54
    w4 = tau_snow * _poly3(band(aiw, 0), band(aiw, 1), band(aiw, 2),
                           band(aiw, 3), re_snow)
    wsum = w1 + w2 + w3 + w4
    ww = wsum / jnp.maximum(tauc, 1e-20)

    g1 = w1 * _poly3(band(aig, 0), band(aig, 1), band(aig, 2),
                     band(aig, 3), re_ice)
    g2 = w2 * _poly3(band(awg, 0), band(awg, 1), band(awg, 2),
                     band(awg, 3), re_liq)
    g3 = w3 * 0.95
    g4 = w4 * _poly3(band(aig, 0), band(aig, 1), band(aig, 2),
                     band(aig, 3), re_snow)
    gg = jnp.where(wsum != 0.0, (g1 + g2 + g3 + g4)
                   / jnp.where(wsum != 0.0, wsum, 1.0), 0.5)

    # similarity scaling for LW scattering (Eqs. 6.11, 6.12)
    ff = 0.5 + (0.3739 + (0.0076 + 0.1185 * gg) * gg) * gg
    tau_eff = jnp.maximum(1.0 - ww * ff, 0.0) * tauc

    active = (tauc > 0.02) & (fcld[..., None, :] > 0.01)
    tcldlyr = jnp.where(active, jnp.exp(-DIFFUSIVITY * tau_eff), 1.0)
    enn = jnp.where(active, fcld[..., None, :] * (1.0 - tcldlyr), 0.0)
    return tcldlyr, enn, taudiag


# ---------------------------------------------------------------------------
# Shortwave (getvistau/getnirtau): max-overlap scaling via caib/caif tables
# ---------------------------------------------------------------------------

_NM, _NT, _NA = 11, 9, 11
_DM, _DT, _DA, _T1 = 0.1, 0.30103, 0.1, -0.9031


def _quad3(tab, i, f):
    """(-tab[i-1]*(1-f) + tab[i+1]*(1+f))*f*0.5 + tab[i]*(1-f*f) along one
    axis; `tab` callables give tab at offsets -1, 0, +1."""
    return (-tab(-1) * (1.0 - f) + tab(1) * (1.0 + f)) * f * 0.5 \
        + tab(0) * (1.0 - f * f)


def _overlap_scales(cosz, tauc, fa, dtype=jnp.float32):
    """Beam & diffuse cloud-optical-depth scaling factors (Eqs. 7.3/7.4).

    Trilinear/quadratic lookup in caib(11,9,11) and caif(9,11)
    (getvistau.code:95-170). cosz scalar; tauc, fa: [...,] arrays.
    Returns (xai_beam, xai_diff).
    """
    t = load("chou_rad_constants")
    caib = jnp.asarray(t["caib"], dtype)
    caif = jnp.asarray(t["caif"], dtype)

    tauc = jnp.minimum(tauc, 32.0)
    fm = cosz / _DM
    ft = (jnp.log10(jnp.maximum(tauc, 1e-20)) - _T1) / _DT
    fa = fa / _DA

    im = jnp.clip(jnp.floor(fm + 1.5).astype(jnp.int32), 2, _NM - 1)
    it = jnp.clip(jnp.floor(ft + 1.5).astype(jnp.int32), 2, _NT - 1)
    ia = jnp.clip(jnp.floor(fa + 1.5).astype(jnp.int32), 2, _NA - 1)
    fm = fm - (im - 1).astype(tauc.dtype)
    ft = ft - (it - 1).astype(tauc.dtype)
    fa = fa - (ia - 1).astype(tauc.dtype)
    i0, j0, k0 = im - 1, it - 1, ia - 1   # 0-based centers

    xb = _quad3(lambda d: caib[i0 + d, j0, k0], i0, fm)
    xb = xb + _quad3(lambda d: caib[i0, j0 + d, k0], j0, ft)
    xb = xb + _quad3(lambda d: caib[i0, j0, k0 + d], k0, fa)
    xb = jnp.clip(xb - 2.0 * caib[i0, j0, k0], 0.0, 1.0)

    xd = _quad3(lambda d: caif[j0 + d, k0], j0, ft)
    xd = xd + _quad3(lambda d: caif[j0, k0 + d], k0, fa)
    xd = jnp.clip(xd - caif[j0, k0], 0.0, 1.0)
    return xb, xd


def _superlayer_cc(fcld, ict, icb):
    """Max cloud fraction of (high, mid, low) groups; fcld [nlev]."""
    cc1 = jnp.max(fcld[:ict - 1], initial=0.0)
    cc2 = jnp.max(fcld[ict - 1:icb - 1], initial=0.0)
    cc3 = jnp.max(fcld[icb - 1:], initial=0.0)
    return cc1, cc2, cc3


def _sw_hydromet_taus(dp_pa, cwc, reff, b_ice, b_liq, b_rain):
    """Hydrometeor optical depths: tau = WP * coef(reff).

    b_ice: scalar aib; b_liq: (c1, c2) -> c1 + c2/reff; b_rain: scalar.
    Shapes broadcast; returns 4 arrays like cwc[..., i].
    """
    wp = dp_pa * 1.0e3 / GRAV
    re_ice = reff[..., 0]
    re_liq = reff[..., 1]
    re_snow = jnp.minimum(reff[..., 3], 112.0)
    t1 = jnp.where(re_ice > 0.0,
                   wp * cwc[..., 0] * b_ice / jnp.maximum(re_ice, 1e-6), 0.0)
    t2 = jnp.where(re_liq > 0.0,
                   wp * cwc[..., 1] * (b_liq[0]
                                       + b_liq[1] / jnp.maximum(re_liq, 1e-6)),
                   0.0)
    t3 = wp * cwc[..., 2] * b_rain
    t4 = jnp.where(re_snow > 0.0,
                   wp * cwc[..., 3] * b_ice / jnp.maximum(re_snow, 1e-6), 0.0)
    return t1, t2, t3, t4


def getvistau(cosz, dp_pa, fcld, reff, cwc, ict, icb, dtype=jnp.float32):
    """UV/PAR cloud optics for one column (getvistau.code).

    Returns (taubeam [nlev,4], taudiff [nlev,4], asycl [nlev]).
    ict/icb are static 1-based layer boundary indices (overlap scaling on).
    """
    t = load("chou_rad_constants")
    t1_, t2_, t3_, t4_ = _sw_hydromet_taus(
        dp_pa, cwc, reff, float(t["aib_uv"]), t["awb_uv"],
        float(t["arb_uv"][0]))
    tauc = t1_ + t2_ + t3_ + t4_

    cc1, cc2, cc3 = _superlayer_cc(fcld, ict, icb)
    nlev = fcld.shape[0]
    k = jnp.arange(1, nlev + 1)
    cc_k = jnp.where(k < ict, cc1, jnp.where(k < icb, cc2, cc3))
    fa = jnp.where(cc_k > 0.0, fcld / jnp.maximum(cc_k, 1e-20), 0.0)

    active = (tauc > 0.02) & (fcld > 0.01)
    xb, xd = _overlap_scales(cosz, tauc, fa, dtype)
    xb = jnp.where(active, xb, 0.0)
    xd = jnp.where(active, xd, 0.0)
    taubeam = jnp.stack([t1_ * xb, t2_ * xb, t3_ * xb, t4_ * xb], axis=-1)
    taudiff = jnp.stack([t1_ * xd, t2_ * xd, t3_ * xd, t4_ * xd], axis=-1)

    aig = t["aig_uv"]
    awg = t["awg_uv"]
    arg = t["arg_uv"]
    re_i, re_l = reff[..., 0], reff[..., 1]
    re_s = jnp.minimum(reff[..., 3], 112.0)
    g1 = (aig[0] + (aig[1] + aig[2] * re_i) * re_i) * t1_
    g2 = (awg[0] + (awg[1] + awg[2] * re_l) * re_l) * t2_
    g3 = arg[0] * t3_
    g4 = (aig[0] + (aig[1] + aig[2] * re_s) * re_s) * t4_
    asycl = jnp.where(active, (g1 + g2 + g3 + g4)
                      / jnp.maximum(tauc, 1e-20), 1.0)
    return taubeam, taudiff, asycl


def getnirtau(cosz, dp_pa, fcld, reff, cwc, ict, icb, dtype=jnp.float32):
    """NIR cloud optics for one column, all 3 IR bands at once
    (getnirtau.code).

    Returns (taubeam [3,nlev,4], taudiff [3,nlev,4], asycl [3,nlev],
    ssacl [3,nlev]).
    """
    t = load("chou_rad_constants")
    aib = float(t["aib_nir"])
    awb = t["awb_nir"]    # (3 bands, 2)
    arb = t["arb_nir"]    # (3, 2)
    aia = t["aia_nir"]    # (3, 3)
    awa = t["awa_nir"]
    ara = t["ara_nir"]
    aig = t["aig_nir"]
    awg = t["awg_nir"]
    arg = t["arg_nir"]

    cc1, cc2, cc3 = _superlayer_cc(fcld, ict, icb)
    nlev = fcld.shape[0]
    k = jnp.arange(1, nlev + 1)
    cc_k = jnp.where(k < ict, cc1, jnp.where(k < icb, cc2, cc3))
    fa = jnp.where(cc_k > 0.0, fcld / jnp.maximum(cc_k, 1e-20), 0.0)

    wp = dp_pa * 1.0e3 / GRAV
    re_i, re_l = reff[..., 0], reff[..., 1]
    re_s = jnp.minimum(reff[..., 3], 112.0)

    outs = []
    for ib in range(3):
        t1_ = jnp.where(re_i > 0.0,
                        wp * cwc[..., 0] * aib / jnp.maximum(re_i, 1e-6), 0.0)
        t2_ = jnp.where(re_l > 0.0,
                        wp * cwc[..., 1]
                        * (awb[ib, 0] + awb[ib, 1] / jnp.maximum(re_l, 1e-6)),
                        0.0)
        t3_ = wp * cwc[..., 2] * arb[ib, 0]
        t4_ = jnp.where(re_s > 0.0,
                        wp * cwc[..., 3] * aib / jnp.maximum(re_s, 1e-6), 0.0)
        tauc = t1_ + t2_ + t3_ + t4_
        active = (tauc > 0.02) & (fcld > 0.01)
        xb, xd = _overlap_scales(cosz, tauc, fa, dtype)
        xb = jnp.where(active, xb, 0.0)
        xd = jnp.where(active, xd, 0.0)
        taubeam = jnp.stack([t1_ * xb, t2_ * xb, t3_ * xb, t4_ * xb], -1)
        taudiff = jnp.stack([t1_ * xd, t2_ * xd, t3_ * xd, t4_ * xd], -1)

        w1 = (1.0 - (aia[ib, 0] + (aia[ib, 1] + aia[ib, 2] * re_i) * re_i)) * t1_
        w2 = (1.0 - (awa[ib, 0] + (awa[ib, 1] + awa[ib, 2] * re_l) * re_l)) * t2_
        w3 = (1.0 - ara[ib, 0]) * t3_
        w4 = (1.0 - (aia[ib, 0] + (aia[ib, 1] + aia[ib, 2] * re_s) * re_s)) * t4_
        wsum = w1 + w2 + w3 + w4
        ssacl = jnp.where(active, wsum / jnp.maximum(tauc, 1e-20), 0.99999)
        # note: asymmetry for snow uses the UNCLAMPED snow radius, matching
        # getnirtau.code:200-206
        re_s_raw = reff[..., 3]
        g1 = (aig[ib, 0] + (aig[ib, 1] + aig[ib, 2] * re_i) * re_i) * w1
        g2 = (awg[ib, 0] + (awg[ib, 1] + awg[ib, 2] * re_l) * re_l) * w2
        g3 = arg[ib, 0] * w3
        g4 = (aig[ib, 0] + (aig[ib, 1] + aig[ib, 2] * re_s_raw) * re_s_raw) * w4
        asycl = jnp.where(active & (wsum != 0.0),
                          (g1 + g2 + g3 + g4)
                          / jnp.where(wsum != 0.0, wsum, 1.0), 1.0)
        outs.append((taubeam, taudiff, asycl, ssacl))
    taubeam = jnp.stack([o[0] for o in outs])
    taudiff = jnp.stack([o[1] for o in outs])
    asycl = jnp.stack([o[2] for o in outs])
    ssacl = jnp.stack([o[3] for o in outs])
    return taubeam, taudiff, asycl, ssacl
