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
