"""LW diagnostic products: band brightness temperatures and RATS forcing.

Re-derivations of GEOS_IrradGridComp.F90:
  * Tbr_from_band_flux / invert_Planck_for_T (:4132-4212): narrow-band
    Planck inversion of band OLR to a brightness temperature;
  * the RATS loop (:3390-3468): re-run the LW scheme once per radiatively
    active trace species with that gas zeroed, storing flux internals so
    instantaneous radiative forcings (F_all - F_gas_zeroed) can be
    exported and advanced between refreshes like the main fluxes.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .state import RatsState

# RRTMG LW band bounds [cm^-1] (rrlw_wvn wavenum1/2)
LW_WAVENUM1 = np.array([10., 350., 500., 630., 700., 820., 980., 1080.,
                        1180., 1390., 1480., 1800., 2080., 2250., 2380.,
                        2600.])
LW_WAVENUM2 = np.array([350., 500., 630., 700., 820., 980., 1080., 1180.,
                        1390., 1480., 1800., 2080., 2250., 2380., 2600.,
                        3250.])

# fundamental constants (GEOS_IrradGridComp.F90:4146-4153)
_H = 6.626070040e-34   # Planck [J s]
_C = 2.99792458e8      # speed of light [m/s]
_KB = 1.38064852e-23   # Boltzmann [J/K]
_ALT = _H * _C / _KB
_BIGC = 2.0 * _H * _C * _C

# GEOS missing-data marker (MAPL_UNDEF)
UNDEF = 1.0e15

# RATS gas set (GEOS_IrradGridComp.F90:3408-3437 select cases)
RATS_GASES = ("H2O", "O3", "CO2", "CH4", "N2O", "CFC11", "CFC12", "HCFC22")


def invert_planck_for_t(b_wn, wn):
    """Temperature whose Planck radiance at wavenumber wn [m^-1] equals
    b_wn [W m^-2 sr^-1 / m^-1] (GEOS_IrradGridComp.F90:4189-4212)."""
    return _ALT * wn / jnp.log1p(_BIGC * wn ** 3 / b_wn)


def band_brightness_temperature(olrb, wavenum1=None, wavenum2=None):
    """Brightness temperature per LW band from band OLR [W/m^2].

    Narrow-band estimate (Tbr_from_band_flux, :4166-4174): mean Planck
    radiance over the band inverted at the mid-point wavenumber. Zero or
    negative band fluxes (pre-first-refresh state) map to UNDEF, matching
    the reference's MAPL_UNDEF guard (:4163-4166).

    olrb: [..., nband]; returns same shape [K].
    """
    olrb = jnp.asarray(olrb)
    wn1 = (LW_WAVENUM1 if wavenum1 is None else np.asarray(wavenum1)) * 100.0
    wn2 = (LW_WAVENUM2 if wavenum2 is None else np.asarray(wavenum2)) * 100.0
    wn_mid = jnp.asarray(0.5 * (wn1 + wn2), olrb.dtype)
    dwn = jnp.asarray(wn2 - wn1, olrb.dtype)
    bmean = jnp.maximum(olrb, 1e-30) / (np.pi * dwn)
    tbr = invert_planck_for_t(bmean, wn_mid)
    return jnp.where(olrb > 0.0, tbr, UNDEF)


def rats_refresh(inp, doy, config, ict, icb, taua=None,
                 gases: Sequence[str] = RATS_GASES) -> RatsState:
    """LW internals with each trace gas zeroed in turn (the RATS loop,
    GEOS_IrradGridComp.F90:3405-3468). The gas list is static config;
    each entry costs one full LW solve.

    Returns RatsState with leading gas axis ordered as `gases`.
    """
    from .radiation import irrad_refresh

    flx, flxu, flxd, dfdts, sfcem = [], [], [], [], []
    for gas in gases:
        if gas not in RATS_GASES:
            raise ValueError(f"unknown RATS gas {gas!r}")
        field = {"H2O": "qv", "O3": "o3", "CO2": "co2", "CH4": "ch4",
                 "N2O": "n2o", "CFC11": "cfc11", "CFC12": "cfc12",
                 "HCFC22": "hcfc22"}[gas]
        zeroed = inp._replace(**{field: jnp.zeros_like(getattr(inp, field))})
        st = irrad_refresh(zeroed, doy, config, ict, icb, taua=taua)
        flx.append(st.flx)
        flxu.append(st.flxu)
        flxd.append(st.flxd)
        dfdts.append(st.dfdts)
        sfcem.append(st.sfcem)
    return RatsState(flx=jnp.stack(flx), flxu=jnp.stack(flxu),
                     flxd=jnp.stack(flxd), dfdts=jnp.stack(dfdts),
                     sfcem=jnp.stack(sfcem))


def rats_update(rats: RatsState, irr_state, tsinst
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-heartbeat Ts-linearized advance of the RATS internals plus the
    instantaneous radiative forcing of each gas:
    forcing[g] = F_net(all gases) - F_net(gas g zeroed), both advanced to
    the current Ts.

    Returns (flx_rat [ngas, ncol, nlev+1], forcing [ngas, ncol, nlev+1]).
    """
    delt = (tsinst - irr_state.ts)[None, :, None]
    flx_rat = rats.flx + rats.dfdts * delt
    flx_all = (irr_state.flx + irr_state.dfdts
               * (tsinst - irr_state.ts)[:, None])[None]
    return flx_rat, flx_all - flx_rat
