"""Top-level radiation step: the composite GridComp's Run in functional form.

`radiation_refresh` = full SW+LW RT (the RunAlarm branch); `radiation_update`
= the cheap per-heartbeat export path. Both jit cleanly and run unchanged on
a column-sharded mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RadiationConfig, Scheme
from .radiation import (AtmosInputs, solar_refresh, solar_update,
                        irrad_refresh, irrad_update, heating_rates,
                        surface_lw_linearization)
from .astronomy import mean_cos_zenith


@partial(jax.jit, static_argnames=("config", "ict", "icb", "sw_nlit",
                                   "sw_ncld"))
def radiation_refresh(inp: AtmosInputs, doy, utc_hours, *, config, ict, icb,
                      sw_aero=None, lw_aero=None, sw_nlit=None,
                      sw_ncld=None):
    """Full SW+LW refresh. Returns (solar_state, irrad_state).

    sw_aero: optional (taua, ssaa, asya) per-SW-band aerosol optics
    [ncol, nlay, nband] from the aerosol provider (the AERO bundle
    run_aerosol_optics protocol, GEOS_SolarGridComp.F90:3113-3200).
    lw_aero: optional LW aerosol optics — (taua, ssaa, asya) for the
    Chou scheme (10 bands), taua alone for RRTMG (16 bands; absorption
    only, rrtmg_lw taua input).
    sw_nlit: optional STATIC lit-column bound for SW daylight packing
    (see models/rrtmg/sw.py rrtmg_sw nlit). Compute host-side from the
    refresh-interval insolation and bucket it so the set of compiled
    shapes stays small (lit_column_bound below does both).
    sw_ncld: optional STATIC cloudy-lit-column bound (rrtmg_sw ncld):
    the cloudy spcvmc pass runs only on that many (sorted-first)
    columns. sw_partition_bounds below computes both bounds.
    """
    slr, lit = mean_cos_zenith(inp.lons, inp.lats, doy, utc_hours,
                               config.solar_dt / 3600.0)
    zth = jnp.where(lit > 0.0, slr / jnp.maximum(lit, 1e-6), 0.0)
    staua, sssaa, sasya = sw_aero if sw_aero is not None else (None,) * 3
    if lw_aero is None:
        ltaua, lssaa, lasya = None, None, None
    elif isinstance(lw_aero, (tuple, list)):
        ltaua, lssaa, lasya = lw_aero
    else:
        ltaua, lssaa, lasya = lw_aero, None, None
    sol = solar_refresh(inp, zth, doy, config, ict, icb,
                        taua=staua, ssaa=sssaa, asya=sasya, nlit=sw_nlit,
                        ncld=sw_ncld)
    irr = irrad_refresh(inp, doy, config, ict, icb,
                        taua=ltaua, ssaa=lssaa, asya=lasya)
    return sol, irr


@partial(jax.jit, static_argnames=("config",))
def radiation_update(solar_state, irrad_state, tsinst, lons, lats, ple,
                     doy, utc_hours, *, config):
    """Per-heartbeat exports + heating rates."""
    mu_now, _ = mean_cos_zenith(lons, lats, doy, utc_hours,
                                config.run_dt / 3600.0)
    sw = solar_update(solar_state, mu_now, doy, config)
    lw = irrad_update(irrad_state, tsinst, config)
    dtdt = heating_rates(sw["fsw"], lw["flw"], ple)
    out = dict(sw=sw, lw=lw, dtdt=dtdt)
    out.update(surface_lw_linearization(irrad_state))
    return out


def lit_column_bound(lons, lats, doy, utc_hours, config, bucket=256):
    """Host-side lit-column bound for SW daylight packing.

    Counts columns with nonzero refresh-interval insolation (the
    reference's NumLit, GEOS_SolarGridComp.F90:3684-3687) and rounds UP
    to a multiple of `bucket`, so successive refreshes reuse at most
    ncol/bucket compiled shapes. Pass the result as radiation_refresh's
    sw_nlit. Returns None when every column is lit.
    """
    import numpy as np

    _, lit = mean_cos_zenith(lons, lats, doy, utc_hours,
                             config.solar_dt / 3600.0)
    nlit = int(np.sum(np.asarray(lit) > 0.0))
    ncol = int(lit.shape[0])
    nlit = min(-(-nlit // bucket) * bucket, ncol)
    return None if nlit >= ncol else nlit


def sw_partition_bounds(lons, lats, fcld, doy, utc_hours, config,
                        bucket=256):
    """Host-side (sw_nlit, sw_ncld) bounds for the SW column partition.

    sw_nlit as in lit_column_bound; sw_ncld bounds the cloudy columns
    the cloudy spcvmc pass must cover - cloudy AND lit when packing is
    active (night-cloudy columns sort into the night section), all
    cloudy columns otherwise. Both rounded up to `bucket` to cap the
    compiled-shape set. fcld: [ncol, nlay] cloud fraction (host or
    device).
    """
    import numpy as np

    _, lit = mean_cos_zenith(lons, lats, doy, utc_hours,
                             config.solar_dt / 3600.0)
    lit = np.asarray(lit) > 0.0
    cloudy = (np.asarray(fcld) > 0.0).any(axis=1)
    ncol = int(lit.shape[0])
    up = lambda n: min(-(-int(n) // bucket) * bucket, ncol)
    nlit = up(lit.sum())
    nlit = None if nlit >= ncol else nlit
    ncld = up((cloudy & lit).sum() if nlit is not None else cloudy.sum())
    ncld = None if ncld >= (nlit if nlit is not None else ncol) else ncld
    return nlit, ncld
