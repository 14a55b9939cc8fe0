"""Checkpointable radiation internal state (pytrees).

Mirrors the reference's MAPL Internal states: Solar keeps NORMALIZED fluxes
(fractions of refresh-time TOA insolation, GEOS_SolarGridComp.F90:106-119,
FSWN et al. :694-701); Irrad keeps fluxes at refresh plus the surface-
temperature Jacobian and the refresh-time Ts (GEOS_IrradGridComp.F90:
1370-1387). These pytrees ARE the checkpoint: save/restore with orbax.
"""

from typing import NamedTuple

import jax.numpy as jnp


class SolarState(NamedTuple):
    """Normalized SW internal state (per column batch)."""
    flxn: jnp.ndarray        # [ncol, nlev+1] net downward / TOA insolation
    flcn: jnp.ndarray        # clear-sky net
    flxun: jnp.ndarray       # upward diffuse
    flcun: jnp.ndarray       # clear upward
    fdir_uv_n: jnp.ndarray   # [ncol] surface direct UV
    fdif_uv_n: jnp.ndarray
    fdir_par_n: jnp.ndarray
    fdif_par_n: jnp.ndarray
    fdir_nir_n: jnp.ndarray
    fdif_nir_n: jnp.ndarray
    flx_sfc_band_n: jnp.ndarray  # [ncol, nbands]
    drband_n: jnp.ndarray        # [ncol, nbands] surface direct per band
    dfband_n: jnp.ndarray        # [ncol, nbands] surface diffuse per band
    cldfrc: jnp.ndarray          # [ncol, 4] McICA cloud fractions
    #   (total/high/mid/low from clearCounts_threeBand,
    #    cloud_subcol_gen.F90:611-769; UNDEF for non-McICA schemes)
    # no-aerosol variants (FSWNAN/FSCNAN/FSWUNAN internals,
    # GEOS_SolarGridComp.F90:801-815, filled by the optional second
    # no-aerosol pass :3249-3259; == the all-sky values when the run has
    # no aerosols; UNDEF when pruned by config)
    flxnan: jnp.ndarray          # [ncol, nlev+1] net, no aerosol
    flcnan: jnp.ndarray          # clear net, no aerosol
    flxunan: jnp.ndarray         # upward, no aerosol


class IrradState(NamedTuple):
    """LW internal state at refresh time (W/m^2, positive up/down)."""
    flx: jnp.ndarray         # [ncol, nlev+1] net downward (dn - up)
    flc: jnp.ndarray         # clear-sky net
    flxu: jnp.ndarray        # upward
    flxd: jnp.ndarray        # downward
    dfdts: jnp.ndarray       # [ncol, nlev+1] d(net)/dTs (negative)
    sfcem: jnp.ndarray       # [ncol] surface emission (negative)
    ts: jnp.ndarray          # [ncol] Ts at refresh
    olrb: jnp.ndarray        # [ncol, 16] band OLR (OLRBbbRG internals)
    dolrb_dts: jnp.ndarray   # [ncol, 16] band dOLR/dTs (DOLRBbbRGDT)
    # no-aerosol variants (FLXA/FLA/DFDTSNA internals,
    # GEOS_IrradGridComp.F90:500-576; == the with-aerosol values when
    # the run has no aerosols; UNDEF when pruned by config)
    flxa: jnp.ndarray        # [ncol, nlev+1] net downward, no aerosol
    fla: jnp.ndarray         # clear-sky net, no aerosol
    dfdtsna: jnp.ndarray     # d(net no-aerosol)/dTs
    # clear-sky no-aerosol derivative (DFDTSCNA,
    # GEOS_IrradGridComp.F90:3871); RRTMG aliases the clear-sky
    # derivative (:3556 DFDTSCNA=DFDTSC), Chou zeroes it (:2107-2109
    # "Chou-Suarez does not provide these derivatives")
    dfdtscna: jnp.ndarray


class RatsState(NamedTuple):
    """Radiatively-active-trace-species diagnostics: LW internals from
    re-running the scheme with one gas zeroed per entry
    (GEOS_IrradGridComp.F90:3390-3468 FLX_RAT/DFDTS_RAT/SFCEM_RAT).

    Leading axis = gas, ordered as the static `gases` tuple passed to
    diagnostics.rats_refresh."""
    flx: jnp.ndarray         # [ngas, ncol, nlev+1] net downward
    flxu: jnp.ndarray        # [ngas, ncol, nlev+1]
    flxd: jnp.ndarray        # [ngas, ncol, nlev+1]
    dfdts: jnp.ndarray       # [ngas, ncol, nlev+1]
    sfcem: jnp.ndarray       # [ngas, ncol]
