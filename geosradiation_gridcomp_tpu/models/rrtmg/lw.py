"""RRTMG-LW all-sky McICA driver (the reference's rrtmg_lw / rrtmg_lw_part).

Pipeline per rrtmg_lw_rad.F90:348-610: stochastic subcolumn generation ->
clear counts -> cloud optical depths -> setcoef -> taumol -> rtrnmc.
No partition loop: XLA tiles the column batch; callers shard/block columns.

All inputs TOA-first. Water paths are IN-CLOUD values in g/m^2.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ...constants import GRAV, RGAS, AMD
from ...ops.mcica import (generate_stochastic_clouds,
                          clear_counts_three_band, overlap_params,
                          state_seed_ints, _sigma_class)
from ...ops.mcica_pallas import mcica_optics_lw_fused
from .cldprmc_lw import cldprmc_lw, band_abs_coeffs_lw
from .rtrnmc import rtrnmc
from .rtrnmc_pallas import rtrnmc_fast
from .setcoef_lw import setcoef_lw
from .taumol_lw import taumol_lw
from .tables_lw import NGPTLW, NG_LW


def level_temperatures(play, tlay, plev, tsfc):
    """Interpolate layer temperatures to levels (TOA-first).

    Interior levels: linear-in-p between adjacent layers; TOA level copies
    the top layer; the surface level uses tsfc.
    """
    wt = (plev[..., 1:-1] - play[..., :-1]) \
        / (play[..., 1:] - play[..., :-1])
    interior = tlay[..., :-1] + wt * (tlay[..., 1:] - tlay[..., :-1])
    return jnp.concatenate(
        [tlay[..., :1], interior, tsfc[..., None]], axis=-1)


def mid_heights(play, tlay, psfc):
    """Approximate layer-midpoint heights via the hypsometric equation.

    Only height DIFFERENCES matter (decorrelation lengths in the subcolumn
    generator), so the zero reference is arbitrary.
    """
    rd = RGAS / (AMD * 1e-3)      # ~287 J/kg/K
    # integrate from surface upward: z ~ sum rd*T/g * dln(p)
    lnp = jnp.log(play)
    dz_half = rd * tlay / GRAV
    # z_mid[k] = sum over layers below of rd*T*dlnp (TOA-first: reverse)
    dlnp = jnp.diff(lnp, axis=-1)                    # [nlay-1], positive
    tmid = 0.5 * (tlay[..., 1:] + tlay[..., :-1])
    seg = rd * tmid / GRAV * dlnp
    # height of layer k relative to the bottom layer
    z_rel = jnp.concatenate(
        [jnp.cumsum(seg[..., ::-1], axis=-1)[..., ::-1],
         jnp.zeros_like(tlay[..., :1])], axis=-1)
    del dz_half
    return z_rel


@partial(jax.jit, static_argnames=("iceflag", "liqflag", "dudts",
                                   "cloud_mh", "cloud_lm", "inhm"))
def rrtmg_lw(ple, play, tlay, tlev, tsfc, emis,
             h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr, o2vmr, covmr,
             cfc11vmr, cfc12vmr, cfc22vmr, ccl4vmr,
             cldf, ciwp, clwp, rei, rel, zm, alat, doy,
             taua=None, *, iceflag=3, liqflag=1, dudts=True,
             cloud_mh=1, cloud_lm=2, inhm=1):
    """RRTMG LW all-sky fluxes with McICA clouds.

    Args (all TOA-first):
      ple:  [ncol, nlay+1] level pressure (Pa)
      play: [ncol, nlay] layer pressure (hPa); tlay [K]; tlev [ncol, nlay+1]
      tsfc: [ncol]; emis: [ncol, 16]
      gas vmrs: [ncol, nlay]
      cldf: [ncol, nlay]; ciwp/clwp in-cloud water paths (g/m^2);
      rei/rel: particle sizes (micron; rei meaning depends on iceflag)
      zm: [ncol, nlay] layer mid heights (m); alat [rad]; doy scalar
      taua: optional [ncol, nlay, 16] aerosol optical depth
      cloud_mh/cloud_lm: static super-layer boundary layer indices (1-based,
        TOA-first, GEOS LCLDMH/LCLDLM) for clear-subcolumn counts

    Returns dict: uflx, dflx, uflxc, dflxc [ncol, nlay+1] (W/m^2, positive),
    duflx_dts, duflxc_dts, olrb [ncol, 16], clear_counts [ncol, 4].
    """
    # cloudy-first column sort (TPU): clear columns then cluster into
    # whole kernel blocks, engaging the McICA clear-block skip — the
    # reference's clear/cloudy column split (rrtmg_sw_rad.F90:1130-1204)
    # as a permutation. Per-column physics (and per-column RNG seeds,
    # derived from play) is order-invariant, so outputs are identical;
    # only the small [ncol, nlay+1]-scale outputs pay the unpermute.
    sort_clear = jax.default_backend() == "tpu"
    if sort_clear:
        perm = jnp.argsort(jnp.logical_not((cldf > 0.0).any(axis=1)),
                           stable=True)
        inv = jnp.argsort(perm)
        pc = lambda x: None if x is None else x[perm]
        (ple, play, tlay, tlev, tsfc, emis, h2ovmr, o3vmr, co2vmr,
         ch4vmr, n2ovmr, o2vmr, covmr, cfc11vmr, cfc12vmr, cfc22vmr,
         ccl4vmr, cldf, ciwp, clwp, rei, rel, zm, alat, taua) = map(
            pc, (ple, play, tlay, tlev, tsfc, emis, h2ovmr, o3vmr,
                 co2vmr, ch4vmr, n2ovmr, o2vmr, covmr, cfc11vmr,
                 cfc12vmr, cfc22vmr, ccl4vmr, cldf, ciwp, clwp, rei,
                 rel, zm, alat, taua))

    plev = ple * 0.01

    scope = jax.named_scope
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # fused Pallas McICA + cloud-optics kernel: subcolumn draws,
        # overlap chains, zcw scaling, band->g optical depths, and the
        # clear-count reduction never leave VMEM (ops/mcica_pallas.py);
        # parity vs the jnp oracle is population-statistical by the
        # reference's own contract (cloud_subcol_gen.F90:24-31) and is
        # gated on-chip by tools/verify_tpu.py. layer_major: the whole
        # TPU LW pipeline (McICA -> taumol -> rtrnmc) runs in the
        # [nlay, ncol, g] layout the kernels emit natively, so no
        # [*, *, g]-scale array is ever relayout-copied by XLA.
        with scope("lw.mcica_fused"):
            alpha, rcorr = overlap_params(zm, alat, doy)
            sigcls = _sigma_class(cldf)
            seeds = jax.vmap(
                lambda p: state_seed_ints(p, (0, 1, 2, 3)))(play)
            absi, absl = band_abs_coeffs_lw(rei, rel, iceflag=iceflag,
                                            liqflag=liqflag)
            taucmc, cloudy, counts = mcica_optics_lw_fused(
                seeds, alpha, rcorr, cldf, ciwp, clwp, sigcls, absi,
                absl, nsub=NGPTLW, inhm=inhm, cwp_tiny=1.0e-20,
                cloud_mh=cloud_mh, cloud_lm=cloud_lm,
                band_ng=tuple(int(g) for g in NG_LW),
                layer_major=True)
    else:
        cldy, ciwp_s, clwp_s = generate_stochastic_clouds(
            zm, alat, doy, play, cldf, ciwp, clwp, 1.0e-20,
            nsubcol=NGPTLW, inhm=inhm, seed_order=(0, 1, 2, 3))

        counts = clear_counts_three_band(cldy, cloud_mh, cloud_lm)

        taucmc_gl, cloudy = cldprmc_lw(cldy, ciwp_s, clwp_s, rei, rel,
                                       iceflag=iceflag, liqflag=liqflag)
        taucmc = jnp.swapaxes(taucmc_gl, -1, -2)  # [ncol, nlay, ngpt]

    with scope("lw.setcoef"):
        coefs = setcoef_lw(play, tlay, plev, tlev, tsfc, emis,
                           h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr, o2vmr,
                           covmr, cfc11vmr, cfc12vmr, cfc22vmr, ccl4vmr,
                           dudts=dudts)

    # fused transposed-space Pallas kernel on TPU (~3.4x the gather
    # engine); the jnp gather engine (the oracle) elsewhere
    with scope("lw.taumol"):
        if on_tpu:
            from .taumol_lw_pallas import taumol_lw_fast
            taug, pfracs = taumol_lw_fast(coefs, taua, layer_major=True)
        else:
            taug, pfracs = taumol_lw(coefs, taua)

    # Pallas fused sweeps on TPU; the jnp scan (the oracle) elsewhere -
    # interpret-mode Pallas is far too slow for the CPU CI mesh
    with scope("lw.rtrnmc"):
        if on_tpu:
            out = rtrnmc_fast(emis, taug, pfracs, cloudy, taucmc,
                              coefs.planklay, coefs.planklev,
                              coefs.plankbnd, coefs.dplankbnd_dts,
                              coefs.pwvcm, dudts=dudts,
                              layer_major=True)
        else:
            out = rtrnmc(emis, taug, pfracs, cloudy, taucmc,
                         coefs.planklay, coefs.planklev, coefs.plankbnd,
                         coefs.dplankbnd_dts, coefs.pwvcm, dudts=dudts)
    out["clear_counts"] = counts
    if sort_clear:
        out = {k: v[inv] for k, v in out.items()}
    return out
