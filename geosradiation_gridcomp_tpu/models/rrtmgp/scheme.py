"""RRTMGP scheme drivers: the reference's RRTMGP paths in the Solar and
Irrad GCs (GEOS_SolarGridComp.F90:4574-5302, GEOS_IrradGridComp.F90:
2114+) as pure functions: gas_concs -> k_dist gas optics -> band cloud
optics -> McICA sampling (GEN_MAX_RAN_OVERLAP with condensate
inhomogeneity, the GC's default path) -> generic rte solve.

Cloud optics: the reference loads rrtmgp-clouds-sw.nc LUTs; here the
band-resolved cloud properties come from the same Ebert-Curry/Key/Fu +
Hu-Stamnes parameterizations used by the RRTMG scheme (cldprmc band
coefficients), evaluated once per band and expanded to g-points by
sampling.draw_samples - behaviorally equivalent band->gpt plumbing.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.mcica import correlation_length, state_seed_key, zcw_lookup
from ..rrtmg.cldprmc_sw import cldprmc_sw
from ..rrtmg.cldprmc_lw import cldprmc_lw
from ..rrtmg.lw import level_temperatures
from .gas_concs import GasConcs
from .kdist import KDistSW, KDistLW, KDistLWNative, KDistSWNative
from .sampling import sampled_urand_gen_max_ran, draw_samples
from .rte import rte_sw, rte_lw
from .rte_native import rte_lw_native, rte_sw_native


@lru_cache(maxsize=8)
def _kdist_lw_native(path):
    """Load-once cache of an ingested LW coefficient set (the
    reference's load_and_init at GC initialize,
    GEOS_IrradGridComp.F90:2151+)."""
    return KDistLWNative(path)


@lru_cache(maxsize=8)
def _kdist_sw_native(path):
    return KDistSWNative(path)


def _band_remap(native_wvn, host_wvn):
    """Map each native band to the host (RRTMG) band containing its
    center wavenumber (nearest interval if outside). Used to evaluate
    the band cloud-optics parameterizations — the reference gets these
    from rrtmgp-clouds-*.nc LUTs; here the RRTMG band
    parameterizations stand in, sampled at the native band centers."""
    mid = 0.5 * (np.asarray(native_wvn[:, 0], np.float64)
                 + np.asarray(native_wvn[:, 1]))
    lo = np.asarray(host_wvn[:, 0], np.float64)
    hi = np.asarray(host_wvn[:, 1], np.float64)
    idx = np.zeros(mid.size, np.int64)
    for b, m in enumerate(mid):
        inside = np.nonzero((m >= lo) & (m < hi))[0]
        if inside.size:
            idx[b] = inside[0]
        else:
            idx[b] = np.argmin(np.minimum(np.abs(m - lo),
                                          np.abs(m - hi)))
    return idx


def _band_cloud_optics_sw(ciwp, clwp, rei, rel, iceflag, liqflag, nbnd,
                          band_starts):
    """Band-resolved SW cloud optical properties for fully-cloudy cells:
    evaluate the per-g-point parameterization (band-constant
    coefficients) and pick one g-point per band."""
    ncol, nlay = ciwp.shape
    ngpt = int(band_starts[-1])
    ones = jnp.ones((ncol, ngpt, nlay), bool)
    bc = lambda x: jnp.broadcast_to(x[:, None, :], (ncol, ngpt, nlay))
    tau, ssa, asm_, _ = cldprmc_sw(ones, bc(ciwp), bc(clwp), rei, rel,
                                   iceflag=iceflag, liqflag=liqflag)
    sel = jnp.asarray(band_starts[:-1], jnp.int32)
    pick = lambda x: jnp.swapaxes(x[:, sel, :], 1, 2)  # [ncol,nlay,nbnd]
    return pick(tau), pick(ssa), pick(asm_)


def _band_cloud_optics_lw(ciwp, clwp, rei, rel, iceflag, liqflag, nbnd,
                          band_starts):
    ncol, nlay = ciwp.shape
    ngpt = int(band_starts[-1])
    ones = jnp.ones((ncol, ngpt, nlay), bool)
    bc = lambda x: jnp.broadcast_to(x[:, None, :], (ncol, ngpt, nlay))
    tau, _ = cldprmc_lw(ones, bc(ciwp), bc(clwp), rei, rel,
                        iceflag=iceflag, liqflag=liqflag)
    sel = jnp.asarray(band_starts[:-1], jnp.int32)
    return jnp.swapaxes(tau[:, sel, :], 1, 2)


def _gen_max_ran_mask(play, zm, alat, doy, cldf, ngpt, inhm):
    """GEN_MAX_RAN_OVERLAP cloud mask + condensate scaling
    (GEOS_SolarGridComp.F90:5186-5299): exponential layer-pair
    correlations (Oreopoulos-2012 decorrelation lengths) for presence
    and condensate, generalized max-random urand chains, cld_frac
    threshold mask, zcw condensate scaling with sigma from cloud
    fraction."""
    from ...ops import mcica
    adl = correlation_length(mcica.AAM1, mcica.AAM2, mcica.AAM30,
                             mcica.AAM4, doy, alat)
    rdl = correlation_length(mcica.RAM1, mcica.RAM2, mcica.RAM30,
                             mcica.RAM4, doy, alat)
    dzmid = jnp.abs(zm[:, 1:] - zm[:, :-1])
    alpha = jnp.exp(-dzmid / adl[:, None])
    rcorr = jnp.exp(-dzmid / rdl[:, None])

    nlay = play.shape[-1]
    keys = jax.vmap(state_seed_key)(play)            # [ncol] keys
    draws = jax.vmap(lambda k: jax.random.uniform(
        k, (4, ngpt, nlay)))(keys)
    urand, ur_aux, uc, uc_aux = (draws[:, i] for i in range(4))
    urand = sampled_urand_gen_max_ran(alpha, urand, ur_aux)
    uc = sampled_urand_gen_max_ran(rcorr, uc, uc_aux)

    cfx = cldf[:, None, :]
    cld_mask = jnp.swapaxes(urand < cfx, 1, 2)     # [ncol, nlay, ngpt]
    cld_mask = cld_mask & (cldf > 0.0)[:, :, None]
    # condensate scaling (sigma_qcw by cloud fraction, :5268-5276)
    from ...ops.mcica import _sigma_class, zcw_lookup_class
    sigcls = jnp.broadcast_to(_sigma_class(cfx), uc.shape)
    zcw = zcw_lookup_class(uc, sigcls, inhm)
    zcw = jnp.swapaxes(zcw, 1, 2)
    return cld_mask, jnp.where(cld_mask, zcw, 0.0)


@partial(jax.jit, static_argnames=("iceflag", "liqflag", "inhm",
                                   "kdist_path"))
def rrtmgp_sw(ple, play, tlay, coszen, albdir_uv, albdif_uv,
              albdir_nir, albdif_nir,
              h2ovmr, o3vmr, co2vmr, ch4vmr, o2vmr,
              cldf, ciwp, clwp, rei, rel, zm, alat, doy,
              taua=None, ssaa=None, asya=None,
              tsi_scale=None, mg=0.1567652, sb=909.7126, *,
              iceflag=3, liqflag=1, inhm=1, kdist_path=None):
    """RRTMGP-path SW fluxes (all-sky + clear), mirroring rrtmg_sw's
    interface. mg/sb: NRLSSI2 indices (k_dist%set_solar_variability);
    tsi_scale: optional [ncol] factor applied to the solar source
    (the GC's tsi = SLR/mu0 nuance).

    kdist_path: when set, an ingested RRTMGP coefficient file
    (tools/rrtmgp_ingest.py npz) runs through the NATIVE interpolation
    engine + band-agnostic RTE — the reference's real RRTMGP path
    (GEOS_SolarGridComp.F90:4574-5302, rrtmgp-gas-sw-*.nc); without it
    the RRTMG-reduced facade serves as the k-distribution."""
    if kdist_path is not None:
        return _rrtmgp_sw_native(
            _kdist_sw_native(kdist_path), ple, play, tlay, coszen,
            albdir_uv, albdif_uv, albdir_nir, albdif_nir,
            h2ovmr, o3vmr, co2vmr, ch4vmr, o2vmr,
            cldf, ciwp, clwp, rei, rel, zm, alat, doy,
            taua, ssaa, asya, tsi_scale, iceflag, liqflag, inhm)
    kd = KDistSW().set_solar_variability(mg, sb)
    gas = (GasConcs()
           .set_vmr("h2o", h2ovmr).set_vmr("o3", o3vmr)
           .set_vmr("co2", co2vmr).set_vmr("ch4", ch4vmr)
           .set_vmr("o2", o2vmr))
    plev = ple * 0.01
    taug, taur, toa_src = kd.gas_optics(play, tlay, plev, gas)
    if tsi_scale is not None:
        toa_src = toa_src * tsi_scale[:, None]

    lims = kd.get_band_lims_gpoint()
    starts = np.concatenate([lims[:, 0] - 1, [lims[-1, 1]]])
    ngpt = kd.get_ngpt()
    cld_mask, zcw = _gen_max_ran_mask(play, zm, alat, doy, cldf, ngpt,
                                      inhm)
    tau_b, ssa_b, g_b = _band_cloud_optics_sw(
        ciwp, clwp, rei, rel, iceflag, liqflag, kd.get_nband(), starts)
    props = draw_samples(cld_mask, dict(tau=tau_b, ssa=ssa_b, g=g_b),
                         lims)
    # condensate-inhomogeneity scaling of tau (GC :5293-5299)
    tau_cld = props["tau"] * zcw

    nbnd = kd.get_nband()
    ibm = np.arange(1, nbnd + 1)
    uvband = jnp.asarray((ibm >= 10) & (ibm <= 13))
    alb_dir = jnp.where(uvband, albdir_uv[:, None], albdir_nir[:, None])
    alb_dif = jnp.where(uvband, albdif_uv[:, None], albdif_nir[:, None])

    allsky = rte_sw(taug, taur, tau_cld, props["ssa"], props["g"],
                    toa_src, coszen, alb_dir, alb_dif, lims,
                    tau_aer=taua, ssa_aer=ssaa, g_aer=asya)
    zero = jnp.zeros_like(tau_cld)
    clrsky = rte_sw(taug, taur, zero, zero, zero,
                    toa_src, coszen, alb_dir, alb_dif, lims,
                    tau_aer=taua, ssa_aer=ssaa, g_aer=asya)
    day = (coszen > 0.0).astype(taug.dtype)[:, None]
    out = dict(bbfu=allsky["flux_up"] * day, bbfd=allsky["flux_dn"] * day,
               bbfddir=allsky["flux_dir"] * day,
               bbcu=clrsky["flux_up"] * day, bbcd=clrsky["flux_dn"] * day)
    return out


def _rrtmgp_sw_native(kd, ple, play, tlay, coszen, albdir_uv,
                      albdif_uv, albdir_nir, albdif_nir,
                      h2ovmr, o3vmr, co2vmr, ch4vmr, o2vmr,
                      cldf, ciwp, clwp, rei, rel, zm, alat, doy,
                      taua, ssaa, asya, tsi_scale, iceflag, liqflag,
                      inhm):
    """SW through the native engine: arbitrary band/g-point layout."""
    gas = (GasConcs()
           .set_vmr("h2o", h2ovmr).set_vmr("o3", o3vmr)
           .set_vmr("co2", co2vmr).set_vmr("ch4", ch4vmr)
           .set_vmr("o2", o2vmr))
    plev = ple * 0.01
    taug, taur, toa_src = kd.gas_optics(play, tlay, plev, gas)
    if tsi_scale is not None:
        toa_src = toa_src * tsi_scale[:, None]

    lims = kd.get_band_lims_gpoint()
    ngpt = kd.get_ngpt()
    nbnd = kd.get_nband()
    cld_mask, zcw = _gen_max_ran_mask(play, zm, alat, doy, cldf, ngpt,
                                      inhm)
    # RRTMG 14-band cloud parameterization sampled at the native bands
    host = KDistSW()
    host_lims = host.get_band_lims_gpoint()
    host_starts = np.concatenate([host_lims[:, 0] - 1,
                                  [host_lims[-1, 1]]])
    tau_h, ssa_h, g_h = _band_cloud_optics_sw(
        ciwp, clwp, rei, rel, iceflag, liqflag, host.get_nband(),
        host_starts)
    remap = _band_remap(kd.get_band_lims_wavenumber(),
                        host.get_band_lims_wavenumber())
    props = draw_samples(cld_mask,
                         dict(tau=tau_h[..., remap],
                              ssa=ssa_h[..., remap],
                              g=g_h[..., remap]), lims)
    tau_cld = props["tau"] * zcw

    # UV/vis vs NIR surface albedo split by band center (RRTMG's
    # ibm 10-13 == 12850-50000 cm-1, rrtmg_sw_spcvmc.F90 ngb mapping)
    mid = 0.5 * (kd.get_band_lims_wavenumber()[:, 0]
                 + kd.get_band_lims_wavenumber()[:, 1])
    uvband = jnp.asarray(mid >= 12850.0)
    alb_dir = jnp.where(uvband, albdir_uv[:, None], albdir_nir[:, None])
    alb_dif = jnp.where(uvband, albdif_uv[:, None], albdif_nir[:, None])

    # aerosol optics arrive on the RRTMG 14-band grid; sample at the
    # native band centers like the cloud parameterization
    rm = lambda x: None if x is None else x[..., remap]
    out = rte_sw_native(taug, taur, toa_src, coszen, alb_dir, alb_dif,
                        lims, tau_cld=tau_cld, ssa_cld=props["ssa"],
                        g_cld=props["g"], tau_aer=rm(taua),
                        ssa_aer=rm(ssaa), g_aer=rm(asya))
    return dict(bbfu=out["flux_up"], bbfd=out["flux_dn"],
                bbfddir=out["flux_dir"],
                bbcu=out["flux_up_clr"], bbcd=out["flux_dn_clr"])


@partial(jax.jit, static_argnames=("iceflag", "liqflag", "inhm",
                                   "dudts", "kdist_path"))
def rrtmgp_lw(ple, play, tlay, tsfc, emis,
              h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr, o2vmr,
              cfc11vmr, cfc12vmr, cfc22vmr,
              cldf, ciwp, clwp, rei, rel, zm, alat, doy,
              ccl4vmr=0.0, covmr=0.0,
              *, iceflag=3, liqflag=1, inhm=1, dudts=True,
              kdist_path=None):
    """RRTMGP-path LW fluxes (all-sky + clear) with McICA clouds.

    kdist_path: when set, routes an ingested RRTMGP coefficient set
    (tools/rrtmgp_ingest.py npz) through the NATIVE engine +
    band-agnostic RTE (GEOS_IrradGridComp.F90:2114+,
    rrtmgp-gas-lw-*.nc); otherwise the RRTMG-reduced facade."""
    if kdist_path is not None:
        return _rrtmgp_lw_native(
            _kdist_lw_native(kdist_path), ple, play, tlay, tsfc, emis,
            h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr, o2vmr,
            cfc11vmr, cfc12vmr, cfc22vmr, ccl4vmr, covmr,
            cldf, ciwp, clwp, rei, rel, zm, alat, doy,
            iceflag, liqflag, inhm, dudts)
    kd = KDistLW()
    gas = (GasConcs()
           .set_vmr("h2o", h2ovmr).set_vmr("o3", o3vmr)
           .set_vmr("co2", co2vmr).set_vmr("ch4", ch4vmr)
           .set_vmr("n2o", n2ovmr).set_vmr("o2", o2vmr)
           .set_vmr("cfc11", cfc11vmr).set_vmr("cfc12", cfc12vmr)
           .set_vmr("hcfc22", cfc22vmr).set_vmr("ccl4", ccl4vmr)
           .set_vmr("co", covmr))
    plev = ple * 0.01
    tlev = level_temperatures(play, tlay, plev, tsfc)
    taug, sources = kd.gas_optics(play, tlay, plev, tlev, tsfc, emis,
                                  gas, dudts=dudts)

    lims = kd.get_band_lims_gpoint()
    starts = np.concatenate([lims[:, 0] - 1, [lims[-1, 1]]])
    ngpt = kd.get_ngpt()
    cld_mask, zcw = _gen_max_ran_mask(play, zm, alat, doy, cldf, ngpt,
                                      inhm)
    tau_b = _band_cloud_optics_lw(ciwp, clwp, rei, rel, iceflag,
                                  liqflag, kd.get_nband(), starts)
    props = draw_samples(cld_mask, dict(tau=tau_b), lims)
    tau_cld = props["tau"] * zcw

    out = rte_lw(taug, sources, emis, tau_cld=tau_cld,
                 cld_mask=cld_mask.any(axis=-1), dudts=dudts)
    return out


def _rrtmgp_lw_native(kd, ple, play, tlay, tsfc, emis,
                      h2ovmr, o3vmr, co2vmr, ch4vmr, n2ovmr, o2vmr,
                      cfc11vmr, cfc12vmr, cfc22vmr, ccl4vmr, covmr,
                      cldf, ciwp, clwp, rei, rel, zm, alat, doy,
                      iceflag, liqflag, inhm, dudts):
    """LW through the native engine with McICA clouds."""
    gas = (GasConcs()
           .set_vmr("h2o", h2ovmr).set_vmr("o3", o3vmr)
           .set_vmr("co2", co2vmr).set_vmr("ch4", ch4vmr)
           .set_vmr("n2o", n2ovmr).set_vmr("o2", o2vmr)
           .set_vmr("cfc11", cfc11vmr).set_vmr("cfc12", cfc12vmr)
           .set_vmr("hcfc22", cfc22vmr).set_vmr("ccl4", ccl4vmr)
           .set_vmr("co", covmr))
    plev = ple * 0.01
    tlev = level_temperatures(play, tlay, plev, tsfc)
    names = [str(s) for s in kd.data["gas_names"]]
    vmrs = {nm: gas.get_vmr(nm, like=tlay) for nm in names}
    from .gas_optics import gas_optics_lw
    taug, sources = gas_optics_lw(kd.data, play * 100.0, tlay,
                                  plev * 100.0, tlev, tsfc, vmrs)

    lims = kd.get_band_lims_gpoint()
    ngpt = kd.get_ngpt()
    nbnd = kd.get_nband()
    cld_mask, zcw = _gen_max_ran_mask(play, zm, alat, doy, cldf, ngpt,
                                      inhm)
    host = KDistLW()
    host_lims = host.get_band_lims_gpoint()
    host_starts = np.concatenate([host_lims[:, 0] - 1,
                                  [host_lims[-1, 1]]])
    tau_h = _band_cloud_optics_lw(ciwp, clwp, rei, rel, iceflag,
                                  liqflag, host.get_nband(),
                                  host_starts)
    remap = _band_remap(kd.get_band_lims_wavenumber(),
                        host.get_band_lims_wavenumber())
    props = draw_samples(cld_mask, dict(tau=tau_h[..., remap]), lims)
    tau_cld = props["tau"] * zcw

    ncol = tlay.shape[0]
    emis_b = jnp.broadcast_to(emis[:, :1], (ncol, nbnd)) \
        if emis.ndim == 2 else jnp.broadcast_to(emis[:, None],
                                                (ncol, nbnd))
    out = rte_lw_native(taug, sources, emis_b, lims, tau_cld=tau_cld,
                        dudts=dudts)
    res = dict(flux_up=out["uflx"], flux_dn=out["dflx"],
               flux_up_clr=out["uflxc"], flux_dn_clr=out["dflxc"],
               olrb=out["olrb"])
    if dudts:
        res.update(duflx_dts=out["duflx_dts"],
                   duflxc_dts=out["duflxc_dts"],
                   dolrb_dts=out["dolrb_dts"])
    return res
