"""Pallas TPU kernels for the RRTMG-SW spectral solver (fused spcvmc).

Re-implementation of rrtmg_sw_spcvmc.F90:34-1588 (PIFM two-stream +
vertical adding over 112 g-points) as two streaming kernels that fuse
what the jnp oracle (spcvmc.py) does in ~30 HBM-materialized
[ncol, nlay, 112] temporaries per solve - run TWICE (clear + all-sky):

  * up-pass: walks layer chunks surface->TOA, derives clear-sky optics
    from taug/taur/aerosol and all-sky optics by adding the McICA cloud
    optics IN VMEM, evaluates the PIFM reflectance/transmittance for
    BOTH streams from one read of the inputs - vectorized over the
    whole layer slab (see _slab_optics) - and stores the 4
    composite-below-level fields (prup/prupd x {clear, all}) plus the
    R/T+dbt slabs for the down pass.
  * down-pass: walks TOA->surface carrying (ztdn, rdnd, tdbt) per
    stream, streams the stored R/T back (overlapped DMA beats
    recomputing the transcendental-heavy reftra, the kernel's dominant
    VPU cost), combines with the stored composites, and emits only
    band-aggregated flux rows [nlev, ncol] plus the surface
    band-resolved quantities - per-g fluxes never return to HBM.

Layer ordering is TOA-first; layers are padded to a multiple of 8 with
zero-optics layers (exact no-ops for both sweeps: R=0, T=1, dbt=1) and
the pad sits below the surface, where both sweeps are identities.

PERF NOTE (round-5 measurement, 2048x72 cloudy): 8.0 ms at
block_cols=128 vs 13.6 ms for the jnp oracle (spcvmc.spcvmc_sw), with
identical outputs to ~2e-5. The round-3 version of this kernel ran
64 ms because every reftra was evaluated per-LAYER on (8, 112) planes -
one vreg per op, so the long sequentially-dependent chain paid full op
latency ~1600 times per grid step; slab vectorization + storing R/T
instead of recomputing it in the down pass recovered a 1.7x win over
XLA's dense pipeline. Production dispatch (models/rrtmg/sw.py) uses
this kernel on TPU and the jnp oracle elsewhere.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables_sw import NG_SW

_LPS = 8                                 # layers per grid step
_NGB14 = np.repeat(np.arange(1, 15), NG_SW)       # 1..14 per g
_G0 = np.concatenate([[0], np.cumsum(NG_SW)])     # band start offsets
_OD_LO = 0.06
_EPS = 1.0e-8
_ZWCRIT = 0.9999995


def _expand14(row, gband, band_g0):
    """[C, lps, 14] band rows -> [C, lps, G] per-g planes by static
    band selects (gband: [C, lps, G] g-index iota)."""
    out = jnp.zeros(gband.shape, jnp.float32)
    for b in range(14):
        m = (gband >= band_g0[b]) & (gband < band_g0[b + 1])
        out = jnp.where(m, row[..., b][..., None], out)
    return out


def _reftra(tau, w, g, mu0, womz=None):
    """PIFM two-stream R/T on [C, G] planes (reftra_sw, kmodts=2).

    Same numerics as spcvmc.reftra_sw; mu0 is [C, 1]. womz is 1-w at
    full relative precision for a stable conservative-scattering
    predicate (see spcvmc.reftra_sw docstring).
    """
    if womz is None:
        womz = 1.0 - w
    zg3 = 3.0 * g
    gamma1 = (8.0 - w * (5.0 + zg3)) * 0.25
    gamma2 = 3.0 * (w * (1.0 - g)) * 0.25
    gamma3 = (2.0 - zg3 * mu0) * 0.25
    gamma4 = 1.0 - gamma3

    q = (g / jnp.maximum(1.0 - g, 1e-12)) ** 2
    den = 1.0 - womz * q
    den = jnp.where(jnp.abs(den) < 1e-12,
                    jnp.where(den < 0, -1e-12, 1e-12), den)
    conservative = womz * (1.0 - q) / den <= 1.0 - _ZWCRIT

    # conservative-scattering branch
    za = gamma1 * mu0
    za1c = za - gamma3
    zgt = gamma1 * tau
    ze1c = jnp.minimum(tau / mu0, 500.0)
    ze2c = jnp.exp(-ze1c)
    ref_c = (zgt - za1c * (1.0 - ze2c)) / (1.0 + zgt)
    tra_c = 1.0 - ref_c
    refd_c = zgt / (1.0 + zgt)
    trad_c = 1.0 - refd_c
    thin = ze2c == 1.0
    ref_c = jnp.where(thin, 0.0, ref_c)
    tra_c = jnp.where(thin, 1.0, tra_c)
    refd_c = jnp.where(thin, 0.0, refd_c)
    trad_c = jnp.where(thin, 1.0, trad_c)

    # non-conservative branch: the resonance-factored form (identical
    # numerics + rationale as spcvmc.reftra_sw - see its comment on the
    # removable zrk*mu0 = 1 singularity)
    za1 = gamma1 * gamma4 + gamma2 * gamma3
    za2 = gamma1 * gamma3 + gamma2 * gamma4
    zrk = jnp.sqrt(jnp.maximum(gamma1 * gamma1 - gamma2 * gamma2, 1e-12))
    zrp = zrk * mu0
    opp = 1.0 + zrp
    s = 1.0 - zrp
    zrk2 = 2.0 * zrk
    zrkg = zrk + gamma1
    g3k = zrk * gamma3
    g4k = zrk * gamma4
    zbeta = (gamma1 - zrk) / zrkg

    ze1 = jnp.minimum(zrk * tau, 5.0)
    ze2 = jnp.minimum(tau / mu0, 5.0)
    zem1 = jnp.exp(-ze1)
    # exp(ze) rather than 1/zem: XLA rewrites 1/exp(-x) -> exp(x) under
    # jit but not in eager dispatch, and that one-ulp difference is the
    # dominant compilation-variance of the whole solver (measured
    # 3.4e-4 max flux drift jit-vs-eager with the reciprocal, 0.0 with
    # the direct form)
    zep1 = jnp.exp(ze1)
    zem2 = jnp.exp(-ze2)
    zep2 = jnp.exp(ze2)

    u = ze2 - ze1
    s_ok = jnp.abs(s) >= 1e-6
    r = jnp.where(s_ok, u / jnp.where(s_ok, s, 1.0),
                  jnp.where(u == 0.0, 0.0, ze2))
    # psi(+-u) = +-expm1(+-u)/u via exp-1 with a quadratic Taylor below
    # |u| <= 0.01 (crossover errors ~6e-6 rel on each side; expm1 is not
    # lowered by Pallas TPU, and exp-1 keeps both solver variants on the
    # same code)
    small_u = jnp.abs(u) <= 0.01
    u_safe = jnp.where(small_u, 1.0, u)
    psi_p = jnp.where(small_u, 1.0 + u * (0.5 + u * (1.0 / 6.0)),
                      (jnp.exp(u) - 1.0) / u_safe)
    psi_m = jnp.where(small_u, 1.0 - u * (0.5 - u * (1.0 / 6.0)),
                      -(jnp.exp(-u) - 1.0) / u_safe)
    zden = opp * (zrkg * zep1 + (zrk - gamma1) * zem1)
    ref_n = w * ((za2 + g3k) * (zep1 - zem2)
                 + (g3k - za2) * opp * zem2 * r * psi_p) / zden
    tra_n = zem2 * (1.0 - w * ((za1 - g4k) * (zep2 - zem1)
                               - (za1 + g4k) * opp * zep2 * r * psi_m)
                    / zden)
    zemm = zem1 * zem1
    zdend = 1.0 / ((1.0 - zbeta * zemm) * zrkg)
    refd_n = gamma2 * (1.0 - zemm) * zdend
    trad_n = zrk2 * zem1 * zdend

    ref = jnp.where(conservative, ref_c, ref_n)
    tra = jnp.where(conservative, tra_c, tra_n)
    refd = jnp.where(conservative, refd_c, refd_n)
    trad = jnp.where(conservative, trad_c, trad_n)
    return ref, tra, refd, trad


def _slab_optics(taug_ref, taur_ref, ta_ref, sa_ref, ga_ref,
                 tcm_ref, scm_ref, acm_ref, mu0, gband, band_g0):
    """Clear + all-sky (tau, w, g) and direct transmittances for the
    WHOLE [C, lps, G] layer slab at once. Mirrors spcvmc.py:200-235.

    Vectorizing over the slab's layer axis is the difference between
    this kernel winning and losing (r5 measurement): per-layer 2-D
    planes are ~7 vregs per VPU op, so the long sequentially-dependent
    reftra chain pays full op latency ~1600 times per grid step
    (~200 us/step, 70 ms total); slab ops are lps x wider, and only the
    cheap adding recursion (_up_step/_down_adv, ~10 ops/layer) stays
    serial."""
    tg = taug_ref[:]
    tr = taur_ref[:]
    if ta_ref is None:
        # no aerosols (static): g-clear = 0, so the delta scaling is an
        # exact no-op - skip the 3x14-select band expansion and the
        # whole scaling block
        tau_c = tr + tg
        w_c = tr / jnp.maximum(tau_c, 1e-30)
        g_c = jnp.zeros_like(tau_c)
        womz_c = tg / jnp.maximum(tau_c, 1e-30)
    else:
        ta = _expand14(ta_ref[:], gband, band_g0)
        sa = _expand14(sa_ref[:], gband, band_g0)
        ga = _expand14(ga_ref[:], gband, band_g0)

        ztauo = tr + tg + ta
        zomco_n = tr + ta * sa
        zgco = (ga * sa * ta) / jnp.maximum(zomco_n, 1e-30)
        zomco = zomco_n / jnp.maximum(ztauo, 1e-30)
        zf = zgco * zgco
        zwf = zomco * zf
        tau_c = (1.0 - zwf) * ztauo
        w_c = (zomco - zwf) / jnp.maximum(1.0 - zwf, 1e-12)
        g_c = (zgco - zf) / jnp.maximum(1.0 - zf, 1e-12)

        womz_c = (tg + ta * (1.0 - sa)) / jnp.maximum(ztauo, 1e-30) \
            / jnp.maximum(1.0 - zwf, 1e-12)

    tcm = tcm_ref[:]
    scm = scm_ref[:]
    acm = acm_ref[:]
    tg_all = tau_c * w_c * g_c + tcm * scm * acm
    to_all = tau_c * w_c + tcm * scm
    tt = tau_c + tcm
    cld = tcm > 0.0
    g_a = jnp.where(cld, tg_all / jnp.maximum(to_all, 1e-30), g_c)
    w_a = jnp.where(cld, to_all / jnp.maximum(tt, 1e-30), w_c)
    womz_a = jnp.where(
        cld, (tau_c * womz_c + tcm * (1.0 - scm)) / jnp.maximum(tt, 1e-30),
        womz_c)
    tau_a = jnp.where(cld, tt, tau_c)

    dbt_c = jnp.exp(-jnp.minimum(tau_c / mu0, 500.0))
    dbt_a = jnp.exp(-jnp.minimum(tau_a / mu0, 500.0))
    return (tau_c, w_c, g_c, dbt_c, womz_c), (tau_a, w_a, g_a, dbt_a,
                                              womz_a)


def _up_step(rup, rupd, ref, tra, refd, trad, dbt):
    """vrtqdr up_step: composite below a level after adding one layer."""
    zrefl = 1.0 / (1.0 - rupd * refd)
    rup_n = ref + trad * ((tra - dbt) * rupd + dbt * rup) * zrefl
    rupd_n = refd + trad * trad * rupd * zrefl
    return rup_n, rupd_n


def _make_up_kernel(band_g0, lps=_LPS, aero=True, layer_major=False):
    # layer_major: g-point slabs arrive [lps, C, G] (blocks of the
    # [nlay, ncol, G] arrays taumol/McICA emit natively); the math in
    # _slab_optics/_reftra is elementwise, so only the slab slicing and
    # the mu0 broadcast orientation change.
    def kernel(taug_ref, taur_ref, *rest):
        if aero:
            ta_ref, sa_ref, ga_ref = rest[:3]
            rest = rest[3:]
        else:
            ta_ref = sa_ref = ga_ref = None
        (tcm_ref, scm_ref, acm_ref, adir_ref, adif_ref, mu0_ref,
         pru_a_ref, prd_a_ref, pru_c_ref, prd_c_ref,
         rt_c_ref, rt_a_ref,
         rup_a, rupd_a, rup_c, rupd_c) = rest
        l = pl.program_id(1)
        if layer_major:
            mu0 = mu0_ref[:][None, :, :]               # [1, C, 1]
        else:
            mu0 = mu0_ref[:][:, :, None]               # [C, 1, 1]
        gband = jax.lax.broadcasted_iota(
            jnp.int32, taug_ref.shape, 2)

        @pl.when(l == 0)
        def _():
            rup_a[:] = adir_ref[:]
            rupd_a[:] = adif_ref[:]
            rup_c[:] = adir_ref[:]
            rupd_c[:] = adif_ref[:]

        # all expensive work (optics + PIFM reftra, both streams) runs
        # vectorized over the whole slab; only the adding recursion
        # below walks layers serially. The R/T slabs are also emitted
        # for the down pass: re-reading ~0.7 GB of stored fields
        # overlaps with compute, while recomputing them would double
        # the kernel's dominant VPU cost (r5 measurement: 11.6 ms
        # recompute vs 8.5 ms store+reload at 2048x72).
        co, ao = _slab_optics(taug_ref, taur_ref, ta_ref, sa_ref,
                              ga_ref, tcm_ref, scm_ref, acm_ref,
                              mu0, gband, band_g0)
        rc = _reftra(*co[:3], mu0, co[4])
        ra = _reftra(*ao[:3], mu0, ao[4])
        for j in range(4):
            rt_c_ref[j] = rc[j]
            rt_a_ref[j] = ra[j]
        rt_c_ref[4] = co[3]
        rt_a_ref[4] = ao[3]

        # NOTE (r5): a per-block clear-skip (@pl.when on an SMEM flag,
        # aliasing the all-sky stream to the clear one for sorted-clear
        # blocks) was tried here and REGRESSED 8.0 -> 9-12 ms on a
        # cloudy scene: the branch bodies double Mosaic's live ranges
        # and the split adding chains lose the latency overlap of the
        # interleaved loop below. The clear-column split lives in the
        # jnp solver instead (spcvmc.spcvmc_sw ncld).
        for i in reversed(range(lps)):
            sl = (lambda t: t[i]) if layer_major else \
                (lambda t: t[:, i, :])
            rup_c_n, rupd_c_n = _up_step(rup_c[:], rupd_c[:],
                                         *map(sl, rc), sl(co[3]))
            rup_a_n, rupd_a_n = _up_step(rup_a[:], rupd_a[:],
                                         *map(sl, ra), sl(ao[3]))
            rup_c[:] = rup_c_n
            rupd_c[:] = rupd_c_n
            rup_a[:] = rup_a_n
            rupd_a[:] = rupd_a_n
            pru_a_ref[i] = rup_a_n
            prd_a_ref[i] = rupd_a_n
            pru_c_ref[i] = rup_c_n
            prd_c_ref[i] = rupd_c_n
    return kernel


def _lev_flux(tdbt, ztdn, rdnd, prup, prupd):
    """vrtqdr final combine at one level (normalized fd, fu)."""
    zrefl = 1.0 / (1.0 - rdnd * prupd)
    fu = (tdbt * prup + (ztdn - tdbt) * prupd) * zrefl
    fd = tdbt + (ztdn - tdbt + tdbt * prup * rdnd) * zrefl
    return fd, fu


def _down_adv(ztdn, rdnd, tdbt, ref, tra, refd, trad, dbt):
    """vrtqdr down_step: advance the above-level composite one layer."""
    zrefl = 1.0 / (1.0 - refd * rdnd)
    ztdn_n = tdbt * tra + trad * ((ztdn - tdbt)
                                  + tdbt * ref * rdnd) * zrefl
    rdnd_n = refd + trad * trad * rdnd * zrefl
    return ztdn_n, rdnd_n, tdbt * dbt


def _make_down_kernel(band_g0, lps=_LPS, layer_major=False):
    def kernel(adir_ref, adif_ref,
               zinc_ref, uvm_ref, nim_ref, s17_ref,
               pru_a_ref, prd_a_ref, pru_c_ref, prd_c_ref,
               rt_c_ref, rt_a_ref,
               bbfu_ref, bbfd_ref, bbcu_ref, bbcd_ref,
               bbfdir_ref, bbcdir_ref,
               uvfd_ref, uvcd_ref, uvfdir_ref, uvcdir_ref,
               nifd_ref, nicd_ref, nifdir_ref, nicdir_ref,
               sfc_ref, dir17_ref, tot17_ref, up17_ref,
               ztdn_a, rdnd_a, tdbt_a, ztdn_c, rdnd_c, tdbt_c):
        l = pl.program_id(1)
        nsteps = pl.num_programs(1)
        zinc = zinc_ref[:]
        uvm = uvm_ref[:]
        nim = nim_ref[:]

        @pl.when(l == 0)
        def _():
            one = jnp.ones_like(ztdn_a)
            zero = jnp.zeros_like(ztdn_a)
            ztdn_a[:] = one
            rdnd_a[:] = zero
            tdbt_a[:] = one
            ztdn_c[:] = one
            rdnd_c[:] = zero
            tdbt_c[:] = one

        # R/T + direct transmittance computed once by the up kernel,
        # streamed back here (see _make_up_kernel)
        rc = tuple(rt_c_ref[j] for j in range(4))
        ra = tuple(rt_a_ref[j] for j in range(4))
        dbt_c_slab = rt_c_ref[4]
        dbt_a_slab = rt_a_ref[4]
        sl2 = (lambda t, i: t[i]) if layer_major else \
            (lambda t, i: t[:, i, :])

        for i in range(lps):
            # flux at level k = chunk*LPS + i from the carried
            # above-composite and the stored below-composite
            fd_a, fu_a = _lev_flux(tdbt_a[:], ztdn_a[:], rdnd_a[:],
                                   pru_a_ref[i], prd_a_ref[i])
            fd_c, fu_c = _lev_flux(tdbt_c[:], ztdn_c[:], rdnd_c[:],
                                   pru_c_ref[i], prd_c_ref[i])
            za_fu = fu_a * zinc
            za_fd = fd_a * zinc
            za_dir = tdbt_a[:] * zinc
            zc_fu = fu_c * zinc
            zc_fd = fd_c * zinc
            zc_dir = tdbt_c[:] * zinc
            bbfu_ref[0, i, :] = jnp.sum(za_fu, axis=1)
            bbfd_ref[0, i, :] = jnp.sum(za_fd, axis=1)
            bbcu_ref[0, i, :] = jnp.sum(zc_fu, axis=1)
            bbcd_ref[0, i, :] = jnp.sum(zc_fd, axis=1)
            bbfdir_ref[0, i, :] = jnp.sum(za_dir, axis=1)
            bbcdir_ref[0, i, :] = jnp.sum(zc_dir, axis=1)
            uvfd_ref[0, i, :] = jnp.sum(za_fd * uvm, axis=1)
            uvcd_ref[0, i, :] = jnp.sum(zc_fd * uvm, axis=1)
            uvfdir_ref[0, i, :] = jnp.sum(za_dir * uvm, axis=1)
            uvcdir_ref[0, i, :] = jnp.sum(zc_dir * uvm, axis=1)
            nifd_ref[0, i, :] = jnp.sum(za_fd * nim, axis=1)
            nicd_ref[0, i, :] = jnp.sum(zc_fd * nim, axis=1)
            nifdir_ref[0, i, :] = jnp.sum(za_dir * nim, axis=1)
            nicdir_ref[0, i, :] = jnp.sum(zc_dir * nim, axis=1)

            # advance the composites through layer k
            zn, rn, tn = _down_adv(
                ztdn_c[:], rdnd_c[:], tdbt_c[:],
                *(sl2(t, i) for t in rc), sl2(dbt_c_slab, i))
            ztdn_c[:] = zn
            rdnd_c[:] = rn
            tdbt_c[:] = tn
            zn, rn, tn = _down_adv(
                ztdn_a[:], rdnd_a[:], tdbt_a[:],
                *(sl2(t, i) for t in ra), sl2(dbt_a_slab, i))
            ztdn_a[:] = zn
            rdnd_a[:] = rn
            tdbt_a[:] = tn

        @pl.when(l == nsteps - 1)
        def _():
            # surface level: below-composite is the surface albedo
            fd_a, fu_a = _lev_flux(tdbt_a[:], ztdn_a[:], rdnd_a[:],
                                   adir_ref[:], adif_ref[:])
            fd_c, fu_c = _lev_flux(tdbt_c[:], ztdn_c[:], rdnd_c[:],
                                   adir_ref[:], adif_ref[:])
            sdir_a = tdbt_a[:] * zinc
            sdir_c = tdbt_c[:] * zinc
            sfd_a = fd_a * zinc
            sfd_c = fd_c * zinc
            sfu_a = fu_a * zinc
            sfc_ref[:, 0] = jnp.sum(sfu_a, axis=1)
            sfc_ref[:, 1] = jnp.sum(sfd_a, axis=1)
            sfc_ref[:, 2] = jnp.sum(fu_c * zinc, axis=1)
            sfc_ref[:, 3] = jnp.sum(sfd_c, axis=1)
            sfc_ref[:, 4] = jnp.sum(sdir_a, axis=1)
            sfc_ref[:, 5] = jnp.sum(sdir_c, axis=1)
            sfc_ref[:, 6] = jnp.sum(sfd_a * uvm, axis=1)
            sfc_ref[:, 7] = jnp.sum(sfd_c * uvm, axis=1)
            sfc_ref[:, 8] = jnp.sum(sdir_a * uvm, axis=1)
            sfc_ref[:, 9] = jnp.sum(sdir_c * uvm, axis=1)
            sfc_ref[:, 10] = jnp.sum(sfd_a * nim, axis=1)
            sfc_ref[:, 11] = jnp.sum(sfd_c * nim, axis=1)
            sfc_ref[:, 12] = jnp.sum(sdir_a * nim, axis=1)
            sfc_ref[:, 13] = jnp.sum(sdir_c * nim, axis=1)
            # band-resolved surface quantities via one [G, 17] matmul
            # per field (14 band one-hots + nir/par/uvr selections)
            s17 = s17_ref[:]
            dir17_ref[:] = jnp.dot(sdir_a, s17,
                                   preferred_element_type=jnp.float32,
                         precision="highest")
            tot17_ref[:] = jnp.dot(sfd_a, s17,
                                   preferred_element_type=jnp.float32,
                         precision="highest")
            up17_ref[:] = jnp.dot(sfu_a, s17,
                                  preferred_element_type=jnp.float32,
                         precision="highest")
    return kernel


def _sfc_sel_mat():
    """[G, 17] selection matrix: 14 band one-hots, then the nir/par/uvr
    band-9-split selections (spcvmc.F90:520-556)."""
    ngb = _NGB14
    onehot = np.eye(14, dtype=np.float32)[ngb - 1]
    nir_sel = ((ngb <= 8) | (ngb == 14)).astype(np.float32) \
        + 0.5 * (ngb == 9)
    par_sel = ((ngb >= 10) & (ngb <= 11)).astype(np.float32) \
        + 0.5 * (ngb == 9)
    uvr_sel = ((ngb >= 12) & (ngb <= 13)).astype(np.float32)
    return jnp.asarray(np.concatenate(
        [onehot, nir_sel[:, None], par_sel[:, None], uvr_sel[:, None]],
        axis=1))


def spcvmc_fast(coefs, taug, taur, sfluxzen, mu0, albdir, albdif,
                cldymc, taucmc, ssacmc, asmcmc,
                taua=None, ssaa=None, asya=None, adjflux=1.0,
                block_cols=128, lps=_LPS, interpret=None,
                layer_major=False):
    """Drop-in replacement for spcvmc.spcvmc_sw using Pallas kernels.

    Same contract as spcvmc_sw (TOA-first; albdir/albdif [ncol, 14]).
    cldymc is implied by taucmc > 0 (cldprmc floors cloudy cells).

    layer_major=True flips the five g-point inputs (taug, taur, and the
    McICA cloud optics) to [nlay, ncol, ngpt] — the layout the
    production kernels emit natively — eliminating every XLA relayout
    copy between taumol/McICA and this solver. Aerosol optics keep
    their [ncol, nlay, 14] shapes (14/112 of the g-array size; swapped
    here).
    """
    del coefs, cldymc
    dtype = taug.dtype
    if layer_major:
        nlay, ncol, ngpt = taug.shape
    else:
        ncol, nlay, ngpt = taug.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mu0c = jnp.maximum(mu0, 1e-4)

    aero = taua is not None
    C = min(block_cols, max(8, ncol))
    npad = (-ncol) % C
    lpad = (-nlay) % lps
    nlayp = nlay + lpad
    nc = ncol + npad
    nb = nc // C
    nsteps = nlayp // lps

    if layer_major:
        def padl(x):
            return jnp.pad(x, [(0, lpad), (0, npad)] + [(0, 0)]
                           * (x.ndim - 2))
        if aero:
            taua, ssaa, asya = (jnp.swapaxes(x, 0, 1)
                                for x in (taua, ssaa, asya))
    else:
        def padl(x):
            return jnp.pad(x, [(0, npad), (0, lpad)] + [(0, 0)]
                           * (x.ndim - 2))

    taug_p, taur_p = padl(taug), padl(taur)
    aero_in = [padl(x) for x in (taua, ssaa, asya)] if aero else []
    tcm_p, scm_p, acm_p = map(padl, (taucmc, ssacmc, asmcmc))
    ngb = _NGB14
    adir_g = jnp.pad(albdir[..., ngb - 1], [(0, npad), (0, 0)])
    adif_g = jnp.pad(albdif[..., ngb - 1], [(0, npad), (0, 0)])
    mu0_p = jnp.pad(mu0c, (0, npad), constant_values=1.0)[:, None]
    zincflx = jnp.pad(adjflux * sfluxzen * mu0c[:, None],
                      [(0, npad), (0, 0)])
    uvm = jnp.broadcast_to(
        jnp.asarray(((ngb >= 10) & (ngb <= 13)), dtype), (1, ngpt))
    nim = jnp.broadcast_to(
        jnp.asarray(((ngb <= 9) | (ngb == 14)), dtype), (1, ngpt))

    band_g0 = tuple(int(x) for x in _G0)
    f32 = jnp.float32
    col_g = pl.BlockSpec((C, ngpt), lambda b, l: (b, 0))
    col1 = pl.BlockSpec((C, 1), lambda b, l: (b, 0))
    row_g = pl.BlockSpec((1, ngpt), lambda b, l: (0, 0))
    # up pass visits chunks bottom-up
    if layer_major:
        rev = lambda b, l: (nsteps - 1 - l, b, 0)
        rev_lay = pl.BlockSpec((lps, C, ngpt), rev)
        rev_lay14 = pl.BlockSpec((lps, C, 14), rev)
    else:
        rev = lambda b, l: (b, nsteps - 1 - l, 0)
        rev_lay = pl.BlockSpec((C, lps, ngpt), rev)
        rev_lay14 = pl.BlockSpec((C, lps, 14), rev)
    # composite storage is layer-major [nlayp, nc, ngpt]; the R/T+dbt
    # slabs keep the kernel's compute layout ((C, lps, G), or
    # (lps, C, G) in layer_major mode), stacked on a leading field
    # axis (0: ref, 1: tra, 2: refd, 3: trad, 4: dbt)
    rev_pr = pl.BlockSpec((lps, C, ngpt),
                          lambda b, l: (nsteps - 1 - l, b, 0))
    pr_shape = jax.ShapeDtypeStruct((nlayp, nc, ngpt), f32)
    if layer_major:
        rev_rt = pl.BlockSpec((5, lps, C, ngpt),
                              lambda b, l: (0, nsteps - 1 - l, b, 0))
        rt_shape = jax.ShapeDtypeStruct((5, nlayp, nc, ngpt), f32)
    else:
        rev_rt = pl.BlockSpec((5, C, lps, ngpt),
                              lambda b, l: (0, b, nsteps - 1 - l, 0))
        rt_shape = jax.ShapeDtypeStruct((5, nc, nlayp, ngpt), f32)

    pru_a, prd_a, pru_c, prd_c, rt_c, rt_a = pl.pallas_call(
        _make_up_kernel(band_g0, lps, aero, layer_major),
        grid=(nb, nsteps),
        in_specs=[rev_lay, rev_lay]
        + ([rev_lay14] * 3 if aero else [])
        + [rev_lay, rev_lay, rev_lay, col_g, col_g, col1],
        out_specs=[rev_pr, rev_pr, rev_pr, rev_pr, rev_rt, rev_rt],
        out_shape=[pr_shape] * 4 + [rt_shape] * 2,
        scratch_shapes=[pltpu.VMEM((C, ngpt), f32) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(taug_p, taur_p, *aero_in, tcm_p, scm_p, acm_p,
      adir_g, adif_g, mu0_p)

    fwd_pr = pl.BlockSpec((lps, C, ngpt), lambda b, l: (l, b, 0))
    if layer_major:
        fwd_rt = pl.BlockSpec((5, lps, C, ngpt),
                              lambda b, l: (0, l, b, 0))
    else:
        fwd_rt = pl.BlockSpec((5, C, lps, ngpt),
                              lambda b, l: (0, b, l, 0))
    # per-level aggregated outputs: [nb, nlayp, C] so the block's last
    # dim equals the array's (legal for any C); reassembled below
    trow = pl.BlockSpec((1, lps, C), lambda b, l: (b, l, 0))
    lev_shape = jax.ShapeDtypeStruct((nb, nlayp, C), f32)
    col17 = pl.BlockSpec((C, 17), lambda b, l: (b, 0))
    sfc_spec = pl.BlockSpec((C, 14), lambda b, l: (b, 0))

    outs = pl.pallas_call(
        _make_down_kernel(band_g0, lps, layer_major),
        grid=(nb, nsteps),
        in_specs=[col_g, col_g,
                  col_g, row_g, row_g,
                  pl.BlockSpec((ngpt, 17), lambda b, l: (0, 0)),
                  fwd_pr, fwd_pr, fwd_pr, fwd_pr, fwd_rt, fwd_rt],
        out_specs=[trow] * 14 + [sfc_spec, col17, col17, col17],
        out_shape=[lev_shape] * 14 + [
            jax.ShapeDtypeStruct((nc, 14), f32),
            jax.ShapeDtypeStruct((nc, 17), f32),
            jax.ShapeDtypeStruct((nc, 17), f32),
            jax.ShapeDtypeStruct((nc, 17), f32)],
        scratch_shapes=[pltpu.VMEM((C, ngpt), f32) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(adir_g, adif_g, zincflx, uvm, nim, _sfc_sel_mat(),
      pru_a, prd_a, pru_c, prd_c, rt_c, rt_a)

    (bbfu_b, bbfd_b, bbcu_b, bbcd_b, bbfdir_b, bbcdir_b,
     uvfd_b, uvcd_b, uvfdir_b, uvcdir_b,
     nifd_b, nicd_b, nifdir_b, nicdir_b,
     sfc, dir17, tot17, up17) = outs

    def levels(body, sfc_col):
        flat = jnp.moveaxis(body, 0, 1).reshape(nlayp, nc)
        return jnp.concatenate(
            [flat[:nlay, :ncol].T, sfc_col[:ncol, None]], axis=1)

    out = dict(
        bbfu=levels(bbfu_b, sfc[:, 0]), bbfd=levels(bbfd_b, sfc[:, 1]),
        bbcu=levels(bbcu_b, sfc[:, 2]), bbcd=levels(bbcd_b, sfc[:, 3]),
        bbfddir=levels(bbfdir_b, sfc[:, 4]),
        bbcddir=levels(bbcdir_b, sfc[:, 5]),
        uvfd=levels(uvfd_b, sfc[:, 6]), uvcd=levels(uvcd_b, sfc[:, 7]),
        uvfddir=levels(uvfdir_b, sfc[:, 8]),
        uvcddir=levels(uvcdir_b, sfc[:, 9]),
        nifd=levels(nifd_b, sfc[:, 10]), nicd=levels(nicd_b, sfc[:, 11]),
        nifddir=levels(nifdir_b, sfc[:, 12]),
        nicddir=levels(nicdir_b, sfc[:, 13]))
    dir17 = dir17[:ncol]
    tot17 = tot17[:ncol]
    up17 = up17[:ncol]
    out["drband"] = dir17[:, :14]
    out["fndsbnd"] = tot17[:, :14] - up17[:, :14]
    out["dfband"] = tot17[:, :14] - dir17[:, :14]
    out["nirr"] = dir17[:, 14]
    out["nirf"] = tot17[:, 14]
    out["parr"] = dir17[:, 15]
    out["parf"] = tot17[:, 15]
    out["uvrr"] = dir17[:, 16]
    out["uvrf"] = tot17[:, 16]
    return out
