"""Pallas TPU kernel for RRTMG-LW rtrnmc (fused radiative-transfer sweeps).

Re-implementation of rtrnmc (rrtmg_lw_rtrnmc.F90:27-392) as two streaming
Pallas kernels. The jnp version (rtrnmc.py) materializes ~14 [ncol, nlay,
140] HBM temporaries between the elementwise prep and the lax.scan sweeps;
here each (column-block, layer-chunk) grid step reads one 8-layer slab of
taug/pfracs/taucmc, derives absorptivities and Planck sources in VMEM,
updates the carried radiances, and writes flux rows - taug is read twice
(down + up) and nothing per-g ever returns to HBM.

Mosaic requires the last two block dims to tile as (8k, 128k) or equal the
array dims, so grid steps cover 8 layers each (python-unrolled inside the
kernel) and the per-level flux outputs are produced layer-major
[nlay_padded, ncol] and transposed outside. nlay is padded up to a multiple
of 8 with zero-tau layers, which are exact no-ops for both sweeps
(absorptivity 0 leaves the carried radiance unchanged).

Layer ordering is TOA-first, matching rtrnmc.py. The up-sweep revisits the
layer chunks in reverse via the BlockSpec index map and walks each chunk
bottom-up.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables_lw import NG_LW

_LPS = 8                                           # layers per grid step

_WTDIFF = 0.5
_FLUXFAC = np.pi * 2.0e4
_WAVENUM1 = np.array([10., 350., 500., 630., 700., 820., 980., 1080.,
                      1180., 1390., 1480., 1800., 2080., 2250., 2380., 2600.])
_WAVENUM2 = np.array([350., 500., 630., 700., 820., 980., 1080., 1180.,
                      1390., 1480., 1800., 2080., 2250., 2380., 2600., 3250.])
_NGB = np.repeat(np.arange(16), NG_LW)
_DELWAVE_G = np.asarray(
    ((_WAVENUM2 - _WAVENUM1) * _WTDIFF * _FLUXFAC)[_NGB], np.float32)
_E16 = np.eye(16, dtype=np.float32)[_NGB]          # [140, 16] band scatter

_A0 = np.array([1.66, 1.55, 1.58, 1.66, 1.54, 1.454, 1.89, 1.33,
                1.668, 1.66, 1.66, 1.66, 1.66, 1.66, 1.66, 1.66])
_A1 = np.array([0.00, 0.25, 0.22, 0.00, 0.13, 0.446, -0.10, 0.40,
                -0.006, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00])
_A2 = np.array([0.00, -12.0, -11.7, 0.00, -0.72, -0.243, 0.19, -0.062,
                0.414, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00, 0.00])
_VARSEC = np.array([0., 1., 1., 0., 1., 1., 1., 1., 1., 0., 0., 0., 0.,
                    0., 0., 0.])


def _tfn(tau):
    tr = jnp.exp(-tau)
    safe = jnp.maximum(tau, 1e-9)
    direct = 1.0 - 2.0 * (1.0 / safe - tr / jnp.maximum(1.0 - tr, 1e-12))
    return jnp.where(tau < 0.06, tau / 6.0, direct)


def _layer_terms(secd, tg, pfr, tcm, blay_g, dpl_g):
    """Shared per-layer optics: effective absorptivity + Planck sources."""
    odepth = jnp.maximum(secd * tg, 0.0)
    odtot = odepth + secd * tcm
    agas = 1.0 - jnp.exp(-odepth)
    atot = 1.0 - jnp.exp(-odtot)
    bbgas = pfr * (blay_g + _tfn(odepth) * dpl_g)
    bbtot = pfr * (blay_g + _tfn(odtot) * dpl_g)
    cld = tcm > 0.0
    a_eff = jnp.where(cld, atot, agas)
    bb_eff = jnp.where(cld, bbtot, bbgas)
    return a_eff, bb_eff, agas, bbgas


def _make_down_kernel(layer_major=False):
    # layer_major: the g-point slabs arrive [lps, C, G] (blocks of the
    # [nlay, ncol, G] arrays the taumol/McICA kernels emit natively)
    # instead of [C, lps, G]; only the slab indexing changes.
    if layer_major:
        sl = lambda a, i: a[i]
        sb = lambda v: v[None, :, :]
    else:
        sl = lambda a, i: a[:, i, :]
        sb = lambda v: v[:, None, :]

    def kernel(dw_ref, e16_ref, secd_ref, taug_ref, pfr_ref, tcm_ref,
               cldy_ref, play_ref, plevn_ref,
               dflx_ref, dflxc_ref, rsfc_ref, rcsfc_ref, div_ref,
               radld, radclrd, div):
        l = pl.program_id(1)
        dw = dw_ref[:]
        e16 = e16_ref[:]

        @pl.when(l == 0)
        def _():
            radld[:] = jnp.zeros_like(radld)
            radclrd[:] = jnp.zeros_like(radclrd)
            div[:] = jnp.zeros_like(div)

        # per-layer optics vectorized over the whole [C, lps, G] slab
        # (the spcvmc_pallas lesson, r5): the transcendental-heavy
        # _layer_terms runs lps-wide, and only the cheap carried-
        # radiance recursion below walks layers serially
        play_slab = play_ref[:]                      # [C, lps, 16]
        blay_gs = jnp.dot(play_slab, e16.T,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        dpl_gs = jnp.dot(plevn_ref[:] - play_slab, e16.T,
                         preferred_element_type=jnp.float32,
                         precision="highest")
        a_eff_s, bbd_eff_s, agas_s, bbdgas_s = _layer_terms(
            sb(secd_ref[:]), taug_ref[:], pfr_ref[:],
            tcm_ref[:], blay_gs, dpl_gs)

        for i in range(_LPS):
            a_eff = sl(a_eff_s, i)
            bbd_eff = sl(bbd_eff_s, i)
            agas = sl(agas_s, i)
            bbdgas = sl(bbdgas_s, i)

            div_new = jnp.maximum(div[:], cldy_ref[i, :][:, None])
            radld_new = radld[:] + (bbd_eff - radld[:]) * a_eff
            radclr_new = jnp.where(div_new > 0.0,
                                   radclrd[:] + (bbdgas - radclrd[:]) * agas,
                                   radld_new)
            radld[:] = radld_new
            radclrd[:] = radclr_new
            div[:] = div_new
            dflx_ref[i, :] = jnp.sum(radld_new * dw, axis=1)
            dflxc_ref[i, :] = jnp.sum(radclr_new * dw, axis=1)

        rsfc_ref[:] = radld[:]
        rcsfc_ref[:] = radclrd[:]
        div_ref[:] = div[:]
    return kernel


def _make_up_kernel(i_sfc, dudts, layer_major=False):
    if layer_major:
        sl = lambda a, i: a[i]
        sb = lambda v: v[None, :, :]
    else:
        sl = lambda a, i: a[:, i, :]
        sb = lambda v: v[:, None, :]

    def kernel(dw_ref, e16_ref, secd_ref, taug_ref, pfr_ref, tcm_ref,
               play_ref, plevt_ref, semiss_ref, pbnd_ref, dpbnd_ref,
               rsfc_ref, rcsfc_ref, divany_ref,
               uflx_ref, uflxc_ref, du_ref, duc_ref,
               usfc_ref, ucsfc_ref, dusfc_ref, ducsfc_ref,
               olrb_ref, dolrb_ref,
               radlu, radclru, dlu, dclru):
        l = pl.program_id(1)
        nsteps = pl.num_programs(1)
        dw = dw_ref[:]
        e16 = e16_ref[:]

        @pl.when(l == 0)
        def _():
            # surface emission + reflection of the downward stream
            # (rrtmg_lw_rtrnmc.F90:344-352); i_sfc is the real bottom layer
            # inside this (possibly padded) chunk
            pf_sfc = sl(pfr_ref, i_sfc)
            rad0 = pf_sfc * jnp.dot(pbnd_ref[:], e16.T,
                                    preferred_element_type=jnp.float32,
                             precision="highest")
            refl_g = jnp.dot(1.0 - semiss_ref[:], e16.T,
                             preferred_element_type=jnp.float32,
                             precision="highest")
            d0 = pf_sfc * jnp.dot(dpbnd_ref[:], e16.T,
                                  preferred_element_type=jnp.float32,
                             precision="highest")
            radlu[:] = rad0 + refl_g * rsfc_ref[:]
            radclru[:] = rad0 + refl_g * rcsfc_ref[:]
            dlu[:] = d0
            dclru[:] = d0
            usfc_ref[:, 0] = jnp.sum(radlu[:] * dw, axis=1)
            ucsfc_ref[:, 0] = jnp.sum(radclru[:] * dw, axis=1)
            if dudts:
                dusfc_ref[:, 0] = jnp.sum(d0 * dw, axis=1)
                ducsfc_ref[:, 0] = jnp.sum(d0 * dw, axis=1)

        divany = divany_ref[:] > 0.0
        # slab-vectorized layer optics (see _make_down_kernel)
        play_slab = play_ref[:]
        blay_gs = jnp.dot(play_slab, e16.T,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        dpl_gs = jnp.dot(plevt_ref[:] - play_slab, e16.T,
                         preferred_element_type=jnp.float32,
                         precision="highest")
        a_eff_s, bbu_eff_s, agas_s, bbugas_s = _layer_terms(
            sb(secd_ref[:]), taug_ref[:], pfr_ref[:],
            tcm_ref[:], blay_gs, dpl_gs)
        for i in reversed(range(_LPS)):
            a_eff = sl(a_eff_s, i)
            bbu_eff = sl(bbu_eff_s, i)
            agas = sl(agas_s, i)
            bbugas = sl(bbugas_s, i)

            radlu_new = radlu[:] + (bbu_eff - radlu[:]) * a_eff
            radclru_new = jnp.where(
                divany, radclru[:] + (bbugas - radclru[:]) * agas, radlu_new)
            radlu[:] = radlu_new
            radclru[:] = radclru_new
            uflx_ref[i, :] = jnp.sum(radlu_new * dw, axis=1)
            uflxc_ref[i, :] = jnp.sum(radclru_new * dw, axis=1)
            if dudts:
                dlu_new = dlu[:] * (1.0 - a_eff)
                dclru_new = jnp.where(divany, dclru[:] * (1.0 - agas),
                                      dlu_new)
                dlu[:] = dlu_new
                dclru[:] = dclru_new
                du_ref[i, :] = jnp.sum(dlu_new * dw, axis=1)
                duc_ref[i, :] = jnp.sum(dclru_new * dw, axis=1)

        @pl.when(l == nsteps - 1)
        def _():
            olrb_ref[:] = jnp.dot(radlu[:] * dw, e16,
                                  preferred_element_type=jnp.float32,
                             precision="highest")
            if dudts:
                dolrb_ref[:] = jnp.dot(dlu[:] * dw, e16,
                                       preferred_element_type=jnp.float32,
                             precision="highest")
    return kernel


def _secdiff_g(pwvcm, dtype):
    sec_band = jnp.where(
        jnp.asarray(_VARSEC) > 0,
        jnp.clip(jnp.asarray(_A0, dtype) + jnp.asarray(_A1, dtype)
                 * jnp.exp(jnp.asarray(_A2, dtype) * pwvcm[:, None]),
                 1.5, 1.8),
        1.66)
    return sec_band[:, _NGB]


def rtrnmc_fast(semiss, taug, pfracs, cloudy, taucmc, planklay, planklev,
                plankbnd, dplankbnd_dts, pwvcm, dudts=True,
                block_cols=128, interpret=None, layer_major=False):
    """Drop-in replacement for rtrnmc.rtrnmc using Pallas kernels.

    Same shapes/contract as rtrnmc.rtrnmc (TOA-first). Columns are padded
    to a multiple of block_cols and layers to a multiple of 8 internally.

    layer_major=True flips the g-point input contract to the layout the
    production taumol/McICA kernels emit natively — taug/pfracs/taucmc
    [nlay, ncol, ngpt], cloudy [nlay, ncol] — so the whole LW pipeline
    runs without a single XLA relayout copy of a [*, *, ngpt] array.
    Per-column inputs (semiss, plank*, pwvcm) keep their [ncol, ...]
    shapes in both modes; the small planck arrays are transposed here.
    """
    if layer_major:
        nlay, ncol, ngpt = taug.shape
    else:
        ncol, nlay, ngpt = taug.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    C = min(block_cols, max(8, ncol))
    npad = (-ncol) % C
    lpad = (-nlay) % _LPS
    nlayp = nlay + lpad

    if layer_major:
        def padcl(x):                              # [nlay, ncol, ...]
            return jnp.pad(
                x, [(0, lpad), (0, npad)] + [(0, 0)] * (x.ndim - 2))
    else:
        def padcl(x):
            return jnp.pad(
                x, [(0, npad), (0, lpad)] + [(0, 0)] * (x.ndim - 2))

    semiss = jnp.pad(semiss, [(0, npad), (0, 0)])
    taug, pfracs, taucmc = map(padcl, (taug, pfracs, taucmc))
    cldy_f = padcl(cloudy.astype(jnp.float32))
    if layer_major:
        # planck inputs stay column-major at the interface ([ncol, *]
        # is what setcoef produces); [nlay, ncol, 16] copies are 16/140
        # the size of the g-arrays whose relayout this mode eliminates
        planklay = jnp.swapaxes(planklay, 0, 1)
        planklev = jnp.swapaxes(planklev, 0, 1)
        planklay = jnp.pad(planklay, [(0, lpad), (0, npad), (0, 0)])
        planklev = jnp.pad(planklev, [(0, lpad), (0, npad), (0, 0)])
    else:
        planklay = padcl(planklay)
        planklev = jnp.pad(planklev, [(0, npad), (0, lpad), (0, 0)])
    plankbnd = jnp.pad(plankbnd, [(0, npad), (0, 0)])
    dplankbnd_dts = jnp.pad(dplankbnd_dts, [(0, npad), (0, 0)])
    pwvcm = jnp.pad(pwvcm, (0, npad), constant_values=1.0)
    nc = ncol + npad
    nb = nc // C
    nsteps = nlayp // _LPS

    secd = _secdiff_g(pwvcm, jnp.float32)
    if layer_major:
        planklev_next = planklev[1:, :, :]
        planklev_top = planklev[:nlayp, :, :]
        cldy_t = cldy_f                              # [nlayp, nc]
    else:
        planklev_next = planklev[:, 1:, :]
        planklev_top = planklev[:, :nlayp, :]
        cldy_t = cldy_f.T                            # [nlayp, nc]

    dw_arr = jnp.asarray(_DELWAVE_G)[None, :]
    e16_arr = jnp.asarray(_E16)
    dw_spec = pl.BlockSpec((1, ngpt), lambda b, l: (0, 0))
    e16_spec = pl.BlockSpec((ngpt, 16), lambda b, l: (0, 0))
    if layer_major:
        lay_spec = pl.BlockSpec((_LPS, C, ngpt), lambda b, l: (l, b, 0))
        lay16 = pl.BlockSpec((_LPS, C, 16), lambda b, l: (l, b, 0))
    else:
        lay_spec = pl.BlockSpec((C, _LPS, ngpt), lambda b, l: (b, l, 0))
        lay16 = pl.BlockSpec((C, _LPS, 16), lambda b, l: (b, l, 0))
    col_spec = pl.BlockSpec((C, ngpt), lambda b, l: (b, 0))
    col16 = pl.BlockSpec((C, 16), lambda b, l: (b, 0))
    col1 = pl.BlockSpec((C, 1), lambda b, l: (b, 0))
    trow = pl.BlockSpec((_LPS, C), lambda b, l: (l, b))   # layer-major out

    f32 = jnp.float32
    down_out = [
        jax.ShapeDtypeStruct((nlayp, nc), f32),   # dflx at levels 1..nlay
        jax.ShapeDtypeStruct((nlayp, nc), f32),
        jax.ShapeDtypeStruct((nc, ngpt), f32),    # radld at surface
        jax.ShapeDtypeStruct((nc, ngpt), f32),
        jax.ShapeDtypeStruct((nc, 1), f32),       # diverged-any flag
    ]
    dflx_b, dflxc_b, rsfc, rcsfc, divany = pl.pallas_call(
        _make_down_kernel(layer_major),
        grid=(nb, nsteps),
        in_specs=[dw_spec, e16_spec, col_spec, lay_spec, lay_spec,
                  lay_spec, trow, lay16, lay16],
        out_specs=[trow, trow, col_spec, col_spec, col1],
        out_shape=down_out,
        scratch_shapes=[pltpu.VMEM((C, ngpt), f32),
                        pltpu.VMEM((C, ngpt), f32),
                        pltpu.VMEM((C, 1), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dw_arr, e16_arr, secd, taug, pfracs, taucmc, cldy_t, planklay,
      planklev_next)

    def rev3(block, last):
        return pl.BlockSpec(block,
                            lambda b, l: (b, nsteps - 1 - l, 0))

    if layer_major:
        rev_lay = pl.BlockSpec((_LPS, C, ngpt),
                               lambda b, l: (nsteps - 1 - l, b, 0))
        rev16 = pl.BlockSpec((_LPS, C, 16),
                             lambda b, l: (nsteps - 1 - l, b, 0))
    else:
        rev_lay = pl.BlockSpec((C, _LPS, ngpt),
                               lambda b, l: (b, nsteps - 1 - l, 0))
        rev16 = pl.BlockSpec((C, _LPS, 16),
                             lambda b, l: (b, nsteps - 1 - l, 0))
    rev_trow = pl.BlockSpec((_LPS, C), lambda b, l: (nsteps - 1 - l, b))
    i_sfc = _LPS - 1 - lpad                      # real bottom layer in chunk

    up_out = [
        jax.ShapeDtypeStruct((nlayp, nc), f32),   # uflx at levels 0..nlay-1
        jax.ShapeDtypeStruct((nlayp, nc), f32),
        jax.ShapeDtypeStruct((nlayp, nc), f32),
        jax.ShapeDtypeStruct((nlayp, nc), f32),
        jax.ShapeDtypeStruct((nc, 1), f32),       # surface values
        jax.ShapeDtypeStruct((nc, 1), f32),
        jax.ShapeDtypeStruct((nc, 1), f32),
        jax.ShapeDtypeStruct((nc, 1), f32),
        jax.ShapeDtypeStruct((nc, 16), f32),      # band OLR
        jax.ShapeDtypeStruct((nc, 16), f32),
    ]
    (uflx_b, uflxc_b, du_b, duc_b, usfc, ucsfc, dusfc, ducsfc,
     olrb, dolrb) = pl.pallas_call(
        _make_up_kernel(i_sfc, dudts, layer_major),
        grid=(nb, nsteps),
        in_specs=[dw_spec, e16_spec, col_spec, rev_lay, rev_lay, rev_lay,
                  rev16, rev16, col16, col16, col16,
                  col_spec, col_spec, col1],
        out_specs=[rev_trow, rev_trow, rev_trow, rev_trow,
                   col1, col1, col1, col1,
                   col16, col16],
        out_shape=up_out,
        scratch_shapes=[pltpu.VMEM((C, ngpt), f32),
                        pltpu.VMEM((C, ngpt), f32),
                        pltpu.VMEM((C, ngpt), f32),
                        pltpu.VMEM((C, ngpt), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dw_arr, e16_arr, secd, taug, pfracs, taucmc, planklay, planklev_top,
      semiss, plankbnd, dplankbnd_dts, rsfc, rcsfc, divany)

    zeros = jnp.zeros((ncol, 1), f32)
    uflx_body = uflx_b[:nlay, :ncol].T
    dflx_body = dflx_b[:nlay, :ncol].T
    out = dict(
        uflx=jnp.concatenate([uflx_body, usfc[:ncol]], axis=1),
        dflx=jnp.concatenate([zeros, dflx_body], axis=1),
        uflxc=jnp.concatenate([uflxc_b[:nlay, :ncol].T, ucsfc[:ncol]],
                              axis=1),
        dflxc=jnp.concatenate([zeros, dflxc_b[:nlay, :ncol].T], axis=1),
        olrb=olrb[:ncol])
    if dudts:
        out["duflx_dts"] = jnp.concatenate(
            [du_b[:nlay, :ncol].T, dusfc[:ncol]], axis=1)
        out["duflxc_dts"] = jnp.concatenate(
            [duc_b[:nlay, :ncol].T, ducsfc[:ncol]], axis=1)
        out["dolrb_dts"] = dolrb[:ncol]
    return out
