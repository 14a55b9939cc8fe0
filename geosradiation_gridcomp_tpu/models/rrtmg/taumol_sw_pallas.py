"""Fused TPU taumol-SW: transposed-space Pallas kernel (no gathers).

Same design as taumol_lw_pallas (see its banner): cells on the 128-lane
axis, one fac-folded one-hot matmul per regime against the packed
[300, 1280] k-table (rrtmg_sw_taumol.F90:27-2086 data), per-band eta
weights expanded through a 0/1 block diagonal, continua/gray
absorbers/Rayleigh as small-K contractions. SW is simpler than LW: the
eta weights are identical for the (jp,jt) and (jp+1,jt1) rows, so ONE
4-nonzero one-hot dot per regime replaces LW's two; there are no Planck
fractions.

Matmuls are manual bf16x3 (tables pre-split hi/lo; ~2^-16 relative);
0/1 tables skip the lo pass. The solar source (sfluxzen) stays in the
XLA wrapper (per-column, needs the layer axis for laysolfr).

Matches taumol_sw_ref to ~5e-5 relative; gated on-chip by
tools/verify_tpu.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables_sw import (sw_gather_tables, NG_SW, NGPTSW, NGS_SW,
                        SW2_BANDS, SWS_BANDS, SW2_OFF, SW_SPP,
                        SW_NROW_LOWER, SW_NROWS, SW_PAIR, SW_UPPER2,
                        SW_UPPER1, SW_LOWER1)
from .taumol_sw import _eta

_CBLK = 512
_WSW = 10 * SW_SPP              # 1280: 9 eta sections + ss


def _bf_split(a):
    import ml_dtypes
    hi = a.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = a - hi
    return (hi, None) if not lo.any() else (hi, lo)


@functools.lru_cache(maxsize=1)
def _kernel_tables():
    gt = sw_gather_tables()
    big = gt["big"]                                  # [300, 1280]
    a_low = np.ascontiguousarray(big[0:SW_NROW_LOWER + 6])   # [71, W]
    a_up = np.ascontiguousarray(big[SW_NROW_LOWER:])         # [235, W]

    # eta-weight block diagonal: row e*8 + band -> section e lanes
    bd = np.zeros((72, _WSW), np.float32)
    for e in range(9):
        for i, b in enumerate(SW2_BANDS):
            off = SW2_OFF[b]
            bd[e * 8 + i, e * SW_SPP + off: e * SW_SPP + off
               + NG_SW[b - 16]] = 1.0

    seg_sws = np.zeros((5, SW_SPP), np.float32)
    seg_sws[:, :] = gt["seg_sws"]
    scat_sw2 = np.asarray(gt["scat_sw2"], np.float32)    # [128, 112]
    scat_sws = np.asarray(gt["scat_sws"], np.float32)
    self10 = np.asarray(gt["self10"], np.float32)        # [10, 112]
    for4 = np.asarray(gt["for4"], np.float32)            # [4, 112]
    gray = gt["gray"]
    gray_tab = np.stack([gray["ch4_both"], gray["o3_lo"], gray["o3_hi"],
                         gray["co2_lo"], gray["h2o_hi"],
                         gray["o2cont"]]).astype(np.float32)  # [6, 112]
    # band-24 lower Rayleigh: [9, 112] (rayla columns at band-24 lanes)
    rayl24 = np.zeros((9, NGPTSW), np.float32)
    rayl24[:, NGS_SW[8]:NGS_SW[9]] = gt["rayla24"]
    raylvec = np.asarray(gt["raylvec"], np.float32)[:, None]
    raylb24 = np.asarray(gt["raylb24"], np.float32)[:, None]
    m_lo = np.asarray(gt["mask_self_lo"], np.float32)[:, None]
    m_hi = np.asarray(gt["mask_for_hi"], np.float32)[:, None]

    tabs = {k: _bf_split(v) for k, v in dict(
        a_low=a_low, a_up=a_up, bd=bd, seg_sws=seg_sws,
        scat_sw2=scat_sw2, scat_sws=scat_sws, self10=self10,
        for4=for4, gray_tab=gray_tab, rayl24=rayl24).items()}
    tabs["raylvec"] = (raylvec, None)
    tabs["raylb24"] = (raylb24, None)
    tabs["m_lo"] = (m_lo, None)
    tabs["m_hi"] = (m_hi, None)
    return tabs


_TABLE_KEYS = ("a_low", "a_up", "bd", "seg_sws", "scat_sw2", "scat_sws",
               "self10", "for4", "gray_tab", "rayl24", "raylvec",
               "raylb24", "m_lo", "m_hi")

_CELL_ORDER = ("weta", "rows", "facs", "colv5", "lowm", "wsf", "gcols",
               "w24", "colmol")


def _make_kernel(split_flags, cell_major=False):
    # cell_major: write [C, NGPTSW] tiles via Mosaic's (free) in-kernel
    # transpose so the layer-major production layout needs no XLA
    # relayout copies (see taumol_lw_pallas._make_kernel)
    def kernel(*refs):
        cells = dict(zip(_CELL_ORDER, refs[:len(_CELL_ORDER)]))
        it = iter(refs[len(_CELL_ORDER):-2])
        tabs = {}
        for k in _TABLE_KEYS:
            hi = next(it)
            lo = next(it) if split_flags[k] else None
            tabs[k] = (hi, lo)
        taug_ref, taur_ref = refs[-2:]

        f32 = jnp.float32
        C = cells["rows"].shape[1]
        lowm = cells["lowm"][0:1, :]
        upm = 1.0 - lowm
        has_low = jnp.max(lowm) > 0.0
        has_up = jnp.max(upm) > 0.0

        def dg(t, w):
            return lax.dot_general(
                t, w, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.DEFAULT)

        def tdot(key, w):
            t_hi, t_lo = tabs[key][0][:], tabs[key][1]
            w_hi = w.astype(jnp.bfloat16).astype(f32)
            w_lo = w - w_hi
            out = dg(t_hi, w_hi) + dg(t_hi, w_lo)
            if t_lo is not None:
                out = out + dg(t_lo[:], w_hi)
            return out

        def onehot4(iota, m):
            acc = jnp.zeros(iota.shape, f32)
            for d in range(4):
                r = cells["rows"][d:d + 1, :]
                f = cells["facs"][d:d + 1, :] * m
                acc = acc + jnp.where(iota == r, f, 0.0)
            return acc

        zw = jnp.zeros((_WSW, C), f32)
        u_low = lax.cond(
            has_low,
            lambda: tdot("a_low", onehot4(
                lax.broadcasted_iota(jnp.int32, (71, C), 0), lowm)),
            lambda: zw)
        u_up = lax.cond(
            has_up,
            lambda: tdot("a_up", onehot4(
                lax.broadcasted_iota(jnp.int32, (235, C), 0)
                + SW_NROW_LOWER, upm)),
            lambda: zw)
        u = u_low + u_up                                 # [_WSW, C]

        wexp = tdot("bd", cells["weta"][:])              # [_WSW, C]
        s = wexp * u
        acc2 = jnp.zeros((SW_SPP, C), f32)
        for e in range(9):
            acc2 = acc2 + s[e * SW_SPP:(e + 1) * SW_SPP, :]
        colvec = tdot("seg_sws", cells["colv5"][:])      # [128, C]
        acc_ss = colvec * u[9 * SW_SPP:, :]

        taug = tdot("scat_sw2", acc2) + tdot("scat_sws", acc_ss)

        # continua: self (lower only, lo_f folded in prep) + foreign
        # (both regimes, per-gpt masks)
        sf = tdot("self10", cells["wsf"][0:10, :])
        ff = tdot("for4", cells["wsf"][10:14, :])
        m_lo = tabs["m_lo"][0][:]
        m_hi = tabs["m_hi"][0][:]
        taug = taug + sf * m_lo + ff * (lowm * m_lo + upm * m_hi)

        # gray absorbers (regime folded into gcols rows in prep)
        taug = taug + tdot("gray_tab", cells["gcols"][:])

        # Rayleigh
        r24 = tdot("rayl24", cells["w24"][:])
        taur = cells["colmol"][0:1, :] * (
            tabs["raylvec"][0][:] + upm * tabs["raylb24"][0][:] + r24)
        if cell_major:
            taug_ref[:] = taug.T
            taur_ref[:] = taur.T
        else:
            taug_ref[:] = taug
            taur_ref[:] = taur

    return kernel


def _taumol_sw_pallas(cell_inputs, interpret, cell_major=False):
    kt = _kernel_tables()
    n = cell_inputs["rows"].shape[1]
    C = _CBLK
    npad = (-n) % C
    if npad:
        cell_inputs = {
            k: jnp.pad(v, ((0, 0), (0, npad)),
                       constant_values=1.0 if k == "lowm" else 0.0)
            for k, v in cell_inputs.items()}
    nb = (n + npad) // C

    split_flags = {k: kt[k][1] is not None for k in _TABLE_KEYS}
    ins = [cell_inputs[k] for k in _CELL_ORDER]
    in_specs = [pl.BlockSpec((x.shape[0], C), lambda b: (0, b))
                for x in ins]
    tables = []
    for k in _TABLE_KEYS:
        hi, lo = kt[k]
        tables.append(jnp.asarray(hi))
        in_specs.append(pl.BlockSpec(
            hi.shape, lambda b, _s=len(hi.shape): (0,) * _s))
        if lo is not None:
            tables.append(jnp.asarray(lo))
            in_specs.append(pl.BlockSpec(
                lo.shape, lambda b, _s=len(lo.shape): (0,) * _s))
    if cell_major:
        out_specs = [pl.BlockSpec((C, NGPTSW), lambda b: (b, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((n + npad, NGPTSW),
                                          jnp.float32)] * 2
    else:
        out_specs = [pl.BlockSpec((NGPTSW, C), lambda b: (0, b))] * 2
        out_shape = [jax.ShapeDtypeStruct((NGPTSW, n + npad),
                                          jnp.float32)] * 2
    taug, taur = pl.pallas_call(
        _make_kernel(split_flags, cell_major),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins, *tables)
    if cell_major:
        return taug[:n], taur[:n]
    return taug[:, :n], taur[:, :n]


def _tent_t(js, fs, K):
    d = jnp.arange(K)[:, None] - (js[None, :] - 1)
    return (jnp.where(d == 0, (1.0 - fs)[None, :], 0.0)
            + jnp.where(d == 1, fs[None, :], 0.0))


def taumol_sw_pallas(c, svw=None, interpret=None, layer_major=False):
    """Drop-in taumol_sw: (taug, taur [ncol, nlay, 112], sflux [ncol, 112]).

    layer_major=True returns taug/taur as [nlay, ncol, 112] — the
    layout the kernel emits natively (free reshape of its cell-major
    output), consumed zero-copy by spcvmc_fast."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ncol, nlay = c.jp.shape
    n = ncol * nlay
    f32 = jnp.float32

    # layer-major flat cells (blocks one side of the tropopause)
    def fl(x):
        if hasattr(x, "ndim") and x.ndim >= 2 \
                and x.shape[:2] == (ncol, nlay):
            return jnp.moveaxis(x, 1, 0).reshape(
                (n,) + x.shape[2:])
        return x

    cf = jax.tree_util.tree_map(fl, c)
    lower = cf.lower
    lo_f = lower.astype(f32)
    hi_f = 1.0 - lo_f

    def col(gas):
        if gas == "o2x":
            return cf.colo2 * 1.6
        return getattr(cf, "col" + gas)

    # per-band eta weights [9, N] -> rows e*8 + band
    e0col = (jnp.arange(9)[:, None] == 0).astype(f32)
    wbands = []
    for b in SW2_BANDS:
        g1, g2, strrat = SW_PAIR[b]
        sc, js, fs = _eta(col(g1), col(g2), strrat, 8.0)
        wl = sc[None, :] * _tent_t(js, fs, 9)
        if b in SW_UPPER2:
            scu, jsu, fsu = _eta(col(g1), col(g2), strrat, 4.0)
            wu = scu[None, :] * _tent_t(jsu, fsu, 9)
        elif b in SW_UPPER1:
            wu = col(SW_UPPER1[b])[None, :] * e0col
        else:
            wu = jnp.zeros((9, n), f32)
        wbands.append(jnp.where(lo_f[None, :] > 0.0, wl, wu))
    weta = jnp.stack(wbands, axis=1).reshape(72, n)      # [72, N]

    jp = cf.jp
    rbase0 = jnp.where(lower, 5 * (jp - 1),
                       SW_NROW_LOWER + 5 * jnp.clip(jp - 13, 0, 46)) \
        + cf.jt - 1
    rbase1 = jnp.where(lower, 5 * jnp.clip(jp, 1, 13),
                       SW_NROW_LOWER + 5 * jnp.clip(jp - 12, 1, 46)) \
        + cf.jt1 - 1
    rows = jnp.stack([jnp.clip(rbase0, 0, SW_NROWS - 1),
                      jnp.clip(rbase0 + 1, 0, SW_NROWS - 1),
                      jnp.clip(rbase1, 0, SW_NROWS - 1),
                      jnp.clip(rbase1 + 1, 0, SW_NROWS - 1)],
                     axis=0).astype(jnp.int32)
    facs = jnp.stack([cf.fac00, cf.fac10, cf.fac01, cf.fac11], axis=0)

    colv5 = jnp.stack(
        [jnp.where(lower, col(SW_LOWER1[b]),
                   col(SW_UPPER1[b]) if b in SW_UPPER1
                   else jnp.zeros_like(cf.colh2o))
         for b in SWS_BANDS], axis=0)                    # [5, N]

    wsf = jnp.concatenate(
        [_tent_t(cf.indself, cf.selffrac, 10)
         * (cf.selffac * cf.colh2o * lo_f)[None, :],
         _tent_t(cf.indfor, cf.forfrac, 4)
         * (cf.forfac * cf.colh2o)[None, :],
         jnp.zeros((2, n), f32)], axis=0)                # [16, N]

    gcols = jnp.stack([cf.colch4, cf.colo3 * lo_f, cf.colo3 * hi_f,
                       cf.colco2 * lo_f, cf.colh2o * hi_f, cf.colo2],
                      axis=0)                            # [6, N]

    g1, g2, strrat = SW_PAIR[24]
    _, js24, fs24 = _eta(col(g1), col(g2), strrat, 8.0)
    w24 = _tent_t(js24, fs24, 9) * lo_f[None, :]         # [9, N]

    cell_inputs = dict(weta=weta, rows=rows, facs=facs, colv5=colv5,
                       lowm=lo_f[None, :], wsf=wsf, gcols=gcols,
                       w24=w24, colmol=cf.colmol[None, :])
    taug_t, taur_t = _taumol_sw_pallas(cell_inputs, interpret,
                                       cell_major=True)
    # cell-major [N, g] outputs; cells are layer-major, so this is a
    # free bitcast to [nlay, ncol, g]
    taug = taug_t.reshape(nlay, ncol, NGPTSW)
    taur = taur_t.reshape(nlay, ncol, NGPTSW)
    if not layer_major:
        taug = jnp.swapaxes(taug, 0, 1)
        taur = jnp.swapaxes(taur, 0, 1)

    # solar source (cheap, [ncol, 112]; needs the layer axis for
    # laysolfr) — shared with the gather engine
    from .taumol_sw import sfluxzen_only
    return taug, taur, sfluxzen_only(c, svw)
