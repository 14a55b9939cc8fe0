"""Fused TPU taumol-LW: one transposed-space Pallas kernel, no gathers.

Round-3's taumol_lw gathers four wide rows ([ncells, 1216]) per cell
from the packed k-table and re-reads them in a 9-eta epilogue (~21 ms at
2048x72 on v5e, gather-bound). Two structural decisions here:

  * EVERYTHING runs in TRANSPOSED space: cells live on the 128-lane
    axis, spectral/table axes on sublanes. Cell weights are [w, N]
    arrays (w <= 81 rows, N = ncol*nlay lanes) — built in XLA with
    full-lane tiles (the [N, w] layout this replaced spent ~12 ms in
    lane-sliver concatenate/pad/scatter fusions running at 26 GB/s) —
    and every table contraction is dot_general(table [K, L],
    weights [K, C]) -> [L, C] on the MXU.
  * the (jp,jt)/(jp+1,jt1) pressure-temperature interpolation is a
    fac-folded one-hot matmul per temperature side ([71, C] one-hots
    against the [71, 1216] lower / [235, 448] upper k-tables); per-PAIR
    eta weights expand through 0/1 block-diagonal matmuls; minors,
    continua, Planck fractions, halocarbons all contract the same way.
    Matmul precision is a manual bf16x3: tables pre-split into hi+lo
    bf16 halves, weights split in-kernel, 3 DEFAULT MXU passes
    (w_hi@t_hi + w_lo@t_hi + w_hi@t_lo, ~2^-16 relative) — HIGHEST's 6
    passes doubled the kernel cost for accuracy far beyond the 5e-4
    gates. 0/1 tables (block diagonals, scatter maps) skip the t_lo
    pass.

Cells are LAYER-major so a 256-cell block sits entirely on one side of
the tropopause and lax.cond skips the wrong-regime dots.

Matches taumol_lw (the gather engine, itself parity-tested against
taumol_lw_ref / rrtmg_lw_taumol.F90:158-3149) to ~5e-5 relative; gated
on-chip by tools/verify_tpu.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables_lw import (lw_gather_tables, lw_gather_tables_padded,
                        NG_LW, NGS_LW, NGPTLW, SP2_BANDS, SS_BANDS,
                        SP2_OFF, SS_OFF, SP2_W, SS_W, NROW_LOWER, NROWS)
from .taumol_lw import (_CHI, _ONEMINUS, _col, _lw_static,
                        _PAIRS_LOWER, _PLANCK_LO, _PLANCK_UP)

_CBLK = 512                     # cells per kernel block (lane axis)

# pair-major band order: bands sharing a lower eta-pair are contiguous,
# so the per-eta weight expansion needs only 5 scalars per cell (pairs),
# not 9 (bands)
_PAIR_ORDER = ["hc", "ho", "hm", "hn", "nc"]
_PAIR_BANDS = {"hc": [3, 4, 5, 12], "ho": [7], "hm": [9, 16],
               "hn": [13], "nc": [15]}
_PO_BANDS = [b for p in _PAIR_ORDER for b in _PAIR_BANDS[p]]
_PO_NG = [NG_LW[b - 1] for b in _PO_BANDS]
_PO_OFF = dict(zip(_PO_BANDS, np.concatenate([[0],
                                              np.cumsum(_PO_NG)[:-1]])))
_PAIR_SPAN = {}
for _p in _PAIR_ORDER:
    _bs = _PAIR_BANDS[_p]
    _PAIR_SPAN[_p] = (_PO_OFF[_bs[0]],
                      _PO_OFF[_bs[-1]] + NG_LW[_bs[-1] - 1])
# upper-atmosphere weight groups over the same lane order
_UP_GROUPS = [("hcu", [3]), ("ocu", [4, 5]), ("o3", [7]),
              ("ch4", [9, 16])]
_WLOW = 9 * 128 + 64            # 9 eta sections + ss
_WUP = 128 + 4 * 64 + 64        # eta0 full, eta1-4 bands 3/4/5, ss
_WEM = 9 * 128                  # eta minors: 9 sections of 128


def _bf_split(a):
    """hi/lo bf16 decomposition of a table; lo is None when the table
    is exactly bf16-representable (0/1 scatter maps)."""
    import ml_dtypes
    hi = a.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = a - hi
    return (hi, None) if not lo.any() else (hi, lo)


@functools.lru_cache(maxsize=1)
def _kernel_tables():
    """Static tables, each as (hi, lo-or-None) bf16 split.

    Layout contract: table [K, L] contracts against in-kernel weights
    [K, C] over K (dim 0 of both) to give [L, C]."""
    big = lw_gather_tables()["big"]            # [300, 828] unpadded
    st = _lw_static()
    # lane permutation: original SP2 order -> pair-major order
    perm = np.zeros(SP2_W, np.int64)
    for b in _PO_BANDS:
        ng = NG_LW[b - 1]
        perm[_PO_OFF[b]:_PO_OFF[b] + ng] = np.arange(
            SP2_OFF[b], SP2_OFF[b] + ng)

    a_low = np.zeros((71, _WLOW), np.float32)
    for e in range(9):
        a_low[:, e * 128: e * 128 + SP2_W] = \
            big[0:71, e * SP2_W:(e + 1) * SP2_W][:, perm]
    a_low[:, 9 * 128: 9 * 128 + SS_W] = big[0:71, 9 * SP2_W:]

    a_up = np.zeros((235, _WUP), np.float32)
    a_up[:, :SP2_W] = big[65:, 0:SP2_W][:, perm]
    for e in range(1, 5):      # bands 3/4/5 = pair-major lanes 0..45
        a_up[:, 128 + (e - 1) * 64: 128 + (e - 1) * 64 + 46] = \
            big[65:, e * SP2_W: e * SP2_W + 46][:, perm[:46]]
    a_up[:, 128 + 4 * 64: 128 + 4 * 64 + SS_W] = big[65:, 9 * SP2_W:]

    # weight-expansion block diagonals (0/1)
    bd_low = np.zeros((45, _WLOW), np.float32)
    for e in range(9):
        for ip, p in enumerate(_PAIR_ORDER):
            lo, hi = _PAIR_SPAN[p]
            bd_low[e * 5 + ip, e * 128 + lo: e * 128 + hi] = 1.0
    bd_up = np.zeros((25, _WUP), np.float32)
    for ig, (_, bands) in enumerate(_UP_GROUPS):
        lo = _PO_OFF[bands[0]]
        hi = _PO_OFF[bands[-1]] + NG_LW[bands[-1] - 1]
        bd_up[ig, lo:hi] = 1.0                 # eta 0, full section
        if lo < 46:                            # eta 1..4 (bands 3/4/5)
            for e in range(1, 5):
                bd_up[e * 5 + ig,
                      128 + (e - 1) * 64 + lo:
                      128 + (e - 1) * 64 + min(hi, 46)] = 1.0

    scat_sp2 = np.zeros((128, NGPTLW), np.float32)
    for b in _PO_BANDS:
        for g in range(NG_LW[b - 1]):
            scat_sp2[_PO_OFF[b] + g, NGS_LW[b - 1] + g] = 1.0
    scat_u14 = np.zeros((64, NGPTLW), np.float32)
    scat_u14[0:46] = scat_sp2[0:46]
    scat_ss = np.zeros((64, NGPTLW), np.float32)
    gt = lw_gather_tables_padded()
    scat_ss[:SS_W] = gt["scat_ss"][:SS_W]

    self10 = np.asarray(gt["self10"], np.float32)        # [10, 140]
    for4 = np.asarray(gt["for4"], np.float32)            # [4, 140]
    uhf_t = np.asarray(st["uhf"], np.float32)[:, None]   # [140, 1]
    m19_raw = st["m19"]                                  # [19, Wm]
    wm = m19_raw.shape[1]
    m19 = np.zeros((19, 128), np.float32)
    m19[:, :wm] = m19_raw
    seg_m = np.zeros((13, 128), np.float32)
    seg_m[:, :wm] = st["seg_m"]
    scat_m = np.zeros((128, NGPTLW), np.float32)
    scat_m[:wm] = st["scat_m"]
    em_stack = st["em_stack"]                            # (9, 19, 66)
    wem = em_stack.shape[-1]
    em_flat = np.zeros((19, _WEM), np.float32)
    for e in range(9):
        em_flat[:, e * 128: e * 128 + wem] = em_stack[e]
    # emw rows are c*9 + e (7 scaling factors x 9 eta sections):
    # block-diagonal expansion so seg_em^T @ emw yields the factor
    # vector per eta section in one contraction
    seg_em = np.zeros((63, _WEM), np.float32)
    for e in range(9):
        for c in range(7):
            seg_em[c * 9 + e, e * 128: e * 128 + wem] = \
                st["seg_em"][c, :wem]
    scat_em = np.zeros((128, NGPTLW), np.float32)
    scat_em[:wem] = st["scat_em"]
    b3u = st["b3u"]                                      # (5, 19, 16)
    b3u_flat = np.transpose(b3u, (1, 0, 2)).reshape(19, 80)
    scat_b3 = np.asarray(st["scat_b3"], np.float32)      # [16, 140]

    p9 = st["p9"]                                        # [9, SPP]
    p9_scat = np.zeros((81, NGPTLW), np.float32)
    for i, b in enumerate(SP2_BANDS):
        for k in range(9):
            p9_scat[i * 9 + k, NGS_LW[b - 1]:NGS_LW[b]] = \
                p9[k, SP2_OFF[b]:SP2_OFF[b] + NG_LW[b - 1]]
    p5 = st["p5"]
    p5_scat = np.zeros((15, NGPTLW), np.float32)
    for i, b in enumerate((3, 4, 5)):
        for k in range(5):
            p5_scat[i * 5 + k, NGS_LW[b - 1]:NGS_LW[b]] = \
                p5[k, SP2_OFF[b]:SP2_OFF[b] + NG_LW[b - 1]]
    pconst_t = np.stack([st["pconst_lo"], st["pconst_hi"]],
                        axis=1).astype(np.float32)       # [140, 2]
    segb_t = np.stack([st["segb1"], st["segb2"]],
                      axis=1).astype(np.float32)         # [140, 2]
    hal_tab = np.zeros((8, NGPTLW), np.float32)
    hal_tab[:4] = np.stack([st["ccl4"], st["cfc11"],
                            st["cfc12"] + st["cfc12_8"],
                            st["cfc22_8"]])

    split_keys = dict(
        a_low=a_low, a_up=a_up, bd_low=bd_low, bd_up=bd_up,
        scat_sp2=scat_sp2, scat_u14=scat_u14, scat_ss=scat_ss,
        self10=self10, for4=for4, m19=m19, seg_m=seg_m, scat_m=scat_m,
        em_flat=em_flat, seg_em=seg_em, scat_em=scat_em,
        b3u_flat=b3u_flat, scat_b3=scat_b3, p9_scat=p9_scat,
        p5_scat=p5_scat, hal_tab=hal_tab)
    tabs = {k: _bf_split(v) for k, v in split_keys.items()}
    tabs["uhf_t"] = (uhf_t, None)
    tabs["pconst_t"] = (pconst_t, None)
    tabs["segb_t"] = (segb_t, None)
    return tabs


_TABLE_KEYS = ("a_low", "a_up", "bd_low", "bd_up", "scat_sp2",
               "scat_u14", "scat_ss", "self10", "for4", "m19", "seg_m",
               "scat_m", "em_flat", "seg_em", "scat_em", "b3u_flat",
               "scat_b3", "p9_scat", "p5_scat", "hal_tab", "uhf_t",
               "pconst_t", "segb_t")

_CELL_ORDER = ("weta0", "weta1", "wetau0", "wetau1", "rows", "facs",
               "colv", "lowm", "t19", "wsf", "fac13", "emw", "w3u",
               "wpl", "wpl5", "halc")


def _make_kernel(split_flags, cell_major=False):
    """split_flags: dict key -> bool (table has a lo half).

    cell_major: write [C, NGPTLW] output tiles (cells on sublanes) via
    an in-kernel transpose — Mosaic's transpose unit makes this free,
    and it lets the layer-major [nlay, ncol, g] production layout come
    straight out of the kernel with no XLA relayout copies."""

    def kernel(*refs):
        cells = dict(zip(_CELL_ORDER, refs[:len(_CELL_ORDER)]))
        it = iter(refs[len(_CELL_ORDER):-2])
        tabs = {}
        for k in _TABLE_KEYS:
            hi = next(it)
            lo = next(it) if split_flags[k] else None
            tabs[k] = (hi, lo)
        taug_ref, pfr_ref = refs[-2:]

        f32 = jnp.float32
        C = cells["rows"].shape[1]
        lowm = cells["lowm"][0:1, :]                       # [1, C]
        upm = 1.0 - lowm
        has_low = jnp.max(lowm) > 0.0
        has_up = jnp.max(upm) > 0.0

        def dg(t, w):
            return lax.dot_general(
                t, w, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.DEFAULT)

        def tdot(key, w):
            """bf16x3 contraction table[K, L] x w[K, C] -> [L, C]."""
            t_hi, t_lo = tabs[key][0][:], tabs[key][1]
            w_hi = w.astype(jnp.bfloat16).astype(f32)
            w_lo = w - w_hi
            out = dg(t_hi, w_hi) + dg(t_hi, w_lo)
            if t_lo is not None:
                out = out + dg(t_lo[:], w_hi)
            return out

        def onehot(rcol, iota, m):
            r = cells["rows"][rcol:rcol + 1, :]
            f = cells["facs"][rcol:rcol + 1, :] * m
            return jnp.where(iota == r, f, 0.0)

        zc = jnp.zeros((128, C), f32)
        z64 = jnp.zeros((64, C), f32)
        z16 = jnp.zeros((16, C), f32)
        zg = jnp.zeros((NGPTLW, C), f32)

        def low_part():
            i71 = lax.broadcasted_iota(jnp.int32, (71, C), 0)
            wal = onehot(0, i71, lowm) + onehot(1, i71, lowm)
            wbl = onehot(2, i71, lowm) + onehot(3, i71, lowm)
            ua = tdot("a_low", wal)                    # [_WLOW, C]
            ub = tdot("a_low", wbl)
            w0 = tdot("bd_low", cells["weta0"][0:45, :])
            w1 = tdot("bd_low", cells["weta1"][0:45, :])
            s = w0 * ua + w1 * ub
            acc = jnp.zeros((128, C), f32)
            for e in range(9):
                acc = acc + s[e * 128:(e + 1) * 128, :]
            uss = ua[9 * 128: 9 * 128 + 64, :] \
                + ub[9 * 128: 9 * 128 + 64, :]
            # 9x19 eta minors (all lower-masked contributors)
            u = tdot("em_flat", cells["t19"][:])       # [_WEM, C]
            wev = tdot("seg_em", cells["emw"][:])
            prod = u * wev
            acc_em = jnp.zeros((128, C), f32)
            for e in range(9):
                acc_em = acc_em + prod[e * 128:(e + 1) * 128, :]
            plo = tdot("p9_scat", cells["wpl"][:]) \
                + tabs["pconst_t"][0][:, 0:1]
            return acc, uss, acc_em, plo

        def up_part():
            i235 = lax.broadcasted_iota(jnp.int32, (235, C), 0) + 65
            wau = onehot(0, i235, upm) + onehot(1, i235, upm)
            wbu = onehot(2, i235, upm) + onehot(3, i235, upm)
            ua = tdot("a_up", wau)                     # [_WUP, C]
            ub = tdot("a_up", wbu)
            w0 = tdot("bd_up", cells["wetau0"][0:25, :])
            w1 = tdot("bd_up", cells["wetau1"][0:25, :])
            s = w0 * ua + w1 * ub
            acc = s[0:128, :]                          # eta-0 section
            acc_u = jnp.zeros((64, C), f32)
            for e in range(4):
                acc_u = acc_u + s[128 + e * 64: 128 + (e + 1) * 64, :]
            uss = ua[384:448, :] + ub[384:448, :]
            # band-3 stratospheric N2O minor (5-point eta)
            u3 = tdot("b3u_flat", cells["t19"][:])     # [80, C]
            acc3 = jnp.zeros((16, C), f32)
            for e in range(5):
                acc3 = acc3 + cells["w3u"][e:e + 1, :] \
                    * u3[e * 16:(e + 1) * 16, :]
            phi = tdot("p5_scat", cells["wpl5"][:]) \
                + tabs["pconst_t"][0][:, 1:2]
            return acc, acc_u, uss, acc3, phi

        acc_l, uss_l, acc_em, plo = lax.cond(
            has_low, low_part, lambda: (zc, z64, zc, zg))
        acc_h, acc_u, uss_h, acc3, phi = lax.cond(
            has_up, up_part, lambda: (zc, z64, z64, z16, zg))

        acc = acc_l + acc_h
        acc_ss = cells["colv"][:] * (uss_l + uss_h)
        taug = tdot("scat_sp2", acc) + tdot("scat_u14", acc_u) \
            + tdot("scat_ss", acc_ss) + tdot("scat_em", acc_em) \
            + tdot("scat_b3", acc3)

        # self/foreign continua (tent weights fac-folded in prep)
        sf = tdot("self10", cells["wsf"][0:10, :])
        ff = tdot("for4", cells["wsf"][10:14, :])
        taug = taug + sf + ff * (lowm + upm * tabs["uhf_t"][0][:])

        # flat 19-point minors
        m_all = tdot("m19", cells["t19"][:])           # [128, C]
        facv = tdot("seg_m", cells["fac13"][:])
        taug = taug + tdot("scat_m", m_all * facv)

        # halocarbons (hal_tab rows 4-7 are zero)
        taug = taug + tdot("hal_tab", cells["halc"][:])

        # band 1/2 empirical pressure corrections
        segb = tabs["segb_t"][0]
        corr = 1.0 + (cells["halc"][4:5, :] - 1.0) * segb[:, 0:1] \
            + (cells["halc"][5:6, :] - 1.0) * segb[:, 1:2]
        if cell_major:
            taug_ref[:] = (taug * corr).T
            pfr_ref[:] = (lowm * plo + upm * phi).T
        else:
            taug_ref[:] = taug * corr
            pfr_ref[:] = lowm * plo + upm * phi

    return kernel


def _taumol_pallas(cell_inputs, interpret, cell_major=False):
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
        out_specs = [pl.BlockSpec((C, NGPTLW), lambda b: (b, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((n + npad, NGPTLW),
                                          jnp.float32)] * 2
    else:
        out_specs = [pl.BlockSpec((NGPTLW, C), lambda b: (0, b))] * 2
        out_shape = [jax.ShapeDtypeStruct((NGPTLW, n + npad),
                                          jnp.float32)] * 2
    taug, pfr = pl.pallas_call(
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
        return taug[:n], pfr[:n]
    return taug[:, :n], pfr[:, :n]


# ---------------------------------------------------------------------
# transposed-layout weight builders ([K, N]: N cells on lanes)
# ---------------------------------------------------------------------

_E9C = np.arange(9)[:, None]


def _tent2_t(idx1b, frac, K):
    """[K, N] linear-interp tent weights at 1-based idx (2 nonzero)."""
    d = jnp.arange(K)[:, None] - (idx1b[None, :] - 1)
    return (jnp.where(d == 0, (1.0 - frac)[None, :], 0.0)
            + jnp.where(d == 1, frac[None, :], 0.0))


def _eta_weights_lower_t(sc, sp, js, fs):
    """[9, N] eta-plane weights (see taumol_lw._eta_weights_lower)."""
    d = _E9C - (js[None, :] - 1)
    p_lo = fs - 1.0
    p4l = p_lo ** 4
    fk0l, fk1l, fk2l = p4l, 1.0 - p_lo - 2.0 * p4l, p_lo + p4l
    p_hi = -fs
    p4h = p_hi ** 4
    fk0h, fk1h, fk2h = p4h, 1.0 - p_hi - 2.0 * p4h, p_hi + p4h

    def w3(a, b, c, off):
        return (jnp.where(d == off, a[None, :], 0.0)
                + jnp.where(d == off + 1, b[None, :], 0.0)
                + jnp.where(d == off + 2, c[None, :], 0.0))

    w_lo = w3(fk0l, fk1l, fk2l, 0)
    w_hi = w3(fk2h, fk1h, fk0h, -1)
    w_mid = (jnp.where(d == 0, (1.0 - fs)[None, :], 0.0)
             + jnp.where(d == 1, fs[None, :], 0.0))
    lo = (sp < 0.125)[None, :]
    hi = (sp > 0.875)[None, :]
    w = jnp.where(lo, w_lo, jnp.where(hi, w_hi, w_mid))
    return sc[None, :] * w


def _eta_weights_upper4_t(sc, js, fs):
    """[9, N] weights for the 5-point stratospheric eta axis."""
    d = _E9C - (js[None, :] - 1)
    w = (jnp.where(d == 0, (1.0 - fs)[None, :], 0.0)
         + jnp.where(d == 1, fs[None, :], 0.0))
    return sc[None, :] * w


def _spec_pair(col1, col2, rat, mult):
    sc = col1 + rat * col2
    sp = jnp.minimum(col1 / sc, _ONEMINUS)
    sm = mult * sp
    js = 1 + jnp.floor(sm).astype(jnp.int32)
    fs = sm - jnp.floor(sm)
    return sc, sp, js, fs


def taumol_lw_fast(coefs, taua=None, interpret=None, layer_major=False,
                   cell_major=False):
    """Drop-in replacement for taumol_lw; [ncol, nlay] or flat cells.

    layer_major=True ([ncol, nlay] inputs only) returns taug/pfracs as
    [nlay, ncol, ngpt] — the layout the kernel produces natively (cells
    layer-major on sublanes, g on lanes), consumed zero-copy by
    rtrnmc_fast. Default False restores the [ncol, nlay, ngpt] contract
    with one XLA transpose.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if coefs.jp.ndim == 2:
        ncol, nlay = coefs.jp.shape

        # layer-major cell order: a kernel block covers one model layer,
        # so whole blocks skip the wrong-regime dots (lax.cond)
        def fl(x):
            if hasattr(x, "ndim") and x.ndim >= 2 \
                    and x.shape[:2] == (ncol, nlay):
                return jnp.moveaxis(x, 1, 0).reshape(
                    (ncol * nlay,) + x.shape[2:])
            return x

        tg, pf = taumol_lw_fast(jax.tree_util.tree_map(fl, coefs),
                                None, interpret=interpret,
                                cell_major=True)
        # outputs arrive cell-major [N, g]; cells are layer-major, so
        # this reshape to [nlay, ncol, g] is a free bitcast
        tg = tg.reshape(nlay, ncol, NGPTLW)
        pf = pf.reshape(nlay, ncol, NGPTLW)
        if taua is not None:
            ngb = np.repeat(np.arange(16), NG_LW)
            tg = tg + jnp.swapaxes(taua, 0, 1)[..., ngb]
        if not layer_major:
            tg = jnp.swapaxes(tg, 0, 1)
            pf = jnp.swapaxes(pf, 0, 1)
        return tg, pf

    st = _lw_static()
    n = coefs.jp.shape[0]
    lower = coefs.lower
    f32 = jnp.float32
    chi_np = st["chi_np"]

    # chi lookups as one-hot contractions [nchi, N]
    jp = coefs.jp
    k59 = jnp.arange(59)[:, None]
    ohA = (k59 == (jp[None, :] - 1)).astype(f32)        # [59, N]
    ohB = (k59 == jp[None, :]).astype(f32)
    chiT = jnp.asarray(chi_np)                          # [nchi, 59]
    hdot = lambda a, b: lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=f32)
    chi_a = hdot(chiT, ohA)                             # [nchi, N]
    chi_b = hdot(chiT, ohB)

    def rat(g1, g2, b):
        c = chi_b if b else chi_a
        return c[_CHI[g1], :] / c[_CHI[g2], :]

    def col(gas):
        return _col(coefs, gas)

    def adjcol(gas, thresh, base, expo, fixed_ref=None):
        colgas = col(gas)
        ref = chi_b[_CHI[gas], :] if fixed_ref is None \
            else jnp.full_like(colgas, fixed_ref)
        ratg = 1.0e20 * (colgas / coefs.coldry) / ref
        adjfac = base + jnp.maximum(ratg - base, 1e-12) ** expo
        adj = adjfac * ref * coefs.coldry * 1.0e-20
        return jnp.where(ratg > thresh, adj, colgas)

    # ---- per-pair eta weights [9, N] ------------------------------
    weL = {}
    for key, (g1, g2) in _PAIRS_LOWER.items():
        sc0, sp0, js0, fs0 = _spec_pair(col(g1), col(g2),
                                        rat(g1, g2, False), 8.0)
        sc1, sp1, js1, fs1 = _spec_pair(col(g1), col(g2),
                                        rat(g1, g2, True), 8.0)
        weL[key] = (_eta_weights_lower_t(sc0, sp0, js0, fs0),
                    _eta_weights_lower_t(sc1, sp1, js1, fs1))
    weU = {}
    for key, (g1, g2) in (("hcu", ("h2o", "co2")),
                          ("ocu", ("o3", "co2"))):
        sc0, _, js0, fs0 = _spec_pair(col(g1), col(g2),
                                      rat(g1, g2, False), 4.0)
        sc1, _, js1, fs1 = _spec_pair(col(g1), col(g2),
                                      rat(g1, g2, True), 4.0)
        weU[key] = (_eta_weights_upper4_t(sc0, js0, fs0),
                    _eta_weights_upper4_t(sc1, js1, fs1))

    # pair-major eta-weight rows [45, N]: row e*5 + pair
    def build_weta(side):
        w = jnp.stack([weL[p][side] for p in _PAIR_ORDER],
                      axis=1)                        # [9, 5, N]
        return w.reshape(45, n)

    # upper groups [25, N]: row e*5 + group (hcu, ocu, o3, ch4)
    def build_wetau(side):
        w = jnp.zeros((5, 5, n), f32)
        w = w.at[:, 0, :].set(weU["hcu"][side][:5, :])
        w = w.at[:, 1, :].set(weU["ocu"][side][:5, :])
        w = w.at[0, 2, :].set(col("o3"))
        w = w.at[0, 3, :].set(col("ch4"))
        return w.reshape(25, n)

    jt0 = coefs.jt - 1
    jt10 = coefs.jt1 - 1
    rbase0 = jnp.where(lower, 5 * (jp - 1),
                       NROW_LOWER + 5 * jnp.clip(jp - 13, 0, 46)) + jt0
    rbase1 = jnp.where(lower, 5 * jnp.clip(jp, 1, 13),
                       NROW_LOWER + 5 * jnp.clip(jp - 12, 1, 46)) + jt10
    rows = jnp.stack([jnp.clip(rbase0, 0, NROWS - 1),
                      jnp.clip(rbase0 + 1, 0, NROWS - 1),
                      jnp.clip(rbase1, 0, NROWS - 1),
                      jnp.clip(rbase1 + 1, 0, NROWS - 1)],
                     axis=0).astype(jnp.int32)          # [4, N]
    facs = jnp.stack([coefs.fac00, coefs.fac10, coefs.fac01,
                      coefs.fac11], axis=0)

    # single-key column amounts expanded to the ss row layout [64, N]
    colgas_ss = {1: ("h2o", "h2o"), 2: ("h2o", "h2o"), 6: ("h2o", "h2o"),
                 8: ("h2o", "o3"), 10: ("h2o", "h2o"),
                 11: ("h2o", "h2o"), 14: ("co2", "co2")}
    seg_ss64 = np.zeros((len(SS_BANDS), 64), np.float32)
    for i, b in enumerate(SS_BANDS):
        seg_ss64[i, SS_OFF[b]: SS_OFF[b] + NG_LW[b - 1]] = 1.0
    ss_stack = jnp.stack(
        [jnp.where(lower, col(colgas_ss[b][0]), col(colgas_ss[b][1]))
         for b in SS_BANDS], axis=0)                    # [nss, N]
    colv = lax.dot_general(jnp.asarray(seg_ss64), ss_stack,
                           (((0,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=f32)  # [64, N]

    # ---- epilogue cell inputs -------------------------------------
    lo_f = lower.astype(f32)
    hi_f = 1.0 - lo_f
    t19 = _tent2_t(coefs.indminor, coefs.minorfrac, 19)
    wsf = jnp.concatenate(
        [_tent2_t(coefs.indself, coefs.selffrac, 10)
         * coefs.selffac[None, :],
         _tent2_t(coefs.indfor, coefs.forfrac, 4)
         * coefs.forfac[None, :],
         jnp.zeros((2, n), f32)], axis=0)               # [16, N]

    factors = {
        "scalen2": coefs.colbrd * coefs.scaleminorn2,
        "adj_b6": adjcol("co2", 3.0, 2.0, 0.77),
        "adj_b8": adjcol("co2", 3.0, 2.0, 0.65),
        "adj_b7u": adjcol("co2", 3.0, 2.0, 0.79),
        "adj_b7l": adjcol("co2", 3.0, 3.0, 0.79),
        "adj_b13": adjcol("co2", 3.0, 2.0, 0.68, fixed_ref=3.55e-4),
        "adjn2o": adjcol("n2o", 1.5, 0.5, 0.65),
        "colo3": coefs.colo3, "coln2o": coefs.coln2o,
        "colco": coefs.colco,
        "o2fac": coefs.colo2 * coefs.scaleminor,
        "n2fac15": coefs.colbrd * coefs.scaleminor,
    }
    fac13 = jnp.stack(
        [factors[k] * (lo_f if r == "lo" else hi_f)
         for k, r in st["flat_keys"]], axis=0)          # [13, N]

    def em_tent(pk, lvl, mult=8.0, K=9):
        g1, g2 = _PAIRS_LOWER[pk] if mult == 8.0 else ("h2o", "co2")
        rr = float(chi_np[_CHI[g1], lvl - 1]
                   / chi_np[_CHI[g2], lvl - 1])
        scm = col(g1) + rr * col(g2)
        spm = jnp.minimum(col(g1) / scm, _ONEMINUS)
        smm = mult * spm
        jm = 1 + jnp.floor(smm).astype(jnp.int32)
        fm = smm - jnp.floor(smm)
        return _tent2_t(jm, fm, K)

    emw = jnp.concatenate(
        [em_tent(pk, lvl) * (factors[fk] * lo_f)[None, :]
         for _, pk, lvl, fk in st["em_meta"]], axis=0)  # [63, N]
    w3u = em_tent("hc", 13, mult=4.0, K=5) \
        * (factors["adjn2o"] * hi_f)[None, :]           # [5, N]

    w_pl = []
    for b in SP2_BANDS:
        pk, lvl = _PLANCK_LO[b]
        g1, g2 = _PAIRS_LOWER[pk]
        rr = float(chi_np[_CHI[g1], lvl - 1] / chi_np[_CHI[g2], lvl - 1])
        scp = col(g1) + rr * col(g2)
        spp_ = jnp.minimum(col(g1) / scp, _ONEMINUS)
        smp = 8.0 * spp_
        jpl = 1 + jnp.floor(smp).astype(jnp.int32)
        fpl = smp - jnp.floor(smp)
        w_pl.append(_tent2_t(jpl, fpl, 9))
    wpl = jnp.concatenate(w_pl, axis=0)                 # [81, N]

    w_pl5 = []
    for b, ((g1, g2), lvl) in _PLANCK_UP.items():
        rr = float(chi_np[_CHI[g1], lvl - 1] / chi_np[_CHI[g2], lvl - 1])
        scp = col(g1) + rr * col(g2)
        spp_ = jnp.minimum(col(g1) / scp, _ONEMINUS)
        smp = 4.0 * spp_
        jpl = 1 + jnp.floor(smp).astype(jnp.int32)
        fpl = smp - jnp.floor(smp)
        w_pl5.append(_tent2_t(jpl, fpl, 5))
    wpl5 = jnp.concatenate(w_pl5, axis=0)               # [15, N]

    corr1 = jnp.where(lower,
                      jnp.where(coefs.pavel < 250.0,
                                1.0 - 0.15 * (250.0 - coefs.pavel)
                                / 154.4, 1.0),
                      1.0 - 0.15 * (coefs.pavel / 95.6))
    corr2 = jnp.where(lower,
                      1.0 - 0.05 * (coefs.pavel - 100.0) / 900.0, 1.0)
    halc = jnp.stack([coefs.colccl4, coefs.colcfc11, coefs.colcfc12,
                      coefs.colcfc22, corr1, corr2,
                      jnp.zeros_like(corr1), jnp.zeros_like(corr1)],
                     axis=0)                            # [8, N]

    cell_inputs = dict(
        weta0=build_weta(0), weta1=build_weta(1),
        wetau0=build_wetau(0), wetau1=build_wetau(1),
        rows=rows, facs=facs, colv=colv,
        lowm=lo_f[None, :], t19=t19, wsf=wsf, fac13=fac13, emw=emw,
        w3u=w3u, wpl=wpl, wpl5=wpl5, halc=halc)
    taug, pfracs = _taumol_pallas(cell_inputs, interpret,
                                  cell_major=cell_major)

    if taua is not None:
        ngb = np.repeat(np.arange(16), NG_LW)
        if cell_major:
            return taug + taua[..., ngb], pfracs
        taug = jnp.transpose(taug) + taua[..., ngb]
        pfracs = jnp.transpose(pfracs)
        return taug, pfracs
    # flat-cell contract: spectral-major [140, N] outputs
    # (cell-major [N, 140] when cell_major=True)
    return taug, pfracs
