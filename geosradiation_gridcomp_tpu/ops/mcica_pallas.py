"""Fused Pallas TPU kernel: McICA subcolumn generation + cloud optics.

Replaces the generate_stochastic_clouds -> cldprmc pipeline (the two most
bandwidth-hungry stages of the all-sky path) with one kernel that keeps
every [ncol, ngpt, nlay] intermediate in VMEM:

  HBM traffic per (column, g-point, layer) cell drops from ~300 B
  (4 cdf fields + one-hot zcw matmul operands + water paths + taucmc,
  each round-tripping HBM between XLA fusions) to ~4 B (the taucmc
  output alone). Everything else - per-column PRNG streams, the
  exponential-overlap forward-fill (log2(nlay) sublane rolls),
  condensate zcw scaling, and the band->g-point optical-depth
  expansion - runs on VPU registers per column block.

  Layout: [B, nlay, nsub] with g-points on the 128-lane axis (112 SW /
  140 LW lanes beat 72-layer lanes for utilization, and the kernel
  output layout equals the solver layout - zero transposes). The
  layer-axis overlap chains become sublane rolls.

Physics matched (same contracts as ops/mcica.py, citations there):
  * exponential overlap chains (cloud_subcol_gen.F90:403-429)
  * state-derived per-column seeds (:336-400) - here they seed the TPU
    hardware PRNG instead of threefry; the reference's own contract is
    POPULATION statistics (cloud_subcol_gen.F90:24-31), and streams stay
    deterministic + decomposition-invariant because each column seeds
    its own stream from the same state-derived integers.
  * condensate scaling zcw (cloud_condensate_inhomogeneity.F90:86-124):
    one arcsin-warped deg-14 polynomial per sigma class (scalar Horner
    coefficients - no per-segment selects), head/tail bins exact; max
    abs deviation vs the bilinear table is 4.7e-3, on par with the
    table's own 4-significant-digit quantization; exact table lookups
    stay on the CPU oracle path, and the flux-level impact is gated by
    tools/verify_tpu.py (fused_vs_oracle_meanflux).
  * cloud optical depth (rrtmg_lw_cldprmc.F90): per-band absorption
    coefficients are computed OUTSIDE (they depend only on col, layer),
    the per-g expansion happens in VMEM via static band slices.
  * clearCounts_threeBand (cloud_subcol_gen.F90:611-769) reduced
    in-kernel.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import load

_N1 = 1000
# fitted region in cdf space: below _LO the table interpolates from its
# floor value (exact linear head), above _HI the bins are rough /
# discontinuous (exact piecewise-linear tail); in between, one
# arcsin-warped polynomial per sigma class (the warp resolves the steep
# ends without segmenting, so the kernel evaluation is a single Horner
# chain with SCALAR coefficients - no per-segment selects on the VPU)
_LO = 1.0 / 999.0
_HI = 994.0 / 999.0
_DEG = 14


def _class_columns(inhm):
    """xcw columns for the 3 static sigma_qcw classes {0.5, 0.71, 1.0}."""
    tab = np.asarray(load("chou_xcw_inhomogeneity")[
        "xcw_beta" if inhm == 1 else "xcw_gamma"], np.float64)
    n2 = tab.shape[1]
    cols = []
    for s in (0.5, 0.71, 1.0):
        r2 = 40.0 * s - 3.0
        j = int(min(max(int(r2), 1), n2 - 1))
        f2 = r2 - j
        cols.append((1.0 - f2) * tab[:, j - 1] + f2 * tab[:, j])
    return np.stack(cols)             # (3, 1000)


@lru_cache(maxsize=None)
def _zcw_fit(inhm):
    """Fit constants for the in-kernel zcw evaluation.

    Returns dict:
      head [3, 2]      value = head[c,0] + f1*head[c,1] for cdf < 1/999
      poly [3, deg+1]  power-basis coeffs (high->low) in the normalized
                       arcsin-warped coordinate t(v)
      warp (a, b)      t = a * arcsin(2v - 1) + b
      tail_int/tail_slp [3, 5]  linear pieces for ind1 in {995..999}

    Max abs deviation vs the bilinear table over the fitted region is
    <= 4.7e-3 (beta table, sigma class 1.0), on par with the table's own
    4-significant-digit quantization; the flux-level impact is gated by
    tools/verify_tpu.py.
    """
    cols = _class_columns(inhm)

    def f_exact(x, col):
        rind1 = x * (_N1 - 1) + 1.0
        i = np.clip(np.floor(rind1).astype(int), 1, _N1 - 1)
        return col[i - 1] + (rind1 - i) * (col[i] - col[i - 1])

    x = np.linspace(_LO, _HI, 200000)
    u = np.arcsin(2.0 * x - 1.0)
    ua, ub = u.min(), u.max()
    t = (u - ua) / (ub - ua) * 2.0 - 1.0
    poly = np.zeros((3, _DEG + 1), np.float64)
    for c in range(3):
        cf = np.polynomial.chebyshev.chebfit(t, f_exact(x, cols[c]), _DEG)
        poly[c] = np.polynomial.chebyshev.cheb2poly(cf)[::-1]  # high->low
    wa = 2.0 / (ub - ua)
    wb = -2.0 * ua / (ub - ua) - 1.0
    head = np.stack([cols[:, 0], cols[:, 1] - cols[:, 0]], axis=1)
    tail_int = cols[:, 994:999]
    tail_slp = cols[:, 995:1000] - cols[:, 994:999]
    return dict(head=head.astype(np.float32),
                poly=poly.astype(np.float32),
                warp=(float(wa), float(wb)),
                tail_int=tail_int.astype(np.float32),
                tail_slp=tail_slp.astype(np.float32))


def mix_seed_pairs(seeds4):
    """[ncol, 4] uint32 state-derived seeds -> [ncol, 2] int32 for the
    TPU hardware PRNG (prng_seed takes at most 2 values on this
    target). Rotate-xor mixing keeps all four state words influential,
    stays deterministic, and is decomposition-invariant (per-column)."""
    s = seeds4.astype(jnp.uint32)
    rotl = lambda x, k: (x << k) | (x >> (32 - k))
    a = s[:, 0] ^ rotl(s[:, 1], 13)
    b = s[:, 2] ^ rotl(s[:, 3], 17)
    return jnp.stack([a, b], axis=1).astype(jnp.int32)


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # >>8 leaves 24 bits, so the int32 detour is exact (Mosaic has no
    # direct uint32 -> float32 cast)
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) \
        * (1.0 / (1 << 24))


def _ffill(v, filled, nlay):
    """Forward-fill along the LAYER axis (second-minor: arrays are
    [B, nlay, nsub] with g-points on lanes): each cell takes the value
    of the nearest cell at or above it with filled=1; layer 0 is always
    a source (the overlap chain's first layer keeps its own number).
    Log-doubling with sublane rolls."""
    lay = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 2)
    filled = jnp.where(lay == 0, 1.0, filled)
    s = 1
    while s < nlay:
        vs = pltpu.roll(v, s, v.ndim - 2)
        fs = pltpu.roll(filled, s, v.ndim - 2)
        ok = (lay >= s).astype(v.dtype)
        fs = fs * ok
        take = (filled == 0.0) & (fs > 0.0)
        v = jnp.where(take, vs, v)
        filled = jnp.maximum(filled, fs)
        s *= 2
    return v


_ASIN_C = (-0.0012624911, 0.0066700901, -0.0170881256, 0.0308918810,
           -0.0501743046, 0.0889789874, -0.2145988016, 1.5707963050)


def _asin(z):
    """arcsin on [-1, 1] via Abramowitz & Stegun 4.4.46 (|err| < 2e-8):
    asin(x) = pi/2 - sqrt(1-x) * P7(x) for x in [0, 1], odd-extended.
    Mosaic has no asin primitive; this is sqrt + 7 fma on the VPU."""
    x = jnp.abs(z)
    p = jnp.full(z.shape, _ASIN_C[0], z.dtype)
    for c in _ASIN_C[1:]:
        p = p * x + c
    a = 1.5707963267948966 - jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * p
    return jnp.where(z < 0.0, -a, a)


def _zcw_eval(v, cls, fit):
    """zcw(v, class) inside the kernel. v [B, nlay, nsub] in [0,1);
    cls: (is0, is1) boolean planes [B, nlay, 1].

    One arcsin-warped Horner chain per sigma class with SCALAR
    coefficients (three fused multiply-add chains on the VPU), blended
    by two class selects; head/tail regions exact as in the table."""
    is0, is1 = cls

    def csel(c3):
        # class-selected constant plane at [B, 1, nlay] granularity
        return jnp.where(is0, float(c3[0]),
                         jnp.where(is1, float(c3[1]), float(c3[2])))

    rind1 = v * (_N1 - 1) + 1.0
    wa, wb = fit["warp"]
    z = jnp.clip(2.0 * v - 1.0, -1.0, 1.0)
    t = wa * _asin(z) + wb
    poly = fit["poly"]
    accs = []
    for c in range(3):
        acc = jnp.full(v.shape, float(poly[c, 0]), v.dtype)
        for k in range(1, _DEG + 1):
            acc = acc * t + float(poly[c, k])
        accs.append(acc)
    acc = jnp.where(is0, accs[0], jnp.where(is1, accs[1], accs[2]))

    # exact head: cdf < 1/999
    vhead = csel(fit["head"][:, 0]) + (v * (_N1 - 1)) \
        * csel(fit["head"][:, 1])
    # exact tail: ind1 in {995..999}
    ind1 = jnp.clip(jnp.floor(rind1).astype(jnp.int32), 1, _N1 - 1)
    f1 = rind1 - ind1.astype(v.dtype)
    p = jnp.clip(ind1 - 995, 0, 4)
    ti, ts = fit["tail_int"], fit["tail_slp"]
    inter = csel(ti[:, 0])
    slp = csel(ts[:, 0])
    for q in range(1, 5):
        inter = jnp.where(p == q, csel(ti[:, q]), inter)
        slp = jnp.where(p == q, csel(ts[:, q]), slp)
    vtail = inter + f1 * slp

    out = jnp.where(v < _LO, vhead,
                    jnp.where(ind1 >= 995, vtail, acc))
    return out


def _draw_fields(seeds, alpha, rcorr, cdf1, keep1, cdf3, keep3,
                 nlay, nsub, ncolb, uniforms=None):
    """Seed + draw block shared by _gen_subcols and _kernel_raw so the
    verification kernel's PRNG consumption can never drift from
    production (ADVICE r4 #3): per column, seed the hardware PRNG and
    make ONE merged (4, nlay, nsub) draw feeding the presence cdf, the
    presence overlap break mask, the condensate cdf, and the condensate
    break mask, in that order.

    uniforms: optional [B, 4, nlay, nsub] VMEM ref of externally drawn
    uniforms replacing the hardware PRNG - the off-TPU (interpret-mode)
    gate for this kernel's layout/draw-order semantics (VERDICT r4 next
    #2); the hardware PRNG has no interpret path."""
    f32 = jnp.float32

    def gen(i, _):
        if uniforms is None:
            pltpu.prng_seed(seeds[i, 0], seeds[i, 1])
            c = _uniform((4, nlay, nsub))
        else:
            c = uniforms[i]
        cdf1[i] = c[0]
        keep1[i] = (c[1] >= alpha[i, :][:, None]).astype(f32)
        cdf3[i] = c[2]
        keep3[i] = (c[3] >= rcorr[i, :][:, None]).astype(f32)
        return 0

    jax.lax.fori_loop(0, ncolb, gen, 0, unroll=False)


def _gen_subcols(seeds, alpha, rcorr, cldf, ciwp, clwp, is0, is1,
                 cdf1, keep1, cdf3, keep3, *,
                 nsub, nlay, ncolb, inhm, cwp_tiny, fit, uniforms=None):
    """Shared in-kernel McICA generation: per-column PRNG streams,
    exponential-overlap forward fills, zcw condensate scaling.

    Layout [B, nlay, nsub]: g-points on the 128-lane axis (112 SW /
    140 LW beat 72 layers for lane utilization) and layers on
    sublanes, which also makes the outputs transpose-free.

    Returns (cldy [B, nlay, nsub] bool, ciwp_s, clwp_s)."""
    _draw_fields(seeds, alpha, rcorr, cdf1, keep1, cdf3, keep3,
                 nlay, nsub, ncolb, uniforms=uniforms)

    v1 = _ffill(cdf1[:], keep1[:], nlay)
    cloudy = v1 >= 1.0 - cldf[:][:, :, None]

    if inhm != 0:
        v3 = _ffill(cdf3[:], keep3[:], nlay)
        zcw = _zcw_eval(v3, (is0[:][:, :, None] > 0,
                             is1[:][:, :, None] > 0), fit)
    else:
        zcw = 1.0

    ciwp_s = jnp.where(cloudy, ciwp[:][:, :, None] * zcw, 0.0)
    clwp_s = jnp.where(cloudy, clwp[:][:, :, None] * zcw, 0.0)
    ciwp_s = jnp.where(ciwp_s <= cwp_tiny, 0.0, ciwp_s)
    clwp_s = jnp.where(clwp_s <= cwp_tiny, 0.0, clwp_s)
    cldy = cloudy & ((ciwp_s > 0.0) | (clwp_s > 0.0))
    return cldy, ciwp_s, clwp_s


def _band_to_g(field, band_g0, gband):
    """Expand [B, nlay, nbnd] band planes to [B, nlay, nsub] by
    select-accumulate over static band ranges (no gathers)."""
    out = jnp.zeros(gband.shape, jnp.float32)
    for b in range(len(band_g0) - 1):
        m = (gband >= band_g0[b]) & (gband < band_g0[b + 1])
        out = jnp.where(m, field[:, :, b][:, :, None], out)
    return out


def _clear_counts(cldy, cloud_mh, cloud_lm, counts_out):
    """clearCounts_threeBand reduced in-kernel: fully-clear subcolumns
    per layer band. cldy is [B, nlay, nsub]."""
    f32 = jnp.float32
    lay = jax.lax.broadcasted_iota(jnp.int32, cldy.shape, 1)
    cf = cldy.astype(f32)

    def count(mask):
        any_g = jnp.max(cf * mask, axis=1)          # [B, nsub]
        return jnp.sum(1.0 - any_g, axis=1)         # [B]

    c_tot = count(jnp.ones_like(cf))
    c_high = count((lay < cloud_mh - 1).astype(f32))
    c_mid = count(((lay >= cloud_mh - 1)
                   & (lay < cloud_lm - 1)).astype(f32))
    c_low = count((lay >= cloud_lm - 1).astype(f32))
    counts_out[:] = jnp.stack([c_tot, c_high, c_mid, c_low], axis=1)


def _kernel(seeds, alpha, rcorr, cldf, ciwp, clwp, is0, is1, absi, absl,
            *rest,
            nsub, nlay, ncolb, inhm, cwp_tiny, cloud_mh, cloud_lm,
            band_g0, fit, injected, layer_major=False):
    if injected:
        uniforms, tau_out, cloudy_out, counts_out, \
            cdf1, keep1, cdf3, keep3 = rest
    else:
        tau_out, cloudy_out, counts_out, cdf1, keep1, cdf3, keep3 = rest
        uniforms = None

    def cloudy_blk():
        cldy, ciwp_s, clwp_s = _gen_subcols(
            seeds, alpha, rcorr, cldf, ciwp, clwp, is0, is1,
            cdf1, keep1, cdf3, keep3, nsub=nsub, nlay=nlay, ncolb=ncolb,
            inhm=inhm, cwp_tiny=cwp_tiny, fit=fit, uniforms=uniforms)

        gband = jax.lax.broadcasted_iota(jnp.int32, (ncolb, nlay, nsub),
                                         2)
        absi_g = _band_to_g(absi, band_g0, gband)
        absl_g = _band_to_g(absl, band_g0, gband)
        tau = jnp.where(cldy & (ciwp_s > 0.0), ciwp_s * absi_g, 0.0) \
            + jnp.where(cldy & (clwp_s > 0.0), clwp_s * absl_g, 0.0)

        cldy2 = jnp.max(jnp.where(tau > 0.0, 1.0, 0.0), axis=2)
        if layer_major:
            # [nlay, ncol, nsub] production layout: the swap runs on
            # Mosaic's transpose unit in VMEM, so rtrnmc_fast consumes
            # the result with zero XLA relayout copies. (cloudy stays
            # column-major — a [nlay, B] block breaks lane tiling and
            # the [ncol, nlay] array is tiny; callers transpose it.)
            tau_out[:] = jnp.swapaxes(tau, 0, 1)
        else:
            tau_out[:] = tau
        cloudy_out[:] = cldy2
        _clear_counts(cldy, cloud_mh, cloud_lm, counts_out)

    def clear_blk():
        # with cldf == 0 everywhere the cloudy mask is identically
        # false (uniform draws < 1 = 1 - cldf), so outputs are exact:
        # no subcolumn generation needed (rrtmg_sw_rad.F90:1130-1204's
        # clear/cloudy split, expressed as a block-level skip)
        tau_out[:] = jnp.zeros_like(tau_out)
        cloudy_out[:] = jnp.zeros_like(cloudy_out)
        counts_out[:] = jnp.full_like(counts_out, float(nsub))

    jax.lax.cond(jnp.max(cldf[:]) > 0.0, cloudy_blk, clear_blk)


@partial(jax.jit, static_argnames=("nsub", "inhm", "cwp_tiny", "cloud_mh",
                                   "cloud_lm", "band_ng", "col_block",
                                   "interpret", "layer_major"))
def mcica_optics_lw_fused(seeds, alpha, rcorr, cldf, ciwp, clwp, sigcls,
                          absice, absliq, *, nsub, inhm, cwp_tiny,
                          cloud_mh, cloud_lm, band_ng, col_block=8,
                          uniforms=None, interpret=False,
                          layer_major=False):
    """Fused McICA + cloud-optics (see module banner).

    Args:
      seeds [ncol, 4] uint32; alpha/rcorr/cldf/ciwp/clwp [ncol, nlay];
      sigcls [ncol, nlay] int32; absice/absliq [ncol, nlay, nbnd];
      band_ng: static tuple, g-points per band (sums to nsub).
      uniforms/interpret: test-only injection of externally drawn
        uniforms [ncol, 4, nlay, nsub] + Pallas interpret mode, giving
        the kernel's layout/draw-order semantics an off-TPU gate
        (tests/test_mcica_pallas_interpret.py, VERDICT r4 next #2).

    Returns (taucmc [ncol, nlay, nsub], cloudy [ncol, nlay] bool,
    counts [ncol, 4] int32); with layer_major=True the first two come
    back [nlay, ncol, nsub] / [nlay, ncol] (the rtrnmc_fast layout).
    """
    ncol, nlay = cldf.shape
    nbnd = len(band_ng)
    band_g0 = tuple(np.concatenate([[0], np.cumsum(band_ng)]).tolist())
    fit = _zcw_fit(inhm) if inhm != 0 else None
    B = min(col_block, ncol)
    if ncol % B:
        pad = B - ncol % B
        padf = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                                 mode="edge")
        tau, cloudy, counts = mcica_optics_lw_fused(
            padf(seeds), padf(alpha), padf(rcorr), padf(cldf),
            padf(ciwp), padf(clwp), padf(sigcls), padf(absice),
            padf(absliq), nsub=nsub, inhm=inhm, cwp_tiny=cwp_tiny,
            cloud_mh=cloud_mh, cloud_lm=cloud_lm, band_ng=band_ng,
            col_block=col_block, layer_major=layer_major)
        if layer_major:
            return tau[:, :ncol], cloudy[:, :ncol], counts[:ncol]
        return tau[:ncol], cloudy[:ncol], counts[:ncol]
    is0 = (sigcls == 0).astype(jnp.float32)
    is1 = (sigcls == 1).astype(jnp.float32)

    kern = partial(_kernel, nsub=nsub, nlay=nlay, ncolb=B, inhm=inhm,
                   cwp_tiny=cwp_tiny, cloud_mh=cloud_mh,
                   cloud_lm=cloud_lm, band_g0=band_g0, fit=fit,
                   injected=uniforms is not None,
                   layer_major=layer_major)
    grid = (ncol // B,)
    row = lambda ncols=None: pl.BlockSpec(
        (B, nlay) if ncols is None else (B, nlay, ncols),
        (lambda i: (i, 0)) if ncols is None else (lambda i: (i, 0, 0)),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((B, 2), lambda i: (i, 0),
                     memory_space=pltpu.SMEM),         # seeds (mixed)
        row(), row(), row(), row(), row(),              # alpha..clwp
        row(), row(),                                   # is0, is1
        row(nbnd), row(nbnd),                           # absice, absliq
    ]
    args = [mix_seed_pairs(seeds), alpha, rcorr, cldf, ciwp, clwp,
            is0, is1, absice, absliq]
    if uniforms is not None:
        in_specs.append(pl.BlockSpec((B, 4, nlay, nsub),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(uniforms)
    if layer_major:
        g_spec = pl.BlockSpec((nlay, B, nsub), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        g_shape = jax.ShapeDtypeStruct((nlay, ncol, nsub), jnp.float32)
    else:
        g_spec = pl.BlockSpec((B, nlay, nsub), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        g_shape = jax.ShapeDtypeStruct((ncol, nlay, nsub), jnp.float32)
    tau, cloudy, counts = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            g_spec,
            row(),
            pl.BlockSpec((B, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            g_shape,
            jax.ShapeDtypeStruct((ncol, nlay), jnp.float32),
            jax.ShapeDtypeStruct((ncol, 4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, nlay, nsub), jnp.float32)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if layer_major:
        # cloudy is written column-major in-kernel (tiling constraint);
        # this XLA transpose is 4 bytes/cell — negligible
        return tau, cloudy.T > 0.0, counts.astype(jnp.int32)
    return tau, cloudy > 0.0, counts.astype(jnp.int32)


def _kernel_raw(seeds, alpha, rcorr, cldf,
                cloudy_out, v3_out,
                cdf1, keep1, cdf3, keep3, *, nsub, nlay, ncolb):
    """Verification-only kernel: emit the raw subcolumn draws (the
    presence mask and the forward-filled condensate cdf) so the zcw
    polynomial fit can be A/B-tested against the exact table with
    IDENTICAL hardware-PRNG realizations (VERDICT r3 next #5a)."""
    _draw_fields(seeds, alpha, rcorr, cdf1, keep1, cdf3, keep3,
                 nlay, nsub, ncolb)
    v1 = _ffill(cdf1[:], keep1[:], nlay)
    cloudy_out[:] = (v1 >= 1.0 - cldf[:][:, :, None]).astype(jnp.float32)
    v3_out[:] = _ffill(cdf3[:], keep3[:], nlay)


@partial(jax.jit, static_argnames=("nsub", "col_block"))
def mcica_subcols_raw(seeds, alpha, rcorr, cldf, *, nsub, col_block=8):
    """Raw subcolumn draws with the production kernel's PRNG streams.

    Returns (cloudy [ncol, nlay, nsub] f32, v3 [ncol, nlay, nsub] f32)
    where v3 is the forward-filled condensate cdf the zcw scaling is
    evaluated at. Used only by tools/verify_tpu.py for the same-RNG
    zcw fit-vs-table A/B gate."""
    ncol, nlay = cldf.shape
    B = min(col_block, ncol)
    assert ncol % B == 0
    kern = partial(_kernel_raw, nsub=nsub, nlay=nlay, ncolb=B)
    row = pl.BlockSpec((B, nlay), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    gout = pl.BlockSpec((B, nlay, nsub), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(ncol // B,),
        in_specs=[pl.BlockSpec((B, 2), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  row, row, row],
        out_specs=[gout, gout],
        out_shape=[jax.ShapeDtypeStruct((ncol, nlay, nsub), jnp.float32),
                   jax.ShapeDtypeStruct((ncol, nlay, nsub), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, nlay, nsub), jnp.float32)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(mix_seed_pairs(seeds), alpha, rcorr, cldf)


_CLDMIN = 1.0e-20


def _kernel_sw(seeds, alpha, rcorr, cldf, ciwp, clwp, is0, is1,
               ext_i, scat_i, asy_i, ext_l, scat_l, asy_l,
               *rest,
               nsub, nlay, ncolb, inhm, cwp_tiny, cloud_mh, cloud_lm,
               band_g0, fit, injected, layer_major=False):
    if injected:
        uniforms, tau_out, ssa_out, asm_out, counts_out, \
            cdf1, keep1, cdf3, keep3 = rest
    else:
        tau_out, ssa_out, asm_out, counts_out, \
            cdf1, keep1, cdf3, keep3 = rest
        uniforms = None
    """SW variant: the same subcolumn generation, then the cldprmc_sw
    combination (rrtmg_sw_cldprmc.F90:40-330) on VMEM-resident per-g
    water paths. The delta-scaling algebra is folded into the 6 per-band
    coefficient planes (delta_band_coeffs_sw), so per g-point the
    kernel is six water-path multiplies + the cloudy-cell guards."""
    def cloudy_blk():
        cldy, ciwp_s, clwp_s = _gen_subcols(
            seeds, alpha, rcorr, cldf, ciwp, clwp, is0, is1,
            cdf1, keep1, cdf3, keep3, nsub=nsub, nlay=nlay, ncolb=ncolb,
            inhm=inhm, cwp_tiny=cwp_tiny, fit=fit, uniforms=uniforms)

        gband = jax.lax.broadcasted_iota(jnp.int32, (ncolb, nlay, nsub),
                                         2)
        eg = lambda f: _band_to_g(f, band_g0, gband)

        # cwp is zero outside cloudy cells, so no per-phase masking is
        # needed on the products (has_ice/has_liq of the oracle)
        tauice = ciwp_s * eg(ext_i)
        tauliq = clwp_s * eg(ext_l)
        scatliq = clwp_s * eg(scat_l)
        scatice = jnp.maximum(ciwp_s * eg(scat_i),
                              jnp.where(cldy, _CLDMIN, 0.0))
        taucmc = tauliq + tauice
        taucmc = jnp.where(cldy & (taucmc == 0.0), _CLDMIN, taucmc)
        ssacmc = jnp.where(
            cldy, (scatliq + scatice) / jnp.maximum(taucmc, _CLDMIN),
            1.0)
        asy_num = clwp_s * eg(asy_l) + ciwp_s * eg(asy_i)
        scat_tot = jnp.maximum(scatliq + scatice, 1e-30)
        asmcmc = jnp.where(cldy, asy_num / scat_tot, 0.0)
        taucmc = jnp.where(cldy, taucmc, 0.0)

        if layer_major:
            # [nlay, ncol, nsub] production layout for spcvmc_fast
            # (Mosaic transpose unit; see _kernel)
            tau_out[:] = jnp.swapaxes(taucmc, 0, 1)
            ssa_out[:] = jnp.swapaxes(ssacmc, 0, 1)
            asm_out[:] = jnp.swapaxes(asmcmc, 0, 1)
        else:
            # [B, nlay, nsub] generation layout == the output layout:
            # no transposes anywhere
            tau_out[:] = taucmc
            ssa_out[:] = ssacmc
            asm_out[:] = asmcmc
        _clear_counts(cldy, cloud_mh, cloud_lm, counts_out)

    def clear_blk():
        # exact for cldf == 0 blocks (see _kernel.clear_blk)
        tau_out[:] = jnp.zeros_like(tau_out)
        ssa_out[:] = jnp.ones_like(ssa_out)
        asm_out[:] = jnp.zeros_like(asm_out)
        counts_out[:] = jnp.full_like(counts_out, float(nsub))

    jax.lax.cond(jnp.max(cldf[:]) > 0.0, cloudy_blk, clear_blk)


@partial(jax.jit, static_argnames=("nsub", "inhm", "cwp_tiny", "cloud_mh",
                                   "cloud_lm", "band_ng", "col_block",
                                   "interpret", "layer_major"))
def mcica_optics_sw_fused(seeds, alpha, rcorr, cldf, ciwp, clwp, sigcls,
                          ext_i, scat_i, asy_i, ext_l, scat_l, asy_l,
                          *, nsub, inhm, cwp_tiny, cloud_mh,
                          cloud_lm, band_ng, col_block=8,
                          uniforms=None, interpret=False,
                          layer_major=False):
    """Fused McICA + SW cloud optics with delta scaling.

    Args mirror mcica_optics_lw_fused; the 6 delta-folded coefficient
    planes (tau/scat/asy-numerator rates for ice and liquid) are
    [ncol, nlay, nbnd], from models.rrtmg.cldprmc_sw.delta_band_coeffs_sw.

    Returns (taucmc, ssacmc, asmcmc each [ncol, nlay, nsub],
    counts [ncol, 4] int32); [nlay, ncol, nsub] with layer_major=True
    (the spcvmc_fast layout). Cloudy-per-g is recoverable as taucmc > 0
    (cldprmc_sw floors cloudy cells at CLDMIN).
    """
    ncol, nlay = cldf.shape
    nbnd = len(band_ng)
    band_g0 = tuple(np.concatenate([[0], np.cumsum(band_ng)]).tolist())
    fit = _zcw_fit(inhm) if inhm != 0 else None
    B = min(col_block, ncol)
    if ncol % B:
        pad = B - ncol % B
        padf = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                                 mode="edge")
        tau, ssa, asym, counts = mcica_optics_sw_fused(
            padf(seeds), padf(alpha), padf(rcorr), padf(cldf),
            padf(ciwp), padf(clwp), padf(sigcls), padf(ext_i),
            padf(scat_i), padf(asy_i), padf(ext_l),
            padf(scat_l), padf(asy_l), nsub=nsub, inhm=inhm,
            cwp_tiny=cwp_tiny, cloud_mh=cloud_mh, cloud_lm=cloud_lm,
            band_ng=band_ng, col_block=col_block,
            layer_major=layer_major)
        if layer_major:
            return (tau[:, :ncol], ssa[:, :ncol], asym[:, :ncol],
                    counts[:ncol])
        return tau[:ncol], ssa[:ncol], asym[:ncol], counts[:ncol]
    is0 = (sigcls == 0).astype(jnp.float32)
    is1 = (sigcls == 1).astype(jnp.float32)

    kern = partial(_kernel_sw, nsub=nsub, nlay=nlay, ncolb=B, inhm=inhm,
                   cwp_tiny=cwp_tiny, cloud_mh=cloud_mh,
                   cloud_lm=cloud_lm, band_g0=band_g0, fit=fit,
                   injected=uniforms is not None,
                   layer_major=layer_major)
    grid = (ncol // B,)
    row = lambda ncols=None: pl.BlockSpec(
        (B, nlay) if ncols is None else (B, nlay, ncols),
        (lambda i: (i, 0)) if ncols is None else (lambda i: (i, 0, 0)),
        memory_space=pltpu.VMEM)
    gout = pl.BlockSpec((B, nlay, nsub), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((B, 2), lambda i: (i, 0),
                     memory_space=pltpu.SMEM),         # seeds (mixed)
        row(), row(), row(), row(), row(),              # alpha..clwp
        row(), row(),                                   # is0, is1
        row(nbnd), row(nbnd), row(nbnd),                # ice coeffs
        row(nbnd), row(nbnd), row(nbnd),                # liq coeffs
    ]
    args = [mix_seed_pairs(seeds), alpha, rcorr, cldf, ciwp, clwp,
            is0, is1, ext_i, scat_i, asy_i, ext_l, scat_l, asy_l]
    if uniforms is not None:
        in_specs.append(pl.BlockSpec((B, 4, nlay, nsub),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(uniforms)
    if layer_major:
        gout = pl.BlockSpec((nlay, B, nsub), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        g_shape = jax.ShapeDtypeStruct((nlay, ncol, nsub), jnp.float32)
    else:
        g_shape = jax.ShapeDtypeStruct((ncol, nlay, nsub), jnp.float32)
    tau, ssa, asym, counts = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[gout, gout, gout,
                   pl.BlockSpec((B, 4), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            g_shape, g_shape, g_shape,
            jax.ShapeDtypeStruct((ncol, 4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, nlay, nsub), jnp.float32)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return tau, ssa, asym, counts.astype(jnp.int32)
