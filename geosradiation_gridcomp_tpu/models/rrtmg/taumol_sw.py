"""RRTMG-SW gas/Rayleigh optical depths and solar source (taumol_sw).

Data-driven re-derivation of rrtmg_sw_taumol.F90:27-2086: per band 16..29,
2-species or 1-species key absorption (simple bilinear eta interpolation -
the SW scheme has no 0.125/0.875 ternary branch), water self/foreign
continuum, per-band extras (CH4/O3/CO2/H2O gray terms, O2 continuum), and
the solar source at a per-column reference layer (laysolfr) computed here
as a vectorized argmax over the jp profile instead of a serial search.

All arrays [ncol, nlay] TOA-first; outputs [ncol, nlay, 112] + sfluxzen
[ncol, 112].
"""

import jax.numpy as jnp
import numpy as np

from .tables_sw import (sw_tables, NG_SW, NSPA, NSPB, STRRAT, LAYREFFR,
                        SOLFR_LOWER, SOLFR_UPPER, NGPTSW)

_ONEMINUS = 1.0 - 1.0e-6


def _eta(col1, col2, strrat, mult):
    speccomb = col1 + strrat * col2
    specparm = jnp.minimum(col1 / speccomb, _ONEMINUS)
    specmult = mult * specparm
    js = 1 + jnp.floor(specmult).astype(jnp.int32)
    fs = specmult - jnp.floor(specmult)
    return speccomb, js, fs


def _interp_ind(tab, ind, frac):
    t0 = tab[ind - 1]
    return t0 + frac[..., None] * (tab[ind] - t0)


def _major2_full(tab, speccomb, js0, fs0, ind0, js1, fs1, ind1, c, estride):
    """Both (jp,jt) and (jp+1,jt1) contributions."""
    nmax = tab.shape[0] - 1

    def g(base, off):
        return tab[jnp.clip(base + off, 0, nmax)]
    fs0x = fs0[..., None]
    fs1x = fs1[..., None]
    f00 = c.fac00[..., None]
    f10 = c.fac10[..., None]
    f01 = c.fac01[..., None]
    f11 = c.fac11[..., None]
    return speccomb[..., None] * (
        (1 - fs0x) * f00 * g(ind0, 0) + fs0x * f00 * g(ind0, 1)
        + (1 - fs0x) * f10 * g(ind0, estride) + fs0x * f10 * g(ind0, estride + 1)
        + (1 - fs1x) * f01 * g(ind1, 0) + fs1x * f01 * g(ind1, 1)
        + (1 - fs1x) * f11 * g(ind1, estride) + fs1x * f11 * g(ind1, estride + 1))


def _major1(tab, colgas, ind0, ind1, c):
    nmax = tab.shape[0] - 1

    def g(i):
        return tab[jnp.clip(i, 0, nmax)]
    return colgas[..., None] * (
        c.fac00[..., None] * g(ind0) + c.fac10[..., None] * g(ind0 + 1)
        + c.fac01[..., None] * g(ind1) + c.fac11[..., None] * g(ind1 + 1))


def _selffor(c, selfref, forref, include_self=True):
    out = c.forfac[..., None] * _interp_ind(forref, c.indfor, c.forfrac)
    if include_self:
        out = out + c.selffac[..., None] * _interp_ind(
            selfref, c.indself, c.selffrac)
    return out


def _laysolfr(c, band):
    """Per-column solar reference layer index (TOA-first, 0-based)."""
    L = LAYREFFR[band]
    nlay = c.jp.shape[-1]
    idx = jnp.arange(nlay)
    if band in SOLFR_UPPER:
        cand = c.jp >= L
        has = jnp.any(cand, axis=-1)
        kmax = jnp.max(jnp.where(cand, idx, -1), axis=-1)
        return jnp.where(has, kmax, 0)
    else:
        # lower-reference: lowest layer with jp >= L, clamped into the
        # lower-atmosphere region; default = topmost lower layer
        cand = c.jp >= L
        has = jnp.any(cand, axis=-1)
        kmax = jnp.max(jnp.where(cand, idx, -1), axis=-1)
        k_trop = jnp.argmax(c.lower.astype(jnp.int32), axis=-1)
        return jnp.where(has, jnp.maximum(kmax, k_trop), k_trop)


def taumol_sw(c, svw=None):
    """Returns (taug, taur, sfluxzen): [ncol, nlay, 112] x2, [ncol, 112].

    svw: optional nrlssi2.SolarVarWeights. When given, the per-band solar
    source table becomes the static linear combination
    w_ref*sfluxref + w_fac*facbrght + w_sns*snsptdrk + w_irr*irradnce
    (the NRLSSI2 SSI decomposition folded at trace time - the isolvar
    branches of rrtmg_sw_taumol.F90 at zero runtime cost)."""
    t = sw_tables()
    taug_parts, taur_parts, sflux_parts = [], [], []
    low = c.lower[..., None]

    for band in range(16, 30):
        bi = band - 16
        tb = {k: jnp.asarray(v) for k, v in t[band].items()}
        if svw is not None:
            tb["sfluxref"] = jnp.asarray(
                svw.w_ref[bi] * t[band]["sfluxref"]
                + svw.w_fac[bi] * t[band]["facbrght"]
                + svw.w_sns[bi] * t[band]["snsptdrk"]
                + svw.w_irr[bi] * t[band]["irradnce"], jnp.float32)
        ng = NG_SW[bi]
        nspa = NSPA[bi]
        nspb = NSPB[bi]
        absa = tb.get("absa")
        absb = tb.get("absb")
        selfref = tb.get("selfref")
        forref = tb.get("forref")
        rayl = tb.get("rayl")

        i0b = ((c.jp - 1) * 5 + (c.jt - 1)) * nspa
        i1b = (c.jp * 5 + (c.jt1 - 1)) * nspa
        u0b = (jnp.maximum(c.jp - 13, 0) * 5 + (c.jt - 1)) * nspb
        u1b = (jnp.maximum(c.jp - 12, 1) * 5 + (c.jt1 - 1)) * nspb

        if rayl is not None and rayl.ndim == 0:
            taur = jnp.broadcast_to(
                (c.colmol * rayl)[..., None],
                c.colmol.shape + (ng,))
        elif rayl is not None:   # per-g rayl
            taur = c.colmol[..., None] * rayl
        else:
            taur = None

        if band == 16:
            sc, js, fs = _eta(c.colh2o, c.colch4, STRRAT[16], 8.0)
            tlo = _major2_full(absa, sc, js, fs, i0b + js - 1,
                               js, fs, i1b + js - 1, c, 9) \
                + c.colh2o[..., None] * _selffor(c, selfref, forref)
            thi = _major1(absb, c.colch4, u0b, u1b, c)
            sflux = jnp.broadcast_to(tb["sfluxref"],
                                     c.jp.shape[:-1] + (ng,))
        elif band in (17, 21):
            sc, js, fs = _eta(c.colh2o, c.colco2, STRRAT[band], 8.0)
            tlo = _major2_full(absa, sc, js, fs, i0b + js - 1,
                               js, fs, i1b + js - 1, c, 9) \
                + c.colh2o[..., None] * _selffor(c, selfref, forref)
            scu, jsu, fsu = _eta(c.colh2o, c.colco2, STRRAT[band], 4.0)
            thi = _major2_full(absb, scu, jsu, fsu, u0b + jsu - 1,
                               jsu, fsu, u1b + jsu - 1, c, 5) \
                + c.colh2o[..., None] * _selffor(c, selfref, forref,
                                                 include_self=False)
            sflux = _sflux_eta2(tb["sfluxref"], c, "h2o", "co2",
                                STRRAT[band], band)
        elif band == 18:
            sc, js, fs = _eta(c.colh2o, c.colch4, STRRAT[18], 8.0)
            tlo = _major2_full(absa, sc, js, fs, i0b + js - 1,
                               js, fs, i1b + js - 1, c, 9) \
                + c.colh2o[..., None] * _selffor(c, selfref, forref)
            thi = _major1(absb, c.colch4, u0b, u1b, c)
            sflux = _sflux_eta2(tb["sfluxref"], c, "h2o", "ch4",
                                STRRAT[18], band)
        elif band == 19:
            sc, js, fs = _eta(c.colh2o, c.colco2, STRRAT[19], 8.0)
            tlo = _major2_full(absa, sc, js, fs, i0b + js - 1,
                               js, fs, i1b + js - 1, c, 9) \
                + c.colh2o[..., None] * _selffor(c, selfref, forref)
            thi = _major1(absb, c.colco2, u0b, u1b, c)
            sflux = _sflux_eta2(tb["sfluxref"], c, "h2o", "co2",
                                STRRAT[19], band)
        elif band == 20:
            tlo = c.colh2o[..., None] * (
                c.fac00[..., None] * absa[i0b] + c.fac10[..., None] * absa[i0b + 1]
                + c.fac01[..., None] * absa[i1b] + c.fac11[..., None] * absa[i1b + 1]
                + _selffor(c, selfref, forref)) \
                + c.colch4[..., None] * tb["absch4"]
            nmaxb = absb.shape[0] - 1
            gb = lambda i: absb[jnp.clip(i, 0, nmaxb)]
            thi = c.colh2o[..., None] * (
                c.fac00[..., None] * gb(u0b) + c.fac10[..., None] * gb(u0b + 1)
                + c.fac01[..., None] * gb(u1b) + c.fac11[..., None] * gb(u1b + 1)
                + _selffor(c, selfref, forref, include_self=False)) \
                + c.colch4[..., None] * tb["absch4"]
            sflux = jnp.broadcast_to(tb["sfluxref"],
                                     c.jp.shape[:-1] + (ng,))
        elif band == 22:
            o2adj = 1.6
            sc, js, fs = _eta(c.colh2o, c.colo2, o2adj * STRRAT[22], 8.0)
            o2cont = (4.35e-4 * c.colo2 / (350.0 * 2.0))[..., None]
            tlo = _major2_full(absa, sc, js, fs, i0b + js - 1,
                               js, fs, i1b + js - 1, c, 9) \
                + c.colh2o[..., None] * _selffor(c, selfref, forref) \
                + o2cont
            thi = (c.colo2 * o2adj)[..., None] * (
                c.fac00[..., None] * absb[jnp.clip(u0b, 0, absb.shape[0]-1)]
                + c.fac10[..., None] * absb[jnp.clip(u0b+1, 0, absb.shape[0]-1)]
                + c.fac01[..., None] * absb[jnp.clip(u1b, 0, absb.shape[0]-1)]
                + c.fac11[..., None] * absb[jnp.clip(u1b+1, 0, absb.shape[0]-1)]) \
                + o2cont
            sflux = _sflux_eta2(tb["sfluxref"], c, "h2o", "o2",
                                STRRAT[22], band, o2adj=o2adj)
        elif band == 23:
            givfac = 1.029
            tlo = c.colh2o[..., None] * (
                givfac * (c.fac00[..., None] * absa[i0b]
                          + c.fac10[..., None] * absa[i0b + 1]
                          + c.fac01[..., None] * absa[i1b]
                          + c.fac11[..., None] * absa[i1b + 1])
                + _selffor(c, selfref, forref))
            thi = jnp.zeros_like(tlo)
            sflux = jnp.broadcast_to(tb["sfluxref"],
                                     c.jp.shape[:-1] + (ng,))
        elif band == 24:
            sc, js, fs = _eta(c.colh2o, c.colo2, STRRAT[24], 8.0)
            tlo = _major2_full(absa, sc, js, fs, i0b + js - 1,
                               js, fs, i1b + js - 1, c, 9) \
                + c.colh2o[..., None] * _selffor(c, selfref, forref) \
                + c.colo3[..., None] * tb["abso3a"]
            thi = _major1(absb, c.colo2, u0b, u1b, c) \
                + c.colo3[..., None] * tb["abso3b"]
            # per-g rayleigh: lower eta-interpolated rayla, upper raylb
            rayla = tb["rayla"]          # (9, ng)
            t0 = rayla[js - 1]
            t1 = rayla[jnp.clip(js, 0, rayla.shape[0] - 1)]
            taur_lo = c.colmol[..., None] * (t0 + fs[..., None] * (t1 - t0))
            taur_hi = c.colmol[..., None] * tb["raylb"]
            taur = jnp.where(low, taur_lo, taur_hi)
            sflux = _sflux_eta2(tb["sfluxref"], c, "h2o", "o2",
                                STRRAT[24], band)
        elif band == 25:
            tlo = c.colh2o[..., None] * (
                c.fac00[..., None] * absa[i0b] + c.fac10[..., None] * absa[i0b + 1]
                + c.fac01[..., None] * absa[i1b] + c.fac11[..., None] * absa[i1b + 1]) \
                + c.colo3[..., None] * tb["abso3a"]
            thi = c.colo3[..., None] * tb["abso3b"]
            sflux = jnp.broadcast_to(tb["sfluxref"],
                                     c.jp.shape[:-1] + (ng,))
        elif band == 26:
            tlo = jnp.zeros(c.jp.shape + (ng,), c.colmol.dtype)
            thi = tlo
            sflux = jnp.broadcast_to(tb["sfluxref"],
                                     c.jp.shape[:-1] + (ng,))
        elif band == 27:
            tlo = _major1(absa, c.colo3, i0b, i1b, c)
            thi = _major1(absb, c.colo3, u0b, u1b, c)
            sflux = jnp.broadcast_to(tb["sfluxref"],
                                     c.jp.shape[:-1] + (ng,))
        elif band == 28:
            sc, js, fs = _eta(c.colo3, c.colo2, STRRAT[28], 8.0)
            tlo = _major2_full(absa, sc, js, fs, i0b + js - 1,
                               js, fs, i1b + js - 1, c, 9)
            scu, jsu, fsu = _eta(c.colo3, c.colo2, STRRAT[28], 4.0)
            thi = _major2_full(absb, scu, jsu, fsu, u0b + jsu - 1,
                               jsu, fsu, u1b + jsu - 1, c, 5)
            sflux = _sflux_eta2(tb["sfluxref"], c, "o3", "o2",
                                STRRAT[28], band)
        elif band == 29:
            tlo = c.colh2o[..., None] * (
                c.fac00[..., None] * absa[i0b] + c.fac10[..., None] * absa[i0b + 1]
                + c.fac01[..., None] * absa[i1b] + c.fac11[..., None] * absa[i1b + 1]
                + _selffor(c, selfref, forref)) \
                + c.colco2[..., None] * tb["absco2"]
            thi = _major1(absb, c.colco2, u0b, u1b, c) \
                + c.colh2o[..., None] * tb["absh2o"]
            sflux = jnp.broadcast_to(tb["sfluxref"],
                                     c.jp.shape[:-1] + (ng,))

        taug_parts.append(jnp.where(low, tlo, thi))
        taur_parts.append(taur)
        sflux_parts.append(sflux)

    taug = jnp.concatenate(taug_parts, axis=-1)
    taur = jnp.concatenate(taur_parts, axis=-1)
    sfluxzen = jnp.concatenate(sflux_parts, axis=-1)
    return taug, taur, sfluxzen


def _sflux_eta2(tab, c, g1, g2, strrat, band, o2adj=1.0):
    """Eta-interpolated solar source at the per-column laysolfr layer."""
    k = _laysolfr(c, band)
    col1 = jnp.take_along_axis(getattr(c, "col" + g1), k[..., None],
                               axis=-1)[..., 0]
    col2 = jnp.take_along_axis(getattr(c, "col" + g2), k[..., None],
                               axis=-1)[..., 0]
    mult = 4.0 if band in SOLFR_UPPER else 8.0
    _, js, fs = _eta(col1, col2, o2adj * strrat, mult)
    nmax = tab.shape[0] - 1
    t0 = tab[js - 1]
    t1 = tab[jnp.clip(js, 0, nmax)]
    return t0 + fs[..., None] * (t1 - t0)
