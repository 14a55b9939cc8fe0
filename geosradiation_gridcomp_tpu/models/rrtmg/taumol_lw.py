"""RRTMG-LW gas optical depths and Planck fractions (taumol).

Data-driven re-derivation of rrtmg_lw_taumol.F90:158-3149. Instead of 16
hand-written band subroutines with lower/upper layer loops, a single engine
evaluates every band from a declarative spec (key species, minor gases,
adjustments, Planck reference ratios), fully vectorized over
[ncol, nlay, ng]; the troposphere split is a mask, not a loop boundary.

The flat absa/absb gathers (including the eta-straddling -1/+2/+8..+11
offsets of the 0.125/0.875 ternary interpolation, rrtmg_lw_taumol.F90:
543-599) use exactly the reference's EQUIVALENCE layout, built in
tables_lw.py.
"""

import jax.numpy as jnp
import numpy as np

from .tables_lw import lw_tables, NG_LW, NSPA, NSPB, NGPTLW

_ONEMINUS = 1.0 - 1.0e-6

# chi_mls species rows (1-based in reference): 1 h2o, 2 co2, 3 o3, 4 n2o,
# 5 co, 6 ch4, 7 o2
_CHI = {"h2o": 0, "co2": 1, "o3": 2, "n2o": 3, "co": 4, "ch4": 5, "o2": 6}


def _col(coefs, gas):
    return getattr(coefs, "col" + gas)


def _interp_ind(tab, ind, frac):
    """tab (n, ng); ind 1-based [...]; returns tab[ind] + frac*(d)."""
    t0 = tab[ind - 1]
    return t0 + frac[..., None] * (tab[ind] - t0)


def _interp_eta_minor(tab, jm, fm, indm, mfrac):
    """tab (9, 19, ng) or (5, 19, ng); bilinear in (eta, T-index).

    jm, indm 1-based [...]; fm, mfrac fractions.
    """
    def at(j, i):
        return tab[j - 1, i - 1]
    m1 = at(jm, indm) + fm[..., None] * (at(jm + 1, indm) - at(jm, indm))
    m2 = at(jm, indm + 1) + fm[..., None] * (at(jm + 1, indm + 1)
                                             - at(jm, indm + 1))
    return m1 + mfrac[..., None] * (m2 - m1)


def _spec(coefs, gas1, gas2, rat):
    """speccomb/specparm/js/fs for a 2-species key (8 eta intervals)."""
    c1 = _col(coefs, gas1)
    c2 = _col(coefs, gas2)
    speccomb = c1 + rat * c2
    specparm = jnp.minimum(c1 / speccomb, _ONEMINUS)
    specmult = 8.0 * specparm
    js = 1 + jnp.floor(specmult).astype(jnp.int32)
    fs = specmult - jnp.floor(specmult)
    return speccomb, specparm, js, fs


def _spec4(coefs, gas1, gas2, rat):
    """Upper-atmosphere variant: 4 eta intervals."""
    c1 = _col(coefs, gas1)
    c2 = _col(coefs, gas2)
    speccomb = c1 + rat * c2
    specparm = jnp.minimum(c1 / speccomb, _ONEMINUS)
    specmult = 4.0 * specparm
    js = 1 + jnp.floor(specmult).astype(jnp.int32)
    fs = specmult - jnp.floor(specmult)
    return speccomb, specparm, js, fs


def _rat(coefs, chi, gas1, gas2, plus1):
    jp = coefs.jp + (1 if plus1 else 0)
    return chi[_CHI[gas1], jp - 1] / chi[_CHI[gas2], jp - 1]


def _refrat(chi_np, gas1, gas2, level):
    """Fixed reference ratio at a chi_mls level (1-based)."""
    return float(chi_np[_CHI[gas1], level - 1] / chi_np[_CHI[gas2], level - 1])


def _tau_major_2sp(absa, speccomb, specparm, js, fs, ind_base, fac0, fac1):
    """2-species key tau with the 3-branch eta interpolation.

    ind_base: 0-based flat index of (jp', jt', js) position.
    fac0/fac1: fac00/fac10 (or fac01/fac11) pair.
    Returns [..., ng].
    """
    p_lo = fs - 1.0
    p_hi = -fs

    def corner(p):
        p4 = p ** 4
        return p4, 1.0 - p - 2.0 * p4, p + p4

    nmax = absa.shape[0] - 1

    def g(off):
        return absa[jnp.clip(ind_base + off, 0, nmax)]

    f0 = fac0[..., None]
    f1 = fac1[..., None]

    fk0l, fk1l, fk2l = corner(p_lo)
    tau_lo = (fk0l[..., None] * f0 * g(0) + fk1l[..., None] * f0 * g(1)
              + fk2l[..., None] * f0 * g(2) + fk0l[..., None] * f1 * g(9)
              + fk1l[..., None] * f1 * g(10) + fk2l[..., None] * f1 * g(11))
    fk0h, fk1h, fk2h = corner(p_hi)
    tau_hi = (fk2h[..., None] * f0 * g(-1) + fk1h[..., None] * f0 * g(0)
              + fk0h[..., None] * f0 * g(1) + fk2h[..., None] * f1 * g(8)
              + fk1h[..., None] * f1 * g(9) + fk0h[..., None] * f1 * g(10))
    fsx = fs[..., None]
    tau_mid = ((1.0 - fsx) * f0 * g(0) + fsx * f0 * g(1)
               + (1.0 - fsx) * f1 * g(9) + fsx * f1 * g(10))

    lo = (specparm < 0.125)[..., None]
    hi = (specparm > 0.875)[..., None]
    tau = jnp.where(lo, tau_lo, jnp.where(hi, tau_hi, tau_mid))
    return speccomb[..., None] * tau


def _tau_major_2sp_upper(absb, speccomb, js, fs, ind_base, fac0, fac1):
    """Upper 2-species (5 eta points, linear interpolation only)."""
    nmax = absb.shape[0] - 1

    def g(off):
        return absb[jnp.clip(ind_base + off, 0, nmax)]
    fsx = fs[..., None]
    f0 = fac0[..., None]
    f1 = fac1[..., None]
    tau = ((1.0 - fsx) * f0 * g(0) + fsx * f0 * g(1)
           + (1.0 - fsx) * f1 * g(5) + fsx * f1 * g(6))
    return speccomb[..., None] * tau


def _tauself(coefs, selfref):
    return coefs.selffac[..., None] * _interp_ind(
        selfref, coefs.indself, coefs.selffrac)


def _taufor(coefs, forref):
    return coefs.forfac[..., None] * _interp_ind(
        forref, coefs.indfor, coefs.forfrac)


def _minor_flat(coefs, tab):
    """(19, ng) minor-gas table at indminor/minorfrac -> [..., ng]."""
    return _interp_ind(tab, coefs.indminor, coefs.minorfrac)


def _adjcol(coefs, chi, gas, thresh, base, expo, fixed_ref=None):
    """Empirical minor-gas column adjustment (e.g. taumol.F90:458-466)."""
    colgas = _col(coefs, gas)
    if fixed_ref is None:
        ref = chi[_CHI[gas], coefs.jp]       # chi_mls(gas, jp+1), 1-based
    else:
        ref = jnp.full_like(colgas, fixed_ref)
    chi_g = colgas / coefs.coldry
    ratg = 1.0e20 * chi_g / ref
    adjfac = base + jnp.maximum(ratg - base, 1e-12) ** expo
    adj = adjfac * ref * coefs.coldry * 1.0e-20
    return jnp.where(ratg > thresh, adj, colgas)


def _planck_eta(frac_tab, coefs, gas1, gas2, refrat, mult):
    """Eta-interpolated Planck fraction: frac_tab (neta, ng)."""
    c1 = _col(coefs, gas1)
    c2 = _col(coefs, gas2)
    speccomb = c1 + refrat * c2
    specparm = jnp.minimum(c1 / speccomb, _ONEMINUS)
    specmult = mult * specparm
    jpl = 1 + jnp.floor(specmult).astype(jnp.int32)
    fpl = specmult - jnp.floor(specmult)
    t0 = frac_tab[jpl - 1]
    return t0 + fpl[..., None] * (frac_tab[jnp.clip(jpl, 0,
                                  frac_tab.shape[0] - 1)] - t0)


def _eta_minor_idx(coefs, gas1, gas2, refrat, mult):
    c1 = _col(coefs, gas1)
    c2 = _col(coefs, gas2)
    speccomb = c1 + refrat * c2
    specparm = jnp.minimum(c1 / speccomb, _ONEMINUS)
    specmult = mult * specparm
    jm = 1 + jnp.floor(specmult).astype(jnp.int32)
    fm = specmult - jnp.floor(specmult)
    return jm, fm


def _ind0_lower(coefs, nspa):
    return ((coefs.jp - 1) * 5 + (coefs.jt - 1)) * nspa  # 0-based, js=1

def _ind1_lower(coefs, nspa):
    return (coefs.jp * 5 + (coefs.jt1 - 1)) * nspa

def _ind0_upper(coefs, nspb):
    return (jnp.maximum(coefs.jp - 13, 0) * 5 + (coefs.jt - 1)) * nspb

def _ind1_upper(coefs, nspb):
    return (jnp.maximum(coefs.jp - 12, 1) * 5 + (coefs.jt1 - 1)) * nspb


def taumol_lw(coefs, taua=None):
    """Compute gas optical depth and Planck fractions for all 140 g-points.

    coefs: LWCoefs from setcoef_lw.
    taua: optional [..., nlay, 16] aerosol optical depth per band.

    Returns (taug, pfracs): [..., nlay, 140].
    """
    t = lw_tables()
    chi = jnp.asarray(t["chi_mls"])
    chi_np = t["chi_mls"]

    low = coefs.lower[..., None]
    taug_parts = []
    pfrac_parts = []

    for band in range(1, 17):
        tb = {k: jnp.asarray(v) for k, v in t[band].items()}
        ng = NG_LW[band - 1]
        nspa = NSPA[band - 1]
        nspb = NSPB[band - 1]
        absa = tb.get("absa")
        absb = tb.get("absb")
        selfref = tb.get("selfref")   # (10, ng)
        forref = tb.get("forref")     # (4, ng)

        # ---------- LOWER ATMOSPHERE ----------
        if band == 1:
            i0 = _ind0_lower(coefs, 1)
            i1 = _ind1_lower(coefs, 1)
            tlo = coefs.colh2o[..., None] * (
                coefs.fac00[..., None] * absa[jnp.clip(i0, 0, absa.shape[0]-1)]
                + coefs.fac10[..., None] * absa[jnp.clip(i0+1, 0, absa.shape[0]-1)]
                + coefs.fac01[..., None] * absa[jnp.clip(i1, 0, absa.shape[0]-1)]
                + coefs.fac11[..., None] * absa[jnp.clip(i1+1, 0, absa.shape[0]-1)])
            scalen2 = (coefs.colbrd * coefs.scaleminorn2)[..., None]
            tlo = tlo + _tauself(coefs, selfref) + _taufor(coefs, forref) \
                + scalen2 * _minor_flat(coefs, tb["ka_mn2"])
            corr = jnp.where(coefs.pavel < 250.0,
                             1.0 - 0.15 * (250.0 - coefs.pavel) / 154.4, 1.0)
            tlo = corr[..., None] * tlo
            plo = jnp.broadcast_to(tb["fracrefa"], tlo.shape)

            u0 = _ind0_upper(coefs, 1)
            u1 = _ind1_upper(coefs, 1)
            thi = coefs.colh2o[..., None] * (
                coefs.fac00[..., None] * absb[jnp.clip(u0, 0, absb.shape[0]-1)]
                + coefs.fac10[..., None] * absb[jnp.clip(u0+1, 0, absb.shape[0]-1)]
                + coefs.fac01[..., None] * absb[jnp.clip(u1, 0, absb.shape[0]-1)]
                + coefs.fac11[..., None] * absb[jnp.clip(u1+1, 0, absb.shape[0]-1)])
            thi = thi + _taufor(coefs, forref) \
                + scalen2 * _minor_flat(coefs, tb["kb_mn2"])
            thi = (1.0 - 0.15 * (coefs.pavel / 95.6))[..., None] * thi
            phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

        elif band == 2:
            i0 = _ind0_lower(coefs, 1)
            i1 = _ind1_lower(coefs, 1)
            tlo = coefs.colh2o[..., None] * (
                coefs.fac00[..., None] * absa[i0]
                + coefs.fac10[..., None] * absa[i0 + 1]
                + coefs.fac01[..., None] * absa[i1]
                + coefs.fac11[..., None] * absa[i1 + 1])
            tlo = tlo + _tauself(coefs, selfref) + _taufor(coefs, forref)
            corr = 1.0 - 0.05 * (coefs.pavel - 100.0) / 900.0
            tlo = corr[..., None] * tlo
            plo = jnp.broadcast_to(tb["fracrefa"], tlo.shape)

            u0 = _ind0_upper(coefs, 1)
            u1 = _ind1_upper(coefs, 1)
            thi = coefs.colh2o[..., None] * (
                coefs.fac00[..., None] * absb[jnp.clip(u0, 0, absb.shape[0]-1)]
                + coefs.fac10[..., None] * absb[jnp.clip(u0+1, 0, absb.shape[0]-1)]
                + coefs.fac01[..., None] * absb[jnp.clip(u1, 0, absb.shape[0]-1)]
                + coefs.fac11[..., None] * absb[jnp.clip(u1+1, 0, absb.shape[0]-1)])
            thi = thi + _taufor(coefs, forref)
            phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

        else:
            tlo, plo, thi, phi = _generic_band(band, coefs, tb, chi, chi_np)

        taug_b = jnp.where(low, tlo, thi)
        pfrac_b = jnp.where(low, plo, phi)
        taug_parts.append(taug_b)
        pfrac_parts.append(pfrac_b)

    taug = jnp.concatenate(taug_parts, axis=-1)
    pfracs = jnp.concatenate(pfrac_parts, axis=-1)
    if taua is not None:
        ngb = np.repeat(np.arange(16), NG_LW)      # band of each g-point
        taug = taug + taua[..., ngb]
    return taug, pfracs


def _generic_band(band, coefs, tb, chi, chi_np):
    """Bands 3-16: declarative spec evaluation."""
    ng = NG_LW[band - 1]
    nspa = NSPA[band - 1]
    nspb = NSPB[band - 1]
    absa = tb.get("absa")
    absb = tb.get("absb")
    selfref = tb.get("selfref")
    forref = tb.get("forref")

    f00, f10, f01, f11 = coefs.fac00, coefs.fac10, coefs.fac01, coefs.fac11

    def major1(tab, colgas, ind0, ind1):
        nmax = tab.shape[0] - 1

        def g(i):
            return tab[jnp.clip(i, 0, nmax)]
        return colgas[..., None] * (
            f00[..., None] * g(ind0) + f10[..., None] * g(ind0 + 1)
            + f01[..., None] * g(ind1) + f11[..., None] * g(ind1 + 1))

    # ---------------- lower ----------------
    if band == 3:
        rat0 = _rat(coefs, chi, "h2o", "co2", False)
        rat1 = _rat(coefs, chi, "h2o", "co2", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "co2", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "co2", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11)
        jm, fm = _eta_minor_idx(coefs, "h2o", "co2",
                                _refrat(chi_np, "h2o", "co2", 3), 8.0)
        absn2o = _interp_eta_minor(tb["ka_mn2o"], jm, fm,
                                   coefs.indminor, coefs.minorfrac)
        adjn2o = _adjcol(coefs, chi, "n2o", 1.5, 0.5, 0.65)
        tlo = tlo + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + adjn2o[..., None] * absn2o
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "co2",
                          _refrat(chi_np, "h2o", "co2", 9), 8.0)

        ratu0 = _rat(coefs, chi, "h2o", "co2", False)
        ratu1 = _rat(coefs, chi, "h2o", "co2", True)
        scu0, spu0, jsu0, fsu0 = _spec4(coefs, "h2o", "co2", ratu0)
        scu1, spu1, jsu1, fsu1 = _spec4(coefs, "h2o", "co2", ratu1)
        u0 = _ind0_upper(coefs, nspb) + jsu0 - 1
        u1 = _ind1_upper(coefs, nspb) + jsu1 - 1
        thi = _tau_major_2sp_upper(absb, scu0, jsu0, fsu0, u0, f00, f10) \
            + _tau_major_2sp_upper(absb, scu1, jsu1, fsu1, u1, f01, f11)
        jmu, fmu = _eta_minor_idx(coefs, "h2o", "co2",
                                  _refrat(chi_np, "h2o", "co2", 13), 4.0)
        absn2o_u = _interp_eta_minor(tb["kb_mn2o"], jmu, fmu,
                                     coefs.indminor, coefs.minorfrac)
        thi = thi + _taufor(coefs, forref) + adjn2o[..., None] * absn2o_u
        phi = _planck_eta(tb["fracrefb"], coefs, "h2o", "co2",
                          _refrat(chi_np, "h2o", "co2", 13), 4.0)

    elif band == 4:
        rat0 = _rat(coefs, chi, "h2o", "co2", False)
        rat1 = _rat(coefs, chi, "h2o", "co2", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "co2", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "co2", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref)
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "co2",
                          _refrat(chi_np, "h2o", "co2", 11), 8.0)

        ratu0 = _rat(coefs, chi, "o3", "co2", False)
        ratu1 = _rat(coefs, chi, "o3", "co2", True)
        scu0, spu0, jsu0, fsu0 = _spec4(coefs, "o3", "co2", ratu0)
        scu1, spu1, jsu1, fsu1 = _spec4(coefs, "o3", "co2", ratu1)
        u0 = _ind0_upper(coefs, nspb) + jsu0 - 1
        u1 = _ind1_upper(coefs, nspb) + jsu1 - 1
        thi = _tau_major_2sp_upper(absb, scu0, jsu0, fsu0, u0, f00, f10) \
            + _tau_major_2sp_upper(absb, scu1, jsu1, fsu1, u1, f01, f11)
        phi = _planck_eta(tb["fracrefb"], coefs, "o3", "co2",
                          _refrat(chi_np, "o3", "co2", 13), 4.0)
        # stratospheric CO2 cooling-rate tweak (taumol.F90:948-954)
        scale = np.ones(ng, np.float32)
        scale[7:14] = [0.92, 0.88, 1.07, 1.1, 0.99, 0.88, 0.943]
        thi = thi * jnp.asarray(scale)

    elif band == 5:
        rat0 = _rat(coefs, chi, "h2o", "co2", False)
        rat1 = _rat(coefs, chi, "h2o", "co2", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "co2", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "co2", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        jm, fm = _eta_minor_idx(coefs, "h2o", "co2",
                                _refrat(chi_np, "h2o", "co2", 7), 8.0)
        abso3 = _interp_eta_minor(tb["ka_mo3"], jm, fm,
                                  coefs.indminor, coefs.minorfrac)
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + coefs.colo3[..., None] * abso3 \
            + coefs.colccl4[..., None] * tb["ccl4"]
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "co2",
                          _refrat(chi_np, "h2o", "co2", 5), 8.0)

        ratu0 = _rat(coefs, chi, "o3", "co2", False)
        ratu1 = _rat(coefs, chi, "o3", "co2", True)
        scu0, spu0, jsu0, fsu0 = _spec4(coefs, "o3", "co2", ratu0)
        scu1, spu1, jsu1, fsu1 = _spec4(coefs, "o3", "co2", ratu1)
        u0 = _ind0_upper(coefs, nspb) + jsu0 - 1
        u1 = _ind1_upper(coefs, nspb) + jsu1 - 1
        thi = _tau_major_2sp_upper(absb, scu0, jsu0, fsu0, u0, f00, f10) \
            + _tau_major_2sp_upper(absb, scu1, jsu1, fsu1, u1, f01, f11) \
            + coefs.colccl4[..., None] * tb["ccl4"]
        phi = _planck_eta(tb["fracrefb"], coefs, "o3", "co2",
                          _refrat(chi_np, "o3", "co2", 43), 4.0)

    elif band == 6:
        i0 = _ind0_lower(coefs, 1)
        i1 = _ind1_lower(coefs, 1)
        adjco2 = _adjcol(coefs, chi, "co2", 3.0, 2.0, 0.77)
        cfc = coefs.colcfc11[..., None] * tb["cfc11adj"] \
            + coefs.colcfc12[..., None] * tb["cfc12"]
        tlo = major1(absa, coefs.colh2o, i0, i1) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + adjco2[..., None] * _minor_flat(coefs, tb["ka_mco2"]) + cfc
        plo = jnp.broadcast_to(tb["fracrefa"], tlo.shape)
        thi = jnp.broadcast_to(cfc, tlo.shape)
        phi = plo

    elif band == 7:
        rat0 = _rat(coefs, chi, "h2o", "o3", False)
        rat1 = _rat(coefs, chi, "h2o", "o3", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "o3", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "o3", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        jm, fm = _eta_minor_idx(coefs, "h2o", "o3",
                                _refrat(chi_np, "h2o", "o3", 3), 8.0)
        absco2 = _interp_eta_minor(tb["ka_mco2"], jm, fm,
                                   coefs.indminor, coefs.minorfrac)
        adjco2_lo = _adjcol(coefs, chi, "co2", 3.0, 3.0, 0.79)
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + adjco2_lo[..., None] * absco2
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "o3",
                          _refrat(chi_np, "h2o", "o3", 3), 8.0)

        u0 = _ind0_upper(coefs, 1)
        u1 = _ind1_upper(coefs, 1)
        adjco2_hi = _adjcol(coefs, chi, "co2", 3.0, 2.0, 0.79)
        thi = major1(absb, coefs.colo3, u0, u1) \
            + adjco2_hi[..., None] * _minor_flat(coefs, tb["kb_mco2"])
        scale = np.ones(ng, np.float32)
        scale[5:11] = [0.92, 0.88, 1.07, 1.1, 0.99, 0.855]
        thi = thi * jnp.asarray(scale)
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    elif band == 8:
        i0 = _ind0_lower(coefs, 1)
        i1 = _ind1_lower(coefs, 1)
        adjco2 = _adjcol(coefs, chi, "co2", 3.0, 2.0, 0.65)
        tlo = major1(absa, coefs.colh2o, i0, i1) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + adjco2[..., None] * _minor_flat(coefs, tb["ka_mco2"]) \
            + coefs.colo3[..., None] * _minor_flat(coefs, tb["ka_mo3"]) \
            + coefs.coln2o[..., None] * _minor_flat(coefs, tb["ka_mn2o"]) \
            + coefs.colcfc12[..., None] * tb["cfc12"] \
            + coefs.colcfc22[..., None] * tb["cfc22adj"]
        plo = jnp.broadcast_to(tb["fracrefa"], tlo.shape)

        u0 = _ind0_upper(coefs, 1)
        u1 = _ind1_upper(coefs, 1)
        thi = major1(absb, coefs.colo3, u0, u1) \
            + adjco2[..., None] * _minor_flat(coefs, tb["kb_mco2"]) \
            + coefs.coln2o[..., None] * _minor_flat(coefs, tb["kb_mn2o"]) \
            + coefs.colcfc12[..., None] * tb["cfc12"] \
            + coefs.colcfc22[..., None] * tb["cfc22adj"]
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    elif band == 9:
        rat0 = _rat(coefs, chi, "h2o", "ch4", False)
        rat1 = _rat(coefs, chi, "h2o", "ch4", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "ch4", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "ch4", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        jm, fm = _eta_minor_idx(coefs, "h2o", "ch4",
                                _refrat(chi_np, "h2o", "ch4", 3), 8.0)
        absn2o = _interp_eta_minor(tb["ka_mn2o"], jm, fm,
                                   coefs.indminor, coefs.minorfrac)
        adjn2o = _adjcol(coefs, chi, "n2o", 1.5, 0.5, 0.65)
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + adjn2o[..., None] * absn2o
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "ch4",
                          _refrat(chi_np, "h2o", "ch4", 9), 8.0)

        u0 = _ind0_upper(coefs, 1)
        u1 = _ind1_upper(coefs, 1)
        thi = major1(absb, coefs.colch4, u0, u1) \
            + adjn2o[..., None] * _minor_flat(coefs, tb["kb_mn2o"])
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    elif band == 10:
        i0 = _ind0_lower(coefs, 1)
        i1 = _ind1_lower(coefs, 1)
        tlo = major1(absa, coefs.colh2o, i0, i1) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref)
        plo = jnp.broadcast_to(tb["fracrefa"], tlo.shape)
        u0 = _ind0_upper(coefs, 1)
        u1 = _ind1_upper(coefs, 1)
        thi = major1(absb, coefs.colh2o, u0, u1) + _taufor(coefs, forref)
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    elif band == 11:
        scaleo2 = (coefs.colo2 * coefs.scaleminor)[..., None]
        i0 = _ind0_lower(coefs, 1)
        i1 = _ind1_lower(coefs, 1)
        tlo = major1(absa, coefs.colh2o, i0, i1) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + scaleo2 * _minor_flat(coefs, tb["ka_mo2"])
        plo = jnp.broadcast_to(tb["fracrefa"], tlo.shape)
        u0 = _ind0_upper(coefs, 1)
        u1 = _ind1_upper(coefs, 1)
        thi = major1(absb, coefs.colh2o, u0, u1) + _taufor(coefs, forref) \
            + scaleo2 * _minor_flat(coefs, tb["kb_mo2"])
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    elif band == 12:
        rat0 = _rat(coefs, chi, "h2o", "co2", False)
        rat1 = _rat(coefs, chi, "h2o", "co2", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "co2", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "co2", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref)
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "co2",
                          _refrat(chi_np, "h2o", "co2", 10), 8.0)
        thi = jnp.zeros_like(tlo)
        phi = jnp.zeros_like(plo)

    elif band == 13:
        rat0 = _rat(coefs, chi, "h2o", "n2o", False)
        rat1 = _rat(coefs, chi, "h2o", "n2o", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "n2o", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "n2o", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        jm2, fm2 = _eta_minor_idx(coefs, "h2o", "n2o",
                                  _refrat(chi_np, "h2o", "n2o", 1), 8.0)
        absco2 = _interp_eta_minor(tb["ka_mco2"], jm2, fm2,
                                   coefs.indminor, coefs.minorfrac)
        adjco2 = _adjcol(coefs, chi, "co2", 3.0, 2.0, 0.68,
                         fixed_ref=3.55e-4)
        jmc, fmc = _eta_minor_idx(coefs, "h2o", "n2o",
                                  _refrat(chi_np, "h2o", "n2o", 3), 8.0)
        absco = _interp_eta_minor(tb["ka_mco"], jmc, fmc,
                                  coefs.indminor, coefs.minorfrac)
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + adjco2[..., None] * absco2 \
            + coefs.colco[..., None] * absco
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "n2o",
                          _refrat(chi_np, "h2o", "n2o", 5), 8.0)
        thi = coefs.colo3[..., None] * _minor_flat(coefs, tb["kb_mo3"])
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    elif band == 14:
        i0 = _ind0_lower(coefs, 1)
        i1 = _ind1_lower(coefs, 1)
        tlo = major1(absa, coefs.colco2, i0, i1) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref)
        plo = jnp.broadcast_to(tb["fracrefa"], tlo.shape)
        u0 = _ind0_upper(coefs, 1)
        u1 = _ind1_upper(coefs, 1)
        thi = major1(absb, coefs.colco2, u0, u1)
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    elif band == 15:
        rat0 = _rat(coefs, chi, "n2o", "co2", False)
        rat1 = _rat(coefs, chi, "n2o", "co2", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "n2o", "co2", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "n2o", "co2", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        jm, fm = _eta_minor_idx(coefs, "n2o", "co2",
                                _refrat(chi_np, "n2o", "co2", 1), 8.0)
        absn2 = _interp_eta_minor(tb["ka_mn2"], jm, fm,
                                  coefs.indminor, coefs.minorfrac)
        scalen2 = (coefs.colbrd * coefs.scaleminor)[..., None]
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref) \
            + scalen2 * absn2
        plo = _planck_eta(tb["fracrefa"], coefs, "n2o", "co2",
                          _refrat(chi_np, "n2o", "co2", 1), 8.0)
        thi = jnp.zeros_like(tlo)
        phi = jnp.zeros_like(plo)

    elif band == 16:
        rat0 = _rat(coefs, chi, "h2o", "ch4", False)
        rat1 = _rat(coefs, chi, "h2o", "ch4", True)
        sc0, sp0, js0, fs0 = _spec(coefs, "h2o", "ch4", rat0)
        sc1, sp1, js1, fs1 = _spec(coefs, "h2o", "ch4", rat1)
        i0 = _ind0_lower(coefs, nspa) + js0 - 1
        i1 = _ind1_lower(coefs, nspa) + js1 - 1
        tlo = _tau_major_2sp(absa, sc0, sp0, js0, fs0, i0, f00, f10) \
            + _tau_major_2sp(absa, sc1, sp1, js1, fs1, i1, f01, f11) \
            + _tauself(coefs, selfref) + _taufor(coefs, forref)
        plo = _planck_eta(tb["fracrefa"], coefs, "h2o", "ch4",
                          _refrat(chi_np, "h2o", "ch4", 6), 8.0)
        u0 = _ind0_upper(coefs, 1)
        u1 = _ind1_upper(coefs, 1)
        thi = major1(absb, coefs.colch4, u0, u1)
        phi = jnp.broadcast_to(tb["fracrefb"], thi.shape)

    return tlo, plo, thi, phi
