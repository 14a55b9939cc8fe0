"""Off-TPU gate for the fused McICA Pallas kernel (VERDICT r4 next #2).

The production kernel (ops/mcica_pallas.py) draws from the TPU hardware
PRNG, which has no interpret path - so until round 5 its layout/overlap
semantics were invisible to the CPU suite, and a layout rewrite could
(and in round 4 briefly appeared to) regress silently. These tests run
the SAME kernel under pallas interpret mode with an injectable uniform
source and pin:

  * the exponential-overlap forward-fill semantics (log-doubling
    sublane rolls) against an independent serial numpy forward-fill
  * the draw -> field assignment order (uniform plane 0 = presence cdf,
    1 = presence break, 2 = condensate cdf, 3 = condensate break)
  * exact agreement of the full kernel output with the jnp oracle
    pipeline (ops/mcica.py masks -> cldprmc) given IDENTICAL uniforms
  * the clear-block skip outputs

Contract: cloud_subcol_gen.F90:132-484 (exponential overlap chains,
:403-429) and rrtmg_lw_cldprmc.F90 / rrtmg_sw_cldprmc.F90 optics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geosradiation_gridcomp_tpu.ops import mcica
from geosradiation_gridcomp_tpu.ops.mcica_pallas import (
    mcica_optics_lw_fused, mcica_optics_sw_fused, _zcw_eval, _zcw_fit)
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import (
    cldprmc_lw, band_abs_coeffs_lw)
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_sw import (
    cldprmc_sw, delta_band_coeffs_sw)
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NGPTLW, NG_LW
from geosradiation_gridcomp_tpu.models.rrtmg.tables_sw import NGPTSW, NG_SW

NCOL, NLAY = 16, 24
CWP_TINY = 1.0e-20


def _scene(nsub, seed=0):
    rng = np.random.default_rng(seed)
    alpha = rng.uniform(0.0, 1.0, (NCOL, NLAY)).astype(np.float32)
    rcorr = rng.uniform(0.0, 1.0, (NCOL, NLAY)).astype(np.float32)
    alpha[:, 0] = 0.0
    rcorr[:, 0] = 0.0
    cldf = np.zeros((NCOL, NLAY), np.float32)
    cldf[:, 6:9] = rng.uniform(0.05, 0.95, (NCOL, 3))
    cldf[:, 16:20] = rng.uniform(0.1, 0.99, (NCOL, 4))
    cldf[:4] = 0.0                     # whole-block clear columns
    ciwp = np.where(cldf > 0, rng.uniform(1.0, 40.0, cldf.shape), 0.0)
    clwp = np.where(cldf > 0, rng.uniform(1.0, 80.0, cldf.shape), 0.0)
    rei = rng.uniform(15.0, 90.0, cldf.shape).astype(np.float32)
    rel = rng.uniform(3.0, 20.0, cldf.shape).astype(np.float32)
    seeds = rng.integers(1, 2**31 - 1, (NCOL, 4)).astype(np.uint32)
    u = rng.random((NCOL, 4, NLAY, nsub)).astype(np.float32)
    return (jnp.asarray(alpha), jnp.asarray(rcorr), jnp.asarray(cldf),
            jnp.asarray(ciwp.astype(np.float32)),
            jnp.asarray(clwp.astype(np.float32)),
            jnp.asarray(rei), jnp.asarray(rel), jnp.asarray(seeds),
            jnp.asarray(u))


def _serial_ffill(v, keep):
    """Independent serial forward-fill: [ncol, nlay, nsub], layer 0 is
    always a source (cloud_subcol_gen.F90:403-429)."""
    out = v.copy()
    k = keep.copy()
    k[:, 0, :] = True
    for l in range(1, out.shape[1]):
        take = ~k[:, l, :]
        out[:, l, :] = np.where(take, out[:, l - 1, :], out[:, l, :])
        k[:, l, :] |= k[:, l - 1, :]
    return out


def _ref_subcols(u, alpha, rcorr, cldf, ciwp, clwp, inhm, sigcls=None):
    """Numpy reference of the kernel's generation semantics with
    injected uniforms (field order: cdf1, break1, cdf3, break3)."""
    u = np.asarray(u)
    a = np.asarray(alpha)[:, :, None]
    r = np.asarray(rcorr)[:, :, None]
    v1 = _serial_ffill(u[:, 0], u[:, 1] >= a)
    cloudy = v1 >= 1.0 - np.asarray(cldf)[:, :, None]
    if inhm:
        v3 = _serial_ffill(u[:, 2], u[:, 3] >= r)
        is0 = (np.asarray(sigcls) == 0)[:, :, None]
        is1 = (np.asarray(sigcls) == 1)[:, :, None]
        zcw = np.asarray(_zcw_eval(jnp.asarray(v3),
                                   (jnp.asarray(is0), jnp.asarray(is1)),
                                   _zcw_fit(inhm)))
    else:
        zcw = 1.0
    ci = np.where(cloudy, np.asarray(ciwp)[:, :, None] * zcw, 0.0)
    cl = np.where(cloudy, np.asarray(clwp)[:, :, None] * zcw, 0.0)
    ci = np.where(ci <= CWP_TINY, 0.0, ci).astype(np.float32)
    cl = np.where(cl <= CWP_TINY, 0.0, cl).astype(np.float32)
    cldy = cloudy & ((ci > 0.0) | (cl > 0.0))
    return cldy, ci, cl


def _run_lw(inhm, u, alpha, rcorr, cldf, ciwp, clwp, sigcls, rei, rel,
            seeds):
    absi, absl = band_abs_coeffs_lw(rei, rel)
    return mcica_optics_lw_fused(
        seeds, alpha, rcorr, cldf, ciwp, clwp, sigcls, absi, absl,
        nsub=NGPTLW, inhm=inhm, cwp_tiny=CWP_TINY, cloud_mh=8,
        cloud_lm=14, band_ng=tuple(int(x) for x in NG_LW),
        uniforms=u, interpret=True)


def test_lw_interpret_matches_oracle_pipeline():
    """Fused LW kernel (interpret, injected uniforms) == oracle
    cldprmc_lw fed the numpy-reference subcolumns, elementwise.
    inhm=0 so the zcw fit-vs-table difference cannot mask a layout
    regression."""
    alpha, rcorr, cldf, ciwp, clwp, rei, rel, seeds, u = _scene(NGPTLW)
    sigcls = mcica._sigma_class(cldf)
    tau, cloudy_col, counts = _run_lw(0, u, alpha, rcorr, cldf, ciwp,
                                      clwp, sigcls, rei, rel, seeds)
    cldy, ci, cl = _ref_subcols(u, alpha, rcorr, cldf, ciwp, clwp, 0)
    sw01 = lambda x: jnp.swapaxes(jnp.asarray(x), 1, 2)  # -> [c, g, l]
    tau_gl, cloudy_ref = cldprmc_lw(sw01(cldy), sw01(ci), sw01(cl),
                                    rei, rel)
    tau_ref = np.swapaxes(np.asarray(tau_gl), 1, 2)
    np.testing.assert_allclose(np.asarray(tau), tau_ref, rtol=2e-6,
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(cloudy_col),
                                  np.asarray(cloudy_ref))
    counts_ref = mcica.clear_counts_three_band(
        jnp.asarray(np.swapaxes(np.asarray(tau_ref) > 0, 1, 2)), 8, 14)
    np.testing.assert_array_equal(np.asarray(counts),
                                  np.asarray(counts_ref))


def test_lw_interpret_zcw_scaling():
    """inhm=1: pins the condensate draw order (planes 2/3) and the
    in-kernel zcw evaluation against the numpy reference."""
    alpha, rcorr, cldf, ciwp, clwp, rei, rel, seeds, u = _scene(NGPTLW, 1)
    sigcls = mcica._sigma_class(cldf)
    tau, _, _ = _run_lw(1, u, alpha, rcorr, cldf, ciwp, clwp, sigcls,
                        rei, rel, seeds)
    cldy, ci, cl = _ref_subcols(u, alpha, rcorr, cldf, ciwp, clwp, 1,
                                sigcls)
    sw01 = lambda x: jnp.swapaxes(jnp.asarray(x), 1, 2)
    tau_gl, _ = cldprmc_lw(sw01(cldy), sw01(ci), sw01(cl), rei, rel)
    tau_ref = np.swapaxes(np.asarray(tau_gl), 1, 2)
    # 2e-3: the arcsin-warped Horner chain amplifies compilation-variant
    # fma rounding ~1e3x at its steep ends (observed 7e-4 on 0.1% of
    # cells, interpret vs jit); a draw-order/plane-swap regression flips
    # zcw to an unrelated uniform's value - O(1) on most cloudy cells -
    # so the gate keeps full power for what it pins
    np.testing.assert_allclose(np.asarray(tau), tau_ref, rtol=2e-3,
                               atol=1e-6)


def test_lw_interpret_clear_block_skip():
    """All-clear input: exact zeros + counts == nsub via the block
    skip (rrtmg_sw_rad.F90:1130-1204 clear/cloudy split analog)."""
    alpha, rcorr, cldf, ciwp, clwp, rei, rel, seeds, u = _scene(NGPTLW, 2)
    z = jnp.zeros_like(cldf)
    sigcls = mcica._sigma_class(z)
    tau, cloudy_col, counts = _run_lw(1, u, alpha, rcorr, z, z, z,
                                      sigcls, rei, rel, seeds)
    assert not np.asarray(tau).any()
    assert not np.asarray(cloudy_col).any()
    np.testing.assert_array_equal(np.asarray(counts), NGPTLW)


def test_sw_interpret_matches_oracle_pipeline():
    """Fused SW kernel (interpret, injected uniforms) == oracle
    cldprmc_sw (delta-scaled tau/ssa/asm) on identical subcolumns."""
    alpha, rcorr, cldf, ciwp, clwp, rei, rel, seeds, u = _scene(NGPTSW, 3)
    sigcls = mcica._sigma_class(cldf)
    coeffs = delta_band_coeffs_sw(rei, rel, iceflag=3, liqflag=1)
    tau, ssa, asym, counts = mcica_optics_sw_fused(
        seeds, alpha, rcorr, cldf, ciwp, clwp, sigcls, *coeffs,
        nsub=NGPTSW, inhm=0, cwp_tiny=CWP_TINY, cloud_mh=8,
        cloud_lm=14, band_ng=tuple(int(x) for x in NG_SW),
        uniforms=u, interpret=True)
    cldy, ci, cl = _ref_subcols(u, alpha, rcorr, cldf, ciwp, clwp, 0)
    sw01 = lambda x: jnp.swapaxes(jnp.asarray(x), 1, 2)
    tau_gl, ssa_gl, asm_gl, _ = cldprmc_sw(sw01(cldy), sw01(ci),
                                           sw01(cl), rei, rel,
                                           iceflag=3, liqflag=1)
    back = lambda x: np.swapaxes(np.asarray(x), 1, 2)
    np.testing.assert_allclose(np.asarray(tau), back(tau_gl), rtol=3e-6,
                               atol=1e-7)
    cloudy_cells = back(tau_gl) > CWP_TINY
    np.testing.assert_allclose(np.asarray(ssa)[cloudy_cells],
                               back(ssa_gl)[cloudy_cells], rtol=3e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(asym)[cloudy_cells],
                               back(asm_gl)[cloudy_cells], rtol=3e-6,
                               atol=1e-6)


def test_lw_interpret_layer_major_layout():
    """layer_major=True returns the identical fields transposed to
    [nlay, ncol, nsub] / [nlay, ncol] (the rtrnmc_fast zero-copy
    layout); counts unchanged."""
    alpha, rcorr, cldf, ciwp, clwp, rei, rel, seeds, u = _scene(NGPTLW)
    sigcls = mcica._sigma_class(cldf)
    absi, absl = band_abs_coeffs_lw(rei, rel)
    kw = dict(nsub=NGPTLW, inhm=1, cwp_tiny=CWP_TINY, cloud_mh=8,
              cloud_lm=14, band_ng=tuple(int(x) for x in NG_LW),
              uniforms=u, interpret=True)
    tau0, cld0, cnt0 = mcica_optics_lw_fused(
        seeds, alpha, rcorr, cldf, ciwp, clwp, sigcls, absi, absl, **kw)
    tau1, cld1, cnt1 = mcica_optics_lw_fused(
        seeds, alpha, rcorr, cldf, ciwp, clwp, sigcls, absi, absl,
        layer_major=True, **kw)
    assert tau1.shape == (NLAY, NCOL, NGPTLW)
    assert cld1.shape == (NLAY, NCOL)
    np.testing.assert_array_equal(np.swapaxes(np.asarray(tau1), 0, 1),
                                  np.asarray(tau0))
    np.testing.assert_array_equal(np.asarray(cld1).T, np.asarray(cld0))
    np.testing.assert_array_equal(np.asarray(cnt1), np.asarray(cnt0))


def test_sw_interpret_layer_major_layout():
    alpha, rcorr, cldf, ciwp, clwp, rei, rel, seeds, u = _scene(NGPTSW, 3)
    sigcls = mcica._sigma_class(cldf)
    coeffs = delta_band_coeffs_sw(rei, rel, iceflag=3, liqflag=1)
    kw = dict(nsub=NGPTSW, inhm=1, cwp_tiny=CWP_TINY, cloud_mh=8,
              cloud_lm=14, band_ng=tuple(int(x) for x in NG_SW),
              uniforms=u, interpret=True)
    out0 = mcica_optics_sw_fused(seeds, alpha, rcorr, cldf, ciwp, clwp,
                                 sigcls, *coeffs, **kw)
    out1 = mcica_optics_sw_fused(seeds, alpha, rcorr, cldf, ciwp, clwp,
                                 sigcls, *coeffs, layer_major=True, **kw)
    for a1, a0 in zip(out1[:3], out0[:3]):
        assert a1.shape == (NLAY, NCOL, NGPTSW)
        np.testing.assert_array_equal(np.swapaxes(np.asarray(a1), 0, 1),
                                      np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(out1[3]),
                                  np.asarray(out0[3]))
