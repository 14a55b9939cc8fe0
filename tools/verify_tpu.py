"""On-TPU fast-path verification: every compiled Pallas kernel vs its
jnp oracle at production shapes (VERDICT r2 weak #2 / next #6).

Run on a real chip:  python tools/verify_tpu.py [--quick]
Writes VERIFY_TPU.json with per-kernel max relative errors and the
population-statistics evidence for the stochastic (McICA) kernels, and
exits nonzero if any gate fails.

Gates:
  rtrnmc_fast   elementwise vs rtrnmc          (deterministic, 5e-4 rel)
  spcvmc_fast   elementwise vs spcvmc_sw       (deterministic, 5e-4 rel)
  mcica fused   population stats vs the threefry oracle + determinism +
                column-permutation invariance (the reference's own
                contract, cloud_subcol_gen.F90:24-31), plus an
                END-TO-END flux bound: LW/SW fluxes with the fused
                kernels vs the oracle pipeline on the same scene must
                agree in the MEAN over columns (per-column subcolumn
                noise averages out) - this bounds the zcw Chebyshev
                approximation at flux level (VERDICT r2 weak #4).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _relmax(a, b, floor=1e-6):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), floor)
    return float(np.abs(a - b).max() / scale)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="ncol=512 instead of 2048")
    ap.add_argument("--nlev", type=int, default=72)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", (
        "verify_tpu must run on a real TPU; backend is "
        + jax.default_backend())

    from __graft_entry__ import _example_inputs
    from geosradiation_gridcomp_tpu.models.rrtmg import lw as lwmod
    from geosradiation_gridcomp_tpu.models.rrtmg import rtrnmc as rt
    from geosradiation_gridcomp_tpu.models.rrtmg.rtrnmc_pallas import (
        rtrnmc_fast)
    from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc import spcvmc_sw
    from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc_pallas import (
        spcvmc_fast)
    from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_lw import (
        setcoef_lw)
    from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_sw import (
        setcoef_sw)
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw import (
        taumol_lw)
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw import (
        taumol_sw)
    from geosradiation_gridcomp_tpu.models.rrtmg.nrlssi2 import (
        solar_source_weights)
    from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import (
        cldprmc_lw, band_abs_coeffs_lw)
    from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_sw import (
        cldprmc_sw, delta_band_coeffs_sw)
    from geosradiation_gridcomp_tpu.ops import mcica
    from geosradiation_gridcomp_tpu.ops.mcica_pallas import (
        mcica_optics_lw_fused, mcica_optics_sw_fused)
    from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import (
        NGPTLW, NG_LW)
    from geosradiation_gridcomp_tpu.models.rrtmg.tables_sw import (
        NGPTSW, NG_SW)

    ncol = 512 if args.quick else 2048
    nlev = args.nlev
    inp = jax.device_put(_example_inputs(ncol=ncol, nlev=nlev))
    play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
    plev = inp.ple * 0.01
    tlev = lwmod.level_temperatures(play, inp.t, plev, inp.ts)
    zm = lwmod.mid_heights(play, inp.t, inp.ple[:, -1])
    emis = jnp.broadcast_to(inp.emis[:, None], (ncol, 16))
    h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
    o3 = inp.o3 * (28.964 / 47.998)
    c = lambda v: jnp.full_like(play, v)
    dp = inp.ple[:, 1:] - inp.ple[:, :-1]
    ciwp = 1000.0 * inp.qi * dp / 9.80665
    clwp = 1000.0 * inp.ql * dp / 9.80665
    report = {"ncol": ncol, "nlev": nlev, "gates": {}}
    ok = True

    def gate(name, err, tol):
        nonlocal ok
        passed = bool(err < tol)
        ok = ok and passed
        report["gates"][name] = {"err": err, "tol": tol, "pass": passed}
        print(f"{name:42s} err={err:.3e} tol={tol:.0e} "
              f"{'PASS' if passed else 'FAIL'}")

    # ---- deterministic kernels: elementwise parity -------------------
    coefs = setcoef_lw(play, inp.t, plev, tlev, inp.ts, emis, h2o, o3,
                       c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(0.0),
                       c(2e-10), c(4e-10), c(1e-10), c(0.0), dudts=True)
    taug, pfracs = taumol_lw(coefs)
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw_pallas import \
        taumol_lw_fast
    tg_f, pf_f = jax.jit(taumol_lw_fast)(coefs)
    gate("taumol_lw_fast.taug", _relmax(tg_f, taug), 5e-4)
    gate("taumol_lw_fast.pfracs", _relmax(pf_f, pfracs), 5e-4)
    cldy, ciwp_s, clwp_s = mcica.generate_stochastic_clouds(
        zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
        nsubcol=NGPTLW, inhm=1, seed_order=(0, 1, 2, 3))
    taucmc_gl, cloudy = cldprmc_lw(cldy, ciwp_s, clwp_s, inp.ri, inp.rl)
    taucmc = jnp.swapaxes(taucmc_gl, -1, -2)
    rt_args = (emis, taug, pfracs, cloudy, taucmc, coefs.planklay,
               coefs.planklev, coefs.plankbnd, coefs.dplankbnd_dts,
               coefs.pwvcm)
    a = rt.rtrnmc(*rt_args, dudts=True)
    b = rtrnmc_fast(*rt_args, dudts=True)
    for k in ("uflx", "dflx", "uflxc", "dflxc", "duflx_dts", "olrb"):
        gate(f"rtrnmc_fast.{k}", _relmax(b[k], a[k]), 5e-4)

    scoefs = setcoef_sw(play, inp.t, plev, h2o, o3, c(4e-4), c(1.8e-6),
                        c(0.2095))
    svw = solar_source_weights(-1, 1361.0, None, None, None)
    tg_s, tr_s, sflux = taumol_sw(scoefs, svw)
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw_pallas import \
        taumol_sw_pallas
    tg_p, tr_p, _ = jax.jit(lambda sc: taumol_sw_pallas(sc, svw))(scoefs)
    gate("taumol_sw_pallas.taug", _relmax(tg_p, tg_s), 5e-4)
    gate("taumol_sw_pallas.taur", _relmax(tr_p, tr_s), 5e-4)
    cldy2, ci2, cl2 = mcica.generate_stochastic_clouds(
        zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
        nsubcol=NGPTSW, inhm=1, seed_order=(3, 2, 1, 0))
    tc, sc, ac, _ = cldprmc_sw(cldy2, ci2, cl2, inp.ri, inp.rl)
    swap = lambda x: jnp.swapaxes(x, -1, -2)
    tc, sc, ac, cy = swap(tc), swap(sc), swap(ac), swap(cldy2)
    mu0 = jnp.clip(jnp.cos(inp.lats), 0.05, 1.0)
    albdir = jnp.broadcast_to(inp.albvr[:, None], (ncol, 14))
    albdif = jnp.broadcast_to(inp.albvf[:, None], (ncol, 14))
    sp_args = (None, tg_s, tr_s, sflux, mu0, albdir, albdif, cy, tc,
               sc, ac)
    a = spcvmc_sw(*sp_args)
    b = spcvmc_fast(*sp_args)
    for k in ("bbfd", "bbfu", "bbcd", "bbcu", "bbfddir", "nirr",
              "parf", "fndsbnd", "drband"):
        gate(f"spcvmc_fast.{k}", _relmax(b[k], a[k]), 5e-4)

    # ---- stochastic kernels: determinism + population stats ---------
    alpha, rcorr = mcica.overlap_params(zm, inp.lats, 172.0)
    sigcls = mcica._sigma_class(inp.fcld)
    seeds = jax.vmap(lambda p: mcica.state_seed_ints(
        p, (0, 1, 2, 3)))(play)
    absi, absl = band_abs_coeffs_lw(inp.ri, inp.rl)
    run = lambda s=seeds, al=alpha: mcica_optics_lw_fused(
        s, al, rcorr, inp.fcld, ciwp, clwp, sigcls, absi, absl,
        nsub=NGPTLW, inhm=1, cwp_tiny=1e-20, cloud_mh=28, cloud_lm=47,
        band_ng=tuple(int(x) for x in NG_LW))
    t1, cl1, ct1 = jax.block_until_ready(run())
    t2, _, _ = jax.block_until_ready(run())
    det = bool(jnp.all(t1 == t2))
    perm = np.random.default_rng(0).permutation(ncol)
    tp, _, _ = mcica_optics_lw_fused(
        seeds[perm], alpha[perm], rcorr[perm], inp.fcld[perm],
        ciwp[perm], clwp[perm], sigcls[perm], absi[perm], absl[perm],
        nsub=NGPTLW, inhm=1, cwp_tiny=1e-20, cloud_mh=28, cloud_lm=47,
        band_ng=tuple(int(x) for x in NG_LW))
    inv = bool(jnp.all(tp == t1[jnp.asarray(perm)]))
    gate("mcica_lw_fused.determinism", 0.0 if det else 1.0, 0.5)
    gate("mcica_lw_fused.perm_invariance", 0.0 if inv else 1.0, 0.5)
    # population: subcolumn cloud fraction vs input cldf
    cf_fused = np.asarray((t1 > 0).mean(axis=2))      # [ncol, nlay]
    sel = np.asarray(inp.fcld) > 0
    pop_err = float(np.abs(cf_fused[sel]
                           - np.asarray(inp.fcld)[sel]).mean())
    gate("mcica_lw_fused.cldfrac_population", pop_err, 0.06)

    # ---- end-to-end flux bound for the fused path (zcw Chebyshev) ----
    lwargs = (inp.ple, play, inp.t, tlev, inp.ts, emis, h2o, o3,
              c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(0.0),
              c(2e-10), c(4e-10), c(1e-10), c(0.0),
              inp.fcld, ciwp, clwp, inp.ri, inp.rl, zm, inp.lats, 172.0)
    out_f = lwmod.rrtmg_lw(*lwargs, cloud_mh=28, cloud_lm=47)  # fused
    out_o = rt.rtrnmc(emis, taug, pfracs, cloudy, taucmc,
                      coefs.planklay, coefs.planklev, coefs.plankbnd,
                      coefs.dplankbnd_dts, coefs.pwvcm, dudts=True)
    # Noise calibration. The fused path and the oracle draw DIFFERENT
    # subcolumn realizations (hardware PRNG vs threefry), so the
    # column-mean all-sky flux difference carries realization noise;
    # with per-column seed diversity (every column's seeds derive from
    # its own fractional surface pressures, cloud_subcol_gen.F90:
    # 336-400) the 2048 columns are independent realizations and the
    # floor is small. Measure it as the MAX over several oracle-vs-
    # oracle reseeds (a single-sample floor estimate is itself ~50%
    # noisy - ADVICE r4 #2; and round 4's red gate was exactly a
    # degenerate-seed scene collapsing the sample size to 1).
    noise_means = []
    for so in ((1, 2, 3, 0), (2, 3, 0, 1), (3, 0, 1, 2)):
        cldy_n, ci_n, cl_n = mcica.generate_stochastic_clouds(
            zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
            nsubcol=NGPTLW, inhm=1, seed_order=so)
        tau_n, cloudy_n = cldprmc_lw(cldy_n, ci_n, cl_n, inp.ri, inp.rl)
        out_n = rt.rtrnmc(emis, taug, pfracs, cloudy_n,
                          jnp.swapaxes(tau_n, -1, -2), coefs.planklay,
                          coefs.planklev, coefs.plankbnd,
                          coefs.dplankbnd_dts, coefs.pwvcm, dudts=True)
        noise_means.append({k: np.asarray(out_n[k]).mean(axis=0)
                            for k in ("uflx", "dflx")})
    for k in ("uflx", "dflx"):
        mean_f = np.asarray(out_f[k]).mean(axis=0)
        mean_o = np.asarray(out_o[k]).mean(axis=0)
        noise = max(float(np.abs(nm[k] - mean_o).max())
                    for nm in noise_means)
        err = float(np.abs(mean_f - mean_o).max())
        gate(f"fused_vs_oracle_meanflux.{k} (W/m2)", err,
             max(0.5, 2.5 * noise))

    # ---- clear-sky END-TO-END: production TPU pipeline vs jnp oracle --
    # Clear-sky RRTMG is deterministic (no subcolumn draws matter), so
    # the full compiled production path (fused taumol + rtrnmc Pallas
    # kernels, clear-block McICA skip, cloudy-first sort) must match the
    # jnp oracle pipeline ELEMENTWISE (VERDICT r3 next #5b).
    z2 = jnp.zeros_like(inp.fcld)
    out_p = lwmod.rrtmg_lw(
        inp.ple, play, inp.t, tlev, inp.ts, emis, h2o, o3,
        c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(0.0),
        c(2e-10), c(4e-10), c(1e-10), c(0.0),
        z2, z2, z2, inp.ri, inp.rl, zm, inp.lats, 172.0,
        cloud_mh=28, cloud_lm=47)
    taucmc0 = jnp.zeros((ncol, nlev, NGPTLW))
    cloudy0 = jnp.zeros((ncol, nlev), bool)
    out_c = rt.rtrnmc(emis, taug, pfracs, cloudy0, taucmc0,
                      coefs.planklay, coefs.planklev, coefs.plankbnd,
                      coefs.dplankbnd_dts, coefs.pwvcm, dudts=True)
    for k in ("uflx", "dflx", "duflx_dts"):
        gate(f"clearsky_e2e_lw.{k}", _relmax(out_p[k], out_c[k]), 5e-5)

    from geosradiation_gridcomp_tpu.models.rrtmg import sw as swmod
    mu0d = jnp.clip(jnp.cos(inp.lats), 0.05, 1.0)
    outs_p = swmod.rrtmg_sw(
        inp.ple, play, inp.t, mu0d, inp.albvr, inp.albvf, inp.albnr,
        inp.albnf, h2o, o3, c(4e-4), c(1.8e-6), c(0.2095),
        z2, z2, z2, inp.ri, inp.rl, zm, inp.lats, 172.0,
        cloud_mh=28, cloud_lm=47)
    uvband = np.zeros(14, bool)
    uvband[9:13] = True                     # bands 10-13 (1-based)
    abd = jnp.where(jnp.asarray(uvband), inp.albvr[:, None],
                    inp.albnr[:, None])
    abf = jnp.where(jnp.asarray(uvband), inp.albvf[:, None],
                    inp.albnf[:, None])
    tc0 = jnp.zeros((ncol, nlev, NGPTSW))
    cy0 = jnp.zeros((ncol, nlev, NGPTSW), bool)
    outs_c = spcvmc_sw(scoefs, tg_s, tr_s, sflux, mu0d, abd, abf,
                       cy0, tc0, tc0, tc0)
    # The PIFM solver has a DISCRETE branch at the conservative-
    # scattering threshold (zwo >= zwcrit = 0.9999995; same knife edge
    # in the reference, rrtmg_sw_spcvmc.F90:1212,1267, stabilized there
    # by real*8). Round 4 gated this at 5e-3 max / 5% flipped columns
    # because ulp wobble in f32 zwo flipped isolated cells between
    # branches. Round 5 removed the instability at its roots: the
    # branch predicate is now evaluated from an EXACT relative
    # (1 - w) = absorption/total supplied by the caller (spcvmc.py
    # reftra_sw womz), and the non-conservative direct-beam resonance
    # zrk*mu0 -> 1 is factored analytically, so recompilation wobble
    # can no longer cross either threshold. Measured r5: 0 flipped
    # columns, max 3.3e-5 - gates tightened 10x/10x per VERDICT r4 #5.
    for k in ("bbfu", "bbfd", "bbcu", "bbcd"):
        e = np.abs(np.asarray(outs_p[k], np.float64)
                   - np.asarray(outs_c[k], np.float64)) \
            / max(float(np.abs(np.asarray(outs_c[k])).max()), 1e-6)
        colmax = e.max(axis=1)
        gate(f"clearsky_e2e_sw.{k}.flipped_cols",
             float((colmax > 5e-5).mean()), 0.005)
        gate(f"clearsky_e2e_sw.{k}.max", float(e.max()), 5e-4)

    # ---- same-RNG zcw A/B: polynomial fit vs exact table -------------
    # identical hardware-PRNG realizations through mcica_subcols_raw;
    # the only difference between the two flux sets is the in-kernel
    # arcsin-warped polynomial vs the bilinear table, so the mean-flux
    # delta IS the systematic fit bias (VERDICT r3 next #5a) - no
    # realization noise in the comparison.
    from geosradiation_gridcomp_tpu.ops.mcica_pallas import (
        mcica_subcols_raw, _zcw_fit, _zcw_eval, _class_columns)
    cldy_raw, v3 = mcica_subcols_raw(seeds, alpha, rcorr, inp.fcld,
                                     nsub=NGPTLW)    # [ncol, nlay, nsub]
    is0p = (np.asarray(sigcls) == 0)[:, :, None]
    is1p = (np.asarray(sigcls) == 1)[:, :, None]
    zfit = np.asarray(_zcw_eval(jnp.asarray(v3),
                                (jnp.asarray(is0p), jnp.asarray(is1p)),
                                _zcw_fit(1)))
    colsv = _class_columns(1).astype(np.float32)          # (3, 1000)
    v = np.asarray(v3)
    rind1 = v * 999.0 + 1.0
    idx = np.clip(np.floor(rind1).astype(np.int32), 1, 999)
    f1 = (rind1 - idx).astype(np.float32)
    zex = np.zeros_like(v)
    clsn = np.asarray(sigcls)
    for cc in range(3):
        vals = colsv[cc][idx - 1] + f1 * (colsv[cc][idx]
                                          - colsv[cc][idx - 1])
        zex = np.where((clsn == cc)[:, :, None], vals, zex)
    cw = np.asarray(cldy_raw) > 0.0
    fluxes = {}
    for name, zcw in (("fit", zfit), ("exact", zex)):
        ci_s = np.where(cw, np.asarray(ciwp)[:, :, None] * zcw, 0.0)
        cl_s = np.where(cw, np.asarray(clwp)[:, :, None] * zcw, 0.0)
        ci_s = np.where(ci_s <= 1e-20, 0.0, ci_s).astype(np.float32)
        cl_s = np.where(cl_s <= 1e-20, 0.0, cl_s).astype(np.float32)
        cldy_ab = cw & ((ci_s > 0.0) | (cl_s > 0.0))
        # cldprmc_lw takes the oracle's [ncol, nsub, nlay] layout
        sw01 = lambda x: jnp.swapaxes(jnp.asarray(x), 1, 2)
        tau_gl, cldy_col = cldprmc_lw(
            sw01(cldy_ab), sw01(ci_s), sw01(cl_s),
            inp.ri, inp.rl)
        o = rt.rtrnmc(emis, taug, pfracs, cldy_col,
                      jnp.swapaxes(tau_gl, -1, -2), coefs.planklay,
                      coefs.planklev, coefs.plankbnd,
                      coefs.dplankbnd_dts, coefs.pwvcm, dudts=False)
        fluxes[name] = {k: np.asarray(o[k]).mean(axis=0)
                        for k in ("uflx", "dflx")}
    for k in ("uflx", "dflx"):
        err = float(np.abs(fluxes["fit"][k] - fluxes["exact"][k]).max())
        gate(f"zcw_fit_ab_same_rng.{k} (W/m2)", err, 0.1)

    report["ok"] = ok
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "VERIFY_TPU.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("overall:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
