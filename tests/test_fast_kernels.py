"""Oracle tests for the TPU fast paths.

The gather-layout taumol engines (taumol_lw / taumol_sw_fast) and the
Pallas rtrnmc kernels must reproduce the per-band reference engines
(taumol_*_ref, rtrnmc) to f32 summation-order roundoff. These run on the
CPU mesh; the fast taumol paths are pure XLA and run everywhere, the
Pallas kernels run in interpreter mode here and compiled on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosradiation_gridcomp_tpu.models.rrtmg import lw as lwmod
from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_lw import setcoef_lw
from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_sw import setcoef_sw
from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw import (
    taumol_lw, taumol_lw_ref)
from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw import (
    taumol_sw_fast, taumol_sw_ref)
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NGPTLW

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _example_inputs as example_inputs


@pytest.fixture(scope="module")
def lw_coefs():
    inp = example_inputs(ncol=16, nlev=72)
    play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
    plev = inp.ple * 0.01
    tlay = inp.t
    tlev = lwmod.level_temperatures(play, tlay, plev, inp.ts)
    emis = jnp.broadcast_to(inp.emis[:, None], (16, 16))
    h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
    o3 = inp.o3 * (28.964 / 47.998)
    c = lambda v: jnp.full_like(play, v)
    return inp, play, plev, tlay, tlev, emis, setcoef_lw(
        play, tlay, plev, tlev, inp.ts, emis, h2o, o3,
        c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(1.5e-7),
        c(2e-10), c(4e-10), c(1e-10), c(8e-11), dudts=True)


def _relmax(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return (np.abs(a - b) / (np.abs(b) + 1e-12)).max()


def test_taumol_lw_fast_matches_ref(lw_coefs):
    *_, coefs = lw_coefs
    tg_f, pf_f = taumol_lw(coefs)
    tg_r, pf_r = taumol_lw_ref(coefs)
    assert _relmax(tg_f, tg_r) < 5e-6
    assert _relmax(pf_f, pf_r) < 5e-6


def test_taumol_lw_fast_aerosol(lw_coefs):
    *_, coefs = lw_coefs
    taua = jnp.full(coefs.jp.shape + (16,), 0.01, jnp.float32)
    tg_f, _ = taumol_lw(coefs, taua)
    tg_r, _ = taumol_lw_ref(coefs, taua)
    assert _relmax(tg_f, tg_r) < 5e-6


def test_taumol_sw_fast_matches_ref():
    inp = example_inputs(ncol=16, nlev=72)
    play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
    plev = inp.ple * 0.01
    h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
    o3 = inp.o3 * (28.964 / 47.998)
    c = lambda v: jnp.full_like(play, v)
    coefs = setcoef_sw(play, inp.t, plev, h2o, o3, c(4e-4), c(1.8e-6),
                       c(0.2095))
    a = taumol_sw_fast(coefs)
    b = taumol_sw_ref(coefs)
    for x, y in zip(a, b):
        assert _relmax(x, y) < 5e-6


def test_taumol_lw_pallas_interpret(lw_coefs):
    """Transposed-space Pallas taumol-LW (interpret mode) vs the gather
    engine: bf16x3 parity <= 1e-4 relative."""
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw_pallas import (
        taumol_lw_fast)
    *_, coefs = lw_coefs
    tg_f, pf_f = taumol_lw_fast(coefs, interpret=True)
    tg_r, pf_r = taumol_lw(coefs)
    assert _relmax(tg_f, tg_r) < 1e-4
    assert _relmax(pf_f, pf_r) < 1e-4


def test_taumol_sw_pallas_interpret():
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw_pallas import (
        taumol_sw_pallas)
    inp = example_inputs(ncol=8, nlev=72)
    play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
    plev = inp.ple * 0.01
    h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
    o3 = inp.o3 * (28.964 / 47.998)
    c = lambda v: jnp.full_like(play, v)
    coefs = setcoef_sw(play, inp.t, plev, h2o, o3, c(4e-4), c(1.8e-6),
                       c(0.2095))
    a = taumol_sw_ref(coefs)
    b = taumol_sw_pallas(coefs, interpret=True)
    for x, y in zip(b, a):
        assert _relmax(x, y) < 1e-4


def test_spcvmc_pallas_interpret():
    """spcvmc_fast (interpret mode) vs the jnp spcvmc_sw oracle."""
    from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_sw import (
        cldprmc_sw)
    from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc import spcvmc_sw
    from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc_pallas import (
        spcvmc_fast)
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw import (
        taumol_sw)
    from geosradiation_gridcomp_tpu.models.rrtmg.nrlssi2 import (
        solar_source_weights)
    from geosradiation_gridcomp_tpu.ops.mcica import (
        generate_stochastic_clouds)
    from geosradiation_gridcomp_tpu.models.rrtmg.tables_sw import NGPTSW

    inp = example_inputs(ncol=8, nlev=72)
    ncol = 8
    play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
    plev = inp.ple * 0.01
    h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
    o3 = inp.o3 * (28.964 / 47.998)
    c = lambda v: jnp.full_like(play, v)
    coefs = setcoef_sw(play, inp.t, plev, h2o, o3, c(4e-4), c(1.8e-6),
                       c(0.2095))
    svw = solar_source_weights(-1, 1361.0, None, None, None)
    taug, taur, sfluxzen = taumol_sw(coefs, svw)

    zm = lwmod.mid_heights(play, inp.t, inp.ple[:, -1])
    dp = inp.ple[:, 1:] - inp.ple[:, :-1]
    ciwp = 1000.0 * inp.qi * dp / 9.80665
    clwp = 1000.0 * inp.ql * dp / 9.80665
    cldy, ciwp_s, clwp_s = generate_stochastic_clouds(
        zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
        nsubcol=NGPTSW, inhm=1, seed_order=(3, 2, 1, 0))
    taucmc_gl, ssacmc_gl, asmcmc_gl, _ = cldprmc_sw(
        cldy, ciwp_s, clwp_s, inp.ri, inp.rl, iceflag=3, liqflag=1)
    swap = lambda x: jnp.swapaxes(x, -1, -2)
    taucmc, ssacmc, asmcmc = map(swap, (taucmc_gl, ssacmc_gl, asmcmc_gl))
    cldymc = swap(cldy)

    mu0 = jnp.asarray(np.linspace(0.05, 0.95, ncol), jnp.float32)
    albdir = jnp.full((ncol, 14), 0.15, jnp.float32)
    albdif = jnp.full((ncol, 14), 0.22, jnp.float32)
    taua = jnp.full((ncol, 72, 14), 0.02, jnp.float32)
    ssaa = jnp.full((ncol, 72, 14), 0.9, jnp.float32)
    asya = jnp.full((ncol, 72, 14), 0.6, jnp.float32)

    a = spcvmc_sw(coefs, taug, taur, sfluxzen, mu0, albdir, albdif,
                  cldymc, taucmc, ssacmc, asmcmc,
                  taua=taua, ssaa=ssaa, asya=asya, adjflux=1.01)
    b = spcvmc_fast(coefs, taug, taur, sfluxzen, mu0, albdir, albdif,
                    cldymc, taucmc, ssacmc, asmcmc,
                    taua=taua, ssaa=ssaa, asya=asya, adjflux=1.01,
                    block_cols=8, interpret=True)
    for k in a:
        scale = np.abs(np.asarray(a[k])).max() + 1e-6
        err = np.abs(np.asarray(a[k]) - np.asarray(b[k])).max()
        assert err < 5e-4 * scale, (k, err, scale)

    # the static no-aerosol kernel variant (skips the band expansion +
    # delta scaling entirely) must match the oracle's taua=None path
    a0 = spcvmc_sw(coefs, taug, taur, sfluxzen, mu0, albdir, albdif,
                   cldymc, taucmc, ssacmc, asmcmc)
    b0 = spcvmc_fast(coefs, taug, taur, sfluxzen, mu0, albdir, albdif,
                     cldymc, taucmc, ssacmc, asmcmc,
                     block_cols=8, interpret=True)
    for k in a0:
        scale = np.abs(np.asarray(a0[k])).max() + 1e-6
        err = np.abs(np.asarray(a0[k]) - np.asarray(b0[k])).max()
        assert err < 5e-4 * scale, (k, err, scale)


def test_rtrnmc_pallas_interpret(lw_coefs):
    from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import cldprmc_lw
    from geosradiation_gridcomp_tpu.models.rrtmg.rtrnmc import rtrnmc
    from geosradiation_gridcomp_tpu.models.rrtmg.rtrnmc_pallas import (
        rtrnmc_fast)
    from geosradiation_gridcomp_tpu.ops.mcica import (
        generate_stochastic_clouds)
    inp, play, plev, tlay, tlev, emis, coefs = lw_coefs
    ncol = play.shape[0]
    zm = lwmod.mid_heights(play, tlay, inp.ple[:, -1])
    dp = inp.ple[:, 1:] - inp.ple[:, :-1]
    ciwp = 1000.0 * inp.qi * dp / 9.80665
    clwp = 1000.0 * inp.ql * dp / 9.80665
    cldy, ciwp_s, clwp_s = generate_stochastic_clouds(
        zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
        nsubcol=NGPTLW, inhm=1, seed_order=(0, 1, 2, 3))
    taucmc_gl, cloudy = cldprmc_lw(cldy, ciwp_s, clwp_s, inp.ri, inp.rl,
                                   iceflag=3, liqflag=1)
    taucmc = jnp.swapaxes(taucmc_gl, -1, -2)
    taug, pfracs = taumol_lw(coefs)
    args = (emis, taug, pfracs, cloudy, taucmc, coefs.planklay,
            coefs.planklev, coefs.plankbnd, coefs.dplankbnd_dts, coefs.pwvcm)
    a = rtrnmc(*args, dudts=True)
    b = rtrnmc_fast(*args, dudts=True, block_cols=8, interpret=True)
    for k in a:
        scale = np.abs(np.asarray(a[k])).max() + 1e-6
        assert np.abs(np.asarray(a[k]) - np.asarray(b[k])).max() < 5e-4 * scale, k


def test_rtrnmc_pallas_layer_major_interpret(lw_coefs):
    """layer_major=True ([nlay, ncol, g] inputs, the zero-relayout
    production contract) must produce bitwise the same fluxes as the
    column-major path given transposed copies of the same inputs."""
    from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import cldprmc_lw
    from geosradiation_gridcomp_tpu.models.rrtmg.rtrnmc_pallas import (
        rtrnmc_fast)
    from geosradiation_gridcomp_tpu.ops.mcica import (
        generate_stochastic_clouds)
    inp, play, plev, tlay, tlev, emis, coefs = lw_coefs
    zm = lwmod.mid_heights(play, tlay, inp.ple[:, -1])
    dp = inp.ple[:, 1:] - inp.ple[:, :-1]
    ciwp = 1000.0 * inp.qi * dp / 9.80665
    clwp = 1000.0 * inp.ql * dp / 9.80665
    cldy, ciwp_s, clwp_s = generate_stochastic_clouds(
        zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
        nsubcol=NGPTLW, inhm=1, seed_order=(0, 1, 2, 3))
    taucmc_gl, cloudy = cldprmc_lw(cldy, ciwp_s, clwp_s, inp.ri, inp.rl,
                                   iceflag=3, liqflag=1)
    taucmc = jnp.swapaxes(taucmc_gl, -1, -2)
    taug, pfracs = taumol_lw(coefs)
    a = rtrnmc_fast(emis, taug, pfracs, cloudy, taucmc, coefs.planklay,
                    coefs.planklev, coefs.plankbnd, coefs.dplankbnd_dts,
                    coefs.pwvcm, dudts=True, block_cols=8,
                    interpret=True)
    lm = lambda x: jnp.swapaxes(x, 0, 1)
    b = rtrnmc_fast(emis, lm(taug), lm(pfracs), lm(cloudy), lm(taucmc),
                    coefs.planklay, coefs.planklev, coefs.plankbnd,
                    coefs.dplankbnd_dts, coefs.pwvcm, dudts=True,
                    block_cols=8, interpret=True, layer_major=True)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]),
                                      np.asarray(b[k]), err_msg=k)


def test_spcvmc_pallas_layer_major_interpret():
    """spcvmc_fast layer_major=True ([nlay, ncol, g] inputs) is bitwise
    the column-major path on transposed copies of the same inputs, with
    and without aerosols."""
    from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_sw import (
        cldprmc_sw)
    from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc_pallas import (
        spcvmc_fast)
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw import (
        taumol_sw)
    from geosradiation_gridcomp_tpu.models.rrtmg.nrlssi2 import (
        solar_source_weights)
    from geosradiation_gridcomp_tpu.ops.mcica import (
        generate_stochastic_clouds)
    from geosradiation_gridcomp_tpu.models.rrtmg.tables_sw import NGPTSW

    inp = example_inputs(ncol=8, nlev=72)
    ncol = 8
    play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
    plev = inp.ple * 0.01
    h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
    o3 = inp.o3 * (28.964 / 47.998)
    c = lambda v: jnp.full_like(play, v)
    coefs = setcoef_sw(play, inp.t, plev, h2o, o3, c(4e-4), c(1.8e-6),
                       c(0.2095))
    svw = solar_source_weights(-1, 1361.0, None, None, None)
    taug, taur, sfluxzen = taumol_sw(coefs, svw)
    zm = lwmod.mid_heights(play, inp.t, inp.ple[:, -1])
    dp = inp.ple[:, 1:] - inp.ple[:, :-1]
    ciwp = 1000.0 * inp.qi * dp / 9.80665
    clwp = 1000.0 * inp.ql * dp / 9.80665
    cldy, ciwp_s, clwp_s = generate_stochastic_clouds(
        zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
        nsubcol=NGPTSW, inhm=1, seed_order=(3, 2, 1, 0))
    taucmc_gl, ssacmc_gl, asmcmc_gl, _ = cldprmc_sw(
        cldy, ciwp_s, clwp_s, inp.ri, inp.rl, iceflag=3, liqflag=1)
    swap = lambda x: jnp.swapaxes(x, -1, -2)
    taucmc, ssacmc, asmcmc = map(swap, (taucmc_gl, ssacmc_gl, asmcmc_gl))
    cldymc = swap(cldy)
    mu0 = jnp.asarray(np.linspace(0.05, 0.95, ncol), jnp.float32)
    albdir = jnp.full((ncol, 14), 0.15, jnp.float32)
    albdif = jnp.full((ncol, 14), 0.22, jnp.float32)
    taua = jnp.full((ncol, 72, 14), 0.02, jnp.float32)
    ssaa = jnp.full((ncol, 72, 14), 0.9, jnp.float32)
    asya = jnp.full((ncol, 72, 14), 0.6, jnp.float32)
    lm = lambda x: jnp.swapaxes(x, 0, 1)
    for aero in (False, True):
        akw = dict(taua=taua, ssaa=ssaa, asya=asya) if aero else {}
        a = spcvmc_fast(coefs, taug, taur, sfluxzen, mu0, albdir,
                        albdif, cldymc, taucmc, ssacmc, asmcmc,
                        adjflux=1.01, block_cols=8, interpret=True,
                        **akw)
        b = spcvmc_fast(coefs, lm(taug), lm(taur), sfluxzen, mu0,
                        albdir, albdif, lm(cldymc), lm(taucmc),
                        lm(ssacmc), lm(asmcmc), adjflux=1.01,
                        block_cols=8, interpret=True, layer_major=True,
                        **akw)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]),
                                          err_msg=f"{k} aero={aero}")
