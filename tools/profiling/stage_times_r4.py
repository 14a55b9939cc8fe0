"""Round-4 per-stage timing of the production LW/SW pipelines on TPU."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from timing2 import bench_loop as bench, report
from __graft_entry__ import _example_inputs
from geosradiation_gridcomp_tpu.models.rrtmg import lw as lwmod
from geosradiation_gridcomp_tpu.models.rrtmg import sw as swmod
from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_lw import setcoef_lw
from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_sw import setcoef_sw
from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw import taumol_lw
from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw import taumol_sw
from geosradiation_gridcomp_tpu.models.rrtmg.rtrnmc_pallas import rtrnmc_fast
from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc import spcvmc_sw
from geosradiation_gridcomp_tpu.models.rrtmg.nrlssi2 import solar_source_weights
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import band_abs_coeffs_lw
from geosradiation_gridcomp_tpu.ops.mcica import (overlap_params,
    state_seed_ints, _sigma_class)
from geosradiation_gridcomp_tpu.ops.mcica_pallas import (
    mcica_optics_lw_fused, mcica_optics_sw_fused)
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NGPTLW, NG_LW

ncol = int(os.environ.get("NCOL", "2048")); nlev = 72
inp = jax.device_put(_example_inputs(ncol=ncol, nlev=nlev))
play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
plev = inp.ple * 0.01
tlay = inp.t
tlev = lwmod.level_temperatures(play, tlay, plev, inp.ts)
zm = lwmod.mid_heights(play, tlay, inp.ple[:, -1])
emis = jnp.broadcast_to(inp.emis[:, None], (ncol, 16))
h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
o3 = inp.o3 * (28.964 / 47.998)
c = lambda v: jnp.full_like(play, v)
dp = inp.ple[:, 1:] - inp.ple[:, :-1]
ciwp = 1000.0 * inp.qi * dp / 9.80665
clwp = 1000.0 * inp.ql * dp / 9.80665

stage = os.environ.get("STAGE", "all")

# --- fused mcica LW
if stage in ("all", "mcica"):
    alpha, rcorr = overlap_params(zm, inp.lats, 172.0)
    sigcls = _sigma_class(inp.fcld)
    seeds = jax.vmap(lambda p: state_seed_ints(p, (0, 1, 2, 3)))(play)
    absi, absl = band_abs_coeffs_lw(inp.ri, inp.rl)
    f = jax.jit(lambda s: mcica_optics_lw_fused(
        s, alpha, rcorr, inp.fcld, ciwp, clwp, sigcls, absi, absl,
        nsub=NGPTLW, inhm=1, cwp_tiny=1e-20, cloud_mh=28, cloud_lm=47,
        band_ng=tuple(int(x) for x in NG_LW)))
    report("mcica_lw_fused", bench(f, seeds, n=10), ncol)

jit = jax.jit
coefs = jit(lambda p: setcoef_lw(p, tlay, plev, tlev, inp.ts, emis, h2o,
            o3, c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(1.5e-7),
            c(0.0), c(0.0), c(0.0), c(0.0), dudts=True))(play)
if stage in ("all", "setcoef"):
    f = jit(lambda p: setcoef_lw(p, tlay, plev, tlev, inp.ts, emis, h2o,
            o3, c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(1.5e-7),
            c(0.0), c(0.0), c(0.0), c(0.0), dudts=True))
    report("setcoef_lw", bench(f, play, n=10), ncol)

if stage in ("all", "taumol"):
    f = jit(lambda cf: taumol_lw(cf))
    report("taumol_lw", bench(f, coefs, n=10), ncol)

if stage in ("all", "rtrnmc"):
    taug, pfracs = jit(lambda cf: taumol_lw(cf))(coefs)
    taucmc = jnp.zeros((ncol, nlev, NGPTLW))
    cloudy = jnp.zeros((ncol, nlev), bool)
    f = jit(lambda tg: rtrnmc_fast(emis, tg, pfracs, cloudy, taucmc,
            coefs.planklay, coefs.planklev, coefs.plankbnd,
            coefs.dplankbnd_dts, coefs.pwvcm, dudts=True))
    report("rtrnmc_fast", bench(f, taug, n=10), ncol)

lwargs = (inp.ple, play, tlay, tlev, inp.ts, emis, h2o, o3,
          c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(0.0),
          c(2e-10), c(4e-10), c(1e-10), c(0.0),
          inp.fcld, ciwp, clwp, inp.ri, inp.rl, zm, inp.lats, 172.0)
if stage in ("all", "lwfull"):
    f = lambda p: lwmod.rrtmg_lw(*((inp.ple, p) + lwargs[2:]),
                                 cloud_mh=28, cloud_lm=47)
    report("LW full", bench(f, play, n=10), ncol)

# --- SW
if stage in ("all", "swsetcoef"):
    f = jit(lambda p: setcoef_sw(p, tlay, plev, h2o, o3, c(4e-4),
                                 c(1.8e-6), c(0.2095)))
    report("setcoef_sw", bench(f, play, n=10), ncol)
scoefs = jit(lambda p: setcoef_sw(p, tlay, plev, h2o, o3, c(4e-4),
             c(1.8e-6), c(0.2095)))(play)
svw = solar_source_weights(-1, 1361.0, None, None, None)
if stage in ("all", "swtaumol"):
    f = jit(lambda sc: taumol_sw(sc, svw))
    report("taumol_sw", bench(f, scoefs, n=10), ncol)

if stage in ("all", "spcvmc"):
    tg_s, tr_s, sflux = jit(lambda sc: taumol_sw(sc, svw))(scoefs)
    from geosradiation_gridcomp_tpu.models.rrtmg.tables_sw import NGPTSW
    mu0 = jnp.clip(jnp.cos(inp.lats), 0.05, 1.0)
    albdir = jnp.broadcast_to(inp.albvr[:, None], (ncol, 14))
    tcz = jnp.zeros((ncol, nlev, NGPTSW))
    cyz = jnp.zeros((ncol, nlev, NGPTSW), bool)
    f = jit(lambda tg: spcvmc_sw(None, tg, tr_s, sflux, mu0, albdir,
                                 albdir, cyz, tcz, tcz, tcz))
    report("spcvmc_sw(jnp)", bench(f, tg_s, n=10), ncol)

if stage in ("all", "swfull"):
    mu0 = jnp.clip(jnp.cos(inp.lats), 0.05, 1.0)
    f = lambda p: swmod.rrtmg_sw(
        inp.ple, p, tlay, mu0, inp.albvr, inp.albvf, inp.albnr,
        inp.albnf, h2o, o3, c(4e-4), c(1.8e-6), c(0.2095),
        inp.fcld, ciwp, clwp, inp.ri, inp.rl, zm, inp.lats, 172.0,
        cloud_mh=28, cloud_lm=47)
    report("SW full", bench(f, play, n=10), ncol)

if stage in ("all", "taumol3"):
    from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw_pallas import (
        taumol_lw_fast)
    tg2, pf2 = jit(lambda cf: taumol_lw(cf))(coefs)
    tg3, pf3 = jit(lambda cf: taumol_lw_fast(cf))(coefs)
    r = lambda a, b: float(jnp.abs(a - b).max() / jnp.abs(b).max())
    print("tpu parity taug:", r(tg3, tg2), "pfrac:", r(pf3, pf2))
    f = jit(lambda cf: taumol_lw_fast(cf))
    report("taumol_lw_fast(v3)", bench(f, coefs, n=5), ncol)
