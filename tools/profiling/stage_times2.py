"""Per-stage timing of the north-star LW workload with reliable forcing."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from timing import bench, report
from __graft_entry__ import _example_inputs
from geosradiation_gridcomp_tpu.config import RadiationConfig
from geosradiation_gridcomp_tpu.models.rrtmg import lw as lwmod
from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_lw import setcoef_lw
from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw import taumol_lw
from geosradiation_gridcomp_tpu.models.rrtmg.rtrnmc import rtrnmc
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import cldprmc_lw
from geosradiation_gridcomp_tpu.ops.mcica import generate_stochastic_clouds
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NGPTLW

ncol = int(os.environ.get("NCOL", "2048")); nlev = 72
inp = _example_inputs(ncol=ncol, nlev=nlev)
inp = jax.device_put(inp)

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
rei = inp.ri
rel = inp.rl

stage = os.environ.get("STAGE", "all")

if stage in ("all", "mcica"):
    dt = bench(lambda z: generate_stochastic_clouds(
        z, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
        nsubcol=NGPTLW, inhm=1, seed_order=(0, 1, 2, 3)), zm, n=5)
    report("mcica gen (nsub=140)", dt, ncol)

if stage in ("all", "setcoef"):
    dt = bench(lambda p: setcoef_lw(p, tlay, plev, tlev, inp.ts, emis,
               h2o, o3, c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(1.5e-7),
               c(0.0), c(0.0), c(0.0), c(0.0), dudts=True), play, n=5)
    report("setcoef_lw", dt, ncol)

coefs = setcoef_lw(play, tlay, plev, tlev, inp.ts, emis,
                   h2o, o3, c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209),
                   c(1.5e-7), c(0.0), c(0.0), c(0.0), c(0.0), dudts=True)

if stage in ("all", "taumol"):
    dt = bench(lambda cf: taumol_lw(cf), coefs, n=5)
    report("taumol_lw", dt, ncol)

cldy, ciwp_s, clwp_s = generate_stochastic_clouds(
    zm, inp.lats, 172.0, play, inp.fcld, ciwp, clwp, 1.0e-20,
    nsubcol=NGPTLW, inhm=1, seed_order=(0, 1, 2, 3))

if stage in ("all", "cldprmc"):
    dt = bench(lambda iw: cldprmc_lw(cldy, iw, clwp_s, rei, rel,
               iceflag=3, liqflag=1), ciwp_s, n=5)
    report("cldprmc_lw", dt, ncol)

taucmc_gl, cloudy = cldprmc_lw(cldy, ciwp_s, clwp_s, rei, rel,
                               iceflag=3, liqflag=1)
taucmc = jnp.swapaxes(taucmc_gl, -1, -2)
taug, pfracs = taumol_lw(coefs)

if stage in ("all", "rtrnmc"):
    dt = bench(lambda tg: rtrnmc(emis, tg, pfracs, cloudy, taucmc,
               coefs.planklay, coefs.planklev, coefs.plankbnd,
               coefs.dplankbnd_dts, coefs.pwvcm, dudts=True), taug, n=5)
    report("rtrnmc", dt, ncol)

if stage in ("all", "lwfull"):
    dt = bench(lambda p: lwmod.rrtmg_lw(
        inp.ple, p, tlay, tlev, inp.ts, emis, h2o, o3, c(4e-4), c(1.8e-6),
        c(3.2e-7), c(0.209), c(1.5e-7), c(0.0), c(0.0), c(0.0), c(0.0),
        inp.fcld, ciwp, clwp, rei, rel, zm, inp.lats, 172.0,
        iceflag=3, liqflag=1, dudts=True, cloud_mh=28, cloud_lm=47,
        inhm=1), play, n=3)
    report("rrtmg_lw FULL", dt, ncol)

if stage in ("all", "swfull"):
    from geosradiation_gridcomp_tpu.models.rrtmg.sw import rrtmg_sw
    cosz = jnp.full((ncol,), 0.5)
    dt = bench(lambda p: rrtmg_sw(
        inp.ple, p, tlay, cosz, inp.albvr, inp.albvf, inp.albnr, inp.albnf,
        h2o, o3, c(4e-4), c(1.8e-6), c(0.2095),
        inp.fcld, ciwp, clwp, rei, rel, zm, inp.lats, 172.0,
        iceflag=3, liqflag=1, cloud_mh=28, cloud_lm=47, inhm=1), play, n=3)
    report("rrtmg_sw FULL", dt, ncol)

if stage in ("all", "refresh"):
    from geosradiation_gridcomp_tpu.driver.step import radiation_refresh
    cfg = RadiationConfig()
    pmid = 0.5 * (np.asarray(inp.ple)[0, 1:] + np.asarray(inp.ple)[0, :-1])
    ict, icb = cfg.superlayer_indices(pmid)
    dt = bench(lambda i: radiation_refresh(i, 172.0, 12.0, config=cfg,
               ict=ict, icb=icb), inp, n=3)
    report("radiation_refresh FULL", dt, ncol)
