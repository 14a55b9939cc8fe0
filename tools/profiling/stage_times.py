"""Per-stage timing of the north-star workload on the real chip."""
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from __graft_entry__ import _example_inputs
from geosradiation_gridcomp_tpu.config import RadiationConfig
from geosradiation_gridcomp_tpu.models.rrtmg import lw as lwmod
from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_lw import setcoef_lw
from geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw import taumol_lw
from geosradiation_gridcomp_tpu.models.rrtmg.rtrnmc import rtrnmc
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import cldprmc_lw
from geosradiation_gridcomp_tpu.ops.mcica import generate_stochastic_clouds, clear_counts_three_band
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NGPTLW

ncol = int(os.environ.get("NCOL", "2048")); nlev = 72
inp = _example_inputs(ncol=ncol, nlev=nlev)
inp = jax.device_put(inp)

def timed(name, fn, *args, n=3, **kw):
    f = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = f(*args, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0)/n
    print(f"{name:28s} {dt*1e3:9.2f} ms   {ncol/dt:10.0f} cols/s")
    return out

# Build LW inputs like driver/radiation.py does
from geosradiation_gridcomp_tpu.driver import radiation as radmod
import inspect
play = 0.01*0.5*(inp.ple[:,1:]+inp.ple[:,:-1])
plev = inp.ple*0.01
tlay = inp.t
tlev = lwmod.level_temperatures(play, tlay, plev, inp.ts)
zm = lwmod.mid_heights(play, tlay, inp.ple[:, -1])
emis = jnp.broadcast_to(inp.emis[:, None], (ncol, 16))
h2o = inp.qv/(1.0-inp.qv) * (28.964/18.015)
o3 = inp.o3 * (28.964/47.998)
c = lambda v: jnp.full_like(play, v)
cldf = inp.fcld
alat = inp.lats
# water paths
dp = (inp.ple[:,1:]-inp.ple[:,:-1])
ciwp = 1000.0*inp.qi*dp/9.80665
clwp = 1000.0*inp.ql*dp/9.80665

args = dict(ple=inp.ple, play=play, tlay=tlay, tlev=tlev, tsfc=inp.ts,
    emis=emis, h2ovmr=h2o, o3vmr=o3, co2vmr=c(4e-4), ch4vmr=c(1.8e-6),
    n2ovmr=c(3.2e-7), o2vmr=c(0.209), covmr=c(1.5e-7), cfc11vmr=c(0.0),
    cfc12vmr=c(0.0), cfc22vmr=c(0.0), ccl4vmr=c(0.0), cldf=cldf,
    ciwp=ciwp, clwp=clwp, rei=inp.ri*1e6, rel=inp.rl*1e6, zm=zm,
    alat=alat, doy=172.0)

full = timed("rrtmg_lw full", lambda **kw: lwmod.rrtmg_lw(**kw), **args)

coefs = timed("setcoef_lw", lambda: setcoef_lw(play, tlay, plev, tlev, inp.ts, emis,
    h2o, o3, c(4e-4), c(1.8e-6), c(3.2e-7), c(0.209), c(1.5e-7),
    c(0.0), c(0.0), c(0.0), c(0.0), dudts=True))
tg = timed("taumol_lw", lambda: taumol_lw(coefs))
cldy, ciwp_s, clwp_s = timed("mcica gen", lambda: generate_stochastic_clouds(
    zm, alat, 172.0, play, cldf, ciwp, clwp, 1.0e-20, nsubcol=NGPTLW, inhm=1, seed_order=(0,1,2,3)))
tc = timed("cldprmc_lw", lambda: cldprmc_lw(cldy, ciwp_s, clwp_s, inp.ri*1e6, inp.rl*1e6, iceflag=3, liqflag=1))
taucmc = jnp.swapaxes(tc[0], -1, -2)
timed("rtrnmc", lambda: rtrnmc(emis, tg[0], tg[1], tc[1], taucmc,
      coefs.planklay, coefs.planklev, coefs.plankbnd, coefs.dplankbnd_dts, coefs.pwvcm, dudts=True))

# SW
from geosradiation_gridcomp_tpu.models.rrtmg import sw as swmod
import geosradiation_gridcomp_tpu.driver.radiation as dr
print("--- SW via solar_refresh / full driver ---")
from geosradiation_gridcomp_tpu.driver.step import radiation_refresh
cfg = RadiationConfig()
pmid = 0.5*(np.asarray(inp.ple)[0,1:]+np.asarray(inp.ple)[0,:-1])
ict, icb = cfg.superlayer_indices(pmid)
timed("radiation_refresh full", lambda: radiation_refresh(inp, 172.0, 12.0, config=cfg, ict=ict, icb=icb), n=2)
