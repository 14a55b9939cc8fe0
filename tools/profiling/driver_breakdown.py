"""Round-5: where does radiation_refresh time go beyond the kernels?"""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from timing2 import bench_loop as bench, report
from __graft_entry__ import _example_inputs
from geosradiation_gridcomp_tpu.config import RadiationConfig
from geosradiation_gridcomp_tpu.driver.step import (radiation_refresh,
                                                    sw_partition_bounds)
from geosradiation_gridcomp_tpu.driver.radiation import (solar_refresh,
                                                         irrad_refresh)
from geosradiation_gridcomp_tpu.driver.astronomy import mean_cos_zenith

ncol = int(os.environ.get("NCOL", "8192")); nlev = 72
inp = _example_inputs(ncol=ncol, nlev=nlev)
cfg = RadiationConfig()
pmid = 0.5 * (np.asarray(inp.ple)[0, 1:] + np.asarray(inp.ple)[0, :-1])
ict, icb = cfg.superlayer_indices(pmid)
inp = jax.device_put(inp)
nlit, ncld = sw_partition_bounds(inp.lons, inp.lats, inp.fcld, 172.0,
                                 12.0, cfg)
print("nlit", nlit, "ncld", ncld)

f_full = lambda i: radiation_refresh(i, 172.0, 12.0, config=cfg,
                                     ict=ict, icb=icb, sw_nlit=nlit,
                                     sw_ncld=ncld)
f_full(inp)
report("radiation_refresh", bench(f_full, inp, n=5), ncol)

zth, lit = mean_cos_zenith(inp.lons, inp.lats, 172.0, 12.0,
                           cfg.solar_dt / 3600.0)
f_sol = jax.jit(lambda i: solar_refresh(i, zth, 172.0, cfg, ict, icb,
                                        nlit=nlit, ncld=ncld))
f_sol(inp)
report("solar_refresh", bench(f_sol, inp, n=5), ncol)

f_irr = jax.jit(lambda i: irrad_refresh(i, 172.0, cfg, ict, icb))
f_irr(inp)
report("irrad_refresh", bench(f_irr, inp, n=5), ncol)
