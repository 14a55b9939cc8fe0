"""Micro-breakdown of the fused McICA kernels: where do the ~11 ms go?

Variants: full kernel, inhm=0 (no zcw polynomial + no second ffill),
and block sizes 8/16/32. Run on the real chip."""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")

import jax
import jax.numpy as jnp
import numpy as np

from timing2 import bench_loop as bench, report
from __graft_entry__ import _example_inputs
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import (
    band_abs_coeffs_lw)
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_sw import (
    delta_band_coeffs_sw)
from geosradiation_gridcomp_tpu.ops.mcica import (overlap_params,
                                                  state_seed_ints,
                                                  _sigma_class)
from geosradiation_gridcomp_tpu.ops.mcica_pallas import (
    mcica_optics_lw_fused, mcica_optics_sw_fused)
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NGPTLW, NG_LW
from geosradiation_gridcomp_tpu.models.rrtmg.tables_sw import NGPTSW, NG_SW
from geosradiation_gridcomp_tpu.models.rrtmg.lw import (level_temperatures,
                                                        mid_heights)

ncol = int(os.environ.get("NCOL", "2048"))
nlev = 72
inp = jax.device_put(_example_inputs(ncol=ncol, nlev=nlev))
play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
zm = mid_heights(play, inp.t, inp.ple[:, -1])
dp = inp.ple[:, 1:] - inp.ple[:, :-1]
ciwp = 1000.0 * inp.qi * dp / 9.80665
clwp = 1000.0 * inp.ql * dp / 9.80665
alpha, rcorr = overlap_params(zm, inp.lats, 172.0)
sigcls = _sigma_class(inp.fcld)
seeds = jax.vmap(lambda p: state_seed_ints(p, (0, 1, 2, 3)))(play)
absi, absl = band_abs_coeffs_lw(inp.ri, inp.rl)
bng_lw = tuple(int(x) for x in NG_LW)
bng_sw = tuple(int(x) for x in NG_SW)
coeffs_sw = delta_band_coeffs_sw(inp.ri, inp.rl)

for B in (8, 16, 32):
    f = jax.jit(lambda s, B=B: mcica_optics_lw_fused(
        s, alpha, rcorr, inp.fcld, ciwp, clwp, sigcls, absi, absl,
        nsub=NGPTLW, inhm=1, cwp_tiny=1e-20, cloud_mh=28, cloud_lm=47,
        band_ng=bng_lw, col_block=B))
    report(f"mcica_lw B={B}", bench(f, seeds, n=10), ncol)

f = jax.jit(lambda s: mcica_optics_lw_fused(
    s, alpha, rcorr, inp.fcld, ciwp, clwp, sigcls, absi, absl,
    nsub=NGPTLW, inhm=0, cwp_tiny=1e-20, cloud_mh=28, cloud_lm=47,
    band_ng=bng_lw))
report("mcica_lw inhm=0", bench(f, seeds, n=10), ncol)

for B in (8, 16, 32):
    f = jax.jit(lambda s, B=B: mcica_optics_sw_fused(
        s, alpha, rcorr, inp.fcld, ciwp, clwp, sigcls, *coeffs_sw,
        nsub=NGPTSW, inhm=1, cwp_tiny=1e-20, cloud_mh=28, cloud_lm=47,
        band_ng=bng_sw, col_block=B))
    report(f"mcica_sw B={B}", bench(f, seeds, n=10), ncol)
