"""Round-5: mcica_optics_lw_fused col_block sweep (all inputs varying)."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np, jax, jax.numpy as jnp
from timing2 import bench_loop as bench, report
from __graft_entry__ import _example_inputs
from geosradiation_gridcomp_tpu.driver.radiation import (_common_derived,
    _incloud_paths)
from geosradiation_gridcomp_tpu.models.rrtmg.lw import mid_heights
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import (
    band_abs_coeffs_lw)
from geosradiation_gridcomp_tpu.ops.mcica import (overlap_params,
    state_seed_ints, _sigma_class)
from geosradiation_gridcomp_tpu.ops.mcica_pallas import (
    mcica_optics_lw_fused)
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NGPTLW, NG_LW

ncol = int(os.environ.get("NCOL", "8192"))
inp = jax.device_put(_example_inputs(ncol=ncol, nlev=72))
play, h2o, o3 = _common_derived(inp)
zm = mid_heights(play, inp.t, inp.ple[:, -1])
ciwp, clwp = _incloud_paths(inp)
perm = jnp.argsort(jnp.logical_not((inp.fcld > 0.0).any(axis=1)),
                   stable=True)
pc = lambda x: x[perm]
args = tuple(map(pc, (zm, inp.lats, play, inp.fcld, ciwp, clwp,
                      inp.ri, inp.rl)))

for B in (int(x) for x in os.environ.get("BLOCKS", "8,16,32").split(",")):
    def f(a, B=B):
        zm_v, lat_v, play_v, fcld_v, ci_v, cl_v, ri_v, rl_v = a
        alpha, rcorr = overlap_params(zm_v, lat_v, 172.0)
        sigcls = _sigma_class(fcld_v)
        seeds = jax.vmap(lambda p: state_seed_ints(p, (0, 1, 2, 3)))(
            play_v)
        absi, absl = band_abs_coeffs_lw(ri_v, rl_v)
        return mcica_optics_lw_fused(
            seeds, alpha, rcorr, fcld_v, ci_v, cl_v, sigcls, absi, absl,
            nsub=NGPTLW, inhm=1, cwp_tiny=1e-20, cloud_mh=28,
            cloud_lm=47, band_ng=tuple(int(x) for x in NG_LW),
            col_block=B)
    g = jax.jit(f)
    jax.block_until_ready(g(args)[0])
    report(f"mcica_lw_fused+prep B={B}", bench(g, args, n=5), ncol)
