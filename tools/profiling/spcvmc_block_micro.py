"""Round-5: spcvmc jnp-vs-Pallas at varying column blocks, with clouds.

The r3 measurement retired spcvmc_fast at block_cols=8 (64 ms vs 6.8 ms
jnp at 2048x72).  (8, 112) planes fill ONE vreg per VPU op, so the
serial per-layer chain exposes raw op latency; this sweep measures
whether wide blocks (vregs per op = C*112/1024) recover the win that
the kernel's ~7x HBM-traffic reduction should deliver.
"""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from timing2 import bench_loop as bench, report
from __graft_entry__ import _example_inputs
from geosradiation_gridcomp_tpu.models.rrtmg import lw as lwmod
from geosradiation_gridcomp_tpu.models.rrtmg.setcoef_sw import setcoef_sw
from geosradiation_gridcomp_tpu.models.rrtmg.taumol_sw import taumol_sw
from geosradiation_gridcomp_tpu.models.rrtmg.nrlssi2 import (
    solar_source_weights)
from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc import spcvmc_sw
from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc_pallas import (
    spcvmc_fast)
from geosradiation_gridcomp_tpu.models.rrtmg.tables_sw import NGPTSW

ncol = int(os.environ.get("NCOL", "2048")); nlev = 72
inp = jax.device_put(_example_inputs(ncol=ncol, nlev=nlev))
play = 0.01 * 0.5 * (inp.ple[:, 1:] + inp.ple[:, :-1])
plev = inp.ple * 0.01
tlay = inp.t
h2o = inp.qv / (1.0 - inp.qv) * (28.964 / 18.015)
o3 = inp.o3 * (28.964 / 47.998)
c = lambda v: jnp.full_like(play, v)

scoefs = jax.jit(lambda p: setcoef_sw(p, tlay, plev, h2o, o3, c(4e-4),
                                      c(1.8e-6), c(0.2095)))(play)
svw = solar_source_weights(-1, 1361.0, None, None, None)
tg_s, tr_s, sflux = jax.jit(lambda sc: taumol_sw(sc, svw))(scoefs)
mu0 = jnp.clip(jnp.cos(inp.lats), 0.05, 1.0)
albdir = jnp.broadcast_to(inp.albvr[:, None], (ncol, 14))

# a realistic McICA-ish cloud field: ~25% of (col, lay, g) cells cloudy
# in two decks
rng = np.random.default_rng(0)
tcm = np.zeros((ncol, nlev, NGPTSW), np.float32)
deck = rng.random((ncol, nlev, NGPTSW)) < 0.25
deck[:, :30] = False
tcm[deck] = rng.gamma(2.0, 2.0, int(deck.sum())).astype(np.float32)
scm = np.where(deck, 0.99, 0.0).astype(np.float32)
acm = np.where(deck, 0.85, 0.0).astype(np.float32)
tcm, scm, acm = map(jnp.asarray, (tcm, scm, acm))
cld = tcm > 0.0

# big arrays must be ARGS, not jit-captured constants: the axon tunnel
# serializes captured constants into the compile request (HTTP 413)
f_jnp = jax.jit(lambda tg, tr, tc, sc, ac, cl: spcvmc_sw(
    None, tg, tr, sflux, mu0, albdir, albdir, cl, tc, sc, ac))
o_ref = f_jnp(tg_s, tr_s, tcm, scm, acm, cld)
report("spcvmc_sw(jnp, cloudy)",
       bench(f_jnp, tg_s, tr_s, tcm, scm, acm, cld, n=5), ncol)

LPS = int(os.environ.get("LPS", "8"))
for C in (int(x) for x in
          os.environ.get("BLOCKS", "128,256").split(",")):
    f_pl = jax.jit(lambda tg, tr, tc, sc, ac, cl, C=C: spcvmc_fast(
        None, tg, tr, sflux, mu0, albdir, albdir, cl, tc, sc, ac,
        block_cols=C, lps=LPS))
    o = f_pl(tg_s, tr_s, tcm, scm, acm, cld)
    errs = {k: float(jnp.abs(o[k] - o_ref[k]).max()
                     / (jnp.abs(o_ref[k]).max() + 1e-9))
            for k in ("bbfu", "bbfd", "bbcu", "bbcd")}
    print(f"  C={C} parity:", {k: f"{v:.2e}" for k, v in errs.items()})
    report(f"spcvmc_fast(C={C})",
           bench(f_pl, tg_s, tr_s, tcm, scm, acm, cld, n=5), ncol)
