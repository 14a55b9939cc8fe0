"""Validate + time the fused Pallas McICA+optics kernel on the real TPU.

Checks:
  1. ffill sub-kernel == ops.mcica._correlate (exact, same inputs)
  2. population statistics: subcolumn cloud fraction per layer ~= cldf;
     taucmc distribution moments vs the jnp oracle pipeline
  3. determinism + column-permutation (decomposition) invariance
  4. timing vs the jnp pipeline at bench shapes
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geosradiation_gridcomp_tpu.ops import mcica, mcica_pallas as mp
from geosradiation_gridcomp_tpu.models.rrtmg.cldprmc_lw import (
    cldprmc_lw, band_abs_coeffs_lw)
from geosradiation_gridcomp_tpu.models.rrtmg.tables_lw import NG_LW

NCOL = int(os.environ.get("NCOL", "2048"))
NSUB, NLAY = 140, 72
rng = np.random.default_rng(0)

# ---- scene ----------------------------------------------------------
play = (np.linspace(2.0, 1000.0, NLAY)[None, :]
        + rng.random((NCOL, NLAY)) * 1.0).astype(np.float32)
zmid = (-7200.0 * np.log(play / 1013.0)).astype(np.float32)
cldf = np.zeros((NCOL, NLAY), np.float32)
cldf[:, 30:40] = rng.uniform(0.2, 0.95, (NCOL, 10))
cldf[:, 55:60] = rng.uniform(0.1, 0.6, (NCOL, 5))
ciwp = np.where(cldf > 0, rng.uniform(1.0, 40.0, cldf.shape), 0.0) \
    .astype(np.float32)
clwp = np.where(cldf > 0, rng.uniform(1.0, 60.0, cldf.shape), 0.0) \
    .astype(np.float32)
rei = np.full((NCOL, NLAY), 30.0, np.float32)
rel = np.full((NCOL, NLAY), 12.0, np.float32)
alat = np.linspace(-1.2, 1.2, NCOL).astype(np.float32)
doy = 172.0

play_j = jnp.asarray(play)
alpha, rcorr = mcica.overlap_params(jnp.asarray(zmid), jnp.asarray(alat),
                                    doy)
sigcls = mcica._sigma_class(jnp.asarray(cldf))
seeds = jax.vmap(mcica.state_seed_ints)(play_j)
absi, absl = band_abs_coeffs_lw(jnp.asarray(rei), jnp.asarray(rel))
BAND_NG = tuple(int(x) for x in NG_LW)

# ---- 1. ffill vs _correlate ----------------------------------------
def ffill_host(v, k):
    def kern(v_ref, k_ref, o_ref):
        o_ref[:] = mp._ffill(v_ref[:], k_ref[:], v.shape[-1])
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(v.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(v, k)

v = jnp.asarray(rng.random((8, NSUB, NLAY)).astype(np.float32))
k = jnp.asarray((rng.random((8, NSUB, NLAY)) > 0.6).astype(np.float32))
got = ffill_host(v, k)
want = mcica._correlate(v, k > 0)
print("ffill max err:", float(jnp.max(jnp.abs(got - want))))

# ---- 2. zcw eval accuracy (vs exact table, dense) ------------------
fit = mp._zcw_fit(1)
vv = jnp.asarray(rng.random((4, 64, NLAY)).astype(np.float32))
for cls in (0, 1, 2):
    is0 = jnp.full((4, 1, NLAY), cls == 0)
    is1 = jnp.full((4, 1, NLAY), cls == 1)
    approx = mp._zcw_eval(vv, (is0, is1), fit)
    sig = {0: 0.5, 1: 0.71, 2: 1.0}[cls]
    exact = mcica.zcw_lookup(vv, jnp.full_like(vv, sig), 1)
    print(f"zcw class {cls}: max|d|="
          f"{float(jnp.max(jnp.abs(approx - exact))):.2e} "
          f"mean|d|={float(jnp.mean(jnp.abs(approx - exact))):.2e}")

# ---- 3. fused kernel run + stats -----------------------------------
run = lambda: mp.mcica_optics_lw_fused(
    seeds, alpha, rcorr, jnp.asarray(cldf), jnp.asarray(ciwp),
    jnp.asarray(clwp), sigcls, absi, absl, nsub=NSUB, inhm=1,
    cwp_tiny=1e-20, cloud_mh=28, cloud_lm=47, band_ng=BAND_NG)
tau, cloudy, counts = jax.block_until_ready(run())
tau2, _, _ = jax.block_until_ready(run())
print("determinism:", bool(jnp.all(tau == tau2)))

perm = rng.permutation(NCOL)
tau_p, _, _ = mp.mcica_optics_lw_fused(
    seeds[perm], alpha[perm], rcorr[perm], jnp.asarray(cldf)[perm],
    jnp.asarray(ciwp)[perm], jnp.asarray(clwp)[perm], sigcls[perm],
    absi[perm], absl[perm], nsub=NSUB, inhm=1, cwp_tiny=1e-20,
    cloud_mh=28, cloud_lm=47, band_ng=BAND_NG)
print("decomposition invariance:",
      bool(jnp.all(tau_p == tau[jnp.asarray(perm)])))

# oracle pipeline for population comparison
cldy_o, ciwp_o, clwp_o = mcica.generate_stochastic_clouds(
    jnp.asarray(zmid), jnp.asarray(alat), doy, play_j, jnp.asarray(cldf),
    jnp.asarray(ciwp), jnp.asarray(clwp), 1e-20, nsubcol=NSUB, inhm=1)
tau_o, cloudy_o = cldprmc_lw(cldy_o, ciwp_o, clwp_o, jnp.asarray(rei),
                             jnp.asarray(rel))
# fused tau is [ncol, nlay, nsub]; oracle [ncol, nsub, nlay]
tf = np.asarray(tau).transpose(0, 2, 1)
to = np.asarray(tau_o)
sel = cldf[:, :] > 0
cf_fused = (tf > 0).mean(axis=1)     # [ncol, nlay] subcol cloud frac
cf_oracle = (to > 0).mean(axis=1)
print("cloud-fraction pop err (fused vs input): "
      f"{np.abs(cf_fused[sel] - cldf[sel]).mean():.4f}")
print("cloud-fraction pop err (oracle vs input): "
      f"{np.abs(cf_oracle[sel] - cldf[sel]).mean():.4f}")
m_f, m_o = tf[tf > 0].mean(), to[to > 0].mean()
s_f, s_o = tf[tf > 0].std(), to[to > 0].std()
print(f"taucmc cloudy-cell moments fused ({m_f:.4f},{s_f:.4f}) "
      f"oracle ({m_o:.4f},{s_o:.4f})")
print("counts row0:", np.asarray(counts)[0], " oracle:",
      np.asarray(mcica.clear_counts_three_band(cldy_o, 28, 47))[0])

# ---- 4. timing ------------------------------------------------------
from timing2 import bench_carry

def fused_step(c):
    t, cl, ct = mp.mcica_optics_lw_fused(
        seeds, alpha, rcorr, c["cldf"], c["ciwp"], c["clwp"], sigcls,
        absi, absl, nsub=NSUB, inhm=1, cwp_tiny=1e-20, cloud_mh=28,
        cloud_lm=47, band_ng=BAND_NG)
    return {"cldf": c["cldf"] + 1e-12 * t[:, :, 0],
            "ciwp": c["ciwp"], "clwp": c["clwp"]}

c0 = {"cldf": jnp.asarray(cldf), "ciwp": jnp.asarray(ciwp),
      "clwp": jnp.asarray(clwp)}
dt = bench_carry(fused_step, c0, k=10, n=3)
print(f"fused mcica+cldprmc: {dt*1e3:.2f} ms ({NCOL/dt:.0f} cols/s)")

def oracle_step(c):
    cldy, ci, cl = mcica.generate_stochastic_clouds(
        jnp.asarray(zmid), jnp.asarray(alat), doy, play_j, c["cldf"],
        c["ciwp"], c["clwp"], 1e-20, nsubcol=NSUB, inhm=1)
    t, _ = cldprmc_lw(cldy, ci, cl, jnp.asarray(rei), jnp.asarray(rel))
    return {"cldf": c["cldf"] + 1e-12 * t[:, 0, :],
            "ciwp": c["ciwp"], "clwp": c["clwp"]}

dt_o = bench_carry(oracle_step, c0, k=4, n=3)
print(f"jnp mcica+cldprmc:  {dt_o*1e3:.2f} ms ({NCOL/dt_o:.0f} cols/s)")
