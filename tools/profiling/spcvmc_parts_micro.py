"""Round-5: where does the jnp spcvmc spend its time? reftra vs scans."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from timing2 import bench_loop as bench, report
from geosradiation_gridcomp_tpu.models.rrtmg.spcvmc import (
    reftra_sw, vrtqdr_sw)

ncol, nlay, G = 2048, 72, 112
rng = np.random.default_rng(0)
tau = jnp.asarray(10.0 ** rng.uniform(-7, 1, (ncol, nlay, G)),
                  jnp.float32)
w = jnp.asarray(rng.uniform(0.1, 1.0, (ncol, nlay, G)), jnp.float32)
g = jnp.asarray(rng.uniform(0.0, 0.85, (ncol, nlay, G)), jnp.float32)
mu0 = jnp.asarray(rng.uniform(0.05, 1.0, ncol), jnp.float32)
alb = jnp.asarray(rng.uniform(0.05, 0.6, (ncol, G)), jnp.float32)

f_rt = jax.jit(lambda t, wv, gv: reftra_sw(t, wv, gv, mu0))
ref, tra, refd, trad = f_rt(tau, w, g)
report("reftra_sw", bench(f_rt, tau, w, g, n=5), ncol)

f_dbt = jax.jit(lambda t: jnp.exp(
    -jnp.minimum(t / mu0[:, None, None], 500.0)))
dbt = f_dbt(tau)
report("dbt+exp", bench(f_dbt, tau, n=5), ncol)

tdbt = jnp.concatenate([jnp.ones_like(dbt[..., :1, :]),
                        jnp.cumprod(dbt, axis=-2)], axis=-2)

f_vq = jax.jit(lambda r, t, rd, td: vrtqdr_sw(r, t, rd, td, alb, alb,
                                              dbt, tdbt))
_ = f_vq(ref, tra, refd, trad)
report("vrtqdr_sw(scans)", bench(f_vq, ref, tra, refd, trad, n=5), ncol)
