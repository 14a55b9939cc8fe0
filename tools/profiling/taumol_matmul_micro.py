"""One-hot/tent matmul formulation for taumol major-species interpolation."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from timing import bench, report

ncol, nlay, ng = 2048, 72, 16
N = ncol * nlay
NP, NT, NE = 13, 5, 9          # jp blocks, jt rows, eta points
R = NP * NT * NE               # 585
rng = np.random.default_rng(0)
absa = jnp.asarray(rng.random((R, ng), np.float32))
# absa[p, t, e, g] layout -> for the (p,e)-contract: [NP*NE, NT*ng]
absa_pe = jnp.asarray(
    np.asarray(absa).reshape(NP, NT, NE, ng).transpose(0, 2, 1, 3)
    .reshape(NP * NE, NT * ng))

jp = jnp.asarray(rng.integers(0, NP - 1, (ncol, nlay)), jnp.int32)
js = jnp.asarray(rng.integers(1, NE - 3, (ncol, nlay)), jnp.int32)
jt = jnp.asarray(rng.integers(0, NT - 1, (ncol, nlay)), jnp.int32)
fs = jnp.asarray(rng.random((ncol, nlay), np.float32))
f0 = jnp.asarray(rng.random((ncol, nlay), np.float32))
f1 = jnp.asarray(rng.random((ncol, nlay), np.float32))


def gather_form(jp):
    """Current formulation: 6 weighted row-gathers (mid branch: 4)."""
    base = (jp * NT + jt) * NE + js
    fsx = fs[..., None]
    acc = ((1 - fsx) * f0[..., None] * absa[base]
           + fsx * f0[..., None] * absa[base + 1]
           + (1 - fsx) * f1[..., None] * absa[base + NE]
           + fsx * f1[..., None] * absa[base + NE + 1])
    return acc


def matmul_form(jp):
    """Wpe [N, NP*NE] (eta-tent x p-onehot) @ absa_pe, then jt contract."""
    e_iota = jnp.arange(NE, dtype=jnp.int32)
    we = (jnp.where(e_iota == js[..., None], 1.0 - fs[..., None], 0.0)
          + jnp.where(e_iota == js[..., None] + 1, fs[..., None], 0.0))
    p_iota = jnp.arange(NP, dtype=jnp.int32)
    wp = (p_iota == jp[..., None]).astype(jnp.float32)
    wpe = (wp[..., :, None] * we[..., None, :]).reshape(
        jp.shape + (NP * NE,))
    u = lax.dot_general(wpe, absa_pe, (((wpe.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
    u = u.reshape(jp.shape + (NT, ng))
    t_iota = jnp.arange(NT, dtype=jnp.int32)
    wt = (jnp.where(t_iota == jt[..., None], f0[..., None], 0.0)
          + jnp.where(t_iota == jt[..., None] + 1, f1[..., None], 0.0))
    return jnp.einsum("...t,...tg->...g", wt, u)


a = gather_form(jp)
b = matmul_form(jp)
print("max rel diff:", float(jnp.max(jnp.abs(a - b) / (jnp.abs(a) + 1e-12))))
report("gather form (4 weighted rows)", bench(gather_form, jp, n=5), ncol)
report("matmul form (pe-contract)", bench(matmul_form, jp, n=5), ncol)

# bf16-split x3 variant for speed
hi = absa_pe.astype(jnp.bfloat16)
mid = (absa_pe - hi.astype(jnp.float32)).astype(jnp.bfloat16)
lot = (absa_pe - hi.astype(jnp.float32) - mid.astype(jnp.float32)).astype(jnp.bfloat16)


def matmul_split(jp):
    e_iota = jnp.arange(NE, dtype=jnp.int32)
    we = (jnp.where(e_iota == js[..., None], 1.0 - fs[..., None], 0.0)
          + jnp.where(e_iota == js[..., None] + 1, fs[..., None], 0.0))
    p_iota = jnp.arange(NP, dtype=jnp.int32)
    wp = (p_iota == jp[..., None]).astype(jnp.float32)
    wpe = (wp[..., :, None] * we[..., None, :]).reshape(
        jp.shape + (NP * NE,)).astype(jnp.bfloat16)
    dn = (((wpe.ndim - 1,), (0,)), ((), ()))
    u = sum(lax.dot_general(wpe, t, dn, preferred_element_type=jnp.float32)
            for t in (hi, mid, lot))
    u = u.reshape(jp.shape + (NT, ng))
    t_iota = jnp.arange(NT, dtype=jnp.int32)
    wt = (jnp.where(t_iota == jt[..., None], f0[..., None], 0.0)
          + jnp.where(t_iota == jt[..., None] + 1, f1[..., None], 0.0))
    return jnp.einsum("...t,...tg->...g", wt, u)


c = matmul_split(jp)
print("split max rel diff:", float(jnp.max(jnp.abs(a - c) / (jnp.abs(a) + 1e-12))))
report("matmul bf16-split x3", bench(matmul_split, jp, n=5), ncol)
