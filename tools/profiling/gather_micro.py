"""Microbenchmark: table-gather formulations on TPU.

The taumol kernels' core primitive is out[p, :] = tab[idx[p], :] for a
small table (65..585 rows x ng<=16 cols) and N = ncol*nlay points, ~8-12
gathers per band. This measures which formulation XLA/Pallas executes
fastest on the actual chip so the kernel design is evidence-based.
"""
import time, os, sys
import numpy as np
import jax, jax.numpy as jnp

N = int(os.environ.get("N", str(8192 * 72)))
ROWS = int(os.environ.get("ROWS", "585"))
NG = 16

key = jax.random.PRNGKey(0)
tab = jax.random.normal(key, (ROWS, NG), jnp.float32)
tab_pad = jnp.pad(tab, ((0, 0), (0, 128 - NG)))
tab_t = tab.T.copy()                     # [NG, ROWS]
idx = jax.random.randint(key, (N,), 0, ROWS - 1, jnp.int32)
idx2d = idx.reshape(-1, 128)             # [N/128, 128]


def timed(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    gbs = out.size * 4 / dt / 1e9 if hasattr(out, 'size') else 0
    print(f"{name:34s} {dt*1e3:9.3f} ms  {N/dt/1e6:9.1f} Mpts/s  out {gbs:7.1f} GB/s")
    return out


print(f"N={N} ROWS={ROWS} NG={NG}")
timed("plain tab[idx] (rows,16)", lambda i: tab[i], idx)
timed("take axis0", lambda i: jnp.take(tab, i, axis=0), idx)
timed("padded tab[idx] (rows,128)", lambda i: tab_pad[i], idx)
timed("one-hot matmul f32", lambda i: jax.nn.one_hot(i, ROWS, dtype=jnp.float32) @ tab, idx)
timed("one-hot matmul bf16", lambda i: (jax.nn.one_hot(i, ROWS, dtype=jnp.bfloat16) @ tab.astype(jnp.bfloat16)).astype(jnp.float32), idx)
# gather along lanes: out[s, l] = tab_t_bcast[s, idx[s, l]] via take_along_axis
timed("take_along lanes [*,128]",
      lambda i: jnp.take_along_axis(jnp.broadcast_to(tab_t[None], (i.shape[0], NG, ROWS)),
                                    i[:, None, :].repeat(NG, 1) if False else jnp.broadcast_to(i[:, None, :], (i.shape[0], NG, 128)),
                                    axis=2), idx2d.reshape(-1, 1, 128).squeeze(1)[:, :])

# Pallas kernel: table resident in VMEM, gather via take_along_axis on lanes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512  # points per block


def gather_kernel(idx_ref, tab_ref, out_ref):
    # idx_ref [BLK], tab_ref [ROWS, NG], out_ref [BLK, NG]
    i = idx_ref[:]
    out_ref[:] = tab_ref[i]


def pallas_gather(i):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N, NG), jnp.float32),
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec((BLK,), lambda k: (k,), memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, NG), lambda k: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, NG), lambda k: (k, 0), memory_space=pltpu.VMEM),
    )(i, tab)


try:
    timed("pallas tab[i] vec-gather", pallas_gather, idx)
except Exception as e:
    print("pallas vec-gather failed:", str(e)[:300])


# Pallas: gather along lanes via take_along_axis with table transposed
def gather_kernel2(idx_ref, tabt_ref, out_ref):
    # idx_ref [B, 128] int32; tabt_ref [NG, ROWS_PAD]; out [B*NG? ...]
    i = idx_ref[:]                       # [B, 128]
    B = i.shape[0]
    tt = tabt_ref[:]                     # [NG, ROWS]
    for g in range(NG):
        row = tt[g]                      # [ROWS]
        out_ref[g * B:(g + 1) * B, :] = row[i]


ROWS_PAD = ((ROWS + 127) // 128) * 128
tab_t_pad = jnp.pad(tab_t, ((0, 0), (0, ROWS_PAD - ROWS)))
B2 = 64


def pallas_gather2(i2d):
    nblk = i2d.shape[0] // B2
    return pl.pallas_call(
        gather_kernel2,
        out_shape=jax.ShapeDtypeStruct((nblk * NG * B2, 128), jnp.float32),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((B2, 128), lambda k: (k, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((NG, ROWS_PAD), lambda k: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NG * B2, 128), lambda k: (k, 0), memory_space=pltpu.VMEM),
    )(i2d)


try:
    timed("pallas lane-gather rowvec[idx]", pallas_gather2, idx2d)
except Exception as e:
    print("pallas lane-gather failed:", str(e)[:300])
