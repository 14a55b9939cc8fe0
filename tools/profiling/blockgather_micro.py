"""Row-gather vs block-gather formulations for taumol k-table fetches."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from timing import bench, report

ncol, nlay, ng, R = 2048, 72, 16, 585
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.random((R, ng), np.float32))
i0 = jnp.asarray(rng.integers(1, R - 13, (ncol, nlay)), jnp.int32)


def rowgathers(i0):
    acc = 0.0
    for off in (-1, 0, 1, 2, 8, 9, 10, 11):
        acc = acc + tab[jnp.clip(i0 + off, 0, R - 1)]
    return acc


def gather_row_block(tab, start, nrows):
    idx = jnp.clip(start, 0, tab.shape[0] - nrows).reshape(-1)[:, None]
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    out = lax.gather(tab, idx, dnums, slice_sizes=(nrows, tab.shape[1]),
                     mode="clip")
    return out.reshape(start.shape + (nrows, tab.shape[1]))


def blockgather(i0):
    blk = gather_row_block(tab, i0 - 1, 13)     # [ncol,nlay,13,ng]
    acc = 0.0
    for k, off in enumerate((-1, 0, 1, 2, 8, 9, 10, 11)):
        acc = acc + blk[..., off + 1, :]
    return acc


a = rowgathers(i0)
b = blockgather(i0)
print("equal:", bool(jnp.all(a == b)))
report("8 row-gathers", bench(rowgathers, i0, n=5), ncol)
report("1 block-gather [13,ng]", bench(blockgather, i0, n=5), ncol)

# weighted version (closer to real taumol: per-offset [ncol,nlay] weights)
w = [jnp.asarray(rng.random((ncol, nlay), np.float32)) for _ in range(8)]
def rowg_w(i0):
    acc = 0.0
    for wk, off in zip(w, (-1, 0, 1, 2, 8, 9, 10, 11)):
        acc = acc + wk[..., None] * tab[jnp.clip(i0 + off, 0, R - 1)]
    return acc
def blkg_w(i0):
    blk = gather_row_block(tab, i0 - 1, 13)
    acc = 0.0
    for wk, off in zip(w, (-1, 0, 1, 2, 8, 9, 10, 11)):
        acc = acc + wk[..., None] * blk[..., off + 1, :]
    return acc
print("w equal:", bool(jnp.allclose(rowg_w(i0), blkg_w(i0))))
report("8 weighted row-gathers", bench(rowg_w, i0, n=5), ncol)
report("1 weighted block-gather", bench(blkg_w, i0, n=5), ncol)
