"""Microbenchmark: RNG strategies for McICA subcolumn generation."""
import time, os
import numpy as np
import jax, jax.numpy as jnp

ncol, nsub, nlay = 2048, 140, 72
print(f"ncol={ncol} nsub={nsub} nlay={nlay}: {4*ncol*nsub*nlay/1e6:.0f}M uniforms")


def timed(name, fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return out


play = jnp.asarray(np.random.rand(ncol, 4).astype(np.float32) * 1000)

def percol_threefry(play4):
    def column(p):
        ints = ((p - jnp.floor(p)) * 2147483646.0 + 1.0).astype(jnp.uint32)
        key = jax.random.key(0)
        for i in range(4):
            key = jax.random.fold_in(key, ints[i])
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return tuple(jax.random.uniform(k, (nsub, nlay)) for k in (k1, k2, k3, k4))
    return jax.vmap(column)(play4)

timed("per-column threefry (current)", percol_threefry, play)

def single_threefry(play4):
    key = jax.random.key(7)
    return jax.random.uniform(key, (4, ncol, nsub, nlay))

timed("one threefry call same volume", single_threefry, play)


# philox-lite: per-element counter-based, fully vectorized u32 ops
def _mulhilo(a, b):
    # 32x32 -> 64 via u32 ops
    prod = a.astype(jnp.uint64) * b.astype(jnp.uint64)
    return (prod >> 32).astype(jnp.uint32), prod.astype(jnp.uint32)

PHILOX_M0 = jnp.uint32(0xD2511F53)
PHILOX_M1 = jnp.uint32(0xCD9E8D57)
W0 = jnp.uint32(0x9E3779B9)
W1 = jnp.uint32(0xBB67AE85)

def philox4x32(c0, c1, c2, c3, k0, k1, rounds=10):
    for _ in range(rounds):
        hi0, lo0 = _mulhilo(PHILOX_M0, c0)
        hi1, lo1 = _mulhilo(PHILOX_M1, c2)
        c0, c1, c2, c3 = (hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0)
        k0 = k0 + W0
        k1 = k1 + W1
    return c0, c1, c2, c3

def u2f(u):
    return (u >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))

def philox_streams(play4):
    ints = ((play4 - jnp.floor(play4)) * 2147483646.0 + 1.0).astype(jnp.uint32)
    k0 = ints[:, 0] ^ (ints[:, 2] << 1)
    k1 = ints[:, 1] ^ (ints[:, 3] << 1)
    sub = jax.lax.broadcasted_iota(jnp.uint32, (ncol, nsub, nlay), 1)
    layi = jax.lax.broadcasted_iota(jnp.uint32, (ncol, nsub, nlay), 2)
    c0 = jnp.broadcast_to(k0[:, None, None], (ncol, nsub, nlay))
    c1 = jnp.broadcast_to(k1[:, None, None], (ncol, nsub, nlay))
    r = philox4x32(c0, c1, sub, layi,
                   jnp.broadcast_to(k0[:, None, None], c0.shape),
                   jnp.broadcast_to(k1[:, None, None], c0.shape))
    return tuple(u2f(x) for x in r)

timed("philox4x32-10 elementwise (u64 mul)", philox_streams, play)


# variant without u64: manual hi/lo via 16-bit split
def _mulhilo32(a, b):
    a_lo = a & jnp.uint32(0xFFFF)
    a_hi = a >> 16
    b_lo = b & jnp.uint32(0xFFFF)
    b_hi = b >> 16
    lo = a * b
    mid1 = a_hi * b_lo
    mid2 = a_lo * b_hi
    carry = ((a_lo * b_lo) >> 16) + (mid1 & jnp.uint32(0xFFFF)) + (mid2 & jnp.uint32(0xFFFF))
    hi = a_hi * b_hi + (mid1 >> 16) + (mid2 >> 16) + (carry >> 16)
    return hi, lo

def philox4x32_b(c0, c1, c2, c3, k0, k1, rounds=10):
    for _ in range(rounds):
        hi0, lo0 = _mulhilo32(PHILOX_M0, c0)
        hi1, lo1 = _mulhilo32(PHILOX_M1, c2)
        c0, c1, c2, c3 = (hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0)
        k0 = k0 + W0
        k1 = k1 + W1
    return c0, c1, c2, c3

def philox_streams_b(play4):
    ints = ((play4 - jnp.floor(play4)) * 2147483646.0 + 1.0).astype(jnp.uint32)
    k0 = ints[:, 0] ^ (ints[:, 2] << 1)
    k1 = ints[:, 1] ^ (ints[:, 3] << 1)
    sub = jax.lax.broadcasted_iota(jnp.uint32, (ncol, nsub, nlay), 1)
    layi = jax.lax.broadcasted_iota(jnp.uint32, (ncol, nsub, nlay), 2)
    c0 = jnp.broadcast_to(k0[:, None, None], (ncol, nsub, nlay))
    c1 = jnp.broadcast_to(k1[:, None, None], (ncol, nsub, nlay))
    r = philox4x32_b(c0, c1, sub, layi,
                     jnp.broadcast_to(k0[:, None, None], c0.shape),
                     jnp.broadcast_to(k1[:, None, None], c0.shape))
    return tuple(u2f(x) for x in r)

timed("philox4x32-10 elementwise (16bit mul)", philox_streams_b, play)

# check both agree
a = jax.jit(philox_streams)(play)
b = jax.jit(philox_streams_b)(play)
print("u64 vs 16bit-split agree:", all(bool(jnp.all(x == y)) for x, y in zip(a, b)))
print("mean/std of stream0:", float(a[0].mean()), float(a[0].std()))

# threefry with batched fold_in (vectorized keys, one uniform call)
def batched_threefry(play4):
    ints = ((play4 - jnp.floor(play4)) * 2147483646.0 + 1.0).astype(jnp.uint32)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.fold_in(jax.random.fold_in(jax.random.fold_in(
            jax.random.key(0), i[0]), i[1]), i[2]), i[3]))(ints)
    return jax.vmap(lambda k: jax.random.uniform(k, (4, nsub, nlay)))(keys)

timed("vmapped-key threefry one call", batched_threefry, play)
