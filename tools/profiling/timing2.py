"""Chained-loop TPU timing: K iterations inside one dispatch.

The axon tunnel adds ~24 ms per dispatch (measured), swamping small
kernels. bench_loop runs K data-dependent iterations of fn inside a
single jitted fori_loop, so per-iteration cost = (total - floor) / K.
"""
import time
import jax
import jax.numpy as jnp
from jax import lax


def _scalarize(out):
    s = jnp.float32(0)
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            xf = x.astype(jnp.float32)
            s = s + jnp.sum(xf * xf) * 1e-30
    return s


def bench_loop(fn, *args, k=10, n=3):
    """Median per-iteration seconds of fn(*args), k chained reps/dispatch.

    fn's first arg must be a pytree with at least one float leaf; each
    iteration perturbs it by the running scalar so iterations are
    sequentially dependent and cannot be CSE'd.
    """
    # args pass through jit as REAL arguments: captured device arrays
    # become HLO constants, and the axon tunnel serializes those into
    # the compile request body (HTTP 413 above a few hundred MB)
    def run(eps, *a_in):
        def body(_, carry):
            eps = carry
            a = list(a_in)
            a[0] = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x, a[0])
            return _scalarize(fn(*a))
        return lax.fori_loop(0, k, body, eps)

    g = jax.jit(lambda eps: run(eps, *args)) if not args else jax.jit(run)
    if args:
        g0 = g
        g = lambda eps: g0(eps, *args)
    eps = g(jnp.float32(0.0))
    float(eps)                      # warm + compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        eps = g(eps * 1e-30)
        float(eps)
        times.append(time.perf_counter() - t0)
    times.sort()
    return (times[len(times) // 2] - 0.024) / k   # subtract tunnel floor


def report(name, dt, ncol):
    print(f"{name:44s} {dt*1e3:9.3f} ms  {ncol/dt:12.0f} cols/s")


def bench_carry(fn, x0, k=10, n=3):
    """Per-iteration seconds where fn's output IS the next input.

    fn: pytree -> pytree of the same structure. Forces every output leaf
    to be materialized (it becomes the next carry), so memory-bound
    stages are measured honestly.
    """
    def run(x):
        return lax.fori_loop(0, k, lambda _, c: fn(c), x)

    g = jax.jit(run)
    x = g(x0)
    float(_scalarize(x))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        x = g(x)
        float(_scalarize(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return (times[len(times) // 2] - 0.024) / k
