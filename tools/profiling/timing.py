"""Reliable TPU timing under the axon tunnel.

block_until_ready proved unreliable here (0.06 ms reported for 330 MB of
output). This harness forces execution by (a) chaining iterations through a
data dependency and (b) fetching a scalar to host at the end.
"""
import time
import jax
import jax.numpy as jnp


def _to_scalar(out):
    leaves = jax.tree_util.tree_leaves(out)
    s = jnp.float32(0)
    for x in leaves:
        if hasattr(x, "dtype"):
            xf = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
            s = s + jnp.sum(xf) * 1e-30
    return s


def bench(fn, *args, n=5, scalar_arg=None, **kw):
    """Median wall time of fn(*args) with forced device execution.

    If scalar_arg is given (index of a scalar positional arg), each
    iteration perturbs that arg by the previous iteration's output scalar
    so runs cannot overlap or be cached.
    """
    f = jax.jit(lambda eps, *a: _to_scalar(fn(*a) if scalar_arg is None
                                           else None))

    def run_once(eps):
        a = list(args)
        if scalar_arg is not None:
            a[scalar_arg] = a[scalar_arg] + eps
        else:
            a[0] = jax.tree_util.tree_map(
                lambda x: x + jnp.asarray(eps, x.dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x, a[0])
        return _to_scalar(fn(*a, **kw))

    g = jax.jit(run_once)
    eps = jnp.float32(0.0)
    eps = g(eps)            # compile + warm
    float(eps)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        eps = g(eps * 1e-30)
        v = float(eps)      # host fetch forces completion
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def report(name, dt, ncol):
    print(f"{name:44s} {dt*1e3:9.2f} ms  {ncol/dt:12.0f} cols/s")
