"""Column sharding over a TPU mesh.

Radiation is column-local (no halo; SURVEY.md par. 2.8): the horizontal
domain decomposition maps to a 1-D device mesh with every per-column array
sharded on its leading axis. A single jit program covers the pod slice -
XLA inserts no collectives because no cross-column data flow exists; the
only multi-host communication is input staging, overlapping with compute
via jax's async dispatch.

An optional day/night rebalance (the MAPL_BalanceWork analog,
GEOS_SolarGridComp.F90:3689-3712) is unnecessary under dense batching:
night columns are masked, not gathered, because on TPU masked compute is
cheaper than an all_to_all repack.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def column_mesh(devices=None, axis_name="columns"):
    """1-D mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def column_sharding(mesh, axis_name="columns"):
    return NamedSharding(mesh, P(axis_name))


def shard_columns(mesh, tree, axis_name="columns"):
    """Place every array in the pytree with its leading (column) axis
    sharded across the mesh."""
    sh = column_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_columns(tree, multiple):
    """Pad the leading axis of every array to a multiple (for even
    sharding); returns (padded_tree, original_ncol)."""
    ncol = jax.tree.leaves(tree)[0].shape[0]
    pad = (-ncol) % multiple
    if pad == 0:
        return tree, ncol

    def f(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, mode="edge")
    return jax.tree.map(f, tree), ncol
