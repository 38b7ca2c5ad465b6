"""Device mesh + sharding helpers.

The reference scales with DDP/NCCL (reference main.py:884-902); the
TPU-native equivalent is a ``jax.sharding.Mesh`` with the batch sharded over
the ``data`` axis and parameters replicated — XLA inserts the gradient
all-reduce over ICI automatically under jit. The FSQ codebook-stat mean
(reference regularizers.py:49-54, explicit dist.all_reduce) needs no code at
all: a global ``jnp.mean`` over the sharded batch axis IS the collective.

An optional ``spatial`` axis shards the H dimension of inference batches
over chips for large-frame decoding (a TPU-native extension; halo exchange
is handled by XLA's conv spatial partitioning).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    devices = devices[: n_data * n_spatial]
    arr = np.array(devices).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis: int = 0):
    """Shard array leaves along ``axis`` over the 'data' mesh axis."""

    def put(x):
        spec = [None] * x.ndim
        spec[axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)
