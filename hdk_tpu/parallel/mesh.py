"""Device mesh utilities.

The reference's parallelism axes are fragments x CPU threads and
fragments x GPUs (SURVEY.md §2.7).  The TPU generalization: one mesh
axis ("frag") shards table rows across chips; collectives ride ICI.
There is no hand-written transport (reference has none either —
SURVEY.md §2.8): XLA inserts the collectives from shard_map.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAG_AXIS = "frag"


def make_mesh(n_devices: Optional[int] = None, axis: str = FRAG_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def row_sharding(mesh: Mesh, axis: str = FRAG_AXIS) -> NamedSharding:
    """Shard the row axis of a column across the mesh (fragment-data-
    parallelism, SURVEY.md P1)."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr, n: int, fill):
    """Pad the row axis so it divides evenly across n shards."""
    import jax.numpy as jnp

    rows = arr.shape[0]
    rem = rows % n
    if rem == 0:
        return arr, rows
    pad = n - rem
    fill_arr = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, fill_arr]), rows
