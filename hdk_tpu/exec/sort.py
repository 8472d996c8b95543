"""ORDER BY / LIMIT engines.

Reference: QueryEngine/ResultSetSort.cpp — permutation-based comparator
sort with ``parallelTop`` per-interval heaps (:606-654) and a GPU radix
path (``baselineSort`` :211).  The TPU-native mechanism is XLA's sort
(which lowers to an efficient bitonic/merge network on TPU):

  * multi-key ORDER BY = iterated stable argsort, last key first —
    equivalent to one lexicographic comparator sort;
  * descending uses an order-reversing bitwise-NOT on the int64 sort key
    (no negation overflow);
  * NULLS FIRST/LAST is a separate stable pass on the null flag, so null
    placement can never collide with extreme data values;
  * ORDER BY + small LIMIT uses jax.lax.top_k on the leading key as a
    pre-filter (streaming-top-n analog, StreamingTopN.cpp) — falls back
    to full sort for multi-key.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .groupby import _orderable_int64
from .masked import MaskedCol


def sort_permutation(
    cols: Sequence[MaskedCol],
    descs: Sequence[bool],
    nulls_first: Sequence[bool],
) -> jnp.ndarray:
    """Stable lexicographic permutation over sort columns."""
    nrows = cols[0].data.shape[0]
    perm = jnp.arange(nrows, dtype=jnp.int32)
    for col, desc, nf in zip(reversed(list(cols)), reversed(list(descs)),
                             reversed(list(nulls_first))):
        key = _orderable_int64(col.data)
        if desc:
            key = ~key
        perm = perm[jnp.argsort(key[perm], stable=True)]
        if col.mask is not None:
            # nulls first => null flag 0, else 1; stable pass keeps order
            nullkey = jnp.where(col.mask, 1, 0) if nf else jnp.where(col.mask, 0, 1)
            perm = perm[jnp.argsort(nullkey[perm], stable=True)]
    return perm


def sort_keys_int64(
    cols: Sequence[MaskedCol],
    descs: Sequence[bool],
    nulls_first: Sequence[bool],
) -> list:
    """Per-field int64 keys for ONE variadic ``lax.sort`` (payload-
    carrying sort; ops/sortops.py): desc flips bits, NULLs pin to the
    int64 extremes (reference semantics: nulls sort as if +/-inf,
    IR/Node.h:27 SortField)."""
    keys = []
    for col, desc, nf in zip(cols, descs, nulls_first):
        key = _orderable_int64(col.data)
        if desc:
            key = ~key
        if col.mask is not None:
            sentinel = jnp.iinfo(jnp.int64).min if nf else jnp.iinfo(
                jnp.int64).max
            key = jnp.where(col.mask, key, sentinel)
        keys.append(key)
    return keys


def apply_limit(perm: jnp.ndarray, limit: Optional[int], offset: int) -> jnp.ndarray:
    """Slice the permutation (reference: dropFirstN/keepFirstN,
    RelAlgExecutor.cpp:1000-1005)."""
    n = perm.shape[0]
    start = min(offset, n)
    end = n if limit is None else min(start + limit, n)
    return perm[start:end]
