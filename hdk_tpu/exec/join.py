"""Equi-join engine.

Reference: QueryEngine/JoinHashTable/ — PerfectJoinHashTable (dense
min/max-keyed direct index, PerfectJoinHashTable.h:54) and
BaselineJoinHashTable (MurmurHash open-addressing, BaselineJoinHashTable
.h:52), probed from generated JoinLoops (IRCodegen.cpp:513).

TPU-native design (SURVEY.md §7.1/M4): open-addressing CAS tables are a
poor fit for the TPU's vector memory system, so the general path is a
**sorted-hash join**:

  1. hash all build keys to 64-bit (splitmix-style mixer — role of
     MurmurHash in GroupByRuntime.cpp:25-29);
  2. argsort build side by hash — the sorted (hash, row) pair array *is*
     the hash table (keys|payload layout analog of HashTable.h:25);
  3. probe = vectorized binary search (searchsorted lower/upper) giving a
     candidate range per probe row — the OneToMany (offset, count) pair;
  4. expand candidate pairs, then verify true key equality to discard
     64-bit hash collisions (the reference compares keys in the probe
     loop for the same reason);
  5. SQL semantics: NULL keys never match — enforced by disjoint hash
     sentinels per side, so null rows generate zero candidates.

Expansion size is data-dependent: the executor syncs the candidate total
to the host between pass 1 and 2 — the same two-pass count-then-fill
structure the reference uses to build OneToMany tables
(fill_one_to_many_hash_table, HashJoinRuntime.h:181).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .groupby import _orderable_int64
from .masked import MaskedCol, combine_masks

def _i64(u: int) -> np.int64:
    """uint64 literal as its two's-complement int64 value (a host numpy
    scalar — a device array here would initialise the XLA backend at
    import time, breaking jax.distributed.initialize ordering)."""
    return np.uint64(u).astype(np.int64)


# disjoint null sentinels per side => null never matches null
_BUILD_NULL = _i64(0xF0F0F0F0F0F0F0F0)
_PROBE_NULL = _i64(0x0F0F0F0F0F0F0F0F)


def _lsr(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Logical shift right on int64 (mask off the sign extension)."""
    return (x >> k) & ((1 << (64 - k)) - 1)


def _mix64(x: jnp.ndarray) -> jnp.ndarray:
    """splitmix64 finalizer in int64 arithmetic (wrapping semantics are
    identical to uint64; uint64 itself is pathologically slow on TPU —
    measured 42s for a 1M argsort vs 83ms for int64)."""
    x = x ^ _lsr(x, 30)
    x = x * _i64(0xBF58476D1CE4E5B9)
    x = x ^ _lsr(x, 27)
    x = x * _i64(0x94D049BB133111EB)
    return x ^ _lsr(x, 31)


def hash_keys(cols: Sequence[MaskedCol], null_sentinel: jnp.ndarray) -> jnp.ndarray:
    """Combined 64-bit hash of key columns; rows with any NULL key get
    ``null_sentinel``."""
    h = jnp.full(cols[0].data.shape, 0x243F6A8885A308D3, jnp.int64)
    valid = None
    for c in cols:
        k = _orderable_int64(c.data)
        h = _mix64(h ^ _mix64(k))
        valid = combine_masks(valid, c.mask)
    if valid is not None:
        h = jnp.where(valid, h, null_sentinel)
    return h


@jax.tree_util.register_pytree_node_class
@dataclass
class BuildTable:
    """Sorted-hash 'table': permutation + sorted hashes (cacheable per
    plan hash — reference: DataRecycler/HashtableRecycler.h:32)."""

    perm: jnp.ndarray  # build row index, ordered by hash
    sorted_hash: jnp.ndarray

    def tree_flatten(self):
        return (self.perm, self.sorted_hash), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build(build_keys: Sequence[MaskedCol]) -> BuildTable:
    h = hash_keys(build_keys, _BUILD_NULL)
    perm = jnp.argsort(h, stable=True).astype(jnp.int32)
    return BuildTable(perm, h[perm])


def probe_ranges(table: BuildTable, probe_keys: Sequence[MaskedCol]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(lo, hi) candidate positions in the sorted build table per probe row."""
    ph = hash_keys(probe_keys, _PROBE_NULL)
    # method="sort": the default scan method is catastrophically slow on
    # TPU (measured 2.4 Mrows/s vs >1 Grows/s for the sort-based probe)
    lo = jnp.searchsorted(table.sorted_hash, ph, side="left", method="sort")
    hi = jnp.searchsorted(table.sorted_hash, ph, side="right", method="sort")
    return lo.astype(jnp.int64), hi.astype(jnp.int64)


def _decode_runs(excl: jnp.ndarray, total: int) -> jnp.ndarray:
    """Run-length decode: slot j -> owning probe row, given each row's
    exclusive start offset.  Scatter-add of run-start markers + cumsum
    (measured 2.9x over searchsorted(method="sort") at 1e8 slots; empty
    runs stack their markers on one slot, which add() handles)."""
    z = jnp.zeros((total,), jnp.int32).at[excl].add(1, mode="drop")
    return jnp.cumsum(z) - 1


def expand_pairs(table: BuildTable, lo: jnp.ndarray, hi: jnp.ndarray,
                 total: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize candidate (probe_row, build_row) pairs; ``total`` is the
    host-synced candidate count (static for this trace)."""
    counts = hi - lo
    offsets = jnp.cumsum(counts)  # inclusive
    excl = offsets - counts
    j = jnp.arange(total, dtype=jnp.int64)
    l_idx = _decode_runs(excl, total)
    safe_l = jnp.minimum(l_idx, lo.shape[0] - 1)
    within = j - excl[safe_l]
    pos = lo[safe_l] + within
    r_idx = table.perm[jnp.clip(pos, 0, table.perm.shape[0] - 1)]
    return safe_l, r_idx


def expand_pairs_capped(table: BuildTable, lo: jnp.ndarray, hi: jnp.ndarray,
                        cap: int) -> Tuple[jnp.ndarray, jnp.ndarray,
                                           jnp.ndarray, jnp.ndarray]:
    """Sync-free variant of ``expand_pairs`` for fixed-capacity buffers
    (shard_map bodies can't host-sync the candidate total).  Returns
    (l_idx, r_idx, live, total): ``live`` marks real pairs, slots past
    the data are padding; ``total`` is the true candidate count so the
    caller can detect overflow (total > cap) and widen-retry."""
    counts = hi - lo
    offsets = jnp.cumsum(counts)  # inclusive
    excl = offsets - counts
    total = offsets[-1] if lo.shape[0] > 0 else jnp.asarray(0, jnp.int64)
    j = jnp.arange(cap, dtype=jnp.int64)
    l_idx = _decode_runs(excl, cap)
    safe_l = jnp.minimum(l_idx, max(lo.shape[0] - 1, 0))
    within = j - excl[safe_l]
    pos = lo[safe_l] + within
    r_idx = table.perm[jnp.clip(pos, 0, table.perm.shape[0] - 1)]
    live = j < total
    return safe_l, r_idx, live, total


@jax.tree_util.register_pytree_node_class
@dataclass
class PerfectTable:
    """Dense direct-index one-to-one table (reference:
    PerfectJoinHashTable.h:54 — min/max-keyed, ``slot = key - min_key``).
    ``rows[key - min_key]`` is the build row id, -1 for empty."""

    rows: jnp.ndarray  # (range,) int32
    min_key: int

    def tree_flatten(self):
        return (self.rows,), self.min_key

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def build_perfect(build_key: MaskedCol, min_key: int, range_size: int):
    """Dense build; returns (table, is_unique).  A duplicate key makes
    the scatter lose a row, detected by count (the reference falls over
    to OneToMany on the same condition, PerfectHashTableBuilder)."""
    n = build_key.data.shape[0]
    idx = build_key.data.astype(jnp.int64) - min_key
    valid = (idx >= 0) & (idx < range_size)
    if build_key.mask is not None:
        valid = valid & build_key.mask
    pos = jnp.where(valid, idx, range_size)
    rows = jnp.full((range_size + 1,), -1, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:range_size]
    n_set = jnp.sum(rows >= 0)
    n_valid = jnp.sum(valid)
    return PerfectTable(rows, min_key), n_set == n_valid


def probe_perfect(table: PerfectTable, probe_key: MaskedCol, range_size: int):
    """Per-probe-row build index (-1 = no match); NULL keys never match."""
    idx = probe_key.data.astype(jnp.int64) - table.min_key
    in_range = (idx >= 0) & (idx < range_size)
    if probe_key.mask is not None:
        in_range = in_range & probe_key.mask
    r = table.rows[jnp.clip(idx, 0, range_size - 1)]
    return jnp.where(in_range, r, -1)


def verify_pairs(build_keys: Sequence[MaskedCol], probe_keys: Sequence[MaskedCol],
                 l_idx: jnp.ndarray, r_idx: jnp.ndarray) -> jnp.ndarray:
    """True-equality check on candidate pairs (hash-collision guard)."""
    ok = jnp.ones(l_idx.shape, jnp.bool_)
    for pk, bk in zip(probe_keys, build_keys):
        pv = pk.data[l_idx]
        bv = bk.data[r_idx]
        eq = pv == bv
        if pk.mask is not None:
            eq = eq & pk.mask[l_idx]
        if bk.mask is not None:
            eq = eq & bk.mask[r_idx]
        ok = ok & eq
    return ok


