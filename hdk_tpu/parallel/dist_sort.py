"""Distributed sort: sampled range partitioning + all_to_all + local sort.

The reference's sort is single-node (parallelTop / GPU radix,
ResultSetSort.cpp); this is the pod-scale generalization promised in
SURVEY.md P7: distributed sort with per-shard merge.

Mechanism (inside shard_map over the row-sharded input):
  1. every shard takes a regular sample of its sort keys; an all_gather
     makes the global sample visible everywhere (tiny);
  2. splitters = sample quantiles (num_shards-1 of them) — the range
     partition function (radix-partition analog with data-adaptive
     boundaries, which also absorbs value skew);
  3. rows route to the shard owning their range via binary search, then
     ONE all_to_all exchanges them (fixed capacity + validity, like the
     hash shuffle);
  4. each shard sorts its received rows locally; the concatenation of
     shard outputs in shard order is globally sorted.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..exec.groupby import _orderable_int64
from ..exec.masked import MaskedCol
from . import shuffle as shf
from .mesh import FRAG_AXIS


def _sort_key(col: MaskedCol, desc: bool, nulls_first: bool) -> jnp.ndarray:
    kv = _orderable_int64(col.data)
    if desc:
        kv = ~kv
    if col.mask is not None:
        sentinel = (jnp.iinfo(jnp.int64).min if nulls_first
                    else jnp.iinfo(jnp.int64).max)
        kv = jnp.where(col.mask, kv, sentinel)
    return kv


def dist_sort(
    mesh: Mesh,
    sort_col: MaskedCol,
    payload_cols: Sequence[MaskedCol],
    rows_per_shard: int,
    desc: bool = False,
    nulls_first: Optional[bool] = None,
    axis: str = FRAG_AXIS,
    sample_per_shard: int = 256,
    slack: float = 2.0,
):
    """Row-sharded input -> range-partitioned, locally-sorted shards.

    Returns (sorted_payload_cols, sort_col_out, row_valid, overflow):
    per-shard buffers of ``num_shards * cap`` rows; taking valid rows
    shard-by-shard in mesh order yields the global sort order.
    """
    num_shards = mesh.devices.size
    cap = max(1, int(math.ceil(rows_per_shard * slack)))
    nf = desc if nulls_first is None else nulls_first

    def shard_fn(key_col, payloads):
        keys = _sort_key(key_col, desc, nf)
        n_loc = keys.shape[0]
        # 1) regular sample of local keys (sorted first for determinism)
        local_sorted = jnp.sort(keys)
        idx = jnp.linspace(0, n_loc - 1, sample_per_shard).astype(jnp.int32)
        sample = local_sorted[idx]
        # 2) global splitters from the gathered sample
        all_samples = jax.lax.all_gather(sample, axis).reshape(-1)
        all_sorted = jnp.sort(all_samples)
        total = all_sorted.shape[0]
        spl_idx = (jnp.arange(1, num_shards) * total // num_shards)
        splitters = all_sorted[spl_idx]
        # 3) destination shard per row + exchange
        dest = jnp.searchsorted(splitters, keys, side="right",
                                method="sort").astype(jnp.int32)
        cols = [MaskedCol(keys)] + list(payloads)
        flat: List[jnp.ndarray] = []
        positions: List[Tuple[int, Optional[int]]] = []
        for c in cols:
            di = len(flat)
            flat.append(c.data)
            mi = None
            if c.mask is not None:
                mi = len(flat)
                flat.append(c.mask)
            positions.append((di, mi))
        bufs, buf_valid, overflow = shf.build_send_buffers(
            dest, flat, jnp.ones((n_loc,), jnp.bool_), num_shards, cap)
        recv, recv_valid = shf.exchange(bufs, buf_valid, axis)
        out_cols = [MaskedCol(recv[di], recv[mi] if mi is not None else None)
                    for di, mi in positions]
        # 4) local sort of received rows; invalid rows last
        rkeys = out_cols[0].data
        rkeys = jnp.where(recv_valid, rkeys, jnp.iinfo(jnp.int64).max)
        perm = jnp.argsort(rkeys, stable=True).astype(jnp.int32)
        sorted_payloads = [
            MaskedCol(c.data[perm],
                      c.mask[perm] if c.mask is not None else None)
            for c in out_cols[1:]
        ]
        key_out = MaskedCol(out_cols[0].data[perm],
                            out_cols[0].mask[perm]
                            if out_cols[0].mask is not None else None)
        valid_out = recv_valid[perm]
        return sorted_payloads, key_out, valid_out, jax.lax.psum(overflow, axis)

    in_specs = (
        jax.tree.map(lambda _: P(axis), sort_col),
        jax.tree.map(lambda _: P(axis), list(payload_cols)),
    )
    out_specs = (
        jax.tree.map(lambda _: P(axis), [
            MaskedCol(jnp.zeros(()), None if c.mask is None
                      else jnp.zeros((), jnp.bool_))
            for c in payload_cols
        ]),
        jax.tree.map(lambda _: P(axis),
                     MaskedCol(jnp.zeros(()), None if sort_col.mask is None
                               else jnp.zeros((), jnp.bool_))),
        P(axis),
        P(),
    )
    return shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(
        sort_col, list(payload_cols))
