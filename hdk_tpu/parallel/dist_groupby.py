"""Distributed group-by over a device mesh.

The reference's multi-device aggregation is: per-device output buffers,
then a host-side reduction (reference: Execute.cpp:1156
reduceMultiDeviceResults via ResultSetReductionJIT; SURVEY.md A.4).  The
TPU translation (A.4 note): keep identical per-shard layouts so the
combine is positional, and let XLA collectives do the reduce:

  * ``dist_groupby_perfect`` — each shard computes a dense positional
    partial buffer, combined with psum/pmin/pmax over the mesh axis (the
    perfect-hash case is a pure elementwise tree-reduce).  Works for
    distributive/algebraic aggregates (COUNT/SUM/AVG/MIN/MAX/STDDEV).
  * ``dist_groupby_shuffled`` — holistic aggregates (COUNT DISTINCT,
    QUANTILE) and high-cardinality keys: rows are exchanged so each key
    lives wholly on its owner shard (parallel/shuffle.py all_to_all),
    then each shard runs the local sort-based group-by.  The result is a
    sharded group table, the pod-scale analog of the reference's
    partitioned aggregation (RelAlgExecutor.cpp:691-860).
"""

from __future__ import annotations

import dataclasses as _dataclasses
import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..exec import groupby as gb
from ..exec.masked import MaskedCol
from ..ir.expr import AggKind
from . import shuffle as shf
from .mesh import FRAG_AXIS

# slot-combine rule per aggregate kind: how per-shard raw slots merge
# (reference: ResultSetReductionOps.h op kinds).  Sketch kinds are
# algebraic too: HLL registers merge by elementwise max (reference:
# hll_unify, HyperLogLog.h:108); t-digest centroids merge by
# concatenate + re-cluster ("tdigest" consumes both slots together).
_COMBINE = {
    AggKind.COUNT: ("sum",),
    AggKind.SUM: ("sum", "sum"),
    AggKind.AVG: ("sum", "sum"),
    AggKind.STDDEV_SAMP: ("sum", "sum", "sum"),
    AggKind.VAR_SAMP: ("sum", "sum", "sum"),
    AggKind.MIN: ("min", "sum"),
    AggKind.MAX: ("max", "sum"),
    AggKind.SAMPLE: ("min", "sum"),
    AggKind.SINGLE_VALUE: ("min", "sum"),
    AggKind.APPROX_COUNT_DISTINCT: ("max",),
    AggKind.APPROX_QUANTILE: ("tdigest", "tdigest"),
}


def perfect_combinable(specs: Sequence[gb.AggSpec]) -> bool:
    return all(s.kind in _COMBINE for s in specs)


def _pin_sketch_sizing(specs, cap_hint: int):
    """Freeze effective sketch widths for a distributed run (budgets set
    to unlimited afterwards so nested paths can't re-shrink them)."""
    from ..ops import sketches as sk
    out = []
    for s in specs:
        if s.kind == AggKind.APPROX_COUNT_DISTINCT:
            s = _dataclasses.replace(
                s, hll_p=sk.effective_hll_p(s.hll_p, cap_hint, s.hll_budget),
                hll_budget=1 << 62)
        elif s.kind == AggKind.APPROX_QUANTILE:
            s = _dataclasses.replace(
                s, td_c=sk.effective_td_c(s.td_c, cap_hint, s.td_budget),
                td_budget=1 << 62)
        out.append(s)
    return out


def dist_groupby_perfect(
    mesh: Mesh,
    keys: Sequence[MaskedCol],
    layout: gb.PerfectHashLayout,
    specs: Sequence[gb.AggSpec],
    axis: str = FRAG_AXIS,
):
    """Row-sharded keys/operands -> replicated finalized dense buffers.

    Returns (key_cols, agg_cols, exists) with ``layout.entry_count``
    entries, replicated on every shard.
    """
    n = layout.entry_count
    operands = [s.operand for s in specs]

    def shard_fn(keys_l, operands_l):
        # same positional layout on every shard => psum is the reducer
        gid = jnp.zeros(keys_l[0].data.shape, jnp.int64)
        stride = 1
        for key, mn, size in zip(reversed(list(keys_l)),
                                 reversed(layout.mins),
                                 reversed(layout.sizes)):
            idx = key.data.astype(jnp.int64) - mn
            if key.mask is not None:
                idx = jnp.where(key.mask, idx, size - 1)
            gid = gid + idx * stride
            stride *= size
        in_range = (gid >= 0) & (gid < n)
        gid = jnp.where(in_range, gid, n).astype(jnp.int32)

        exists_local = jax.ops.segment_sum(
            jnp.ones(gid.shape, jnp.int64), gid, num_segments=n + 1)[:n] > 0
        exists = jax.lax.psum(exists_local.astype(jnp.int32), axis) > 0

        out = []
        for spec, op in zip(specs, operands_l):
            sspec = _dataclasses.replace(spec, operand=op)
            slots = gb._agg_slots(sspec, gid, in_range, n, False).slots
            if spec.kind == AggKind.APPROX_QUANTILE:
                # gather every shard's digests along the centroid axis
                # and re-cluster per group (ops/sketches)
                from ..ops import sketches as sk
                c = slots[0].shape[1]
                gm = jax.lax.all_gather(slots[0], axis, axis=1, tiled=True)
                gw = jax.lax.all_gather(slots[1], axis, axis=1, tiled=True)
                combined = list(sk.tdigest_merge_gathered(gm, gw, c))
            else:
                combined = []
                for slot, rule in zip(slots, _COMBINE[spec.kind]):
                    if rule == "sum":
                        combined.append(jax.lax.psum(slot, axis))
                    elif rule == "min":
                        combined.append(jax.lax.pmin(slot, axis))
                    else:
                        combined.append(jax.lax.pmax(slot, axis))
            out.append(gb.AggResult(combined).finalize(sspec, None))
        return out, exists

    in_specs = (
        jax.tree.map(lambda _: P(axis), list(keys)),
        jax.tree.map(lambda _: P(axis), list(operands)),
    )
    out_specs = (
        jax.tree.map(lambda _: P(), [_out_struct(s) for s in specs]),
        P(),
    )
    agg_cols, exists = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(list(keys), list(operands))

    # reconstruct key columns from the dense entry index (host-side math)
    entry = jnp.arange(n, dtype=jnp.int64)
    strides = []
    acc = 1
    for size in reversed(layout.sizes):
        strides.append(acc)
        acc *= size
    strides = list(reversed(strides))
    key_cols = []
    for key, mn, size, st in zip(keys, layout.mins, layout.sizes, strides):
        idx = (entry // st) % size
        data = (idx + mn).astype(key.data.dtype)
        mask = (idx != size - 1) if key.mask is not None else None
        key_cols.append(MaskedCol(data, mask))
    return key_cols, agg_cols, exists


def _out_struct(spec: gb.AggSpec) -> MaskedCol:
    """Placeholder with the pytree structure finalize() returns."""
    nullable = spec.kind not in (AggKind.COUNT, AggKind.COUNT_DISTINCT,
                                 AggKind.APPROX_COUNT_DISTINCT)
    return MaskedCol(jnp.zeros(()), jnp.zeros((), jnp.bool_) if nullable else None)


def dist_groupby_two_phase(
    mesh: Mesh,
    keys: Sequence[MaskedCol],
    specs: Sequence[gb.AggSpec],
    rows_per_shard: int,
    group_cap_per_shard: int,
    axis: str = FRAG_AXIS,
    slack: float = 2.0,
    row_valid=None,
):
    """Skew-proof distributed group-by for algebraic aggregates.

    Phase 1: every shard pre-aggregates its local rows (sort group-by) —
    a heavy-hitter key collapses to ONE partial row per shard, so key
    skew cannot overload any shuffle partition (the north-star
    heavy-hitter requirement; generalizes the reference's partial
    buffers + reduce, Execute.cpp:1156).
    Phase 2: the per-shard partial rows (at most local-NDV of them)
    shuffle by key to owner shards and merge with the slot-combine
    rules of ``_COMBINE``.

    Same return contract as dist_groupby_shuffled.
    """
    if not perfect_combinable(specs):
        raise ValueError("two-phase aggregation requires algebraic "
                         "aggregates; use dist_groupby_shuffled")
    num_shards = mesh.devices.size
    local_cap = min(rows_per_shard, group_cap_per_shard * num_shards)
    cap = max(1, int(math.ceil(local_cap / num_shards * slack)))
    # pin sketch widths so phase-1 partials (built at local_cap groups)
    # and the phase-2 merge (group_cap groups) agree on register/centroid
    # counts — positional merge requires identical slot shapes
    specs = _pin_sketch_sizing(specs, max(local_cap, group_cap_per_shard))
    operands = [s.operand for s in specs]

    def shard_fn(keys_l, operands_l, row_valid_l):
        # ---- phase 1: local partial aggregation (raw slots) ----------
        nrows = keys_l[0].data.shape[0]
        perm = jnp.arange(nrows, dtype=jnp.int32)
        sort_keys = []
        for key in keys_l:
            kv = gb._orderable_int64(key.data)
            if key.mask is not None:
                kv = jnp.where(key.mask, kv, jnp.iinfo(jnp.int64).max)
            sort_keys.append(kv)
        for kv in reversed(sort_keys):
            perm = perm[jnp.argsort(kv[perm], stable=True)]
        if row_valid_l is not None:  # dead rows (filter/pad) sort last
            perm = perm[jnp.argsort((~row_valid_l[perm]).astype(jnp.int32),
                                    stable=True)]
        boundary = jnp.zeros((nrows,), jnp.bool_).at[0].set(True)
        for kv in sort_keys:
            skv = kv[perm]
            boundary = boundary | jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), skv[1:] != skv[:-1]])
        if row_valid_l is not None:
            sv = row_valid_l[perm].astype(jnp.int32)
            boundary = boundary | jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), sv[1:] != sv[:-1]])
        gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        if row_valid_l is None:
            n_local = gid[-1] + 1
        else:
            n_local = jnp.max(jnp.where(row_valid_l[perm], gid + 1, 0))
        grp = jnp.arange(local_cap + 1, dtype=jnp.int32)
        bounds = jnp.searchsorted(jnp.minimum(gid, local_cap - 1), grp,
                                  side="left", method="sort").astype(jnp.int64)
        starts, ends = bounds[:-1], bounds[1:]

        partial_slots: List[List[jnp.ndarray]] = []
        for spec, op in zip(specs, operands_l):
            sspec = _dataclasses.replace(
                spec, operand=gb._permute_col(op, perm),
                operand2=gb._permute_col(spec.operand2, perm))
            partial_slots.append(
                gb._agg_sorted(sspec, jnp.minimum(gid, local_cap - 1),
                               starts, ends, local_cap).slots)
        rep = perm[jnp.clip(starts, 0, max(nrows - 1, 0)).astype(jnp.int32)]
        pkeys = [
            MaskedCol(k.data[rep], k.mask[rep] if k.mask is not None else None)
            for k in keys_l
        ]
        local_valid = jnp.arange(local_cap) < n_local

        # ---- phase 2: shuffle partial rows, merge by key --------------
        slot_cols = [MaskedCol(slot) for slots in partial_slots
                     for slot in slots]
        cols, row_valid, overflow = shf.shuffle_rows(
            pkeys, slot_cols, axis, num_shards, cap,
            row_valid=local_valid)
        k2 = cols[: len(keys_l)]
        s2 = cols[len(keys_l):]

        # merge: group partial rows by key, combining slots
        merged_keys, merged_slots, exists, n_merged = _merge_partials(
            k2, s2, specs, row_valid, group_cap_per_shard)
        agg_cols = [
            gb.AggResult(slots).finalize(spec, None)
            for slots, spec in zip(merged_slots, specs)
        ]
        # receiver group-cap overflow is a detected failure, not a silent
        # clamp: a shard owning more distinct keys than its cap reports
        # the shortfall so the caller can widen and retry (reference:
        # OUT_OF_SLOTS -> retry ladder, GroupByRuntime.cpp:31-54)
        merge_overflow = jnp.maximum(
            n_merged.astype(jnp.int64) - group_cap_per_shard, 0)
        total_overflow = jax.lax.psum(
            overflow.astype(jnp.int64) + merge_overflow, axis)
        return merged_keys, agg_cols, exists, total_overflow

    in_specs = (
        jax.tree.map(lambda _: P(axis), list(keys)),
        jax.tree.map(lambda _: P(axis), list(operands)),
        None if row_valid is None else P(axis),
    )
    out_specs = (
        jax.tree.map(lambda _: P(axis), [
            MaskedCol(jnp.zeros(()), None if k.mask is None
                      else jnp.zeros((), jnp.bool_)) for k in keys]),
        jax.tree.map(lambda _: P(axis), [_out_struct(s) for s in specs]),
        P(axis),
        P(),
    )
    return shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(
        list(keys), list(operands), row_valid)


def _merge_partials(key_cols, slot_cols, specs, row_valid, cap):
    """Group shuffled partial rows by key; combine slots with the
    per-kind merge rules (sum/min/max)."""
    nrows = key_cols[0].data.shape[0]
    perm = jnp.arange(nrows, dtype=jnp.int32)
    sort_keys = []
    for key in key_cols:
        kv = gb._orderable_int64(key.data)
        if key.mask is not None:
            kv = jnp.where(key.mask, kv, jnp.iinfo(jnp.int64).max)
        sort_keys.append(kv)
    for kv in reversed(sort_keys):
        perm = perm[jnp.argsort(kv[perm], stable=True)]
    perm = perm[jnp.argsort((~row_valid[perm]).astype(jnp.int32),
                            stable=True)]
    boundary = jnp.zeros((nrows,), jnp.bool_).at[0].set(True)
    for kv in sort_keys:
        skv = kv[perm]
        boundary = boundary | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), skv[1:] != skv[:-1]])
    sv = row_valid[perm].astype(jnp.int32)
    boundary = boundary | jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sv[1:] != sv[:-1]])
    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    n_groups = jnp.max(jnp.where(row_valid[perm], gid + 1, 0))
    gid = jnp.minimum(gid, cap - 1)
    grp = jnp.arange(cap + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(gid, grp, side="left",
                              method="sort").astype(jnp.int64)
    starts, ends = bounds[:-1], bounds[1:]

    merged = []
    i = 0
    for spec in specs:
        rules = _COMBINE[spec.kind]
        if spec.kind == AggKind.APPROX_QUANTILE:
            # both slots merge together: concatenate each key's partial
            # digests and re-cluster (ops/sketches)
            from ..ops import sketches as sk
            means = slot_cols[i].data[perm]
            weights = slot_cols[i + 1].data[perm]
            i += 2
            weights = jnp.where(row_valid[perm][:, None], weights, 0.0)
            merged.append(list(sk.tdigest_merge_rows(
                means, weights, gid, starts, ends, cap)))
            continue
        slots = []
        for rule in rules:
            col = slot_cols[i]
            i += 1
            vals = col.data[perm]
            rv = row_valid[perm]
            vals = jnp.where(rv[:, None] if vals.ndim == 2 else rv, vals,
                             _merge_identity(rule, vals.dtype))
            if rule == "sum":
                slots.append(gb._span_sums(vals, starts, ends))
            elif rule == "min":
                slots.append(gb._seg_min(vals, gid, cap + 1, True)[:cap])
            else:
                slots.append(gb._seg_max(vals, gid, cap + 1, True)[:cap])
        merged.append(slots)
    rep = perm[jnp.clip(starts, 0, max(nrows - 1, 0)).astype(jnp.int32)]
    mkeys = [
        MaskedCol(k.data[rep], k.mask[rep] if k.mask is not None else None)
        for k in key_cols
    ]
    exists = jnp.arange(cap) < n_groups
    return mkeys, merged, exists, n_groups


def _merge_identity(rule: str, dtype):
    if rule == "sum":
        return jnp.asarray(0, dtype)
    return gb._minmax_identity(dtype, rule == "min")


def dist_groupby_shuffled(
    mesh: Mesh,
    keys: Sequence[MaskedCol],
    specs: Sequence[gb.AggSpec],
    rows_per_shard: int,
    group_cap_per_shard: int,
    axis: str = FRAG_AXIS,
    slack: float = 2.0,
    row_valid=None,
):
    """Row-sharded inputs -> per-shard complete groups via all_to_all.

    The raw-row shuffle: every key's rows co-locate on its owner shard,
    so HOLISTIC aggregates (COUNT DISTINCT, QUANTILE, TOP_K, CORR)
    compute exactly — the pod-scale analog of the reference's
    partitioned aggregation (RelAlgExecutor.cpp:691-860).

    Returns (key_cols, agg_cols, group_valid, overflow) where buffers are
    sharded (num_shards * group_cap_per_shard rows total); ``group_valid``
    marks real groups.  ``overflow`` > 0 means a shuffle-slot or
    receiver group-cap capacity was exceeded and the caller must retry
    with more slack (reference analog: OUT_OF_SLOTS -> retry ladder,
    Execute.cpp:2291).
    """
    num_shards = mesh.devices.size
    cap = max(1, int(math.ceil(rows_per_shard / num_shards * slack)))
    operands = [s.operand for s in specs]
    operands2 = [s.operand2 for s in specs]

    def shard_fn(keys_l, operands_l, operands2_l, row_valid_l):
        present = ([op for op in operands_l if op is not None]
                   + [op for op in operands2_l if op is not None])
        cols, rvalid, overflow = shf.shuffle_rows(
            list(keys_l), present, axis, num_shards, cap,
            row_valid=row_valid_l)
        k2 = cols[: len(keys_l)]
        rest = iter(cols[len(keys_l):])
        ops2: List[Optional[MaskedCol]] = [
            next(rest) if op is not None else None for op in operands_l]
        ops2b: List[Optional[MaskedCol]] = [
            next(rest) if op is not None else None for op in operands2_l]
        specs2 = [
            _dataclasses.replace(s, operand=o, operand2=o2)
            for s, o, o2 in zip(specs, ops2, ops2b)
        ]
        key_cols, agg_cols, exists, n_local = gb.groupby_sort(
            k2, specs2, group_cap_per_shard, row_valid=rvalid)
        # receiver group-cap overflow feeds the retry signal too (see
        # dist_groupby_two_phase)
        group_overflow = jnp.maximum(
            n_local.astype(jnp.int64) - group_cap_per_shard, 0)
        total_overflow = jax.lax.psum(
            overflow.astype(jnp.int64) + group_overflow, axis)
        return key_cols, agg_cols, exists, total_overflow

    in_specs = (
        jax.tree.map(lambda _: P(axis), list(keys)),
        jax.tree.map(lambda _: P(axis), list(operands)),
        jax.tree.map(lambda _: P(axis), list(operands2)),
        None if row_valid is None else P(axis),
    )
    out_specs = (
        jax.tree.map(lambda _: P(axis), [MaskedCol(jnp.zeros(()), None
                                                   if k.mask is None else jnp.zeros((), jnp.bool_))
                                         for k in keys]),
        jax.tree.map(lambda _: P(axis), [_out_struct(s) for s in specs]),
        P(axis),
        P(),
    )
    return shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(
        list(keys), list(operands), list(operands2), row_valid)
