"""Window function execution.

Reference: QueryEngine/WindowContext.{h,cpp} — the reference
materializes partitions via a hash join table on the partition keys,
sorts each partition, and computes rank-family / navigation / windowed
aggregates into a buffer indexed by original row position (SURVEY.md
A.6).

TPU-native mechanism: ONE lexicographic sort of all rows by
(validity, partition keys, order keys), then every window kind is a
combination of segment boundaries, prefix scans (jax.lax.associative_scan
with segmented combine), and gathers — fully fused by XLA, no
per-partition loops.  Results scatter back to original row positions.

Frame semantics (matching the reference's defaults):
  * rank family / ntile: standard SQL.
  * navigation (lag/lead/first/last): whole partition.
  * windowed aggregates: whole partition without ORDER BY; cumulative
    (RANGE UNBOUNDED PRECEDING .. CURRENT ROW, ties share the value of
    their tie-group end) with ORDER BY.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ir.expr import WindowKind
from .groupby import _minmax_identity, _orderable_int64
from .masked import MaskedCol, combine_masks


def _seg_scan(vals, reset, combine):
    """Segmented inclusive scan: restart at rows where reset is True."""

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, combine(va, vb))

    _, out = jax.lax.associative_scan(op, (reset, vals))
    return out


def compute_window(
    kind: WindowKind,
    args: Sequence[MaskedCol],
    part_cols: Sequence[MaskedCol],
    order_cols: Sequence[MaskedCol],
    order_desc: Sequence[bool],
    arg1,
    nrows: int,
    row_mask: Optional[jnp.ndarray],
    out_dtype,
) -> MaskedCol:
    # ---- global sort: (validity, partition keys, order keys) ----------
    perm = jnp.arange(nrows, dtype=jnp.int32)

    def keyof(col: MaskedCol, desc: bool = False, nulls_high: bool = True):
        kv = _orderable_int64(col.data)
        if desc:
            kv = ~kv
        if col.mask is not None:
            sentinel = jnp.iinfo(jnp.int64).max if nulls_high else jnp.iinfo(jnp.int64).min
            kv = jnp.where(col.mask, kv, sentinel)
        return kv

    order_keys = [keyof(c, d) for c, d in zip(order_cols, order_desc)]
    part_keys = [keyof(c) for c in part_cols]
    for kv in reversed(order_keys):
        perm = perm[jnp.argsort(kv[perm], stable=True)]
    for kv in reversed(part_keys):
        perm = perm[jnp.argsort(kv[perm], stable=True)]
    if row_mask is not None:  # dead rows cluster at the end
        perm = perm[jnp.argsort((~row_mask[perm]).astype(jnp.int32),
                                stable=True)]

    pos = jnp.arange(nrows, dtype=jnp.int64)
    first_row = pos == 0

    def boundary(keys):
        b = first_row
        for kv in keys:
            sk = kv[perm]
            b = b | jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]])
        return b

    pb = boundary(part_keys)  # partition boundary
    if row_mask is not None:
        sv = row_mask[perm]
        pb = pb | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sv[1:] != sv[:-1]])
    ob = pb | boundary(order_keys)  # order-tie boundary

    pgid = jnp.cumsum(pb.astype(jnp.int32)) - 1
    n_seg = nrows + 1
    start = _seg_scan(jnp.where(pb, pos, 0), pb, lambda a, b: a)  # abs start
    cnt = jax.ops.segment_sum(jnp.ones((nrows,), jnp.int64), pgid,
                              num_segments=n_seg,
                              indices_are_sorted=True)[pgid]
    pos0 = pos - start  # 0-based within partition
    tie_start = _seg_scan(jnp.where(ob, pos, 0), ob, lambda a, b: a)
    tie_gid = jnp.cumsum(ob.astype(jnp.int32)) - 1
    tie_end = jax.ops.segment_max(pos, tie_gid, num_segments=n_seg,
                                  indices_are_sorted=True)[tie_gid]

    def scatter_back(sorted_vals, sorted_mask=None) -> MaskedCol:
        out = jnp.zeros((nrows,), sorted_vals.dtype).at[perm].set(sorted_vals)
        mask = (jnp.zeros((nrows,), jnp.bool_).at[perm].set(sorted_mask)
                if sorted_mask is not None else None)
        return MaskedCol(out.astype(out_dtype), mask)

    if kind == WindowKind.ROW_NUMBER:
        return scatter_back(pos0 + 1)
    if kind == WindowKind.RANK:
        return scatter_back(tie_start - start + 1)
    if kind == WindowKind.DENSE_RANK:
        obc = jnp.cumsum(ob.astype(jnp.int64))
        return scatter_back(obc - obc[jnp.clip(start, 0, nrows - 1)] + 1)
    if kind == WindowKind.PERCENT_RANK:
        rank = (tie_start - start).astype(jnp.float64)
        denom = jnp.maximum(cnt - 1, 1).astype(jnp.float64)
        return scatter_back(jnp.where(cnt <= 1, 0.0, rank / denom))
    if kind == WindowKind.CUME_DIST:
        return scatter_back((tie_end - start + 1).astype(jnp.float64)
                            / cnt.astype(jnp.float64))
    if kind == WindowKind.NTILE:
        n = jnp.int64(int(arg1))
        return scatter_back(pos0 * n // jnp.maximum(cnt, 1) + 1)

    # navigation / aggregates need the argument column in sorted order
    arg = args[0] if args else None

    if kind in (WindowKind.LAG, WindowKind.LEAD):
        k = int(arg1) if arg1 is not None else 1
        if kind == WindowKind.LEAD:
            k = -k
        src = jnp.clip(pos - k, 0, nrows - 1)
        in_part = (pgid[src] == pgid) & (pos - k >= 0) & (pos - k < nrows)
        sa = arg.data[perm]
        sm = arg.mask[perm] if arg.mask is not None else None
        vals = sa[src]
        mask = in_part if sm is None else (in_part & sm[src])
        return scatter_back(vals, mask)

    if kind in (WindowKind.FIRST_VALUE, WindowKind.LAST_VALUE):
        sa = arg.data[perm]
        sm = arg.mask[perm] if arg.mask is not None else None
        if kind == WindowKind.FIRST_VALUE:
            idx = start
        else:
            idx = jax.ops.segment_max(pos, pgid, num_segments=n_seg,
                                      indices_are_sorted=True)[pgid]
        vals = sa[jnp.clip(idx, 0, nrows - 1)]
        mask = sm[jnp.clip(idx, 0, nrows - 1)] if sm is not None else None
        return scatter_back(vals, mask)

    # ---- windowed aggregates -----------------------------------------
    cumulative = len(order_cols) > 0
    if kind == WindowKind.COUNT and arg is None:
        ones = jnp.ones((nrows,), jnp.int64)
        if cumulative:
            run = _seg_scan(ones, pb, jnp.add)
            return scatter_back(run[tie_end])
        return scatter_back(cnt)

    sa = arg.data[perm]
    sm = arg.mask[perm] if arg.mask is not None else None

    if kind == WindowKind.COUNT:
        ones = (jnp.ones((nrows,), jnp.int64) if sm is None
                else sm.astype(jnp.int64))
        if cumulative:
            return scatter_back(_seg_scan(ones, pb, jnp.add)[tie_end])
        return scatter_back(jax.ops.segment_sum(
            ones, pgid, num_segments=n_seg, indices_are_sorted=True)[pgid])

    acc_dt = (jnp.float64 if jnp.issubdtype(sa.dtype, jnp.floating)
              else jnp.int64)
    vals0 = (sa.astype(acc_dt) if sm is None
             else jnp.where(sm, sa, 0).astype(acc_dt))
    nonnull = (jnp.ones((nrows,), jnp.int64) if sm is None
               else sm.astype(jnp.int64))

    if kind in (WindowKind.SUM, WindowKind.AVG):
        if cumulative:
            s = _seg_scan(vals0, pb, jnp.add)[tie_end]
            nn = _seg_scan(nonnull, pb, jnp.add)[tie_end]
        else:
            s = jax.ops.segment_sum(vals0, pgid, num_segments=n_seg,
                                    indices_are_sorted=True)[pgid]
            nn = jax.ops.segment_sum(nonnull, pgid, num_segments=n_seg,
                                     indices_are_sorted=True)[pgid]
        if kind == WindowKind.AVG:
            avg = s.astype(jnp.float64) / jnp.maximum(nn, 1)
            return scatter_back(avg, nn > 0)
        return scatter_back(s, nn > 0)

    if kind in (WindowKind.MIN, WindowKind.MAX):
        is_min = kind == WindowKind.MIN
        ident = _minmax_identity(sa.dtype, is_min)
        filled = sa if sm is None else jnp.where(sm, sa, ident)
        combine = jnp.minimum if is_min else jnp.maximum
        if cumulative:
            r = _seg_scan(filled, pb, combine)[tie_end]
            nn = _seg_scan(nonnull, pb, jnp.add)[tie_end]
        else:
            seg = (jax.ops.segment_min if is_min else jax.ops.segment_max)
            r = seg(filled, pgid, num_segments=n_seg,
                    indices_are_sorted=True)[pgid]
            nn = jax.ops.segment_sum(nonnull, pgid, num_segments=n_seg,
                                     indices_are_sorted=True)[pgid]
        return scatter_back(r, nn > 0)

    raise NotImplementedError(f"window function {kind}")
