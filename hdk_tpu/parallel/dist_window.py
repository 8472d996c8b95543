"""Distributed window functions: shuffle-by-partition-key, local
window, route results back to origin shards.

Closes VERDICT-r2 missing #5: in dist sessions window expressions fell
to the uncontrolled GSPMD path (a global payload-carrying sort XLA
shards however it likes).  The explicit plan here matches the reference
model — every step runs per-device with an exchange in front
(Execute.cpp:2656; WindowContext partitions via hash,
WindowFunctionContext::compute) — and the scaling-book recipe: one
hash all_to_all in, one positional all_to_all back.

Mechanism (one shard_map over the row-sharded chain output):
  1. every row is tagged with its global position (shard * rows_per_shard
     + local index);
  2. ONE hash shuffle by the PARTITION keys sends each partition wholly
     to one owner shard (skew-capped: cap = rows_per_shard * slack;
     overflow is returned so the executor can widen-retry);
  3. the owner runs the ordinary local window engine
     (exec/window.compute_window) over its received rows — received
     padding and filter-dead rows ride the local row_mask;
  4. results route back by global position (cap = rows_per_shard is an
     exact bound: a sender cannot hold more of one origin shard's rows
     than that shard has) and land at their original local offsets.

Window functions with NO partition keys are global — a single shard
would own every row, so the caller keeps those on the GSPMD path.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..exec.masked import MaskedCol
from ..exec.window import compute_window
from ..utils import commlog
from . import shuffle as shf
from .mesh import FRAG_AXIS


def dist_window(
    mesh: Mesh,
    kind,
    args: Sequence[MaskedCol],
    part_cols: Sequence[MaskedCol],
    order_cols: Sequence[MaskedCol],
    order_desc: Sequence[bool],
    arg1,
    rows_per_shard: int,
    row_mask: Optional[jnp.ndarray],
    out_dtype,
    frame=None,
    axis: str = FRAG_AXIS,
    slack: float = 2.0,
):
    """Returns (MaskedCol in the original sharded row order, overflow).

    ``overflow`` counts rows dropped at the partition shuffle (a skewed
    partition exceeding cap); the caller must treat any nonzero value as
    a retry signal — results are invalid in that case.  Requires at
    least one partition key (global windows stay on the GSPMD path).
    """
    assert part_cols, "dist_window needs partition keys"
    num_shards = mesh.devices.size
    cap = max(1, int(math.ceil(rows_per_shard * slack)))
    nargs, nparts = len(args), len(part_cols)

    def shard_fn(aa, pp, oo, rm):
        n_loc = pp[0].data.shape[0]
        me = jax.lax.axis_index(axis)
        gpos = (me.astype(jnp.int64) * rows_per_shard
                + jnp.arange(n_loc, dtype=jnp.int64))
        # the chain row_mask rides as a payload: dead rows still need
        # their output slot back (their value is masked upstream), so
        # every row ships (valid=ones at the exchange)
        rm_col = MaskedCol(jnp.ones((n_loc,), jnp.bool_) if rm is None
                           else rm)
        payload = list(aa) + list(oo) + [rm_col, MaskedCol(gpos)]
        out_cols, recv_valid, overflow = shf.shuffle_rows(
            list(pp), payload, axis, num_shards, cap)
        rpp = out_cols[:nparts]
        raa = out_cols[nparts:nparts + nargs]
        roo = out_cols[nparts + nargs:-2]
        r_rm = out_cols[-2].data
        r_pos = out_cols[-1].data
        local_mask = recv_valid & r_rm
        n_recv = r_pos.shape[0]
        val = compute_window(kind, raa, rpp, roo, order_desc, arg1,
                             n_recv, local_mask, jnp.dtype(out_dtype),
                             frame=frame)
        # ---- route back by global position --------------------------
        dest = (r_pos // rows_per_shard).astype(jnp.int32)
        back_pay: List[jnp.ndarray] = [val.data, r_pos]
        if val.mask is not None:
            back_pay.append(val.mask)
        bufs, bvalid, _ov2 = shf.build_send_buffers(
            dest, back_pay, recv_valid, num_shards, rows_per_shard)
        recv2, recv2_valid = shf.exchange(bufs, bvalid, axis)
        vdata, vpos = recv2[0], recv2[1]
        local_off = jnp.where(
            recv2_valid, (vpos % rows_per_shard).astype(jnp.int32),
            rows_per_shard)  # invalid slots -> dropped past the end
        out = jnp.zeros((rows_per_shard + 1,) + vdata.shape[1:],
                        vdata.dtype).at[local_off].set(
            vdata, mode="drop")[:rows_per_shard]
        if val.mask is not None:
            m = jnp.zeros((rows_per_shard + 1,), jnp.bool_).at[
                local_off].set(recv2[2], mode="drop")[:rows_per_shard]
        else:
            m = None
        return MaskedCol(out, m), commlog.psum(overflow, axis)

    def spec_of(cols):
        return [MaskedCol(P(axis), None if c.mask is None else P(axis))
                for c in cols]

    # the output's mask-ness depends on (kind, arg masks, row_mask):
    # probe with per-shard shapes + a row_mask, mirroring shard_fn's
    # local_mask-always-present call
    def _shrink(c):
        return MaskedCol(
            jax.ShapeDtypeStruct((num_shards * cap,) + c.data.shape[1:],
                                 c.data.dtype),
            None if c.mask is None else jax.ShapeDtypeStruct(
                (num_shards * cap,), jnp.bool_))

    probe = jax.eval_shape(
        lambda a, p, o, m: compute_window(
            kind, a, p, o, order_desc, arg1, num_shards * cap, m,
            jnp.dtype(out_dtype), frame=frame),
        [_shrink(c) for c in args], [_shrink(c) for c in part_cols],
        [_shrink(c) for c in order_cols],
        jax.ShapeDtypeStruct((num_shards * cap,), jnp.bool_))

    in_specs = (spec_of(args), spec_of(part_cols), spec_of(order_cols),
                None if row_mask is None else P(axis))
    out_specs = (MaskedCol(P(axis),
                           None if probe.mask is None else P(axis)), P())
    return shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(
        list(args), list(part_cols), list(order_cols), row_mask)
