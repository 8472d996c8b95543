"""Pallas TPU kernel: fused perfect-hash group-by (COUNT/SUM family).

Reference semantics: GroupByRuntime.cpp:199-213 ``get_group_value_fast``
— dense positional aggregation ``off = key - min_key`` — plus the agg
cells of RuntimeFunctions.cpp:456-860.  The reference's GPU path uses
atomics; a TPU has no fast global atomics, so the kernel computes a
**one-hot matmul histogram**: for each row block, build the one-hot
matrix OH[b, e] = (gid[b] == e) and accumulate OH^T @ V on the MXU.
This turns the scatter-add into dense systolic-array work — the
TPU-native formulation of a histogram.

Layout:
  * grid over row blocks (sequential on TPU, so a VMEM scratch
    accumulator persists across steps);
  * gid is computed by the caller's traced expr code and passed as an
    int32 array (XLA fuses the key arithmetic into the block loads);
  * V packs all sum-like slots as columns: [ones(count), operand0, ...],
    so ONE matmul per block covers every aggregate;
  * dead rows (filter mask / out-of-range keys) carry gid >= n_entries
    and are zeroed via the one-hot comparison (no branch).

Used by the executor's aggregate step when every aggregate is
COUNT/SUM/AVG (the taxi Q1-Q3 class); MIN/MAX/distinct fall back to the
XLA segment path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(gid_ref, vals_ref, out_ref, acc_ref, *, n_entries_padded: int,
            block_rows: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gid = gid_ref[...]  # (block_rows, 1) int32
    vals = vals_ref[...]  # (block_rows, n_slots_padded) f32
    # one-hot on the fly: (block_rows, n_entries_padded)
    entries = jax.lax.broadcasted_iota(jnp.int32, (block_rows, n_entries_padded), 1)
    oh = (gid == entries).astype(jnp.float32)
    # MXU: (entries, rows) @ (rows, slots) -> (entries, slots).
    # HIGHEST precision: default TPU f32 matmul rounds through bf16,
    # which corrupts aggregate sums (observed ~1% error).
    acc_ref[...] += jax.lax.dot_general(
        oh, vals, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(step == n_steps - 1)
    def _flush():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_entries", "interpret"))
def groupby_sums(gid: jnp.ndarray, vals: jnp.ndarray, n_entries: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Dense positional sum aggregation.

    gid:  (nrows,) int32 in [0, n_entries) for live rows; >= n_entries
          for dead rows (discarded by construction).
    vals: (nrows, n_slots) float32 slot values (ones column for COUNT).
    Returns (n_entries, n_slots) float32 sums.
    """
    nrows, n_slots = vals.shape
    ep = _round_up(max(n_entries, 1), _LANE)
    sp = _round_up(max(n_slots, 1), _LANE)
    block_rows = 512
    padded_rows = _round_up(max(nrows, 1), block_rows)
    if padded_rows != nrows:
        pad = padded_rows - nrows
        gid = jnp.concatenate([gid, jnp.full((pad,), ep + 1, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, n_slots), vals.dtype)])
    if sp != n_slots:
        vals = jnp.pad(vals, ((0, 0), (0, sp - n_slots)))
    gid2 = gid.reshape(padded_rows, 1).astype(jnp.int32)
    vals = vals.astype(jnp.float32)

    grid = padded_rows // block_rows
    out = pl.pallas_call(
        functools.partial(_kernel, n_entries_padded=ep, block_rows=block_rows),
        grid=(grid,),
        in_specs=[
            # NOTE: index maps must return uniformly-typed indices — a
            # literal 0 becomes i64 under jax_enable_x64 and Mosaic
            # rejects the (i32, i64) tuple; i*0 keeps i32.
            pl.BlockSpec((block_rows, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, sp), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ep, sp), lambda i: (i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ep, sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ep, sp), jnp.float32)],
        interpret=interpret,
    )(gid2, vals)
    return out[:n_entries, :n_slots]


def supported(n_entries: int, n_slots: int, nrows: int) -> bool:
    """VMEM feasibility check for the one-hot matmul layout."""
    ep = _round_up(max(n_entries, 1), _LANE)
    sp = _round_up(max(n_slots, 1), _LANE)
    # acc + out + one-hot block + vals block, f32
    vmem = (2 * ep * sp + 512 * ep + 512 * sp) * 4
    return ep <= 4096 and vmem < 12 * 1024 * 1024 and nrows >= 1


# ---------------------------------------------------------------------------
# two-level one-hot histogram: the fast path
# ---------------------------------------------------------------------------
#
# The flat one-hot matmul above costs 2*rows*E_padded*128 f32 FLOPs — at
# E=4096 that is ~300ms for 10M rows even at MXU speed.  Decomposing the
# group id as gid = hi*128 + lo turns the histogram into
#
#     out2d[h, l] = sum_r  onehot_hi[r, h] * v[r] * onehot_lo[r, l]
#                 = ((onehot_hi * v)^T @ onehot_lo)[h, l]
#
# ONE (rows x M) @ (rows x 128) matmul per block with M = n_slots *
# ceil(E/128) <= 128 — 2*rows*128*128 FLOPs TOTAL regardless of E, and
# both operands are exactly representable in bf16 (0/1 one-hots, 0/1
# count values), so the MXU runs at native bf16 rate with exact f32
# accumulation.  ~64-400x fewer FLOPs than the flat form.

def _kernel2(gid_ref, vals_ref, out_ref, acc_ref, *, e_hi: int,
             n_slots: int, block_rows: int, m_pad: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gid = gid_ref[...]  # (block_rows, 1) int32; dead rows >= e_hi*128
    vals = vals_ref[...]  # (block_rows, n_slots<=8) f32 in {0, 1}
    # shift/mask, not //: Mosaic's i32 floor-div lowering recurses
    # infinitely under x64 (probed on this toolchain); _LANE is 2^7
    hi = gid >> 7
    lo = gid & (_LANE - 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANE), 1)
    oh_lo = (lo == iota_lo).astype(jnp.float32)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (block_rows, e_hi), 1)
    oh_hi = (hi == iota_hi).astype(jnp.float32)
    # lhs[:, s*e_hi + h] = oh_hi[:, h] * vals[:, s], built by lane concat
    # (Mosaic rejects the (rows, S, E) reshape).  Everything stays f32:
    # 0/1 operands are exact under the MXU's default bf16-pass matmul,
    # and bf16 relayouts measured 100x slower than straight f32 here.
    parts = [vals[:, s:s + 1] * oh_hi for s in range(n_slots)]
    lhs = parts[0] if n_slots == 1 else jnp.concatenate(parts, axis=1)
    if m_pad != n_slots * e_hi:
        lhs = jnp.pad(lhs, ((0, 0), (0, m_pad - n_slots * e_hi)))
    acc_ref[...] += jax.lax.dot_general(
        lhs, oh_lo, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(step == n_steps - 1)
    def _flush():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_entries", "interpret"))
def groupby_sums2(gid: jnp.ndarray, vals: jnp.ndarray, n_entries: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Two-level one-hot histogram (see module comment).

    gid:  (nrows,) int32 in [0, n_entries) for live rows; >= n_entries
          for dead rows.
    vals: (nrows, n_slots) values EXACT in bf16 (0/1 count columns).
    Returns (n_entries, n_slots) float32 sums.  Requires
    ``supported2(n_entries, n_slots)``.
    """
    nrows, n_slots = vals.shape
    ep = _round_up(max(n_entries, 1), _LANE)
    e_hi = ep // _LANE
    m = n_slots * e_hi
    m_pad = _round_up(m, 8)  # f32 sublane multiple
    block_rows = 1024  # measured optimum; larger blocks fall off a cliff
    padded_rows = _round_up(max(nrows, 1), block_rows)
    # dead/pad rows -> gid = ep: hi = e_hi falls outside the hi-iota
    gid = jnp.where(gid >= n_entries, ep, gid).astype(jnp.int32)
    if padded_rows != nrows:
        pad = padded_rows - nrows
        gid = jnp.concatenate([gid, jnp.full((pad,), ep, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, n_slots), vals.dtype)])
    gid2 = gid.reshape(padded_rows, 1)
    vals = vals.astype(jnp.float32)

    grid = padded_rows // block_rows
    out = pl.pallas_call(
        functools.partial(_kernel2, e_hi=e_hi, n_slots=n_slots,
                          block_rows=block_rows, m_pad=m_pad),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, n_slots), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, _LANE), lambda i: (i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, _LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_pad, _LANE), jnp.float32)],
        interpret=interpret,
    )(gid2, vals)
    # out[s*e_hi + h, l] = sums for entry h*128 + l of slot s
    per_slot = out[:m].reshape(n_slots, e_hi * _LANE)
    return per_slot[:, :n_entries].T


def supported2(n_entries: int, n_slots: int) -> bool:
    """Feasibility of the two-level layout: all slot blocks fit the
    128-row lhs (M = n_slots * ceil(E/128) <= 128)."""
    e_hi = _round_up(max(n_entries, 1), _LANE) // _LANE
    return n_entries > 0 and n_slots >= 1 and n_slots * e_hi <= _LANE
