"""Pallas TPU kernel: FACTORED one-hot histogram (grouped COUNT/SUM).

The XLA formulation of the factored contraction (ops/onehot.py) still
materializes the two thin one-hot operands through HBM; this kernel
builds them inside VMEM per row block, so the only HBM traffic is one
pass over (gid, value-slots) plus the tiny output:

    hi = gid // 128, lo = gid % 128
    A[hi_n, B]  = (hi == iota)          (bf16, built in VMEM)
    Bm[B, 128]  = (lo == iota)          (bf16, built in VMEM)
    acc[l, hi_n, 128] += (A * slots[:, l]) @ Bm      (MXU, f32 -> int32)

Exactness contract (same scheme as ops/onehot.py):
  * slot values must be bf16-exact (|v| <= 255 integers — 8-bit limbs —
    or 0/1 count columns): products are then exact in the MXU;
  * per-block f32 accumulation is exact (<= 255 * block < 2^24);
  * the cross-block accumulator is int32; callers must chunk rows so
    255 * nrows_chunk < 2^31 (ROW_CHUNK_LIMIT) and combine chunk
    outputs in int64.

Reference semantics: GroupByRuntime.cpp:199-213 dense positional
aggregation; the reference's GPU path uses shared-memory atomics — this
is the systolic-array replacement.

MEASURED (v5e, 1e7 rows, 5 slots, honest readback timing): ~61 ms at
every E in 512..4096 — a flat ~12.5 us/grid-step floor (4883 sequential
2048-row steps; block sizes above 2048 crash the Mosaic remote
compiler).  The XLA factored contraction (ops/onehot.py) runs the same
job in 15-30 ms, so this kernel stays OPT-IN
(exec.prefer_pallas_groupby / exec.pallas_onehot) until the per-step
floor is understood.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BLOCK = 2048
# up to this many (padded) entries the DIRECT one-hot kernel runs: a
# single (B, Ep) one-hot and ONE dot per block — no factoring, no lane
# concat ((B, Ep) bf16 at B=2048, Ep=1024 is 4MB VMEM)
_DIRECT_LIMIT = 1024
# 255 * ROW_CHUNK_LIMIT must stay below int32 overflow
ROW_CHUNK_LIMIT = (1 << 31) // 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(gid_ref, vals_ref, out_ref, acc_ref, *, hi_n: int,
            n_slots: int, block_rows: int, rows_p: int):
    # Everything stays rank-2 (TPU/Mosaic: no 1D iota, avoid
    # transposes): gid arrives (B, 1); ONE dot per block contracts the
    # (B, n_slots*hi_n) slot-scaled one-hot against the (B, LANE) lane
    # one-hot — folding the slots into the thin operand keeps the MXU
    # busy instead of issuing n_slots skinny matmuls.
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gid2 = gid_ref[...]  # (B, 1) int32
    vals = vals_ref[...]  # (B, n_slots) f32 (bf16-exact values)
    # int32 constants: under jax_enable_x64 a bare Python int enters the
    # kernel as an i64 scalar, and Mosaic cannot lower i64->i32 converts
    # (jax's _convert_helper recurses forever on that pair)
    lane = jnp.int32(_LANE)
    hi = gid2 // lane  # (B, 1)
    lo = gid2 % lane   # (B, 1)
    # thin one-hots built in VMEM (never touch HBM)
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (block_rows, hi_n), 1)
    a = (a_iota == hi).astype(jnp.bfloat16)  # (B, hi_n)
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANE), 1)
    bm = (b_iota == lo).astype(jnp.bfloat16)  # (B, 128)
    # slot-scaled copies of the thin one-hot, concatenated along lanes
    # (stays rank-2 throughout: Mosaic rejects the rank-3
    # broadcast+reshape formulation); zero-pad to the sublane multiple
    vb = vals.astype(jnp.bfloat16)
    aw = jnp.concatenate([a * vb[:, l:l + 1] for l in range(n_slots)],
                         axis=1)
    if rows_p != n_slots * hi_n:
        aw = jnp.pad(aw, ((0, 0), (0, rows_p - n_slots * hi_n)))
    part = jax.lax.dot_general(
        aw, bm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (rows_p, 128) exact
    acc_ref[...] += part.astype(jnp.int32)

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        out_ref[...] = acc_ref[...]


def _direct_kernel(gid_ref, vals_ref, out_ref, acc_ref, *, e_p: int,
                   n_slots: int, rows_p: int, block_rows: int):
    """Single-level one-hot: out[l, e] += sum_r vals[r, l] * (gid[r]==e).
    ONE (B, n_slots) x (B, e_p) dot per block."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gid2 = gid_ref[...]  # (B, 1) int32
    vals = vals_ref[...].astype(jnp.bfloat16)  # (B, n_slots)
    o_iota = jax.lax.broadcasted_iota(jnp.int32, (block_rows, e_p), 1)
    o = (o_iota == gid2).astype(jnp.bfloat16)  # (B, e_p) in VMEM only
    if rows_p != n_slots:
        vals = jnp.pad(vals, ((0, 0), (0, rows_p - n_slots)))
    part = jax.lax.dot_general(
        vals, o, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (rows_p, e_p) exact
    acc_ref[...] += part.astype(jnp.int32)

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        out_ref[...] = acc_ref[...]


def supported(n_entries: int, n_slots: int, nrows: int) -> bool:
    hi_n = _round_up(n_entries, _LANE) // _LANE
    if hi_n > 64 or n_slots > 16:
        return False
    return nrows <= ROW_CHUNK_LIMIT


@functools.partial(jax.jit, static_argnames=("n_entries", "interpret"))
def seg_sums_exact(gid: jnp.ndarray, slots: jnp.ndarray, n_entries: int,
                   interpret: bool = False) -> jnp.ndarray:
    """(L, n_entries) int32 sums of bf16-exact ``slots`` columns per
    gid.  Rows with gid outside [0, n_entries) drop out.  ``slots`` is
    (N, L) f32; N must be <= ROW_CHUNK_LIMIT (callers chunk)."""
    nrows = gid.shape[0]
    n_slots = slots.shape[1]
    hi_n = max(1, _round_up(n_entries, _LANE) // _LANE)
    padded_e = hi_n * _LANE
    rows_p = _round_up(n_slots * hi_n, 8)  # sublane-aligned accumulator
    nb = max(1, math.ceil(nrows / _BLOCK))
    pad = nb * _BLOCK - nrows
    gid = gid.astype(jnp.int32)
    if pad:
        # padding rows point past the live range -> hi == hi_n matches
        # no one-hot row, lo may alias but its A row is all-zero
        gid = jnp.concatenate([gid, jnp.full((pad,), padded_e, jnp.int32)])
        slots = jnp.concatenate(
            [slots, jnp.zeros((pad, n_slots), slots.dtype)])
    gid = jnp.where((gid >= 0) & (gid < n_entries), gid, padded_e)

    if padded_e <= _DIRECT_LIMIT:
        # dead rows carry gid == padded_e: give the direct one-hot one
        # extra lane-tile so they match a discarded column
        e_p = padded_e + _LANE
        rp = _round_up(n_slots, 8)
        out = pl.pallas_call(
            functools.partial(_direct_kernel, e_p=e_p, n_slots=n_slots,
                              rows_p=rp, block_rows=_BLOCK),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((_BLOCK, 1), lambda i: (i, i * 0)),
                pl.BlockSpec((_BLOCK, n_slots), lambda i: (i, i * 0)),
            ],
            out_specs=pl.BlockSpec((rp, e_p), lambda i: (i * 0, i * 0)),
            out_shape=jax.ShapeDtypeStruct((rp, e_p), jnp.int32),
            scratch_shapes=[pltpu.VMEM((rp, e_p), jnp.int32)],
            interpret=interpret,
        )(gid.reshape(-1, 1), slots.astype(jnp.float32))
        return out[:n_slots, :n_entries]

    out = pl.pallas_call(
        functools.partial(_kernel, hi_n=hi_n, n_slots=n_slots,
                          block_rows=_BLOCK, rows_p=rows_p),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 1), lambda i: (i, i * 0)),
            pl.BlockSpec((_BLOCK, n_slots), lambda i: (i, i * 0)),
        ],
        out_specs=pl.BlockSpec((rows_p, _LANE), lambda i: (i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((rows_p, _LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows_p, _LANE), jnp.int32)],
        interpret=interpret,
    )(gid.reshape(-1, 1), slots.astype(jnp.float32))
    out = out[:n_slots * hi_n].reshape(n_slots, padded_e)
    return out[:, :n_entries]
