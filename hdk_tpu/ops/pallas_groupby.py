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
