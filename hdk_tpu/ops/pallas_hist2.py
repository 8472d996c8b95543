"""Pallas VMEM-one-hot count histogram (the Q4-class contraction).

The XLA one-hot count path (ops/onehot.py seg_sums ones_ids) builds the
bf16 one-hot factors A (rows, HI) and B (rows, 128) in HBM and feeds an
MXU contraction — the factor materialization IS the cost (~2.4 MB per
8192-row block through HBM; measured ~21-28 ms per 1e7 rows at E≈1500).
This kernel builds the factors in VMEM and leaves only the gid stream
(4 B/row) on HBM: per grid step one (SUB*64, 128) gid block loads once,
an unrolled loop forms per-sub-block one-hots and batched-contracts
them on the MXU, and a VMEM f32 accumulator carries (HI, 128) partials
across the whole grid.  The unrolled sub-block loop amortizes Mosaic's
fixed per-grid-step cost (measured 12-16 us/step — the round-2 kernel's
downfall, NOTES.md).

Exactness: one-hot entries are 0/1 (bf16-exact); the f32 accumulator is
exact for counts < 2^24, so callers chunk rows at ROW_LIMIT.

Mosaic landmines honored (NOTES.md): jnp.int32 constants everywhere,
rank>=2 shapes only, 8-multiple sublane blocks, no in-kernel reshapes
across the lane axis.

Reference semantics: COUNT cells of GroupByRuntime.cpp:25-182 (the
per-group agg_count protocol) — here one dense (HI*128) histogram.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB_ROWS = 64          # sublanes per sub-block: 64x128 = 8192 rows
SUBS_PER_STEP = 8      # sub-blocks per grid step (amortizes step cost)
_STEP_ROWS = SUB_ROWS * SUBS_PER_STEP * LANE  # 65536 rows per grid step
ROW_LIMIT = 1 << 24    # f32-exact count ceiling per kernel invocation
MAX_E = 4096


def supported(n: int) -> bool:
    return n <= MAX_E


def _hi_n(n: int) -> int:
    if n <= LANE:
        return 1
    hi = max(1, math.ceil((n + 1) / LANE))
    return 1 << (hi - 1).bit_length()


def _kernel(g_ref, out_ref, acc_ref, *, hi_n: int):
    step = pl.program_id(0)

    @pl.when(step == jnp.int32(0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for s in range(SUBS_PER_STEP):
        g = g_ref[s * SUB_ROWS:(s + 1) * SUB_ROWS, :]  # (64, 128) i32
        lo = g & jnp.int32(LANE - 1)
        B = (lo[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (SUB_ROWS, LANE, LANE), 2)).astype(jnp.bfloat16)
        if hi_n == 1:
            # flat regime: counts = column sums of B, accumulated on
            # the VPU (one sublane-reduce per sub-block)
            acc_ref[0:1, :] += jnp.sum(
                B.astype(jnp.float32), axis=(0, 1))[None, :]
        else:
            hi = jax.lax.shift_right_logical(g, jnp.int32(7))
            A = (hi[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (SUB_ROWS, LANE, hi_n), 2)).astype(jnp.bfloat16)
            # batched over sublanes: contract the lane axis of the
            # one-hots -> (64, hi_n, 128) f32 partials on the MXU
            part = jax.lax.dot_general(
                A, B, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_ref[...] += jnp.sum(part, axis=0)

    @pl.when(step == pl.num_programs(0) - jnp.int32(1))
    def _():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def count_hist(gid: jnp.ndarray, n: int, interpret: bool = False
               ) -> jnp.ndarray:
    """(n,) int64 counts of ``gid`` values in [0, n); out-of-range gids
    (discard segment, padding) are dropped.  gid must be int32-ranged.
    Rows above ROW_LIMIT must be chunked by the caller."""
    assert supported(n)
    nrows = gid.shape[0]
    assert nrows <= ROW_LIMIT
    hi_n = _hi_n(n)
    pad = (-nrows) % _STEP_ROWS
    g = gid.astype(jnp.int32)
    if pad:
        g = jnp.concatenate([g, jnp.full((pad,), n, jnp.int32)])
    total = g.shape[0]
    steps = total // _STEP_ROWS
    g2 = g.reshape(total // LANE, LANE)
    rows_per_step = _STEP_ROWS // LANE
    # index maps: ``i * 0`` (a traced i32 zero), NEVER a literal 0 —
    # under jax_enable_x64 a literal index enters Mosaic as i64 and the
    # remote compiler crashes (HTTP 500; same landmine as in-kernel int
    # constants, NOTES.md)
    out = pl.pallas_call(
        functools.partial(_kernel, hi_n=hi_n),
        grid=(steps,),
        in_specs=[pl.BlockSpec((rows_per_step, LANE), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((max(hi_n, 1), LANE), lambda i: (i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max(hi_n, 1), LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((max(hi_n, 1), LANE), jnp.float32)],
        interpret=interpret,
    )(g2)
    return out.reshape(-1)[:n].astype(jnp.int64)
