"""One-hot MXU segment reductions.

XLA lowers ``segment_sum``/``segment_min`` to scatter, and TPU scatter
with 64-bit payloads serializes: measured 735-960 ms for one 1e7-row
segment-sum at ANY segment count <= 512 (v5e).  The TPU-native shape
for the same reduction is a *factored* one-hot contraction on the MXU.

Factorization: ``gid = hi * LO + lo`` with LO = 128 (the lane width).
Per row-block, two thin one-hots A[b, HI] = (hi == ·) and
B[b, LO] = (lo == ·) contract as an outer-product histogram

    partial[hi, lo] = sum_b vals[b] * A[b, hi] * B[b, lo]

so the (B x E) one-hot never materializes — the MXU sees two narrow
operands instead.  Measured (1e7 rows, v5e): 9-10 ms for counts at
E = 512..4096 and 16 ms for bit-exact int64 sums at E = 2816, vs
735-960 ms scatter and ~170 ms sort+spans.

Exactness:
  * integer values decompose into 8-bit limbs (<= 255: exactly
    representable in bf16, so default-precision MXU multiplies are
    exact); block partials (<= 255 * block < 2^24) are exact in the
    MXU's f32 accumulator; limb totals recombine in int64.  Verified
    bit-exact vs np.add.at over 1e7 random int64.
  * f32 values contract with ``Precision.HIGHEST`` and combine block
    partials in f64 — measured relative error ~2e-9 over 1e7 rows,
    far better than the reference's atomic-f32 adds
    (GroupByRuntime.cpp agg_sum_float_shared).
  * f64 values skip the MXU (its f32 accumulator would cap accuracy at
    ~1e-6) and use a blocked select+reduce in true f64 on the VPU —
    ~1e-15 relative error, still ~25x faster than the scatter.

MIN/MAX use the blocked select+reduce over the same (blocks, B) tiling
(no factorization — extrema don't distribute over the outer product).

Rows with ``gid`` outside [0, n) (discard segment, padding) match no
one-hot column and drop out of sums; min/max select the identity.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_BLOCK = 8192   # rows per block; int block partials <= 255 * 8192 < 2^24
_LANE = 128     # lo-side width (TPU lane count)

# opt-in Pallas backend for the integer contraction (ops/pallas_hist.py:
# builds the one-hot factors in VMEM, one HBM pass over gid+slots).
# Configured per session via Executor.__init__ -> configure()
_PALLAS = False
_INTERPRET = False


def configure(pallas: bool = False, interpret: bool = False) -> None:
    global _PALLAS, _INTERPRET
    _PALLAS = pallas
    _INTERPRET = interpret

# above this many segments the contraction's N*E work term loses to the
# E-independent radix sort + span sums (measured crossover ~4-8k at 1e7
# rows for the full aggregate mix; counts alone stay flat to 4096+)
SEGMENT_LIMIT = 4096


def _pad_blocks(gid: jnp.ndarray, n: int,
                vals: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, list, int]:
    """Pad rows to a multiple of _BLOCK; padding rows get gid == n
    (matches no one-hot column of the live range)."""
    nrows = gid.shape[0]
    nb = max(1, math.ceil(nrows / _BLOCK))
    padded = nb * _BLOCK
    pad = padded - nrows
    if pad:
        gid = jnp.concatenate([gid, jnp.full((pad,), n, gid.dtype)])
        vals = [jnp.concatenate([v, jnp.zeros((pad,), v.dtype)]) for v in vals]
    else:
        vals = list(vals)
    return gid.reshape(nb, _BLOCK), [v.reshape(nb, _BLOCK) for v in vals], nb


def _factor(n: int) -> Tuple[int, int]:
    """(HI, LO) with HI*LO >= n (+ a discard slot when factored).

    n <= _LANE stays flat (HI == 1, LO == n: a 10-wide one-hot beats a
    lane-padded 128-wide one 1.7x — measured q2 at E=10).  Larger n
    factors over LO = 128 lanes with HI a power of two AND at least 32:
    the MXU runs the (B, HI) x (B, LO) contraction pathologically slowly
    for thin HI (measured: HI=16 21.1 ms vs HI=32 8.4 ms per 1e7 rows
    for the SAME int8 count — also the earlier HI=22 vs 32 finding);
    padding HI only wastes discard columns."""
    if n <= _LANE:
        return 1, n
    lo = _LANE
    hi = max(1, math.ceil((n + 1) / lo))
    hi = max(1 << (hi - 1).bit_length(), 32)
    return hi, lo


def _onehots(gid2: jnp.ndarray, n: int, dt) -> Tuple[Optional[jnp.ndarray],
                                                     jnp.ndarray]:
    """(A, B) one-hot factors; A is None in the flat (HI == 1) regime —
    out-of-range gids (discard/padding) then match no B column."""
    hi_n, lo_n = _factor(n)
    if hi_n == 1:
        B = (gid2[:, :, None]
             == jnp.arange(lo_n, dtype=gid2.dtype)[None, None, :]).astype(dt)
        return None, B
    hi = (gid2 // lo_n).astype(jnp.int32)
    lo = (gid2 % lo_n).astype(jnp.int32)
    A = (hi[:, :, None] == jnp.arange(hi_n, dtype=jnp.int32)).astype(dt)
    B = (lo[:, :, None] == jnp.arange(lo_n, dtype=jnp.int32)).astype(dt)
    return A, B


def _int_limbs(v2: jnp.ndarray) -> List[jnp.ndarray]:
    """8-bit limb decomposition; every limb is bf16-exact.  The top limb
    keeps the sign via arithmetic shift so the recombination is exact
    two's-complement."""
    if v2.dtype == jnp.bool_:
        return [v2.astype(jnp.float32)]
    bits = jnp.iinfo(v2.dtype).bits
    n_limbs = (bits + 7) // 8
    v64 = v2.astype(jnp.int64) if bits > 32 else v2.astype(jnp.int32)
    out = []
    for k in range(n_limbs):
        sh = v64 >> (8 * k)
        limb = (sh & 255) if k < n_limbs - 1 else sh
        out.append(limb.astype(jnp.float32))
    return out


def seg_sums(columns: Sequence[jnp.ndarray], gid: jnp.ndarray,
             n: int, ones_ids: Sequence[int] = ()) -> List[jnp.ndarray]:
    """Segment sums of several columns sharing one factored contraction.

    Returns one (n,) array per column: int64 for integer/bool inputs
    (bit-exact), float64 for floating inputs.

    ``ones_ids``: column indices the CALLER asserts are all-ones (COUNT
    slots).  Those never enter the slot operand — the per-gid count is
    the pure two-operand contraction A^T@B of the one-hot factors, which
    skips the 3-operand einsum entirely (XLA's contraction order for
    'nkb,nbh,nbl' materializes a huge intermediate: measured 98 ms vs
    21 ms per 1e7 rows at E=1504 for a single ones column)."""
    gid2, cols2, nb = _pad_blocks(gid, n, columns)
    hi_n, lo_n = _factor(n)
    ones_set = set(ones_ids)

    int_slots: List[jnp.ndarray] = []   # (nb, B) f32 limbs
    int_plan: List[Tuple[int, List[int]]] = []  # (col idx, limb slot ids)
    flt_slots: List[jnp.ndarray] = []
    flt_plan: List[Tuple[int, int]] = []
    f64_ids: List[int] = []
    for i, v2 in enumerate(cols2):
        if i in ones_set:
            continue  # counts come from the one-hot factors alone
        if jnp.issubdtype(v2.dtype, jnp.floating):
            if v2.dtype == jnp.float64:
                f64_ids.append(i)
            else:
                flt_plan.append((i, len(flt_slots)))
                flt_slots.append(v2.astype(jnp.float32))
        else:
            limbs = _int_limbs(v2)
            ids = list(range(len(int_slots), len(int_slots) + len(limbs)))
            int_plan.append((i, ids))
            int_slots.extend(limbs)

    out: List[Optional[jnp.ndarray]] = [None] * len(columns)
    use_pallas = (int_slots and _PALLAS
                  and _pallas_ok(n, len(int_slots), gid))
    int_stacked = (jnp.stack(int_slots, axis=1)
                   if int_slots and not use_pallas else None)
    flt_stacked = jnp.stack(flt_slots, axis=1) if flt_slots else None

    # row-chunked passes: the one-hot operands / f64 selects are bounded
    # per pass (~4M rows) so transients never scale with total rows
    nbp = max(1, (1 << 22) // _BLOCK)
    int_tot = flt_tot = cnt_tot = None
    f64_tot = {i: None for i in f64_ids}

    def add(a, b):
        return b if a is None else a + b

    for b0 in range(0, nb, nbp):
        g = gid2[b0:b0 + nbp]
        for i in f64_ids:
            hit = (g[:, :, None]
                   == jnp.arange(n, dtype=g.dtype)[None, None, :])
            sel = jnp.where(hit, cols2[i][b0:b0 + nbp][:, :, None],
                            jnp.float64(0))
            f64_tot[i] = add(f64_tot[i], jnp.sum(jnp.sum(sel, axis=1),
                                                 axis=0))
        if ones_set:
            # INT8 one-hot factors: the v5e MXU runs int8 matmuls ~5x
            # faster than bf16 for this shape (measured 7.2 ms vs
            # 36.5 ms per 1e7 rows at E=2432) and the i32 accumulator
            # is exact for any block size
            A, B = _onehots(g, n, jnp.int8)
            if A is None:  # flat: counts = column sums of B
                part = jnp.sum(B.astype(jnp.int32), axis=1)
            else:
                part = jnp.einsum('nbh,nbl->nhl', A, B,
                                  preferred_element_type=jnp.int32)
            cnt_tot = add(cnt_tot, jnp.sum(part.astype(jnp.int64), axis=0))
        if int_stacked is not None:
            A, B = _onehots(g, n, jnp.bfloat16)
            chunk = int_stacked[b0:b0 + nbp]
            if A is None:
                part = jnp.einsum('nkb,nbl->nkl', chunk, B,
                                  preferred_element_type=jnp.float32)
            else:
                part = jnp.einsum('nkb,nbh,nbl->nkhl', chunk, A, B,
                                  preferred_element_type=jnp.float32)
            int_tot = add(int_tot, jnp.sum(part.astype(jnp.int64), axis=0))
        if flt_stacked is not None:
            A, B = _onehots(g, n, jnp.float32)
            chunk = flt_stacked[b0:b0 + nbp]
            if A is None:
                part = jnp.einsum('nkb,nbl->nkl', chunk, B,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
            else:
                part = jnp.einsum('nkb,nbh,nbl->nkhl', chunk, A, B,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
            flt_tot = add(flt_tot,
                          jnp.sum(part.astype(jnp.float64), axis=0))

    for i in f64_ids:
        out[i] = f64_tot[i]
    if cnt_tot is not None:
        cnt = cnt_tot.reshape(-1)[:n]
        for i in ones_set:
            out[i] = cnt
    if use_pallas:
        tot = _pallas_int_sums(gid2.reshape(-1), int_slots, n)
        for i, ids in int_plan:
            acc = jnp.zeros((n,), jnp.int64)
            for k, sid in enumerate(ids):
                acc = acc + (tot[sid] << (8 * k))
            out[i] = acc
    elif int_tot is not None:
        tot = int_tot.reshape(int_tot.shape[0], hi_n * lo_n)[:, :n]
        for i, ids in int_plan:
            acc = jnp.zeros((n,), jnp.int64)
            for k, sid in enumerate(ids):
                acc = acc + (tot[sid] << (8 * k))
            out[i] = acc
    if flt_tot is not None:
        tot = flt_tot.reshape(flt_tot.shape[0], hi_n * lo_n)[:, :n]
        for i, sid in flt_plan:
            out[i] = tot[sid]
    return out  # type: ignore[return-value]


def _pallas_ok(n: int, n_slots: int, gid: jnp.ndarray) -> bool:
    from . import pallas_hist as ph

    return ph.supported(n, n_slots, min(gid.shape[0], ph.ROW_CHUNK_LIMIT))


def _pallas_int_sums(gid: jnp.ndarray, int_slots: List[jnp.ndarray],
                     n: int) -> jnp.ndarray:
    """(L, n) int64 via the VMEM-one-hot kernel, chunked so the int32
    in-kernel accumulator cannot overflow (pallas_hist contract)."""
    from . import pallas_hist as ph

    slots = jnp.stack([s.reshape(-1) for s in int_slots], axis=1)
    flat_g = gid.astype(jnp.int32)
    total = None
    for c0 in range(0, flat_g.shape[0], ph.ROW_CHUNK_LIMIT):
        part = ph.seg_sums_exact(
            flat_g[c0:c0 + ph.ROW_CHUNK_LIMIT],
            slots[c0:c0 + ph.ROW_CHUNK_LIMIT], n,
            interpret=_INTERPRET).astype(jnp.int64)
        total = part if total is None else total + part
    return total


def seg_sum(vals: jnp.ndarray, gid: jnp.ndarray, n: int) -> jnp.ndarray:
    """Single-column segment sum; trailing dims handled column-wise."""
    if vals.ndim == 1:
        return seg_sums([vals], gid, n)[0]
    flat = vals.reshape(vals.shape[0], -1)
    cols = seg_sums([flat[:, j] for j in range(flat.shape[1])], gid, n)
    return jnp.stack(cols, axis=1).reshape((n,) + vals.shape[1:])


def _seg_extreme(vals: jnp.ndarray, gid: jnp.ndarray, n: int,
                 ident: jnp.ndarray, is_min: bool) -> jnp.ndarray:
    if vals.ndim > 1:  # columns independently
        flat = vals.reshape(vals.shape[0], -1)
        cols = [_seg_extreme(flat[:, j], gid, n, ident, is_min)
                for j in range(flat.shape[1])]
        return jnp.stack(cols, axis=1).reshape((n,) + vals.shape[1:])
    gid2, (v2,), nb = _pad_blocks(gid, n, [vals])
    hit = gid2[:, :, None] == jnp.arange(n, dtype=gid2.dtype)[None, None, :]
    sel = jnp.where(hit, v2[:, :, None], ident)
    part = jnp.min(sel, axis=1) if is_min else jnp.max(sel, axis=1)
    return (jnp.min(part, axis=0) if is_min else jnp.max(part, axis=0))


def seg_min(vals: jnp.ndarray, gid: jnp.ndarray, n: int,
            ident: jnp.ndarray) -> jnp.ndarray:
    return _seg_extreme(vals, gid, n, ident, True)


def seg_max(vals: jnp.ndarray, gid: jnp.ndarray, n: int,
            ident: jnp.ndarray) -> jnp.ndarray:
    return _seg_extreme(vals, gid, n, ident, False)
