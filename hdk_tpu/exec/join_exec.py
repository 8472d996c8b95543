"""Join executor (mixin half of the Executor).

Split out of exec/executor.py (round 4): the single-device join routes
(loop join, sorted-hash pair table, perfect dense table with
sparse-range admission, value-table probe, delta-spread FK route),
residual evaluation and left-outer padding.  Distributed join routing
lives in exec/dist_exec.py.

Reference map: PerfectJoinHashTable.h:54, BaselineJoinHashTable.h,
JoinHashImpl.h:55-95, HashJoin.cpp (the CPU/GPU hash-table tiers these
routes replace with sort/spread designs).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as t
from ..ir import expr as ir
from ..ir import node as nd
from ..utils.logger import get_channel

_LOG = get_channel("exec")
from . import join as jn
from .codecache import chain_key
from .common import (ExecTable, _LazyThunkColumns, _broadcast,
                     _next_pow2, _raise_ref, _rebind_to_join_output,
                     _schema_sig)
from .masked import MaskedCol, combine_masks, nonzero_indices
from .scalar import ExecError


class _StubArray:
    """Typed placeholder for a skipped build side's column data: carries
    shape/dtype metadata (route admission checks read them) but raises
    on any real use — a skipped subtree's data must never be touched."""

    __slots__ = ("shape", "dtype", "__weakref__")

    def __init__(self, shape, dtype) -> None:
        self.shape = tuple(shape)
        self.dtype = jnp.dtype(dtype)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def __getattr__(self, name):
        raise ExecError(
            f"internal: skipped build-side data touched (attr {name!r}) "
            "— plan-cache readiness check missed a consumer")

    def __getitem__(self, *_a):
        raise ExecError(
            "internal: skipped build-side data touched (__getitem__)")


class JoinExecMixin:
    # -- plan-keyed build-artifact recycling (reference:
    # HashtableRecycler by plan hash + table generations,
    # DataRecycler/HashtableRecycler.h:32) --------------------------------
    def _data_epoch(self) -> str:
        """Session data context a data-plan signature must include:
        dictionary contents feed translation maps / transient codes and
        UDF bodies feed traced programs."""
        dsig = ",".join(f"{i}:{len(d)}"
                        for i, d in sorted(self.dicts._dicts.items()))
        u = self.udfs.generation if self.udfs is not None else 0
        return f"{dsig}|u{u}"

    def _join_build_plan_sig(self, node: nd.Join) -> Optional[str]:
        """Recycling key for this join's build-side artifacts: the
        data-plan signature of the build subtree + the key-pair
        expression signatures (both sides — probe key TYPES drive
        numeric promotion and dict translation of the build keys) +
        the session data epoch.  None when recycling does not apply."""
        if self._mesh is not None or not node.key_pairs:
            return None
        if not self.config.cache.enable_hashtable_cache:
            return None
        from .codecache import _h, data_plan_sig, expr_sig

        sig_ids = {node.inputs[0].id: "L", node.inputs[1].id: "R"}
        pairs = ";".join(
            f"{expr_sig(l, sig_ids)}={expr_sig(r, sig_ids)}"
            for l, r in node.key_pairs)
        return _h([data_plan_sig(node.inputs[1]), pairs,
                   node.join_type.value, self._data_epoch()])

    def _plan_get(self, tag: str, bp=None):
        bp = bp if bp is not None else getattr(self, "_join_build_plan",
                                               None)
        if bp is None:
            return None
        return self._ht_plan_cache.get((bp, tag))

    def _plan_put(self, tag: str, value, bp=None) -> None:
        bp = bp if bp is not None else getattr(self, "_join_build_plan",
                                               None)
        if bp is not None:
            self._ht_plan_cache.put((bp, tag), value)

    def _stub_rhs_table(self, meta) -> ExecTable:
        """Reconstruct the build side's SHAPE (fields, types, per-column
        dtypes, nrows) from recycled metadata without executing its
        subtree; data access raises (everything the probe needs is in
        the recycled artifacts)."""
        fields, types_, nrows, colmeta, has_row_mask, unique_sets = meta
        cols = [
            MaskedCol(_StubArray(shape, dt),
                      _StubArray(shape, jnp.bool_) if has_mask else None)
            for (shape, dt, has_mask) in colmeta
        ]
        rm = _StubArray((nrows,), jnp.bool_) if has_row_mask else None
        return ExecTable(list(fields), list(types_), cols, nrows, rm,
                         unique_sets=unique_sets)

    def _join_plan_ready(self, node: nd.Join, bp: str) -> bool:
        """True when the recycled artifacts fully cover this join's
        build-side needs, so the build subtree need not execute:
        perfect/value route present + a value table for every demanded
        build column (SEMI/ANTI demand none)."""
        if self._ht_plan_cache.get((bp, "meta")) is None:
            return False
        perf = self._ht_plan_cache.get((bp, "perfect"))
        if perf is None or perf[0] is None:
            return False  # generic route gathers rhs data directly
        if node.join_type in (nd.JoinType.SEMI, nd.JoinType.ANTI):
            return True
        nl = node.inputs[0].size()
        demand = (self._demand or {}).get(node.id)
        rhs_demand = (sorted(i - nl for i in demand if i >= nl)
                      if demand is not None
                      else list(range(node.inputs[1].size())))
        return all(
            self._ht_plan_cache.get((bp, f"vt{ci}")) is not None
            for ci in rhs_demand)

    def _exec_loop_join(self, node: nd.Join, results) -> ExecTable:
        """Cartesian (loop) join for key-less INNER joins: CROSS JOIN and
        the non-equi ON fallback (reference: IRCodegen.cpp:513 loop-join
        codegen; gated like the reference by JoinConfig.enable_loop_join
        and the inner-table row cap)."""
        jcfg = self.config.exec.join
        if not jcfg.enable_loop_join:
            raise ExecError(
                "cross/loop join disabled (exec.join.enable_loop_join)")
        assert node.join_type == nd.JoinType.INNER
        lhs = self._materialize_input(node.inputs[0], results)
        rhs = self._materialize_input(node.inputs[1], results)
        if lhs.nrows == 0 or rhs.nrows == 0:
            return ExecTable.empty(node.fields, node.output_types)
        if rhs.nrows > jcfg.loop_join_inner_table_max_num_rows:
            raise ExecError(
                f"loop-join inner table has {rhs.nrows} rows, above "
                f"join.loop_join_inner_table_max_num_rows="
                f"{jcfg.loop_join_inner_table_max_num_rows}")
        ln, rn = lhs.nrows, rhs.nrows
        wd = self.config.exec.watchdog
        if wd.enable and ln * rn > wd.max_rows_per_step:
            raise ExecError(
                f"watchdog: loop join would produce {ln * rn} rows")
        from .codecache import _h, expr_sig

        sig_ids = {node.inputs[0].id: "L", node.inputs[1].id: "R"}
        key = _h(["loopjoin", _schema_sig(lhs), _schema_sig(rhs), ln, rn,
                  "" if node.residual is None
                  else expr_sig(node.residual, sig_ids)])

        def build():
            def fn(lcols, rcols, lmask, rmask):
                li = jnp.repeat(jnp.arange(ln, dtype=jnp.int32), rn)
                ri = jnp.tile(jnp.arange(rn, dtype=jnp.int32), ln)
                gl = [MaskedCol(c.data[li], c.mask[li]
                                if c.mask is not None else None)
                      for c in lcols]
                gr = [MaskedCol(c.data[ri], c.mask[ri]
                                if c.mask is not None else None)
                      for c in rcols]
                rm = None
                if lmask is not None:
                    rm = lmask[li]
                if rmask is not None:
                    rm = rmask[ri] if rm is None else (rm & rmask[ri])
                if node.residual is not None:
                    resolve = lambda ref: (
                        gl[ref.index] if ref.node is node.inputs[0]
                        else gr[ref.index])
                    cond = self.scalar.evaluate(node.residual, resolve)
                    m = cond.data.astype(jnp.bool_)
                    if cond.mask is not None:
                        m = m & cond.mask
                    rm = m if rm is None else (rm & m)
                return gl + gr, rm

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        cols, rm = fn(list(lhs.columns), list(rhs.columns),
                      lhs.row_mask, rhs.row_mask)
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         ln * rn, rm)

    def _exec_join(self, node: nd.Join, results) -> ExecTable:
        if not node.key_pairs:
            return self._exec_loop_join(node, results)
        if self._mesh is not None:
            out = self._exec_join_dist(node, results)
            if out is not None:
                return out
        self._join_build_plan = self._join_build_plan_sig(node)
        try:
            return self._exec_join_single(node, results)
        finally:
            self._join_build_plan = None

    def _exec_join_single(self, node: nd.Join, results) -> ExecTable:
        # masked inputs: a filtered probe/build side keeps its row_mask
        # instead of paying an eager compaction (one 1.3-2.2 s/1e8-row
        # gather PER COLUMN — the dominant cost of filtered joins like
        # TPC-H Q3's shipdate-filtered lineitem).  Dead rows fold into
        # the key NULL sentinels below, so they can never match.
        lhs = self._input_table_masked(node.inputs[0], results)
        # recycled build artifacts (plan-keyed): the build subtree was
        # skipped by the executor — its fields/types/nrows reconstruct
        # from metadata, every data access rides the recycled tables
        skip_info = (self._join_skip_rhs or {}).get(node.id)
        if skip_info is not None:
            rhs = self._stub_rhs_table(skip_info)
            self._join_route = "perfect(recycled)"
        else:
            rhs = self._input_table_masked(node.inputs[1], results)
        resolve_l = lambda ref: lhs.columns[ref.index] if ref.node is node.inputs[0] else _raise_ref(ref)
        resolve_r = lambda ref: rhs.columns[ref.index] if ref.node is node.inputs[1] else _raise_ref(ref)

        def eval_keys(exprs, table, which):
            resolve = (lambda ref: table.columns[ref.index])
            out = [
                _broadcast(self.scalar.evaluate(e, resolve), table.nrows)
                for e in exprs
            ]
            if table.row_mask is not None:
                # filter-dead rows become NULL keys: NULL never matches
                # (hash sentinels / perfect-table validity), so masked
                # rows drop out of the join without a compaction
                out = [MaskedCol(k.data, combine_masks(k.mask,
                                                       table.row_mask))
                       for k in out]
            return out

        lhs_keys = eval_keys([l for l, _ in node.key_pairs], lhs, 0)
        keys_rewritten = False
        if skip_info is not None:
            # recycled build: the cached table embodies the cold run's
            # dict translation / promotion of the BUILD keys; the probe
            # keys must take the same promotion, derived from the
            # static build-key types (no build data to consult)
            rhs_keys = None
            for i, (le, re_) in enumerate(node.key_pairs):
                lt, rt = le.type, re_.type
                if lt.is_dict_encoded_string() or rt.is_dict_encoded_string():
                    continue
                ld = lhs_keys[i].data.dtype
                rd = jnp.dtype(rt.physical_dtype())
                if (ld != rd and jnp.issubdtype(ld, jnp.number)
                        and jnp.issubdtype(rd, jnp.number)):
                    ct = jnp.promote_types(ld, rd)
                    if ld != ct:
                        lhs_keys[i] = MaskedCol(
                            lhs_keys[i].data.astype(ct), lhs_keys[i].mask)
        else:
            rhs_keys = eval_keys([r for _, r in node.key_pairs], rhs, 1)
            # cross-dictionary string keys: translate rhs codes into the
            # lhs dictionary (reference: StringDictionaryTranslationMgr)
            # keys rewritten below (dict translation / numeric promotion)
            # no longer take the values of their source expression —
            # static range inference would bound the WRONG value space
            for i, (le, re_) in enumerate(node.key_pairs):
                lt, rt = le.type, re_.type
                if (lt.is_dict_encoded_string() and rt.is_dict_encoded_string()
                        and lt.dict_id != rt.dict_id):  # type: ignore[attr-defined]
                    data, mask = self.scalar.translate_dict_codes(
                        rhs_keys[i].data, rhs_keys[i].mask, rt, lt)
                    rhs_keys[i] = MaskedCol(data, mask)
                    keys_rewritten = True
                elif lhs_keys[i].data.dtype != rhs_keys[i].data.dtype:
                    # mixed numeric key types (e.g. INT = DOUBLE from an
                    # IN subquery): hash_keys encodes each side's raw
                    # bits, so 31 and 31.0 would never match — promote
                    # both sides to the common SQL type first (reference:
                    # Analyzer normalize_column_pairs)
                    ld, rd = lhs_keys[i].data.dtype, rhs_keys[i].data.dtype
                    if (jnp.issubdtype(ld, jnp.number)
                            and jnp.issubdtype(rd, jnp.number)):
                        ct = jnp.promote_types(ld, rd)
                        if ld != ct:
                            lhs_keys[i] = MaskedCol(
                                lhs_keys[i].data.astype(ct),
                                lhs_keys[i].mask)
                        if rd != ct:
                            rhs_keys[i] = MaskedCol(
                                rhs_keys[i].data.astype(ct),
                                rhs_keys[i].mask)
                            keys_rewritten = True
        jt = node.join_type

        if lhs.nrows == 0:
            return ExecTable.empty(node.fields, node.output_types)
        if rhs.nrows == 0:
            if jt in (nd.JoinType.INNER, nd.JoinType.SEMI):
                return ExecTable.empty(node.fields, node.output_types)
            if jt == nd.JoinType.ANTI:
                return lhs
            return self._left_pad(node, lhs, rhs,
                                  jnp.zeros((0,), jnp.int32),
                                  jnp.zeros((0,), jnp.int32),
                                  jnp.arange(lhs.nrows, dtype=jnp.int32))

        from ..ir.expr import collect_column_refs
        from .codecache import _h, expr_sig

        # stable positional ids so structurally-equal joins share caches
        sig_ids = {node.inputs[0].id: "L", node.inputs[1].id: "R"}
        plan_sig = _h([
            ";".join(f"{expr_sig(l, sig_ids)}={expr_sig(r, sig_ids)}"
                     for l, r in node.key_pairs),
            node.join_type.value, _schema_sig(lhs), _schema_sig(rhs),
            lhs.nrows, rhs.nrows,
        ])

        rhs_ref_idx = sorted({
            ref.index for _, r in node.key_pairs
            for ref in collect_column_refs(r)
        })
        # the row_mask is part of the build identity: with masked
        # (uncompacted) inputs, two different filters over the same base
        # table share column buffers — only the mask distinguishes them
        ht_objs = [rhs.columns[i].data for i in rhs_ref_idx] + (
            [rhs.row_mask] if rhs.row_mask is not None else [])

        # recycle metadata: a later execution of the same build subtree
        # (data_plan_sig) reconstructs the build side's SHAPE from this
        # and skips executing the subtree entirely (column dtypes come
        # from the static types — no forced materialization here)
        if (skip_info is None and self._join_build_plan is not None
                and all(not ty.is_array() for ty in rhs.types)):
            colmeta = [((rhs.nrows,), jnp.dtype(ty.physical_dtype()),
                        bool(ty.nullable)) for ty in rhs.types]
            self._plan_put("meta", (
                list(rhs.fields), list(rhs.types), rhs.nrows, colmeta,
                rhs.row_mask is not None, rhs.unique_sets))

        # perfect (dense direct-index) join: single int-ish key with a
        # small value range and unique build keys (reference:
        # PerfectJoinHashTable; falls back to the sorted-hash table on
        # duplicates or oversized range, like HashJoin::getInstance)
        def attempt(pref):
            """Execute one route preference.  None = static default
            (spread > value-table > sorted-hash); a named route returns
            None when its admission fails."""
            if pref != "hash":
                self._join_route = "perfect"  # refined to "spread" inside
                out_ = self._try_perfect_join(node, lhs, rhs, lhs_keys,
                                              rhs_keys, plan_sig, ht_objs,
                                              jt, route=pref,
                                              keys_rewritten=keys_rewritten)
                if out_ is not None or pref is not None:
                    return out_
            self._join_route = "hash"
            return self._hash_join(node, lhs, rhs, lhs_keys, rhs_keys,
                                   plan_sig, ht_objs, jt)

        if skip_info is not None:
            # recycled artifacts cover the perfect-route family end to
            # end (the readiness check guaranteed table + demanded
            # value tables); the static spread>value preference applies,
            # route feedback is bypassed — the recycled configuration
            # is the fastest known one for this plan
            out = self._try_perfect_join(node, lhs, rhs, lhs_keys,
                                         rhs_keys, plan_sig, ht_objs,
                                         jt, route=None,
                                         keys_rewritten=False)
            if out is None:
                raise ExecError(
                    "internal: recycled perfect-join artifacts vanished "
                    "mid-run (plan-cache eviction between readiness "
                    "check and execution?)")
            self._join_route = "perfect(recycled)"
            return out

        # measured-feedback route tuning (exec/feedback.py; VERDICT r3
        # #8): spread vs value-table vs sorted-hash have tunnel-state-
        # dependent crossovers (NOTES: 585 vs 810 ms at 1e8) — the first
        # repetitions of a plan signature time each admissible route
        # warm (timed_wall: one extra warm execution, all outputs
        # forced so lazy-column routes are compared at full demand),
        # later repetitions run the measured winner.
        if (self._feedback.enabled and self._mesh is None
                and lhs.nrows >= (1 << 16)):
            from . import feedback as fb

            tune_sig = plan_sig + "|tunejoin"
            while True:
                pref, measure = self._feedback.choose(
                    tune_sig, ["spread", "value", "hash"])
                if not measure:
                    out = attempt(pref)
                    if out is not None:
                        return out
                    break  # winner inadmissible (shape drift): static
                def run():
                    o = attempt(pref)
                    if o is not None:
                        self._force_table_demanded(o)
                    return o

                out, secs = fb.timed_wall(run)
                if out is None:
                    # inadmissible candidate: poison it so exploration
                    # never retries this route for this plan signature
                    self._feedback.record(tune_sig, pref, float("inf"))
                    continue
                self._feedback.record(tune_sig, pref, secs)
                return out
        return attempt(None)

    def _hash_join(self, node, lhs, rhs, lhs_keys, rhs_keys, plan_sig,
                   ht_objs, jt):
        """Generic sorted-hash join route (reference:
        BaselineJoinHashTable): build once per (keys, mask) identity,
        probe ranges, expand candidate pairs, verify exact keys."""
        table = self._hashtable_cache.get(plan_sig + "|ht", ht_objs)
        if table is None:
            table = self._plan_get("ht")
            if table is not None:
                self._hashtable_cache.put(plan_sig + "|ht", ht_objs, table)
        if table is None:
            build_fn = self.code_cache.get_or_build(
                plan_sig + "|build",
                lambda: jax.jit(lambda ks: jn.build(ks)))
            table = build_fn(rhs_keys)
            self._hashtable_cache.put(plan_sig + "|ht", ht_objs, table)
            self._plan_put("ht", table)

        probe_fn = self.code_cache.get_or_build(
            plan_sig + "|probe",
            lambda: jax.jit(lambda tbl, lks: (
                lambda lo_hi: (lo_hi[0], lo_hi[1],
                               jnp.sum(lo_hi[1] - lo_hi[0]))
            )(jn.probe_ranges(tbl, lks))))
        lo, hi, total_dev = probe_fn(table, lhs_keys)
        total = int(total_dev)  # host sync: candidate count
        if total == 0:
            l_keep = r_keep = jnp.zeros((0,), jnp.int32)
            m = 0
        else:
            # candidate capacity rounds up to a power of two so repeated
            # executions with drifting match counts share ONE compiled
            # expansion program (padding slots carry live=False); the
            # exact-count variant recompiled per (total, m) pair — a
            # compile per bench iteration on real data
            cap = _next_pow2(total)
            expand_fn = self.code_cache.get_or_build(
                plan_sig + f"|expand{cap}",
                lambda: jax.jit(lambda tbl, lo_, hi_, lks, rks: (
                    lambda lrl: (lrl[0], lrl[1], lrl[2]
                                 & jn.verify_pairs(rks, lks, lrl[0], lrl[1]))
                )(jn.expand_pairs_capped(tbl, lo_, hi_, cap)[:3])))
            l_idx, r_idx, ok = expand_fn(table, lo, hi, lhs_keys, rhs_keys)
            if node.residual is not None and jt != nd.JoinType.INNER:
                ok = ok & self._residual_on_pairs(node, lhs, rhs, l_idx, r_idx)
            m = int(ok.sum())  # host sync: verified match count

        if jt == nd.JoinType.INNER:
            if m == 0:
                return ExecTable.empty(node.fields, node.output_types)
            # pair buffer bucketed like the expansion: padded pair rows
            # are dead under the output row_mask (masked-output design),
            # and the live flag derives in-graph so one program serves
            # every match count in the bucket
            mcap = min(_next_pow2(m), total)
            keep_fn = self.code_cache.get_or_build(
                plan_sig + f"|keepm{cap}/{mcap}",
                lambda: jax.jit(lambda li, ri, okk: (
                    lambda kp: (li[kp], ri[kp],
                                jnp.arange(mcap, dtype=jnp.int64)
                                < okk.sum())
                )(nonzero_indices(okk, mcap))))
            l_keep, r_keep, live = keep_fn(l_idx, r_idx, ok)
            out = self._pair_table(node, lhs, rhs, l_keep, r_keep,
                                   live_mask=None if mcap == m else live)
            if node.residual is not None:
                out = self._apply_residual(node, out)
            return out
        if total > 0:
            keep_fn = self.code_cache.get_or_build(
                plan_sig + f"|keep{cap}/{m}",
                lambda: jax.jit(lambda li, ri, okk: (
                    lambda kp: (li[kp], ri[kp])
                )(nonzero_indices(okk, m))))
            l_keep, r_keep = keep_fn(l_idx, r_idx, ok)

        matched = jnp.zeros((lhs.nrows,), jnp.bool_).at[l_keep].set(True)
        if jt == nd.JoinType.SEMI:
            n = int(matched.sum())
            return lhs.gather(nonzero_indices(matched, n))
        unmatched = (~matched if lhs.row_mask is None
                     else (~matched) & lhs.row_mask)
        if jt == nd.JoinType.ANTI:
            n = int(unmatched.sum())
            return lhs.gather(nonzero_indices(unmatched, n))

        # LEFT: residual already folded into the match set
        n_un = int(unmatched.sum())
        un_idx = nonzero_indices(unmatched, n_un)
        return self._left_pad(node, lhs, rhs, l_keep, r_keep, un_idx)

    def _try_perfect_join(self, node, lhs, rhs, lhs_keys, rhs_keys,
                          plan_sig, ht_objs, jt, route=None,
                          keys_rewritten=False):
        """``route``: None = spread-then-value default; "spread" = only
        the delta-spread output qualifies (None otherwise); "value" =
        skip the spread attempt (measured-feedback candidates).
        ``keys_rewritten``: the build keys no longer take their source
        expression's values (dict translation / numeric promotion), so
        static range inference must not be consulted (ADVICE r4: passed
        explicitly, not via instance state)."""
        if len(node.key_pairs) != 1:
            return None
        if route == "spread" and (jt != nd.JoinType.INNER
                                  or node.residual is not None):
            return None
        kt = node.key_pairs[0][1].type
        ok = (kt.is_integer() or kt.is_boolean()
              or kt.is_dict_encoded_string()
              or (kt.is_date() and kt.unit == t.TimeUnit.DAY))  # type: ignore[attr-defined]
        if not ok:
            return None
        sig = plan_sig + "|perfect"
        cached = self._hashtable_cache.get(sig, ht_objs)
        if cached is None:
            cached = self._plan_get("perfect")
            if cached is not None:
                self._hashtable_cache.put(sig, ht_objs, cached)
        if cached is None:
            if rhs_keys is None:
                raise ExecError(
                    "internal: recycled perfect-join table missing with "
                    "a skipped build side")
            bk = rhs_keys[0]
            from . import ranges as rg

            static_r = (None if keys_rewritten
                        else rg.infer_range(node.key_pairs[0][1]))

            # density guard: a dense table costs range_size entries of
            # memory, so tiny builds with huge ranges stay on the hash
            # route — but SPARSE bounded ranges (e.g. a filtered FK
            # build keeping 9% of [0, 15M) in TPC-H Q3) must still
            # qualify: the sorted-hash probe + expand costs seconds and
            # a compile per candidate-count where the dense table costs
            # range_size*4B once (measured Q3 @SF10: 11.3 s -> sub-s)
            def admissible(range_size):
                return not (
                    range_size <= 0
                    or range_size > self.config.exec.join.perfect_hash_range_limit
                    or range_size > max(rhs.nrows, 1) * 1024
                    or range_size > max(rhs.nrows * 8, 1 << 16)
                    and lhs.nrows < self.config.exec.join.spread_join_min_rows)

            lo = hi = None
            if static_r is not None and admissible(
                    static_r[1] - static_r[0] + 1):
                # static stats bound the key range: no device min/max
                # readback (a superset range only widens the table;
                # validity masks keep matching exact) — one host sync
                # saved per build, which an intermediate-derived build
                # side pays on EVERY execution
                lo, hi = static_r[0], static_r[1]
            else:
                # no static range, or the static superset failed the
                # guard (e.g. base-table stats over a heavily filtered
                # build side): a device min/max probe may still admit a
                # compact table — only its failure caches a rejection
                # (ADVICE r4).  NULL/dead keys fill with dtype extremes
                # so a masked build side can't widen the probed range.
                if bk.mask is None:
                    stats = jnp.stack([jnp.min(bk.data), jnp.max(bk.data)])
                else:
                    fi = (jnp.iinfo(bk.data.dtype)
                          if jnp.issubdtype(bk.data.dtype, jnp.integer)
                          else None)
                    top = fi.max if fi is not None else 0
                    bot = fi.min if fi is not None else 0
                    stats = jnp.stack([jnp.min(bk.fill(top)),
                                       jnp.max(bk.fill(bot))])
                lo, hi = (int(x) for x in np.asarray(stats))  # host sync
            range_size = hi - lo + 1
            if not admissible(range_size):
                self._hashtable_cache.put(sig, ht_objs,
                                          (None, None, False, None))
                self._plan_put("perfect", (None, None, False, None))
                return None

            # ONE build program: dense table + per-build-row slots (the
            # slot vector is an intermediate of the table scatter, so
            # XLA shares the work; value tables address it directly) —
            # saves the separate pjbslots dispatch that intermediate-
            # derived builds pay per execution
            def _build_both(bk_):
                tbl, uq, ns = jn.build_perfect(bk_, min_key=lo,
                                               range_size=range_size)
                return tbl, uq, ns, jn.build_slots(
                    bk_, min_key=lo, range_size=range_size)

            build_fn = self.code_cache.get_or_build(
                f"pjbuild/{range_size}/{lo}/{rhs.nrows}/{bk.data.dtype}"
                f"/{bk.mask is None}",
                lambda: jax.jit(_build_both))
            table, unique, n_set, bslots_arr = build_fn(bk)
            if not bool(unique):  # duplicate keys: OneToMany -> generic
                self._hashtable_cache.put(sig, ht_objs,
                                          (None, None, False, None))
                self._plan_put("perfect", (None, None, False, None))
                return None
            # every slot occupied => probe matching needs no table gather
            complete = int(n_set) == range_size
            cached = (table, range_size, complete, bslots_arr)
            self._hashtable_cache.put(sig, ht_objs, cached)
            self._plan_put("perfect", cached)
        table, range_size, complete, bslots_arr = cached
        if table is None:
            return None
        if node.residual is not None and jt != nd.JoinType.INNER:
            # residual ON conditions affect matching; use the generic path
            return None

        # value-table route: per-probe-row key slots, zero table gathers
        # when the table is complete, one (the occupancy check) otherwise;
        # each USED build column then costs one direct vt[slot] gather
        # instead of the rows[slot] -> col[row] dependent chain (measured
        # 1.52 s -> 0.76 s per column at 1e8x1e7 rows on v5e).
        slot_fn = self.code_cache.get_or_build(
            f"pjslots/{range_size}/{table.min_key}/{lhs.nrows}"
            f"/{lhs_keys[0].data.dtype}/{lhs_keys[0].mask is None}/{complete}",
            lambda: jax.jit(functools.partial(
                jn.perfect_match, range_size=range_size, complete=complete)))
        slots, matched = slot_fn(table, lhs_keys[0])

        if jt == nd.JoinType.SEMI:
            n = int(matched.sum())
            return self._fields_table(node, lhs.gather(
                nonzero_indices(matched, n)))
        if jt == nd.JoinType.ANTI:
            alive = (~matched if lhs.row_mask is None
                     else (~matched) & lhs.row_mask)
            n = int(alive.sum())
            return self._fields_table(node, lhs.gather(
                nonzero_indices(alive, n)))

        bslot_fn = lambda _bk=None: bslots_arr  # built with the table

        if jt == nd.JoinType.INNER:
            masked_wins = self._masked_output_wins(node, lhs)
            if (masked_wins and lhs.row_mask is not None
                    and route != "spread"):
                # a masked probe can never be all-matched and its
                # join-only consumers fold the mask into key NULLs for
                # free: emit the masked output without even paying the
                # match-count host sync
                out = self._pair_table_slots(
                    node, lhs, rhs, None, slots, None, sig,
                    bslot_fn, range_size,
                    ht_objs, lhs_mask=matched)
                if node.residual is not None:
                    out = self._apply_residual(node, out)
                return out
            m = int(matched.sum())
            if m == lhs.nrows and lhs.row_mask is None:
                if (complete and node.residual is None
                        and route in (None, "spread")):
                    out = self._try_spread_join(
                        node, lhs, rhs, slots, sig, range_size,
                        bslot_fn, ht_objs)
                    if out is not None:
                        self._join_route = "spread"
                        return out
                if route == "spread":
                    return None  # spread inadmissible for this shape
                # every probe row matched (FK-style join): skip the keep
                # compaction entirely, lhs columns pass through untouched
                out = self._pair_table_slots(
                    node, lhs, rhs, None, slots, None, sig,
                    bslot_fn, range_size, ht_objs)
            elif route == "spread":
                return None  # spread needs all-matched unmasked probes
            else:
                # masked output: dead probe rows ride the row_mask
                # instead of paying one keep-gather per column.  Joins
                # fold the mask into key NULLs for free; other consumers
                # only win when enough rows survive (frac knob)
                masked_ok = (
                    masked_wins
                    or m >= lhs.nrows
                    * self.config.exec.join.masked_output_min_match_frac)
                if masked_ok:
                    out = self._pair_table_slots(
                        node, lhs, rhs, None, slots, None, sig,
                        bslot_fn, range_size,
                        ht_objs, lhs_mask=matched)
                else:
                    keep = nonzero_indices(matched, m)
                    out = self._pair_table_slots(
                        node, lhs, rhs, keep, slots[keep], None, sig,
                        bslot_fn, range_size, ht_objs)
            if node.residual is not None:
                out = self._apply_residual(node, out)
            return out
        # LEFT (one-to-one): value-table lookup at match or pad null.
        # Residual LEFT/SEMI/ANTI returned None above (generic route
        # folds the residual into the match set, _hash_join)
        return self._pair_table_slots(
            node, lhs, rhs, None, slots, matched, sig,
            bslot_fn, range_size, ht_objs,
            lhs_mask=lhs.row_mask)

    def _masked_output_wins(self, node: nd.Join, lhs: ExecTable) -> bool:
        """True when every consumer of this join handles a masked
        (uncompacted) output at no extra per-row cost, so compaction
        gathers are pure waste regardless of the match fraction:

        * other joins — key evaluation folds the mask into NULL
          sentinels;
        * aggregates that will take the uniqueness-certificate identity
          pass (keys cover a certified set of the would-be output) —
          the identity program and the streaming top-k after it carry
          the mask through in-graph."""
        cons = (self._consumers or {}).get(node.id, [])
        if cons and all(c.startswith("join") for c in cons):
            return True
        if not lhs.unique_sets or node.residual is not None:
            return False
        if self._mesh is not None:
            return False  # identity pass is single-device only
        from .agg_exec import _IDENTITY_KINDS

        direct = getattr(self, "_direct_consumers", None) or {}
        direct = direct.get(node.id, [])
        if not direct:
            return False
        for c, pos in direct:
            if not (isinstance(c, nd.Aggregate) and pos == 0 and c.keys):
                return False
            if not all(isinstance(k, ir.ColumnRef) and k.node is node
                       for k in c.keys):
                return False
            key_idx = {k.index for k in c.keys}
            if not any(s <= key_idx for s in lhs.unique_sets):
                return False
            if not all(a.kind in _IDENTITY_KINDS
                       and getattr(a, "operand2", None) is None
                       for a in c.aggs):
                return False
        return True

    def _residual_on_pairs(self, node: nd.Join, lhs: ExecTable,
                           rhs: ExecTable, l_idx, r_idx):
        """Residual ON condition on candidate pairs (reference: residual
        join quals in the generated probe loop, IRCodegen.cpp)."""
        lhs_node, rhs_node = node.inputs

        def resolve(ref: ir.ColumnRef) -> MaskedCol:
            if ref.node is lhs_node:
                c = lhs.columns[ref.index]
                return MaskedCol(c.data[l_idx],
                                 c.mask[l_idx] if c.mask is not None else None)
            if ref.node is rhs_node:
                c = rhs.columns[ref.index]
                return MaskedCol(c.data[r_idx],
                                 c.mask[r_idx] if c.mask is not None else None)
            raise ExecError(f"unresolvable residual ref {ref!r}")

        cond = self.scalar.evaluate(node.residual, resolve)
        out = cond.data.astype(jnp.bool_)
        if cond.mask is not None:
            out = out & cond.mask
        return out

    @staticmethod
    def _force_table_demanded(table: ExecTable) -> None:
        """_force_table, but skips demand-poisoned lazy columns (the
        spread route materializes only the consumer-demanded set; its
        other thunks raise by design).  Every route is timed on the
        columns it actually produces — the same set a real consumer
        would pull."""
        for i in range(len(table.columns)):
            try:
                c = table.columns[i]
                np.asarray(jax.device_get(c.data.ravel()[:1]))
                if c.mask is not None:
                    np.asarray(jax.device_get(c.mask.ravel()[:1]))
            except ExecError:
                continue
        if table.row_mask is not None:
            np.asarray(jax.device_get(table.row_mask.ravel()[:1]))

    @staticmethod
    def _force_table(table: ExecTable) -> None:
        """Evaluate lazy columns and sync (1-element readbacks — the
        only trustworthy completion signal on the tunneled dev TPU)."""
        for c in table.columns:
            np.asarray(jax.device_get(c.data.ravel()[:1]))
            if c.mask is not None:
                np.asarray(jax.device_get(c.mask.ravel()[:1]))
        if table.row_mask is not None:
            np.asarray(jax.device_get(table.row_mask.ravel()[:1]))

    def _fields_table(self, node, table: ExecTable) -> ExecTable:
        return ExecTable(list(node.fields), list(node.output_types),
                         table.columns, table.nrows, table.row_mask,
                         unique_sets=table.unique_sets)

    def _value_tables_grouped(self, sig, rhs_idx, rhs, bslots_fn,
                              range_size, ht_objs,
                              bp=None) -> Dict[int, tuple]:
        """All demanded rhs columns scattered into key-slot order in ONE
        jitted program (vs one dispatch per column): a build side
        derived from an intermediate result misses the hashtable cache
        on every execution, so per-column dispatches are a per-run
        round-trip tax on the tunnel-attached TPU.  Each column's table
        still lands in the per-column cache slot so later single-column
        pulls hit."""
        out: Dict[int, tuple] = {}
        missing = []
        for ci in rhs_idx:
            c = rhs.columns[ci]
            vt_sig = sig + f"|vt{ci}"
            cached = self._hashtable_cache.get(vt_sig,
                                               [c.data] + list(ht_objs))
            if cached is None:
                cached = self._plan_get(f"vt{ci}", bp)
                if cached is not None:
                    self._hashtable_cache.put(
                        vt_sig, [c.data] + list(ht_objs), cached)
            if cached is None:
                missing.append((ci, c))
            else:
                out[ci] = cached
        if missing:
            key = ("vtgroup/" + f"{range_size}/{rhs.nrows}/" + ",".join(
                f"{ci}:{c.data.dtype}{c.data.shape[1:]}{c.mask is None}"
                for ci, c in missing))
            fn = self.code_cache.get_or_build(
                key, lambda: jax.jit(lambda cols, bs: [
                    jn.build_value_table(c, bs, range_size=range_size)
                    for c in cols
                ]))
            vts = fn([c for _, c in missing], bslots_fn())
            for (ci, c), vt in zip(missing, vts):
                self._hashtable_cache.put(sig + f"|vt{ci}",
                                          [c.data] + list(ht_objs), vt)
                self._plan_put(f"vt{ci}", vt, bp)
                out[ci] = vt
        return out

    def _value_table(self, sig, ci, c, bslots_fn, range_size, rhs_nrows,
                     ht_objs, bp=None):
        """One rhs column scattered into key-slot order, cached per plan
        + buffer identity (reference: HashtableRecycler.h:32).  The cache
        identity includes the build KEY buffers (``ht_objs``) — the slot
        layout depends on the key column, so a rebuilt key buffer under a
        live value buffer must invalidate the table."""
        vt_sig = sig + f"|vt{ci}"
        id_objs = [c.data] + list(ht_objs)
        cached = self._hashtable_cache.get(vt_sig, id_objs)
        if cached is None:
            cached = self._plan_get(f"vt{ci}", bp)
            if cached is not None:
                self._hashtable_cache.put(vt_sig, id_objs, cached)
        if cached is None:
            vt_fn = self.code_cache.get_or_build(
                f"vtbuild/{range_size}/{rhs_nrows}/{c.data.dtype}"
                f"/{c.data.shape[1:]}/{c.mask is None}",
                lambda: jax.jit(functools.partial(
                    jn.build_value_table, range_size=range_size)))
            cached = vt_fn(c, bslots_fn())
            self._hashtable_cache.put(vt_sig, id_objs, cached)
            self._plan_put(f"vt{ci}", cached, bp)
        return cached

    @staticmethod
    def _spreadable_dtype(dt) -> bool:
        """Dtypes spread_inner_fk can delta-encode exactly on TPU: ≤4-byte
        ints/f32/bool plus int64 (split into i32 words).  f64 is out —
        no f64 bitcast compiles on TPU — as is uint64 (pathological on
        TPU generally, NOTES.md)."""
        dt = jnp.dtype(dt)
        if dt == jnp.bool_:
            return True
        if jnp.issubdtype(dt, jnp.floating):
            return dt.itemsize == 4
        if jnp.issubdtype(dt, jnp.integer):
            return dt.itemsize <= 4 or dt == jnp.int64
        return False

    def _try_spread_join(self, node: nd.Join, lhs: ExecTable,
                         rhs: ExecTable, slots, sig, range_size,
                         bslots_fn, ht_objs) -> Optional[ExecTable]:
        """Delta-spread FK join (jn.spread_inner_fk): applies when the
        rest of the DAG reads ONLY build-side columns of this join, so
        losing probe-row order costs nothing and every consumed column
        is spread gather-free.  Output keeps build rows interleaved as
        dead rows under row_mask (lazy compaction)."""
        if lhs.nrows < self.config.exec.join.spread_join_min_rows:
            return None
        demand = (self._demand or {}).get(node.id, None)
        if demand is None:  # all columns (or unknown): probe order wins
            return None
        nl = len(lhs.fields)
        if any(i < nl for i in demand):
            return None
        rhs_idx = sorted(i - nl for i in demand)
        if not rhs_idx:
            return None
        rcols = [rhs.columns[i] for i in rhs_idx]
        if any(c.data.ndim != 1 for c in rcols):
            return None  # array columns can't ride lax.sort
        bad = [rhs.fields[i] for i, c in zip(rhs_idx, rcols)
               if not self._spreadable_dtype(c.data.dtype)]
        if bad:
            # visible route demotion (VERDICT r3 weak #8): pandas-default
            # f64 build columns silently lose the gather-free spread
            # route — surface it so users can cast to f32/int and get it
            _LOG.info(
                "spread join demoted to value-table route: build "
                "column(s) %s have no exact TPU delta encoding "
                "(f64/u64); cast to f32/int to enable the spread route",
                ", ".join(bad))
            self._join_route = "perfect(spread-demoted:f64)"
            return None  # f64/u64: no exact TPU delta encoding
        memo: dict = {}

        def bslots():
            if "bs" not in memo:
                memo["bs"] = bslots_fn()
            return memo["bs"]

        vts = [self._value_table(sig, i, c, bslots, range_size, rhs.nrows,
                                 ht_objs,
                                 bp=getattr(self, "_join_build_plan", None))
               for i, c in zip(rhs_idx, rcols)]
        fn = self.code_cache.get_or_build(
            sig + f"|spread/{lhs.nrows}/{tuple(rhs_idx)}",
            lambda: jax.jit(functools.partial(
                jn.spread_inner_fk, range_size=range_size)))
        is_probe, outcols = fn(slots, vts)

        def undemanded(j):
            def thunk():
                raise ExecError(
                    f"internal: spread-join column {j} pulled but not in "
                    f"the demand set {sorted(demand)} (column-demand "
                    f"analysis bug)")
            return thunk

        by_out = {nl + i: MaskedCol(d, m)
                  for i, (d, m) in zip(rhs_idx, outcols)}
        cols = _LazyThunkColumns([
            (lambda v=by_out[j]: v) if j in by_out else undemanded(j)
            for j in range(len(node.fields))
        ])
        return ExecTable(list(node.fields), list(node.output_types),
                         cols, range_size + lhs.nrows, is_probe)

    def _pair_table_slots(self, node: nd.Join, lhs: ExecTable,
                          rhs: ExecTable, l_idx, slots, rhs_valid, sig,
                          bslots_fn, range_size, ht_objs,
                          lhs_mask=None) -> ExecTable:
        """Perfect-join output via per-column VALUE TABLES: each used rhs
        column is scattered once into key-slot order (cached per plan,
        reference: HashtableRecycler.h:32) and probed with ONE direct
        vt[slot] gather — replacing the rows[slot] -> col[row] dependent
        gather chain (measured 1.52 s -> 0.76 s per used column at
        1e8 x 1e7 rows).  ``l_idx=None`` = lhs passes through untouched;
        ``rhs_valid`` masks unmatched rows (LEFT join nulls)."""
        memo: dict = {}
        demand = (self._demand or {}).get(node.id, None)
        nl = len(lhs.fields)
        rhs_demand = (sorted(i - nl for i in demand if i >= nl)
                      if demand is not None else [])
        # lazy thunks outlive _exec_join's plan context: capture it so
        # late column pulls still reach the plan-keyed recycling layer
        bp = getattr(self, "_join_build_plan", None)

        def bslots():
            if "bs" not in memo:
                memo["bs"] = bslots_fn()
            return memo["bs"]

        def lthunk(c):
            if l_idx is None:
                return lambda: c
            return lambda: MaskedCol(
                c.data[l_idx], c.mask[l_idx] if c.mask is not None else None)

        def vt_for(ci, c):
            if len(rhs_demand) > 1 and ci in rhs_demand:
                if "vts" not in memo:
                    memo["vts"] = self._value_tables_grouped(
                        sig, rhs_demand, rhs, bslots, range_size, ht_objs,
                        bp=bp)
                return memo["vts"][ci]
            return self._value_table(sig, ci, c, bslots, range_size,
                                     rhs.nrows, ht_objs, bp=bp)

        def rthunk(c, ci):
            def thunk():
                vtd, vtm = vt_for(ci, c)
                data = vtd[slots]
                mask = rhs_valid
                if vtm is not None:
                    m2 = vtm[slots]
                    if mask is None:
                        mask = m2
                    elif m2.ndim > 1:
                        mask = m2 & mask[:, None]
                    else:
                        mask = mask & m2
                return MaskedCol(data, mask)
            return thunk

        # traceable forms: a consumer step compiler (the fused identity
        # +sort tail) can inline these gathers into its own program —
        # one dispatch for the whole probe tail instead of one per
        # column (the ~5-program tunnel round-trip tax, NOTES r5 gap 2)
        def l_traceable(c):
            if l_idx is not None:
                return None

            def make():
                if c.mask is None:
                    return ([c.data],
                            lambda d: MaskedCol(d, None),
                            f"pass/{c.data.dtype}")
                return ([c.data, c.mask],
                        lambda d, m: MaskedCol(d, m),
                        f"passm/{c.data.dtype}")
            return make

        def r_traceable(c, ci):
            def make():
                vtd, vtm = vt_for(ci, c)
                leaves = [vtd, slots]
                if vtm is not None:
                    leaves.append(vtm)
                if rhs_valid is not None:
                    leaves.append(rhs_valid)

                def trace(vtd_, slots_, *rest):
                    it = iter(rest)
                    vtm_ = next(it) if vtm is not None else None
                    rv_ = next(it) if rhs_valid is not None else None
                    data = vtd_[slots_]
                    mask = rv_
                    if vtm_ is not None:
                        m2 = vtm_[slots_]
                        if mask is None:
                            mask = m2
                        elif m2.ndim > 1:
                            mask = m2 & mask[:, None]
                        else:
                            mask = mask & m2
                    return MaskedCol(data, mask)

                sig = (f"vt/{vtd.dtype}{vtd.shape[1:]}/{vtm is not None}"
                       f"/{rhs_valid is not None}")
                return leaves, trace, sig
            return make

        cols = _LazyThunkColumns(
            [lthunk(c) for c in lhs.columns]
            + [rthunk(c, ci) for ci, c in enumerate(rhs.columns)],
            traceables=[l_traceable(c) for c in lhs.columns]
            + [r_traceable(c, ci) for ci, c in enumerate(rhs.columns)])
        nrows = lhs.nrows if l_idx is None else int(l_idx.shape[0])
        # every output row maps to a distinct probe row (l_idx is None
        # or a subset gather; build keys verified unique), so probe-side
        # uniqueness certificates survive at unchanged column indices
        return ExecTable(list(node.fields), list(node.output_types),
                         cols, nrows, lhs_mask,
                         unique_sets=lhs.unique_sets)

    def _pair_table(self, node: nd.Join, lhs: ExecTable, rhs: ExecTable,
                    l_idx, r_idx, live_mask=None) -> ExecTable:
        """Join output with LAZY per-column gathers: a downstream step
        that uses only some columns never pays the HBM random-gather for
        the rest (measured 1.3 s per 1e8-row gather — the dominant join
        cost).  ``l_idx=None`` = identity (every probe row matched, in
        order): lhs columns pass through untouched.  ``live_mask`` marks
        real pairs when the pair buffer is padded to a compile-count
        bucket (dead slots ride the output row_mask)."""
        def lthunk(c):
            if l_idx is None:
                return lambda: c
            return lambda: MaskedCol(
                c.data[l_idx], c.mask[l_idx] if c.mask is not None else None)

        def rthunk(c):
            return lambda: MaskedCol(
                c.data[r_idx], c.mask[r_idx] if c.mask is not None else None)

        cols = _LazyThunkColumns([lthunk(c) for c in lhs.columns]
                                 + [rthunk(c) for c in rhs.columns])
        return ExecTable(list(node.fields), list(node.output_types),
                         cols, int(r_idx.shape[0]), live_mask)

    def _left_pad(self, node: nd.Join, lhs: ExecTable, rhs: ExecTable,
                  l_idx, r_idx, un_idx) -> ExecTable:
        """LEFT join output: matched pairs ++ unmatched lhs with null rhs."""
        n_match = int(l_idx.shape[0])
        n_un = int(un_idx.shape[0])
        l_all = jnp.concatenate([l_idx, un_idx]) if n_match else un_idx
        lcols = lhs.gather(l_all.astype(jnp.int32)).columns
        rcols = []
        for c in rhs.columns:
            matched_part = c.data[r_idx] if n_match else jnp.zeros(
                (0,), c.data.dtype)
            pad = jnp.zeros((n_un,), c.data.dtype)
            data = jnp.concatenate([matched_part, pad])
            mm = (c.mask[r_idx] if c.mask is not None else
                  jnp.ones((n_match,), jnp.bool_))
            mask = jnp.concatenate([mm, jnp.zeros((n_un,), jnp.bool_)])
            rcols.append(MaskedCol(data, mask))
        return ExecTable(list(node.fields), list(node.output_types),
                         lcols + rcols, n_match + n_un)

    def _apply_residual(self, node: nd.Join, out: ExecTable) -> ExecTable:
        resolve_out = lambda ref: out.columns[ref.index]
        cond = self.scalar.evaluate(
            _rebind_to_join_output(node.residual, node), resolve_out)
        mask = cond.data.astype(jnp.bool_)
        if cond.mask is not None:
            mask = mask & cond.mask
        if out.row_mask is not None:  # masked join output: dead rows
            mask = mask & out.row_mask  # must not pass the residual
        n = int(mask.sum())
        return out.gather(nonzero_indices(mask, n))

