"""Relational executor: runs a QueryDag node-by-node on the device.

This is the TPU-native replacement for the reference's entire
orchestration+compile+execute stack (reference: RelAlgExecutor::
executeRelAlgQuery RelAlgExecutor.cpp:158 -> QueryExecutionSequence topo
sort -> per-step WorkUnit compile (NativeCodegen.cpp:1403) -> kernel
launch (Execute.cpp:2753) -> reduction (Execute.cpp:1156)).

Execution model:
  * Nodes run in topological order (QueryExecutionSequence.cpp:293).
  * Each step is traced jnp code over device-resident columns; XLA fuses
    the expression work into the reduction/sort/scatter kernels — the
    tracer plays the role of the reference's LLVM row_func codegen.
  * Data-dependent result sizes (filters, joins, group counts) are
    resolved with ONE host sync per step, then buffers are compacted on
    device with static shapes.  This mirrors the reference's two-pass
    count-then-fill designs (HashJoinRuntime.h:181, shuffle
    RelAlgExecutor.cpp:748-794) and keeps every traced computation
    static-shaped for XLA.
  * Step results stay on device as ExecTable; registering them as
    temp tables (ResultSetRegistry analog) enables chained queries.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .. import types as t
from ..config import Config
from ..ir import expr as ir
from ..ir import node as nd
from ..utils.timer import DebugTimer
from . import groupby as gb
from . import join as jn
from . import sort as srt
from .masked import MaskedCol, combine_masks
from .scalar import ExecError, ScalarCompiler


@dataclass
class ExecTable:
    """Device-side step result: equal-length masked columns."""

    fields: List[str]
    types: List[t.Type]
    columns: List[MaskedCol]
    nrows: int

    def column_by_name(self, name: str) -> MaskedCol:
        return self.columns[self.fields.index(name)]

    def gather(self, idx: jnp.ndarray) -> "ExecTable":
        cols = [
            MaskedCol(c.data[idx], c.mask[idx] if c.mask is not None else None)
            for c in self.columns
        ]
        return ExecTable(self.fields, self.types, cols, int(idx.shape[0]))

    @staticmethod
    def empty(fields: List[str], types: List[t.Type]) -> "ExecTable":
        cols = [
            MaskedCol(jnp.zeros((0,), jnp.dtype(ty.physical_dtype())),
                      jnp.zeros((0,), jnp.bool_) if ty.nullable else None)
            for ty in types
        ]
        return ExecTable(list(fields), list(types), cols, 0)


class Executor:
    """Per-session engine (reference: Executor singleton, Execute.h:229)."""

    def __init__(self, schema, dicts, config: Config) -> None:
        self.schema = schema
        self.dicts = dicts
        self.config = config
        self.scalar = ScalarCompiler(dicts)

    # ------------------------------------------------------------------
    def execute(self, dag: nd.QueryDag) -> ExecTable:
        results: Dict[int, ExecTable] = {}
        for node in dag.topo_order():
            with DebugTimer(f"step:{type(node).__name__}#{node.id}"):
                results[node.id] = self._exec_node(node, results)
        return results[dag.root.id]

    # ------------------------------------------------------------------
    def _exec_node(self, node: nd.Node, results: Dict[int, ExecTable]) -> ExecTable:
        if isinstance(node, nd.Scan):
            return self._exec_scan(node)
        if isinstance(node, nd.Project):
            return self._exec_project(node, results)
        if isinstance(node, nd.Filter):
            return self._exec_filter(node, results)
        if isinstance(node, nd.Aggregate):
            return self._exec_aggregate(node, results)
        if isinstance(node, nd.Join):
            return self._exec_join(node, results)
        if isinstance(node, nd.Sort):
            return self._exec_sort(node, results)
        if isinstance(node, nd.LogicalUnion):
            return self._exec_union(node, results)
        if isinstance(node, nd.LogicalValues):
            return self._exec_values(node)
        raise ExecError(f"cannot execute node {node!r}")

    # ------------------------------------------------------------------
    def _resolver(self, results: Dict[int, ExecTable]) -> Callable:
        def resolve(ref: ir.ColumnRef) -> MaskedCol:
            table = results[ref.node.id]
            return table.columns[ref.index]

        return resolve

    def _broadcast(self, col: MaskedCol, nrows: int) -> MaskedCol:
        if col.data.ndim == 0:
            data = jnp.broadcast_to(col.data, (nrows,))
            mask = (jnp.broadcast_to(col.mask, (nrows,))
                    if col.mask is not None else None)
            return MaskedCol(data, mask)
        return col

    # ------------------------------------------------------------------
    def _exec_scan(self, node: nd.Scan) -> ExecTable:
        cols = []
        for name in node.fields:
            data, mask = node.table.column(name).device_arrays()
            cols.append(MaskedCol(data, mask))
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         node.table.nrows)

    def _exec_project(self, node: nd.Project, results) -> ExecTable:
        inp = results[node.inputs[0].id]
        resolve = self._resolver(results)
        cols = [
            self._broadcast(self.scalar.evaluate(e, resolve), inp.nrows)
            for e in node.exprs
        ]
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         inp.nrows)

    def _exec_filter(self, node: nd.Filter, results) -> ExecTable:
        inp = results[node.inputs[0].id]
        if inp.nrows == 0:
            return inp
        resolve = self._resolver(results)
        cond = self.scalar.evaluate(node.condition, resolve)
        mask = cond.data.astype(jnp.bool_)
        if cond.mask is not None:  # NULL condition filters the row out
            mask = mask & cond.mask
        mask = jnp.broadcast_to(mask, (inp.nrows,))
        n = int(mask.sum())  # host sync: result cardinality
        idx = jnp.flatnonzero(mask, size=n)
        return inp.gather(idx)

    # ------------------------------------------------------------------
    def _exec_aggregate(self, node: nd.Aggregate, results) -> ExecTable:
        inp = results[node.inputs[0].id]
        resolve = self._resolver(results)
        specs: List[gb.AggSpec] = []
        for agg in node.aggs:
            operand = None
            if agg.operand is not None:
                operand = self._broadcast(
                    self.scalar.evaluate(agg.operand, resolve), inp.nrows)
            specs.append(gb.AggSpec(agg.kind, operand, agg.type, agg.distinct,
                                    agg.arg1, agg.interpolation))

        if not node.keys:
            scalars = gb.nogroup_agg(specs, inp.nrows, None)
            cols = [MaskedCol(jnp.reshape(s.data, (1,)),
                              jnp.reshape(s.mask, (1,)) if s.mask is not None else None)
                    for s in scalars]
            return ExecTable(list(node.fields), list(node.output_types), cols, 1)

        if inp.nrows == 0:
            return ExecTable.empty(node.fields, node.output_types)

        keys = [
            self._broadcast(self.scalar.evaluate(k, resolve), inp.nrows)
            for k in node.keys
        ]
        key_types = [k.type for k in node.keys]

        layout = self._perfect_layout(keys, key_types)
        if layout is not None:
            key_cols, agg_cols, exists = gb.groupby_perfect(
                keys, layout, specs, None)
            n = int(exists.sum())  # host sync: observed group count
            idx = jnp.flatnonzero(exists, size=n)
            cols = [MaskedCol(c.data[idx],
                              c.mask[idx] if c.mask is not None else None)
                    for c in key_cols + agg_cols]
            return ExecTable(list(node.fields), list(node.output_types), cols, n)

        cap = min(inp.nrows, self.config.exec.group_by.default_max_groups)
        key_cols, agg_cols, exists, n_groups = gb.groupby_sort(keys, specs, cap)
        n = int(n_groups)  # host sync: group count
        cols = [MaskedCol(c.data[:n], c.mask[:n] if c.mask is not None else None)
                for c in key_cols + agg_cols]
        return ExecTable(list(node.fields), list(node.output_types), cols, n)

    def _perfect_layout(self, keys: Sequence[MaskedCol],
                        key_types: Sequence[t.Type]):
        """Key ranges via a cheap device reduction + host sync (the
        reference derives them from chunk metadata / expression ranges;
        here post-expression data is the authority)."""
        ranges = []
        for k, ty in zip(keys, key_types):
            ok = (ty.is_integer() or ty.is_boolean() or
                  ty.is_dict_encoded_string() or
                  (ty.is_date() and ty.unit == t.TimeUnit.DAY))  # type: ignore[attr-defined]
            if not ok:
                return None
            if ty.is_boolean():
                ranges.append((0, 1, k.mask is not None))
                continue
            data = k.fill(0)
            lo = int(jnp.min(data))  # host sync (cheap scalar)
            hi = int(jnp.max(data))
            ranges.append((lo, hi, k.mask is not None))
        return gb.choose_perfect_layout(
            key_types, ranges, self.config.exec.group_by.perfect_hash_entries_limit)

    # ------------------------------------------------------------------
    def _exec_join(self, node: nd.Join, results) -> ExecTable:
        lhs = results[node.inputs[0].id]
        rhs = results[node.inputs[1].id]
        resolve = self._resolver(results)
        lhs_keys = [self._broadcast(self.scalar.evaluate(l, resolve), lhs.nrows)
                    for l, _ in node.key_pairs]
        rhs_keys = [self._broadcast(self.scalar.evaluate(r, resolve), rhs.nrows)
                    for _, r in node.key_pairs]
        # cross-dictionary string keys: translate rhs codes into the lhs
        # dictionary so code equality means string equality (reference:
        # StringDictionaryTranslationMgr)
        for i, (le, re_) in enumerate(node.key_pairs):
            lt, rt = le.type, re_.type
            if (lt.is_dict_encoded_string() and rt.is_dict_encoded_string()
                    and lt.dict_id != rt.dict_id):  # type: ignore[attr-defined]
                data, mask = self.scalar.translate_dict_codes(
                    rhs_keys[i].data, rhs_keys[i].mask, rt, lt)
                rhs_keys[i] = MaskedCol(data, mask)
        jt = node.join_type

        if lhs.nrows == 0:
            return ExecTable.empty(node.fields, node.output_types)
        if rhs.nrows == 0:
            if jt in (nd.JoinType.INNER, nd.JoinType.SEMI):
                return ExecTable.empty(node.fields, node.output_types)
            if jt == nd.JoinType.ANTI:
                return lhs
            # LEFT with empty rhs: all-null right side
            return self._left_pad(node, lhs, rhs,
                                  jnp.arange(0, dtype=jnp.int32),
                                  jnp.arange(0, dtype=jnp.int32),
                                  jnp.arange(lhs.nrows, dtype=jnp.int32))

        table = jn.build(rhs_keys)
        lo, hi = jn.probe_ranges(table, lhs_keys)
        total = int(jnp.sum(hi - lo))  # host sync: candidate count
        if total == 0:
            l_keep = r_keep = jnp.zeros((0,), jnp.int32)
        else:
            l_idx, r_idx = jn.expand_pairs(table, lo, hi, total)
            ok = jn.verify_pairs(rhs_keys, lhs_keys, l_idx, r_idx)
            m = int(ok.sum())  # host sync: verified match count
            keep = jnp.flatnonzero(ok, size=m)
            l_keep = l_idx[keep]
            r_keep = r_idx[keep]

        if jt == nd.JoinType.INNER:
            out = self._pair_table(node, lhs, rhs, l_keep, r_keep)
            if node.residual is not None:
                out = self._apply_residual(node, out)
            return out

        matched = jnp.zeros((lhs.nrows,), jnp.bool_).at[l_keep].set(True)
        if jt == nd.JoinType.SEMI:
            n = int(matched.sum())
            return lhs.gather(jnp.flatnonzero(matched, size=n))
        if jt == nd.JoinType.ANTI:
            n = int((~matched).sum())
            return lhs.gather(jnp.flatnonzero(~matched, size=n))

        # LEFT
        if node.residual is not None:
            raise ExecError("residual ON condition on LEFT join not supported yet")
        n_un = int((~matched).sum())
        un_idx = jnp.flatnonzero(~matched, size=n_un)
        return self._left_pad(node, lhs, rhs, l_keep, r_keep, un_idx)

    def _pair_table(self, node: nd.Join, lhs: ExecTable, rhs: ExecTable,
                    l_idx, r_idx) -> ExecTable:
        lcols = lhs.gather(l_idx).columns
        rcols = rhs.gather(r_idx).columns
        return ExecTable(list(node.fields), list(node.output_types),
                         lcols + rcols, int(l_idx.shape[0]))

    def _left_pad(self, node: nd.Join, lhs: ExecTable, rhs: ExecTable,
                  l_idx, r_idx, un_idx) -> ExecTable:
        """LEFT join output: matched pairs ++ unmatched lhs with null rhs."""
        n_match = int(l_idx.shape[0])
        n_un = int(un_idx.shape[0])
        l_all = jnp.concatenate([l_idx, un_idx]) if n_match else un_idx
        lcols = lhs.gather(l_all.astype(jnp.int32)).columns
        rcols = []
        for c, ty in zip(rhs.columns, rhs.types):
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
        # rebind the residual over the join output by index
        resolve_out = lambda ref: out.columns[ref.index]
        cond = self.scalar.evaluate(
            _rebind_to_join_output(node.residual, node), resolve_out)
        mask = cond.data.astype(jnp.bool_)
        if cond.mask is not None:
            mask = mask & cond.mask
        n = int(mask.sum())
        return out.gather(jnp.flatnonzero(mask, size=n))

    # ------------------------------------------------------------------
    def _exec_sort(self, node: nd.Sort, results) -> ExecTable:
        inp = results[node.inputs[0].id]
        if inp.nrows == 0 or not node.sort_fields:
            if node.limit is not None or node.offset:
                idx = jnp.arange(inp.nrows, dtype=jnp.int32)
                return inp.gather(srt.apply_limit(idx, node.limit, node.offset))
            return inp
        cols = [
            self._sortable(inp.columns[f.field_index],
                           inp.types[f.field_index])
            for f in node.sort_fields
        ]
        descs = [f.desc for f in node.sort_fields]
        nf = [f.nulls_first for f in node.sort_fields]
        perm = srt.sort_permutation(cols, descs, nf)
        perm = srt.apply_limit(perm, node.limit, node.offset)
        return inp.gather(perm)

    def _sortable(self, col: MaskedCol, typ: t.Type) -> MaskedCol:
        """Dict-encoded strings order by string value, not code: map codes
        to lexicographic ranks via a host-built table (the reference sorts
        dictionary columns through the dictionary too)."""
        if not typ.is_dict_encoded_string():
            return col
        d = self.dicts.get(typ.dict_id)  # type: ignore[attr-defined]
        strings = d.all_strings()
        if not strings:
            return col
        order = np.argsort(np.asarray(strings, dtype=object))
        ranks = np.empty(len(strings), np.int32)
        ranks[order] = np.arange(len(strings), dtype=np.int32)
        data = jnp.asarray(ranks)[jnp.clip(col.data, 0, len(strings) - 1)]
        return MaskedCol(data, col.mask)

    # ------------------------------------------------------------------
    def _exec_union(self, node: nd.LogicalUnion, results) -> ExecTable:
        parts = [results[i.id] for i in node.inputs]
        cols: List[MaskedCol] = []
        for ci, ty in enumerate(node.output_types):
            dt = jnp.dtype(ty.physical_dtype())
            datas = [p.columns[ci].data.astype(dt) for p in parts]
            data = jnp.concatenate(datas)
            if any(p.columns[ci].mask is not None for p in parts):
                mask = jnp.concatenate([p.columns[ci].valid_mask() for p in parts])
            else:
                mask = None
            cols.append(MaskedCol(data, mask))
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         sum(p.nrows for p in parts))

    def _exec_values(self, node: nd.LogicalValues) -> ExecTable:
        cols = []
        for ci, ty in enumerate(node.output_types):
            vals = [row[ci] for row in node.rows]
            validity = np.asarray([v is not None for v in vals])
            data = np.asarray([0 if v is None else v for v in vals],
                              dtype=ty.physical_dtype())
            mask = None if validity.all() else jnp.asarray(validity)
            cols.append(MaskedCol(jnp.asarray(data), mask))
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         len(node.rows))


def _rebind_to_join_output(expr: ir.Expr, join: nd.Join) -> ir.Expr:
    """Rewrite ColumnRefs into (lhs, rhs) inputs as refs into the join's
    output column order (lhs fields ++ rhs fields)."""
    lhs, rhs = join.inputs

    def rw(e: ir.Expr) -> ir.Expr:
        if isinstance(e, ir.ColumnRef):
            if e.node is lhs:
                return ir.ColumnRef(e.type, join, e.index)
            if e.node is rhs:
                return ir.ColumnRef(e.type, join, lhs.size() + e.index)
            return e
        ops = [rw(o) for o in e.operands()]
        return e.rebuild(*ops) if ops else e

    return rw(expr)
