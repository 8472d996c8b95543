"""Shared executor data structures and module-level helpers.

Split out of exec/executor.py (round 4, VERDICT r3 #10): ExecTable and
the lazy column containers, the identity-keyed value cache, dead-column
demand analysis, and small pure helpers shared by the step compiler
(exec/agg_exec.py), the distributed router (exec/dist_exec.py) and the
join executor (exec/join_exec.py).
"""

from __future__ import annotations

import weakref
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as t
from ..ir import expr as ir
from ..ir import node as nd
from .masked import MaskedCol, nonzero_indices
from .scalar import ExecError


@dataclass
class ExecTable:
    """Device-side step result.

    ``nrows`` is the buffer capacity; ``row_mask`` (optional) marks live
    rows — the lazy-compaction representation (reference: dense group
    buffers with empty entries skipped at iteration,
    ResultSetIteration.cpp).  ``live`` is the host-synced live count,
    cached after first use.
    """

    fields: List[str]
    types: List[t.Type]
    columns: List[MaskedCol]
    nrows: int
    row_mask: Optional[jnp.ndarray] = None
    _live: Optional[int] = None
    # uniqueness certificates: each entry is a frozenset of column
    # indices whose value TUPLE (NULLs compared as values, matching
    # GROUP BY equivalence) is distinct across live rows.  Issued by
    # group-by outputs (key columns) and preserved by row-subset /
    # 1:1 transforms; a downstream GROUP BY whose keys cover a
    # certified set collapses to an identity pass (each live row is
    # its own group) — no sort, no buffers (reference analog: Calcite
    # removes aggregates over unique keys, AggregateRemoveRule)
    unique_sets: tuple = ()

    def live_count(self) -> int:
        if self.row_mask is None:
            return self.nrows
        if self._live is None:
            self._live = int(self.row_mask.sum())  # host sync
        return self._live

    def compact(self) -> "ExecTable":
        """Dense copy with dead rows removed (one sync + gather)."""
        if self.row_mask is None:
            return self
        n = self.live_count()
        idx = nonzero_indices(self.row_mask, n)
        out = self.gather(idx)
        out.unique_sets = self.unique_sets  # row subset: still distinct
        return out

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
            MaskedCol(
                jnp.zeros((0, 1) if ty.is_array() else (0,),
                          jnp.dtype(ty.physical_dtype())),
                jnp.zeros((0, 1) if ty.is_array() else (0,), jnp.bool_)
                if (ty.nullable or ty.is_array()) else None)
            for ty in types
        ]
        return ExecTable(list(fields), list(types), cols, 0)


class _LazyScanColumns(list):
    """Scan columns materialized to device on first access — unused
    columns never transfer (reference: lazy fetch, rs.enable_lazy_fetch
    Config.h:140; dead-column elimination RelAlgOptimizer.cpp)."""

    def __init__(self, table, fields):
        super().__init__([None] * len(fields))
        self._table = table
        self._fields = fields

    def __getitem__(self, i):
        got = super().__getitem__(i)
        if got is None and isinstance(i, int):
            data, mask = self._table.column(self._fields[i]).device_arrays()
            got = MaskedCol(data, mask)
            self[i] = got
        return got

    def __iter__(self):
        return (self[i] for i in range(len(self)))


class _LazyThunkColumns(list):
    """Columns computed on first access (join outputs: dead columns
    never pay their gather).

    ``traceables`` (optional, parallel to ``thunks``): per-column
    zero-arg callables returning ``(leaves, trace, sig)`` — ``leaves``
    a list of concrete device arrays, ``trace`` a pure function of the
    traced leaves producing the column's MaskedCol, ``sig`` a string
    keying the trace structure for program caches.  A consumer step
    compiler can pull these instead of the eager thunk and inline the
    column's gather INTO its own jitted program (one dispatch for
    gather + aggregate + sort instead of one per column — the fused
    probe tail of TPC-H Q3).  Resolving a traceable may itself consult
    caches (e.g. value-table builds), so they are resolved at program-
    build time, not table-construction time."""

    def __init__(self, thunks, traceables=None):
        super().__init__([None] * len(thunks))
        self._thunks = thunks
        self._traceables = traceables

    def traceable(self, i):
        if self._traceables is None:
            return None
        return self._traceables[i]

    def __getitem__(self, i):
        got = super().__getitem__(i)
        if got is None and isinstance(i, int):
            got = self._thunks[i]()
            self[i] = got
        return got

    def __iter__(self):
        return (self[i] for i in range(len(self)))


class _PrunedScanColumns(list):
    """Scan columns restricted to surviving fragments, host-gathered and
    padded to ``bucket`` rows on first access (fragment skipping,
    reference: Execute.h:540 skipFragmentPair).  The gathered device
    buffer is cached on the Column keyed by the selection signature."""

    def __init__(self, table, fields, ranges, bucket, sharding=None):
        super().__init__([None] * len(fields))
        self._table = table
        self._fields = fields
        self._ranges = tuple(ranges)
        self._bucket = bucket
        # dist sessions: survivors row-shard over the mesh like any scan
        # (bucket is a device-count multiple; padding rides the row_mask)
        self._sharding = sharding

    def _put(self, arr):
        return (jnp.asarray(arr) if self._sharding is None
                else jax.device_put(arr, self._sharding))

    def __getitem__(self, i):
        got = super().__getitem__(i)
        if got is None and isinstance(i, int):
            from ..storage.memory import device_cache_manager

            col = self._table.column(self._fields[i])
            sig = (self._ranges, self._bucket, self._sharding is not None)
            cached = getattr(col, "_device_pruned", None)
            if cached is not None and cached[0] == sig:
                got = cached[1]
            else:
                data = np.concatenate(
                    [col.data[s:e] for s, e in self._ranges]
                    + [np.zeros(self._bucket - sum(
                        e - s for s, e in self._ranges), col.data.dtype)])
                d = self._put(data)
                m = None
                if col.validity is not None:
                    v = np.concatenate(
                        [col.validity[s:e] for s, e in self._ranges]
                        + [np.zeros(self._bucket - sum(
                            e - s for s, e in self._ranges), np.bool_)])
                    m = self._put(v)
                got = MaskedCol(d, m)
                col._device_pruned = (sig, got)
                device_cache_manager().note_use(col, data.nbytes)
            self[i] = got
        return got

    def __iter__(self):
        return (self[i] for i in range(len(self)))


class _IdentityKeyedCache:
    """Cache keyed by (plan signature, identity of device buffers).

    ``id()`` alone is unsafe: CPython reuses addresses after GC, so a
    later structurally-identical query could hit a stale entry built from
    different data (ADVICE r1).  Entries hold weakrefs to the keyed
    arrays; lookups validate each with ``is`` and miss on any mismatch.
    """

    def __init__(self, limit: int, byte_budget: Optional[int] = None,
                 enabled: bool = True) -> None:
        self._limit = limit
        self._byte_budget = byte_budget
        self._enabled = enabled
        self._bytes = 0
        self._d: Dict = {}

    @staticmethod
    def _key(sig, objs):
        return (sig, tuple(id(o) for o in objs))

    @staticmethod
    def _value_bytes(value) -> int:
        total = 0
        for leaf in jax.tree.leaves(value):
            total += getattr(leaf, "nbytes", 0) or 0
        return total

    def get(self, sig, objs):
        if not self._enabled:
            return None
        ent = self._d.get(self._key(sig, objs))
        if ent is None:
            return None
        refs, value, _nb = ent
        for r, o in zip(refs, objs):
            if (r() if r is not None else None) is not o:
                return None  # address reused by a different buffer
        return value

    def put(self, sig, objs, value) -> None:
        if not self._enabled:
            return
        nb = self._value_bytes(value)
        if len(self._d) > self._limit or (
                self._byte_budget is not None
                and self._bytes + nb > self._byte_budget):
            self._d.clear()
            self._bytes = 0
        refs = tuple(None if o is None else weakref.ref(o) for o in objs)
        self._d[self._key(sig, objs)] = (refs, value, nb)
        self._bytes += nb


class _PlanArtifactCache:
    """LRU of join build artifacts keyed by (data-plan signature, tag).

    The identity-keyed cache above only hits while the SAME device
    buffers are alive — a build side derived from an intermediate
    result (filtered build, join output) gets fresh buffers every
    execution and rebuilds its hash/value tables each warm run.  This
    layer recycles those artifacts across executions keyed by
    exec/codecache.data_plan_sig of the build subtree (table
    generations included), the reference's HashtableRecycler-by-plan-
    hash design (DataRecycler/HashtableRecycler.h:32,
    QueryPlanDagCache.h:61)."""

    def __init__(self, limit: int = 256,
                 byte_budget: Optional[int] = None,
                 enabled: bool = True) -> None:
        self._limit = limit
        self._byte_budget = byte_budget
        self._enabled = enabled
        self._bytes = 0
        from collections import OrderedDict

        self._d: "OrderedDict" = OrderedDict()

    def get(self, key):
        if not self._enabled:
            return None
        ent = self._d.get(key)
        if ent is None:
            return None
        self._d.move_to_end(key)
        return ent[0]

    def put(self, key, value) -> None:
        if not self._enabled:
            return
        nb = _IdentityKeyedCache._value_bytes(value)
        old = self._d.pop(key, None)
        if old is not None:
            self._bytes -= old[1]
        self._d[key] = (value, nb)
        self._bytes += nb
        while self._d and (
                len(self._d) > self._limit
                or (self._byte_budget is not None
                    and self._bytes > self._byte_budget)):
            _, (_, b) = self._d.popitem(last=False)
            self._bytes -= b


# nodes that are fused into their consumer's step rather than executed
_CHAIN_NODES = (nd.Project, nd.Filter)


def _column_demand(order, root) -> Dict[int, Optional[set]]:
    """Per-node demanded output columns, one backward pass over the
    topo order (dead-column analysis; reference: eliminate-dead-columns,
    RelAlgOptimizer.cpp).  ``None`` = all columns (the root materializes
    everything; unknown node kinds are conservative).

    MUST over-approximate what the executors actually pull — a consumer
    pulling an undemanded column of a spread-join output is an internal
    error (`_try_spread_join` poisons those thunks).  Concretely:

    * Project: ``_chain_env`` evaluates ALL exprs (even demand-dead
      ones), so every expr's refs are demanded regardless of ``d``.
    * Sort: ``_exec_sort`` pulls every source column when no Project
      sits between it and the source — demand is all columns.
    * Join / Union / Unnest consumers go through
      ``_materialize_input().compact()`` which forces every column.
    """
    from ..ir.expr import collect_column_refs

    demand: Dict[int, Optional[set]] = {root.id: None}

    def want(n, cols) -> None:
        cur = demand.get(n.id, set())
        if cur is None:
            return
        demand[n.id] = None if cols is None else (cur | cols)

    def want_refs(exprs) -> None:
        for e in exprs:
            if e is None:
                continue
            for ref in collect_column_refs(e):
                want(ref.node, {ref.index})

    for node in reversed(order):
        d = demand.get(node.id, set())
        if isinstance(node, nd.Project):
            want_refs(node.exprs)  # _chain_env evaluates ALL exprs
        elif isinstance(node, nd.Filter):
            want(node.inputs[0], d)
            want_refs([node.condition])
        elif isinstance(node, nd.Aggregate):
            want_refs(node.keys)
            want_refs(node.aggs)
        elif isinstance(node, (nd.Sort, nd.Unnest)):
            # _exec_sort with no intervening Project pulls every column
            # (executor.py `used = range(len(fields))`); Unnest
            # materializes + compacts its input
            want(node.inputs[0], None)
        elif isinstance(node, nd.LogicalUnion):
            for i in node.inputs:
                want(i, None)  # _exec_union materializes + compacts
        elif isinstance(node, nd.Join):
            # _exec_join materializes + compacts both inputs
            want(node.inputs[0], None)
            want(node.inputs[1], None)
            want_refs([l for l, _ in node.key_pairs])
            want_refs([r for _, r in node.key_pairs])
            want_refs([node.residual])
        else:  # Scan/Values: no inputs; unknown kinds: conservative
            for i in node.inputs:
                want(i, None)
    return demand

# aggregate kinds with mergeable partial slots (two-phase distribution);
# APPROX_* are algebraic via sketches: HLL registers merge by max,
# t-digests by re-cluster (ops/sketches.py) — skew-proof by construction
_TWO_PHASE_KINDS = frozenset({
    ir.AggKind.COUNT, ir.AggKind.SUM, ir.AggKind.AVG, ir.AggKind.MIN,
    ir.AggKind.MAX, ir.AggKind.STDDEV_SAMP, ir.AggKind.VAR_SAMP,
    ir.AggKind.SAMPLE, ir.AggKind.SINGLE_VALUE,
    ir.AggKind.APPROX_COUNT_DISTINCT, ir.AggKind.APPROX_QUANTILE,
})



def _consumer_kinds(order, root) -> Dict[int, List[str]]:
    """Per-node terminal-consumer kinds, seen THROUGH Project/Filter
    chains (which fuse into their consuming terminal and carry row
    masks for free).  Used by output-shape policy decisions — e.g. a
    join whose output only feeds other joins can stay masked
    (uncompacted): join key evaluation folds the row_mask into key NULL
    sentinels at zero cost, while compaction costs one HBM gather per
    column (reference analog: RelAlgExecutor's translate-only
    intermediate bufers never materialize dead rows either).

    Kinds: ``join_build`` / ``join_probe`` / ``agg`` / ``sort`` /
    ``root`` (materialized) / lowercase node-class name otherwise."""
    direct: Dict[int, List] = {}
    for n in order:
        for pos, i in enumerate(n.inputs):
            direct.setdefault(i.id, []).append((n, pos))
    memo: Dict[int, List[str]] = {}

    def kinds_of(nid: int) -> List[str]:
        if nid in memo:
            return memo[nid]
        memo[nid] = res = []  # pre-seed: cycles impossible, but cheap
        if nid == root.id:
            res.append("root")
        for (c, pos) in direct.get(nid, []):
            if isinstance(c, _CHAIN_NODES):
                res.extend(kinds_of(c.id))
            elif isinstance(c, nd.Join):
                res.append("join_build" if pos == 1 else "join_probe")
            elif isinstance(c, nd.Aggregate):
                res.append("agg")
            elif isinstance(c, nd.Sort):
                res.append("sort")
            else:
                res.append(type(c).__name__.lower())
        return res

    return {n.id: kinds_of(n.id) for n in order}


def _next_pow2(n: int) -> int:
    """Round capacities up to powers of two so repeated queries with
    near-identical sizes share compiled programs."""
    return 1 << max(0, (int(n) - 1).bit_length())


def _broadcast(col: MaskedCol, nrows: int) -> MaskedCol:
    if col.data.ndim == 0:
        data = jnp.broadcast_to(col.data, (nrows,))
        mask = (jnp.broadcast_to(col.mask, (nrows,))
                if col.mask is not None else None)
        return MaskedCol(data, mask)
    return col


def _schema_sig(table: ExecTable) -> str:
    return ",".join(f"{ty}" for ty in table.types) + (
        "|masked" if table.row_mask is not None else "")


def _raise_ref(ref):
    raise ExecError(f"unresolvable column ref {ref!r}")


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
