"""Relational executor: compiles DAG steps into fused XLA programs.

This is the TPU-native replacement for the reference's entire
orchestration+compile+execute stack (reference: RelAlgExecutor::
executeRelAlgQuery RelAlgExecutor.cpp:158 -> QueryExecutionSequence topo
sort -> WorkUnitBuilder collects a node subtree into one
RelAlgExecutionUnit (WorkUnitBuilder.h:25) -> Executor::compileWorkUnit
(NativeCodegen.cpp:1403) -> kernel launch -> reduction).

Execution model (the WorkUnit analog):
  * A **step** is a maximal Scan/source -> Project/Filter chain capped by
    a terminal (Aggregate/Sort/Join/materialize).  The whole step is
    traced into ONE jitted XLA program — projections and filter
    predicates fuse into the terminal's reduction/sort, exactly like the
    reference compiles quals+exprs into a single row_func.
  * Compiled steps are cached by structural plan hash
    (exec/codecache.py; reference: CodeCacheAccessor.h:25).
  * Filters don't compact: they accumulate a row validity mask carried
    on the step result (``ExecTable.row_mask``), consumed for free by
    aggregation (dead rows route to a discard segment).  Compaction
    happens only where an op truly needs dense rows (join inputs,
    union, final materialization) — one host sync for the count, then a
    device gather (the reference's count-then-fill two-pass shape).
  * Perfect-hash layout is chosen from *static* expression ranges over
    fragment stats (exec/ranges.py; reference: ExpressionRange.cpp), so
    the common group-by compiles with zero data-dependent syncs.
"""

from __future__ import annotations

import functools
import weakref
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as t
from ..config import Config
from ..ir import expr as ir
from ..ir import node as nd
from ..utils.timer import DebugTimer
from ..utils.logger import get_channel

_LOG = get_channel("exec")
from . import groupby as gb
from . import join as jn
from . import ranges as rng
from . import sort as srt
from .codecache import CodeCache, chain_key
from .masked import MaskedCol, combine_masks, nonzero_indices
from .scalar import ExecError, ScalarCompiler


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
        return self.gather(idx)

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
    never pay their gather)."""

    def __init__(self, thunks):
        super().__init__([None] * len(thunks))
        self._thunks = thunks

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


class Executor:
    """Per-session engine (reference: Executor singleton, Execute.h:229)."""

    def __init__(self, schema, dicts, config: Config, udfs=None) -> None:
        self.schema = schema
        self.dicts = dicts
        self.config = config
        self.udfs = udfs
        self.scalar = ScalarCompiler(dicts, udfs=udfs)
        self.code_cache = CodeCache()
        # probed perfect-hash layouts keyed by (plan, input buffers) —
        # avoids re-syncing min/max for repeated queries over the same
        # arrays (reference: col-range cache, Execute.h col-range cache)
        self._layout_cache = _IdentityKeyedCache(1024)
        # join build tables keyed by (key expr plan, build buffers) —
        # reference: HashtableRecycler (DataRecycler/HashtableRecycler.h:32);
        # CacheConfig governs enablement and the device-byte budget
        self._hashtable_cache = _IdentityKeyedCache(
            256, byte_budget=config.cache.hashtable_cache_size,
            enabled=config.cache.enable_hashtable_cache)
        self._dist_agg_route = None  # last dist agg route (observability)
        self._join_route = None  # last join route (observability)
        self._analyze = False  # EXPLAIN ANALYZE: force + time every step
        self._step_times: Dict[int, Tuple[float, int]] = {}
        self._ndv_estimate = None  # last sampling-NDV estimate
        self._groupby_attempts = 0  # compile attempts of the last group-by
        from .feedback import RouteFeedback

        # measured-feedback route tuning (P3 autotune seam, feedback.py)
        self._feedback = RouteFeedback(
            enabled=config.exec.enable_route_feedback)
        self._demand: Optional[Dict[int, Optional[set]]] = None
        self._frag_prune_stats = None  # last fragment-skip counters
        self._frag_stream_chunks = None  # last fragment-stream chunk count
        self._deadline = None  # per-query watchdog deadline
        # multi-device mode: scans shard rows over the mesh and XLA/GSPMD
        # parallelizes each fused step, inserting collectives (the
        # "annotate shardings, let XLA do the rest" recipe; replaces the
        # reference's per-device kernels + host reduce, SURVEY.md P1-P8)
        self._mesh = None
        if config.dist.enable:
            from ..parallel import mesh as pmesh

            if config.dist.multi_host:
                # pod-slice / DCN: join the multi-controller job first so
                # jax.devices() spans every host (parallel/mesh.py)
                pmesh.init_distributed(
                    coordinator_address=config.dist.coordinator_address
                    or None,
                    num_processes=config.dist.num_processes or None,
                    process_id=(config.dist.process_id
                                if config.dist.process_id >= 0 else None))
            ndev = config.dist.num_devices or None
            if len(jax.devices()) > 1 and (ndev is None or ndev > 1):
                self._mesh = pmesh.make_mesh(ndev, axis=config.dist.mesh_axis)

    # ------------------------------------------------------------------
    def execute(self, dag: nd.QueryDag) -> ExecTable:
        from ..utils import logger as hlog
        from ..ops import onehot as _onehot

        # per-query (not per-session): the backend flags are module
        # state shared by all sessions in the process, so each query
        # asserts its own session's choice before tracing
        _onehot.configure(pallas=self.config.exec.pallas_onehot,
                          interpret=self.config.exec.interpret_pallas)
        with hlog.query_context():
            return self._execute_logged(dag)

    def _execute_logged(self, dag: nd.QueryDag) -> ExecTable:
        import time as _time

        results: Dict[int, ExecTable] = {}
        order = dag.topo_order()
        self._demand = _column_demand(order, dag.root)
        _LOG.debug1("query: %d nodes, root=%s", len(order),
                    type(dag.root).__name__)
        t_query = _time.monotonic()
        # agg->sort fusion (reference: ORDER BY over an aggregate is the
        # taxi-Q4 bread-and-butter, taxi_reduced_bench.cpp:76-84): when a
        # Sort directly consumes an Aggregate it alone uses, both compile
        # into ONE device program — no trim step, no group-count sync
        fused_aggs: Dict[int, nd.Sort] = {}
        if self._mesh is None:
            uses: Dict[int, int] = {}
            for n in order:
                for i in n.inputs:
                    uses[i.id] = uses.get(i.id, 0) + 1
            for n in order:
                if (isinstance(n, nd.Sort) and n.sort_fields
                        and isinstance(n.inputs[0], nd.Aggregate)
                        and uses.get(n.inputs[0].id, 0) == 1
                        and n.inputs[0] is not dag.root
                        and n.inputs[0].keys):
                    fused_aggs[n.inputs[0].id] = n
        wd = self.config.exec.watchdog
        deadline = (_time.monotonic() + wd.time_limit_ms / 1e3
                    if wd.enable and wd.time_limit_ms else None)
        self._deadline = deadline
        for node in order:
            if node.id in fused_aggs and node.id not in results:
                continue  # fused into the consuming Sort
            if isinstance(node, _CHAIN_NODES) and node is not dag.root:
                continue  # fused into the consuming terminal
            if (isinstance(node, nd.Sort)
                    and node.inputs[0].id in fused_aggs
                    and node.inputs[0].id not in results):
                t0 = _time.monotonic()
                out = self._exec_fused_agg_sort(node, node.inputs[0], results)
                if out is not None:
                    results[node.id] = out
                    if self._analyze:
                        self._force_table(out)
                        self._step_times[node.id] = (
                            (_time.monotonic() - t0) * 1e3, out.nrows)
                    continue
                # unfusable after all: run the aggregate, fall through
                results[node.inputs[0].id] = self._exec_aggregate(
                    node.inputs[0], results)
            # watchdog: static row budget + step deadline (reference:
            # DynamicWatchdog cycle budget, Shared/Config.h:20-26)
            if wd.enable:
                for inp in node.inputs:
                    got = results.get(inp.id)
                    if got is not None and got.nrows > wd.max_rows_per_step:
                        raise ExecError(
                            f"watchdog: step input of {got.nrows} rows "
                            f"exceeds budget {wd.max_rows_per_step}")
                if deadline is not None and _time.monotonic() > deadline:
                    raise ExecError("watchdog: query time budget exceeded")
            with DebugTimer(f"step:{type(node).__name__}#{node.id}"):
                t0 = _time.monotonic()
                results[node.id] = self._exec_step(node, results)
                if self._analyze:
                    # EXPLAIN ANALYZE: force this step's outputs (lazy
                    # thunks + async dispatch) so the recorded time is
                    # the step's true device cost, not dispatch time
                    self._force_table(results[node.id])
                    self._step_times[node.id] = (
                        (_time.monotonic() - t0) * 1e3,
                        results[node.id].nrows)
                if _LOG.enabled_for("DEBUG1"):
                    extras = ""
                    if self._dist_agg_route and isinstance(
                            node, nd.Aggregate):
                        extras += f" route={self._dist_agg_route}"
                    if self._frag_prune_stats and isinstance(
                            node, (nd.Aggregate, nd.Sort, nd.Join,
                                   *_CHAIN_NODES)):
                        extras += (" frags={selected}/{total}".format(
                            **self._frag_prune_stats))
                    _LOG.debug1(
                        "step %s#%d: %d rows, %.1f ms%s",
                        type(node).__name__, node.id,
                        results[node.id].nrows,
                        (_time.monotonic() - t0) * 1e3, extras)
        _LOG.info("query done: %.1f ms, %d rows",
                  (_time.monotonic() - t_query) * 1e3,
                  results[dag.root.id].nrows)
        return results[dag.root.id]

    # ------------------------------------------------------------------
    # chain resolution (WorkUnitBuilder analog)
    # ------------------------------------------------------------------
    def _resolve_chain(self, node: nd.Node, results) -> Tuple[ExecTable, List[nd.Node], nd.Node]:
        """Walk back through Project/Filter to the materialized source.
        Returns (source_table, chain_in_exec_order, source_node)."""
        chain: List[nd.Node] = []
        cur = node
        while isinstance(cur, _CHAIN_NODES) and cur.id not in results:
            chain.append(cur)
            cur = cur.inputs[0]
        chain.reverse()
        source = self._source_table(cur, results)
        pruned = self._maybe_prune_scan(cur, chain, results)
        return (pruned if pruned is not None else source), chain, cur

    def _maybe_prune_scan(self, src_node: nd.Node, chain: List[nd.Node],
                          results) -> Optional[ExecTable]:
        """Fragment skipping (reference: Execute.h:540 skipFragmentPair):
        when the chain's filters bound scan columns whose per-fragment
        min/max stats exclude fragments, gather only survivors into a
        bucket-padded device buffer.  None = no pruning applies."""
        from . import prune

        if (not self.config.exec.enable_fragment_skipping
                or not isinstance(src_node, nd.Scan)
                or getattr(src_node.table, "process_local", False)):
            return None
        got = results.get(src_node.id)
        if (self._mesh is None and got is not None
                and not isinstance(got.columns, _LazyScanColumns)):
            # scan already materialized differently (stream/spill path)
            return None
        table = src_node.table
        if table.nrows == 0 or len(table.fragments) < 2:
            return None
        if not any(isinstance(n, nd.Filter) for n in chain):
            return None
        bounds = prune.column_bounds(chain, src_node)
        if not bounds:
            return None
        sel = prune.select_fragments(table, list(src_node.fields), bounds)
        if sel is None or len(sel) == len(table.fragments):
            return None
        self._frag_prune_stats = {"selected": len(sel),
                                  "total": len(table.fragments)}
        fields = list(src_node.fields)
        types = list(src_node.output_types)
        nsel = sum(e - s for s, e in sel)
        if nsel == 0:
            return ExecTable.empty(fields, types)
        sharding = None
        bucket = min(prune.pad_bucket(nsel), table.nrows)
        if self._mesh is not None:
            # dist: prune on the host, shard the survivors (closes the
            # VERDICT-r2 gap: dist sessions lost fragment skipping);
            # the bucket pads up to a device-count multiple
            from jax.sharding import NamedSharding, PartitionSpec

            ndev = self._mesh.devices.size
            bucket = min(bucket + (-bucket) % ndev,
                         table.nrows + (-table.nrows) % ndev)
            sharding = NamedSharding(self._mesh,
                                     PartitionSpec(self._mesh.axis_names[0]))
            if bucket >= table.nrows + (-table.nrows) % ndev:
                return None  # padding reaches full size: no win
        elif bucket == table.nrows:
            return None  # padding would reach full size: no win
        cols = _PrunedScanColumns(table, fields, sel, bucket, sharding)
        rm = (None if bucket == nsel
              else self._put_row_mask(nsel, bucket, sharding))
        return ExecTable(fields, types, cols, bucket, rm)

    @staticmethod
    def _put_row_mask(nsel: int, bucket: int, sharding):
        rm = np.arange(bucket) < nsel
        return (jnp.asarray(rm) if sharding is None
                else jax.device_put(rm, sharding))

    def _source_table(self, node: nd.Node, results) -> ExecTable:
        got = results.get(node.id)
        if got is not None:
            return got
        if isinstance(node, nd.Scan):
            tbl = self._exec_scan(node)
            results[node.id] = tbl
            return tbl
        raise ExecError(f"source node {node!r} has no result")

    def _dict_generation_sig(self, chain: List[nd.Node],
                             terminal: Optional[nd.Node]) -> str:
        """Dictionary content feeds trace-time constants (LIKE code sets,
        translation maps); include dict sizes in the cache key so a grown
        dictionary invalidates compiled steps (reference: string dict
        generations, StringDictionaryGenerations)."""
        ids = set()
        uses_udf = [False]

        def scan_expr(e: ir.Expr):
            typ = e.type
            if typ.is_dict_encoded_string():
                ids.add(typ.dict_id)  # type: ignore[attr-defined]
            if (isinstance(e, ir.FunctionCall) and self.udfs is not None
                    and self.udfs.get(e.name) is not None):
                uses_udf[0] = True
            for o in e.operands():
                scan_expr(o)

        for n in list(chain) + ([terminal] if terminal is not None else []):
            if isinstance(n, nd.Project):
                for e in n.exprs:
                    scan_expr(e)
            elif isinstance(n, nd.Filter):
                scan_expr(n.condition)
            elif isinstance(n, nd.Aggregate):
                for e in list(n.keys) + list(n.aggs):
                    scan_expr(e)
            elif isinstance(n, nd.Join):
                for l, r in n.key_pairs:
                    scan_expr(l)
                    scan_expr(r)
        # UDF registry generation: re-registering a name must invalidate
        # compiled steps that traced the old function body (udf.py) —
        # but ONLY plans that actually call a UDF; unrelated plans keep
        # their compiled programs across registrations
        udf_sig = f"/u{self.udfs.generation}" if uses_udf[0] else ""
        if not ids:
            return udf_sig
        return ";".join(f"d{i}:{len(self.dicts.get(i))}"
                        for i in sorted(ids)) + udf_sig

    def _used_columns(self, src_node: nd.Node, chain: List[nd.Node],
                      terminal_exprs: List[ir.Expr]) -> List[int]:
        """Source column indices actually referenced by the step.  Refs
        reach the source directly or through Filter pass-through aliases
        (dead-column elimination, RelAlgOptimizer.cpp)."""
        aliases = {src_node.id}
        used = set()

        def collect(e: ir.Expr):
            if isinstance(e, ir.ColumnRef) and e.node.id in aliases:
                used.add(e.index)
            for o in e.operands():
                collect(o)

        for n in chain:
            if isinstance(n, nd.Project):
                for e in n.exprs:
                    collect(e)
                aliases.clear()  # projection rebinds the namespace
                aliases.add(-1)
            else:
                collect(n.condition)
                aliases.add(n.id)
        for e in terminal_exprs:
            collect(e)
        return sorted(used)

    @staticmethod
    def _expand_cols(sub_cols, used: List[int], size: int):
        full = [None] * size
        for pos, i in enumerate(used):
            full[i] = sub_cols[pos]
        return full

    def _chain_env(self, source_node: nd.Node, source_cols, chain: List[nd.Node],
                   row_mask, nrows: Optional[int] = None,
                   window_override=None):
        """Trace the Project/Filter chain; returns (env, final_node,
        row_mask).  Runs inside jit.  ``window_override`` substitutes
        precomputed window-function values (the dist-window route)."""
        env: Dict[int, List[MaskedCol]] = {source_node.id: list(source_cols)}
        final = source_node
        if nrows is None:
            first = next((c for c in source_cols if c is not None), None)
            nrows = first.data.shape[0] if first is not None else 0

        def resolver_for(n: nd.Node):
            def resolve(ref: ir.ColumnRef) -> MaskedCol:
                cols = env.get(ref.node.id)
                if cols is None:
                    raise ExecError(
                        f"expression references node {ref.node!r} which is "
                        f"not an input of this step")
                return cols[ref.index]

            return resolve

        for n in chain:
            resolve = resolver_for(n)
            if isinstance(n, nd.Project):
                env[n.id] = [
                    _broadcast(self.scalar.evaluate(
                        e, resolve, row_mask,
                        window_override=window_override), nrows)
                    for e in n.exprs
                ]
            else:  # Filter
                cond = self.scalar.evaluate(n.condition, resolve)
                m = cond.data.astype(jnp.bool_)
                if cond.mask is not None:
                    m = m & cond.mask
                m = jnp.broadcast_to(m, (nrows,))
                row_mask = m if row_mask is None else (row_mask & m)
                env[n.id] = env[n.inputs[0].id]
        return env, (chain[-1] if chain else source_node), row_mask

    def _exec_chain_dist_window(self, node: nd.Node, source: ExecTable,
                                chain: List[nd.Node],
                                src_node: nd.Node) -> Optional[ExecTable]:
        """Distributed window route (VERDICT-r2 #5): shuffle rows to
        partition-owner shards, run the local window engine, route
        results back by global position (parallel/dist_window.py) — the
        reference's per-device-step + exchange model (Execute.cpp:2656,
        WindowContext hash partitions).  Returns None to fall back to
        the GSPMD path (global windows, irregular shapes, overflow
        exhaustion)."""
        from .optimizer import _contains_window
        from ..parallel.dist_window import dist_window

        wi = next(i for i, n_ in enumerate(chain)
                  if isinstance(n_, nd.Project)
                  and any(_contains_window(e) for e in n_.exprs))
        prefix, wp, suffix = chain[:wi], chain[wi], chain[wi + 1:]
        if any(_contains_window(e) for n_ in suffix
               if isinstance(n_, nd.Project) for e in n_.exprs):
            return None  # one window project per step for now

        wfs: List[ir.WindowFunction] = []

        def collect(e: ir.Expr):
            if isinstance(e, ir.WindowFunction):
                wfs.append(e)
                return  # nested windows inside args unsupported
            for o in e.operands():
                collect(o)

        for e in wp.exprs:
            collect(e)
        if not wfs or any(not w.partition_keys for w in wfs):
            return None  # global windows: single owner shard, stay GSPMD
        mesh = self._mesh
        ndev = mesh.devices.size
        if source.nrows < ndev or source.nrows % ndev != 0:
            return None
        rows_per_shard = source.nrows // ndev
        nrows0, size = source.nrows, len(source.fields)
        axis = self.config.dist.mesh_axis
        key = chain_key(_schema_sig(source), chain, None,
                        self._dict_generation_sig(chain, None)
                        + f"dwin/n{nrows0}/d{ndev}")

        # ---- 1: one jitted program produces every window input column
        def build_inputs():
            def fn(cols, rm):
                env, _, rmx = self._chain_env(src_node, cols, prefix, rm,
                                              nrows=nrows0)
                resolve = lambda ref: env[ref.node.id][ref.index]
                per_wf = []
                for w in wfs:
                    grp = []
                    for exprs in (w.args, w.partition_keys, w.order_keys):
                        grp.append([
                            _broadcast(self.scalar.evaluate(a, resolve, rmx),
                                       nrows0) for a in exprs])
                    per_wf.append(grp)
                return per_wf, rmx

            return jax.jit(fn)

        in_fn = self.code_cache.get_or_build(key + "|in", build_inputs)
        per_wf, rmx = in_fn(list(source.columns), source.row_mask)

        # ---- 2: per window fn, the shuffle plan (widen-retry on skew)
        from .codecache import expr_sig

        vals: Dict[int, MaskedCol] = {}
        attempts = 3 if self.config.exec.allow_retry else 1
        for w, (aa, pp, oo) in zip(wfs, per_wf):
            sig = key + "|w" + expr_sig(w, {src_node.id: "S"})
            slack = 2.0
            for _ in range(attempts):
                fn = self.code_cache.get_or_build(
                    sig + f"|s{slack}",
                    lambda: jax.jit(functools.partial(
                        dist_window, mesh, w.kind,
                        order_desc=list(w.order_desc), arg1=w.arg1,
                        rows_per_shard=rows_per_shard,
                        out_dtype=w.type.physical_dtype(),
                        frame=w.frame, axis=axis, slack=slack)))
                col, overflow = fn(args=aa, part_cols=pp, order_cols=oo,
                                   row_mask=rmx)
                if int(overflow) == 0:  # host sync: retry contract
                    break
                slack *= 2.0
            else:
                return None  # skew beyond retry budget: GSPMD fallback
            vals[id(w)] = col

        # ---- 3: final trace with the computed values substituted
        def build_final():
            def fn(cols, rm, wvals):
                ov = {wid: v for wid, v in zip(list(vals.keys()), wvals)}
                env, final, rmx2 = self._chain_env(
                    src_node, cols, chain, rm, nrows=nrows0,
                    window_override=ov)
                return env[final.id], rmx2

            return jax.jit(fn)

        fin = self.code_cache.get_or_build(key + "|fin", build_final)
        cols, rm_out = fin(list(source.columns), source.row_mask,
                           list(vals.values()))
        return ExecTable(list(node.fields), list(node.output_types),
                         cols, nrows0, rm_out)

    # ------------------------------------------------------------------
    def _exec_step(self, node: nd.Node, results) -> ExecTable:
        if isinstance(node, nd.Scan):
            return self._source_table(node, results)
        if isinstance(node, _CHAIN_NODES):
            return self._exec_chain_root(node, results)
        if isinstance(node, nd.Aggregate):
            return self._exec_aggregate(node, results)
        if isinstance(node, nd.Sort):
            return self._exec_sort(node, results)
        if isinstance(node, nd.Join):
            return self._exec_join(node, results)
        if isinstance(node, nd.LogicalUnion):
            return self._exec_union(node, results)
        if isinstance(node, nd.LogicalValues):
            return self._exec_values(node)
        if isinstance(node, nd.Unnest):
            return self._exec_unnest(node, results)
        raise ExecError(f"cannot execute node {node!r}")

    def _exec_unnest(self, node: nd.Unnest, results) -> ExecTable:
        """Explode a fixed-width array column: nrows * width output rows
        (row-major: parent row, then element), absent elements dead via
        the row_mask — static shapes, no host sync."""
        src = self._materialize_input(node.inputs[0], results)
        fi = node.field_index
        arr = src.columns[fi]
        if arr.data.ndim != 2:
            raise ExecError("UNNEST input is not an array column")
        n, k = arr.data.shape

        key = (f"unnest/{_schema_sig(src)}/{fi}/{n}x{k}")
        def build():
            def fn(cols, row_mask):
                a = cols[fi]
                out = []
                for i, c in enumerate(cols):
                    if i == fi:
                        out.append(MaskedCol(a.data.reshape(n * k), None))
                    else:
                        out.append(MaskedCol(
                            jnp.repeat(c.data, k, axis=0),
                            jnp.repeat(c.mask, k, axis=0)
                            if c.mask is not None else None))
                elem_live = (a.mask.reshape(n * k) if a.mask is not None
                             else jnp.ones((n * k,), jnp.bool_))
                if row_mask is not None:
                    elem_live = elem_live & jnp.repeat(row_mask, k)
                return out, elem_live

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        cols, live = fn(list(src.columns), src.row_mask)
        return ExecTable(list(node.fields), list(node.output_types),
                         cols, n * k, live)

    # ------------------------------------------------------------------
    def _exec_scan(self, node: nd.Scan) -> ExecTable:
        if self._mesh is not None:
            return self._exec_scan_sharded(node)
        cols = _LazyScanColumns(node.table, list(node.fields))
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         node.table.nrows)

    def _exec_scan_sharded(self, node: nd.Scan) -> ExecTable:
        """Row-shard the table over the mesh; rows pad to a multiple of
        the device count and padding rides the row_mask (fragment-data-
        parallelism, SURVEY.md P1)."""
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = self._mesh
        ndev = mesh.devices.size
        sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        if getattr(node.table, "process_local", False):
            return self._exec_scan_process_local(node, mesh, sharding)
        nrows = node.table.nrows
        pad = (-nrows) % ndev
        total = nrows + pad

        cols = []
        for name in node.fields:
            col = node.table.column(name)
            cached = getattr(col, "_device_sharded", None)
            if cached is None:
                data = col.data
                if pad:
                    data = np.concatenate(
                        [data,
                         np.zeros((pad,) + data.shape[1:], data.dtype)])
                d = jax.device_put(data, sharding)
                m = None
                if col.validity is not None:
                    v = col.validity
                    if pad:
                        v = np.concatenate(
                            [v, np.zeros((pad,) + v.shape[1:], np.bool_)])
                    m = jax.device_put(v, sharding)
                cached = MaskedCol(d, m)
                col._device_sharded = cached
            cols.append(cached)
        if pad:
            rm_host = np.concatenate(
                [np.ones(nrows, np.bool_), np.zeros(pad, np.bool_)])
            row_mask = jax.device_put(rm_host, sharding)
        else:
            row_mask = None
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         total, row_mask)

    def _exec_scan_process_local(self, node: nd.Scan, mesh,
                                 sharding) -> ExecTable:
        """Multi-controller scan: every process contributes its LOCAL
        host rows; the global array is assembled shard-by-shard without
        any host ever holding the full table (the SPMD pod ingest story,
        SURVEY.md §2.8).  Padding rows ride the row_mask."""
        import jax as _jax
        from ..parallel import mesh as pmesh

        table = node.table
        local_n = table.nrows
        per, total = pmesh.process_row_quota(local_n, mesh)
        pidx = _jax.process_index()
        cols = []
        for name in node.fields:
            col = table.column(name)
            cached = getattr(col, "_device_sharded", None)
            if cached is None:
                data = col.data
                if col.info.is_rowid:
                    # rowid = position in the global padded layout
                    data = pidx * per + np.arange(local_n, dtype=np.int64)
                d = pmesh.global_from_process_local(mesh, data, per, total)
                m = None
                if col.validity is not None:
                    m = pmesh.global_from_process_local(
                        mesh, col.validity, per, total, fill=False)
                cached = MaskedCol(d, m)
                col._device_sharded = cached
            cols.append(cached)
        if per == local_n and _jax.process_count() == 1:
            row_mask = None
        else:
            rm_local = np.arange(per) < local_n
            row_mask = pmesh.global_from_process_local(
                mesh, rm_local, per, total, fill=False)
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         total, row_mask)

    # ------------------------------------------------------------------
    def _exec_chain_root(self, node: nd.Node, results) -> ExecTable:
        """Root of the DAG is a bare Project/Filter chain: materialize it."""
        source, chain, src_node = self._resolve_chain(node, results)
        if source.nrows == 0:
            return ExecTable.empty(node.fields, node.output_types)
        if self._mesh is not None:
            from .optimizer import _contains_window

            if any(_contains_window(e)
                   for n_ in chain if isinstance(n_, nd.Project)
                   for e in n_.exprs):
                out = self._exec_chain_dist_window(
                    node, source, chain, src_node)
                if out is not None:
                    return out
        has_proj = any(isinstance(n, nd.Project) for n in chain)
        used = (list(range(len(source.fields))) if not has_proj
                else self._used_columns(src_node, chain, []))
        key = chain_key(_schema_sig(source), chain, None,
                        self._dict_generation_sig(chain, None)
                        + f"u{used}/n{source.nrows}")
        nrows = source.nrows
        size = len(source.fields)

        def build():
            def fn(sub_cols, row_mask):
                source_cols = self._expand_cols(sub_cols, used, size)
                env, final, rm = self._chain_env(src_node, source_cols, chain,
                                                row_mask, nrows=nrows)
                return env[final.id], rm

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        cols, rm = fn([source.columns[i] for i in used], source.row_mask)
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         source.nrows, rm)

    # ------------------------------------------------------------------
    def _exec_aggregate(self, node: nd.Aggregate, results) -> ExecTable:
        source, chain, src_node = self._resolve_chain(node.inputs[0], results)
        specs_meta = [
            (a.kind, a.type, a.distinct, a.arg1, a.interpolation)
            for a in node.aggs
        ]

        if not node.keys:
            return self._agg_nogroup(node, source, chain, src_node)

        if source.nrows == 0:
            return ExecTable.empty(node.fields, node.output_types)

        # layout choice from static ranges (no device sync); if stats
        # can't bound a key, probe min/max on device — one tiny kernel +
        # sync (reference: ExpressionRange falls back to runtime metadata)
        layout = self._static_perfect_layout(node)
        key_ranges = None
        if layout is None:
            layout, key_ranges = self._dynamic_perfect_layout(
                node, source, chain, src_node)
        cap = min(source.nrows,
                  self.config.exec.group_by.default_max_groups)
        if key_ranges is not None:
            # distinct groups cannot exceed the key-range product
            prod = 1
            for lo_r, hi_r, _nul in key_ranges:
                prod *= (hi_r - lo_r + 2)
                if prod > cap:
                    break
            cap = min(cap, max(prod, 1))
        self._ndv_estimate = None
        if layout is None and cap > (1 << 20):
            # unbounded (or loosely bounded) keys: size the buffer from
            # the sampling estimator; 3x slack makes widen-retries rare
            est = self._estimate_ndv_sample(node, source, chain, src_node)
            if est is not None:
                self._ndv_estimate = est
                cap = min(cap, max(256, est * 3))
        terminal_exprs = list(node.keys) + [
            a.operand for a in node.aggs if a.operand is not None] + [
            a.operand2 for a in node.aggs
            if getattr(a, "operand2", None) is not None]
        used = self._used_columns(src_node, chain, terminal_exprs)
        nrows0 = source.nrows
        size = len(source.fields)

        # fragment-streamed execution for over-budget scans (static
        # perfect layouts only: a dynamic range probe would itself
        # materialize the whole column on device)
        if layout is not None and key_ranges is None:
            plan = self._fragment_stream_plan(node, source, chain,
                                              src_node, used)
            if plan is not None:
                return self._exec_aggregate_fragmented(
                    node, source, chain, src_node, used, size, layout, plan)

        pmode = self._pallas_groupby_mode(node, layout, nrows0)

        # measured-feedback route tuning (exec/feedback.py, the P3
        # autotune seam): near the one-hot/sort tier boundary either
        # route can win depending on row count and agg mix — the first
        # repetitions of a plan shape time each candidate warm (forced
        # 1-element-readback sync), later repetitions run the winner
        route = "perfect" if layout is not None else "sort"
        measure = False
        tune_sig = None
        if (layout is not None and self._mesh is None and pmode is None
                and self._feedback.enabled
                and 512 < layout.entry_count <= gb.onehot.SEGMENT_LIMIT
                and nrows0 >= (1 << 16)):
            tune_sig = chain_key(
                _schema_sig(source), chain, node,
                self._dict_generation_sig(chain, node)
                + f"tunegrp/u{used}/n{nrows0}")
            route, measure = self._feedback.choose(
                tune_sig, ["perfect", "sort"])
        layout_eff = layout if route == "perfect" else None
        if layout is not None and layout_eff is None:
            cap = min(nrows0, layout.entry_count)

        def make_key(cap_):
            extra = (f"layout={layout_eff.mins}/{layout_eff.sizes}/pl{pmode}"
                     if layout_eff
                     else f"sortcap={cap_}/rng={key_ranges}") + f"u{used}"
            return chain_key(_schema_sig(source), chain, node,
                             self._dict_generation_sig(chain, node) + extra
                             + f"/n{source.nrows}")

        def build(cap_):
            def fn(sub_cols, row_mask):
                source_cols = self._expand_cols(sub_cols, used, size)
                env, final, rm = self._chain_env(src_node, source_cols, chain,
                                                row_mask, nrows=nrows0)
                resolve = lambda ref: env[ref.node.id][ref.index]
                keys = [
                    _broadcast(self.scalar.evaluate(k, resolve), nrows0)
                    for k in node.keys
                ]
                specs = self._build_specs(node, resolve, nrows0)
                if layout_eff is not None:
                    kc, ac, exists = gb.groupby_perfect(
                        keys, layout_eff, specs, rm, pallas_mode=pmode)
                    return kc, ac, exists, None
                kc, ac, exists, n_groups = gb.groupby_sort(
                    keys, specs, cap_, row_valid=rm, key_ranges=key_ranges)
                return kc, ac, exists, n_groups

            return jax.jit(fn)

        key = make_key(cap)
        # distributed sessions route high-NDV aggregation off the GSPMD
        # fallback: algebraic aggs through the skew-proof two-phase
        # shuffle (local combine -> all_to_all of partials -> merge),
        # holistic aggs (COUNT DISTINCT/QUANTILE/TOP_K/CORR/distinct)
        # through the raw-row shuffle so each key's rows co-locate
        if self._mesh is not None:
            all_alg = all(a.kind in _TWO_PHASE_KINDS and not a.distinct
                          for a in node.aggs)
            out = None
            if all_alg and layout is None:
                out = self._exec_aggregate_dist(node, source, chain,
                                                src_node, used, size, key)
            elif not all_alg and self._distinct_split_applicable(node):
                out = self._exec_aggregate_dist_distinct(
                    node, source, chain, src_node, used, size, key)
            elif not all_alg:
                out = self._exec_aggregate_dist_shuffled(
                    node, source, chain, src_node, used, size, key)
            else:
                # perfect layout + algebraic aggs -> GSPMD dense-buffer
                # path below (local partials + AllReduce, already
                # optimal); recorded so commlog captures with zero
                # explicit collectives are interpretable
                self._dist_agg_route = "gspmd_dense"
            if out is not None:
                return out

        self._groupby_attempts = 0
        while True:
            self._groupby_attempts += 1
            fn = self.code_cache.get_or_build(key, lambda: build(cap))
            args = ([source.columns[i] for i in used], source.row_mask)
            if measure and tune_sig is not None:
                from . import feedback as fb

                (key_cols, agg_cols, exists, n_groups), secs = \
                    fb.timed_sync(fn, *args)
                self._feedback.record(tune_sig, route, secs)
                measure = False
            else:
                key_cols, agg_cols, exists, n_groups = fn(*args)
            cols = list(key_cols) + list(agg_cols)
            if layout_eff is not None:
                return ExecTable(list(node.fields), list(node.output_types),
                                 cols, layout_eff.entry_count, exists)
            n = int(n_groups)  # host sync: group count
            if n <= cap:
                break
            # group-cap overflow: the buffer clamped the tail groups, so
            # re-run with the now-known exact group count (reference:
            # OUT_OF_SLOTS -> widen-and-retry ladder, Execute.cpp:2291)
            if not self.config.exec.allow_retry:
                raise ExecError(
                    f"group count {n} exceeds buffer cap {cap} "
                    f"(exec.allow_retry disabled)")
            cap = min(nrows0, n)
            key = make_key(cap)
        trim = self.code_cache.get_or_build(
            key + f"|trim{n}",
            lambda: jax.jit(lambda cs: [
                MaskedCol(c.data[:n],
                          c.mask[:n] if c.mask is not None else None)
                for c in cs
            ]))
        return ExecTable(list(node.fields), list(node.output_types),
                         trim(cols), n)

    def _exec_fused_agg_sort(self, sort_node: nd.Sort, node: nd.Aggregate,
                             results) -> Optional[ExecTable]:
        """ONE jitted program for Aggregate -> Sort (+LIMIT window):
        group-by into the dense buffer, sort the buffer rows with dead
        groups pushed last, emit a validity window.  Kills the Q4-class
        fixed overhead of 3 dispatches + 2 host syncs (VERDICT r1 #3)."""
        source, chain, src_node = self._resolve_chain(node.inputs[0], results)
        if source.nrows == 0:
            return None
        layout = self._static_perfect_layout(node)
        key_ranges = None
        if layout is None:
            layout, key_ranges = self._dynamic_perfect_layout(
                node, source, chain, src_node)
        cap = min(source.nrows,
                  self.config.exec.group_by.default_max_groups)
        prod = None
        if key_ranges is not None:
            prod = 1
            for lo_r, hi_r, _nul in key_ranges:
                prod *= (hi_r - lo_r + 2)
                if prod > cap:
                    break
            cap = min(cap, max(prod, 1))
        self._ndv_estimate = None
        if layout is None and cap > (1 << 20):
            est = self._estimate_ndv_sample(node, source, chain, src_node)
            if est is not None:
                self._ndv_estimate = est
                cap = min(cap, max(256, est * 3))
        terminal_exprs = list(node.keys) + [
            a.operand for a in node.aggs if a.operand is not None] + [
            a.operand2 for a in node.aggs
            if getattr(a, "operand2", None) is not None]
        used = self._used_columns(src_node, chain, terminal_exprs)
        nrows0 = source.nrows
        size = len(source.fields)
        out_types = list(node.output_types)
        sf = sort_node.sort_fields
        descs = [f.desc for f in sf]
        nfs = [f.nulls_first for f in sf]
        limit, offset = sort_node.limit, sort_node.offset
        # overflow impossible when the buffer covers every row or the
        # whole key-range product: skip the group-count host sync
        can_overflow = (layout is None and cap < nrows0
                        and (prod is None or prod > cap))
        pmode = self._pallas_groupby_mode(node, layout, nrows0)

        def make_key(cap_):
            extra = ((f"layout={layout.mins}/{layout.sizes}/pl{pmode}"
                      if layout
                      else f"sortcap={cap_}/rng={key_ranges}")
                     + f"u{used}|fsort"
                     + f"{[(f.field_index, f.desc, f.nulls_first) for f in sf]}"
                     + f"/{limit}/{offset}")
            return chain_key(_schema_sig(source), chain, node,
                             self._dict_generation_sig(chain, node) + extra
                             + f"/n{nrows0}")

        def build(cap_):
            def fn(sub_cols, row_mask):
                source_cols = self._expand_cols(sub_cols, used, size)
                env, final, rm = self._chain_env(src_node, source_cols, chain,
                                                row_mask, nrows=nrows0)
                resolve = lambda ref: env[ref.node.id][ref.index]
                keys = [
                    _broadcast(self.scalar.evaluate(k, resolve), nrows0)
                    for k in node.keys
                ]
                specs = self._build_specs(node, resolve, nrows0)
                if layout is not None:
                    kc, ac, exists = gb.groupby_perfect(
                        keys, layout, specs, rm, pallas_mode=pmode)
                    n_groups = jnp.asarray(0, jnp.int32)
                    nbuf = layout.entry_count
                else:
                    kc, ac, exists, n_groups = gb.groupby_sort(
                        keys, specs, cap_, row_valid=rm,
                        key_ranges=key_ranges)
                    nbuf = cap_
                cols = list(kc) + list(ac)
                scols = [
                    self._sortable(cols[f.field_index],
                                   out_types[f.field_index])
                    for f in sf
                ]
                live = exists.sum()
                topn = (offset + limit
                        if (len(scols) == 1 and limit is not None
                            and 0 < offset + limit
                            <= self.config.exec.streaming_topn_max
                            and offset + limit < nbuf)
                        else None)
                if topn is not None:
                    # single ORDER BY key + small LIMIT: lax.top_k of
                    # the orderable key replaces the full payload sort
                    # of the group buffer (0.9 s at 5e7 groups -> ~50 ms)
                    # and the per-column output access is a topn-sized
                    # gather.  Dead groups take a strict sentinel level
                    # above every live key (same scheme as _exec_sort's
                    # streaming top-n).
                    key64 = srt.sort_keys_int64(scols, descs, nfs)[0]
                    imax = jnp.iinfo(jnp.int64).max
                    key64 = jnp.where(exists,
                                      jnp.minimum(key64, imax - 1), imax)
                    _, idx = jax.lax.top_k(~key64, topn)
                    out = [
                        MaskedCol(c.data[idx],
                                  c.mask[idx] if c.mask is not None
                                  else None)
                        for c in cols
                    ]
                    pos = jnp.arange(topn, dtype=jnp.int64)
                    end = jnp.minimum(live, offset + limit)
                    window = (pos >= offset) & (pos < end)
                    return out, window, n_groups
                # ONE payload-carrying sort (live groups first, then the
                # ORDER BY keys): argsort + per-column permutation
                # gathers cost ~1.3-2.2 s PER COLUMN at 5e7 groups
                from ..ops import sortops as so

                skeys = [~exists] + srt.sort_keys_int64(scols, descs, nfs)
                pay = so.PayloadSet()
                slots = []
                for c in cols:
                    slots.append((pay.add(c.data), pay.add(c.mask)))
                _, sorted_pay = so.sort_with_payload(skeys, pay.arrays)
                out = [
                    MaskedCol(sorted_pay[di],
                              sorted_pay[mi] if mi is not None else None)
                    for di, mi in slots
                ]
                pos = jnp.arange(nbuf, dtype=jnp.int64)
                end = (live if limit is None
                       else jnp.minimum(live, offset + limit))
                window = (pos >= offset) & (pos < end)
                return out, window, n_groups

            return jax.jit(fn)

        key = make_key(cap)
        while True:
            fn = self.code_cache.get_or_build(key, lambda: build(cap))
            cols, window, n_groups = fn(
                [source.columns[i] for i in used], source.row_mask)
            if not can_overflow:
                break
            n = int(n_groups)  # host sync only when overflow is possible
            if n <= cap:
                break
            if not self.config.exec.allow_retry:
                raise ExecError(
                    f"group count {n} exceeds buffer cap {cap} "
                    f"(exec.allow_retry disabled)")
            cap = min(nrows0, n)
            key = make_key(cap)
        # the streaming-top-n branch emits topn-sized buffers; the full
        # sort emits the whole group buffer — size from the output
        nbuf = int(window.shape[0])
        return ExecTable(list(sort_node.fields),
                         list(sort_node.output_types), cols, nbuf, window)

    def _dist_group_cap(self, node, ndev: int, rows_per_shard: int) -> int:
        """Per-shard group capacity: bounded by the NDV estimate when key
        ranges bound it (exec/cost.py — the cost-model partition-sizing
        seam, reference: RelAlgExecutor.cpp:691-860 partition sizing);
        undershoot is safe (overflow feeds the widen-and-retry ladder)."""
        from . import cost as _cost

        cap = max(64, min(
            self.config.exec.group_by.default_max_groups // ndev,
            rows_per_shard * 2))
        ndv = _cost._ndv_bound(node)
        if ndv is not None and ndv < cap * ndev:
            # keys hash-partition across shards; 2x slack absorbs
            # imbalance before the retry ladder has to act
            cap = max(64, min(cap, int(ndv // ndev * 2 + 64)))
        elif getattr(self, "_ndv_estimate", None) is not None:
            # unbounded keys: the sampling estimator (Chao84,
            # _estimate_ndv_sample) sizes the per-shard buffer; 3x slack
            # absorbs hash imbalance + estimator error before a retry
            cap = max(64, min(cap, self._ndv_estimate // ndev * 3 + 64))
        return cap

    def _jitted_dist_groupby(self, run, plan_key, node, rows_per_shard,
                             group_cap, slack, shared_salt=False):
        """ONE compiled program for a whole distributed group-by route
        (parallel/dist_groupby.py).  shard_map without jit executes one
        eager dispatch per primitive — measured 45 s/query for the
        pair-split route at 5e5 rows on a 2-device mesh vs a single
        fused program.  AggSpecs are rebuilt inside the trace so the
        jitted callable caches on the plan key."""
        import dataclasses as _dc
        from ..parallel import dist_groupby as dg

        key = (plan_key
               + f"|{run.__name__}/{rows_per_shard}/{group_cap}/{slack}")

        def build():
            def fn(keys, operands, rm):
                specs = [
                    gb.AggSpec(a.kind, op, a.type, a.distinct, a.arg1,
                               a.interpolation, op2,
                               **self._sketch_kwargs())
                    for a, (op, op2) in zip(node.aggs, operands)
                ]
                if shared_salt:
                    # the split route requires all distinct-class specs
                    # to reference the same operand value
                    salt = next(s.operand for s in specs
                                if dg._is_distinct_class(s))
                    specs = [_dc.replace(s, operand=salt)
                             if dg._is_distinct_class(s) else s
                             for s in specs]
                return run(self._mesh, keys, specs, rows_per_shard,
                           group_cap, axis=self.config.dist.mesh_axis,
                           slack=slack, row_valid=rm)

            return jax.jit(fn)

        return self.code_cache.get_or_build(key, build)

    def _exec_aggregate_dist(self, node, source, chain, src_node, used,
                             size, plan_key):
        """Two-phase distributed aggregation over the session mesh
        (parallel/dist_groupby.py).  Returns None to fall back (e.g.
        shuffle overflow -> the retry ladder re-runs via GSPMD)."""
        from ..parallel import dist_groupby as dg

        ndev = self._mesh.devices.size
        nrows0 = source.nrows

        # evaluate the chain + key/operand exprs sharded (GSPMD)
        prep = self.code_cache.get_or_build(
            plan_key + "|distprep",
            lambda: jax.jit(self._build_prep_fn(node, chain, src_node, used,
                                                size, nrows0)))
        keys, operands, rm = prep([source.columns[i] for i in used],
                                  source.row_mask)
        rows_per_shard = max(1, nrows0 // ndev)
        group_cap = self._dist_group_cap(node, ndev, rows_per_shard)
        # widen-and-retry ladder: shuffle-slot or receiver group-cap
        # overflow doubles the capacities and re-runs (reference:
        # Execute.cpp:2291 slot widening); exhausted -> GSPMD fallback
        slack = 2.0
        attempts = 3 if self.config.exec.allow_retry else 1
        self._dist_agg_route = "two_phase"
        for _ in range(attempts):
            fn = self._jitted_dist_groupby(
                dg.dist_groupby_two_phase, plan_key, node, rows_per_shard,
                group_cap, slack)
            key_cols, agg_cols, gvalid, overflow = fn(keys, operands, rm)
            if int(overflow) == 0:
                cols = list(key_cols) + list(agg_cols)
                return ExecTable(list(node.fields), list(node.output_types),
                                 cols, ndev * group_cap, gvalid)
            _LOG.warning("dist agg overflow (%d): widening to "
                         "group_cap=%d slack=%.1f", int(overflow),
                         group_cap * 2, slack * 2.0)
            group_cap *= 2
            slack *= 2.0
        return None

    def _distinct_split_applicable(self, node) -> bool:
        """True when every aggregate is algebraic or DISTINCT-class with
        one shared operand expression — the shape the skew-proof
        pair-split distribution handles (SURVEY §7.3 heavy hitters)."""
        def is_dist(a):
            return (a.kind == ir.AggKind.COUNT_DISTINCT
                    or (a.distinct and a.kind in (ir.AggKind.SUM,
                                                  ir.AggKind.AVG)))
        dists = [a for a in node.aggs if is_dist(a)]
        if not dists:
            return False
        if not all(is_dist(a) or (a.kind in _TWO_PHASE_KINDS
                                  and not a.distinct)
                   for a in node.aggs):
            return False
        op0 = dists[0].operand
        return all(d.operand == op0 for d in dists[1:])

    def _estimate_ndv_sample(self, node: nd.Aggregate, source: ExecTable,
                             chain: List[nd.Node],
                             src_node: nd.Node) -> Optional[int]:
        """Sampling NDV estimator for unbounded group keys (reference:
        estimator-as-mini-query, CardinalityEstimator.h:59 NDVEstimator).

        A strided host sample of the raw key columns feeds the Chao84
        estimator (u + f1^2 / 2*f2 over sample tuple counts) — for
        uniform high-NDV keys the birthday-collision doubleton count
        recovers the population NDV from a 64K sample within a few
        percent; for low-NDV keys it converges to the observed count.
        The result seeds group caps so unbounded int keys compile one
        right-sized program instead of a default_max_groups-sized buffer
        (an UNDERestimate only costs one widen-retry — the ladder is the
        safety net, the estimator is the fast path).

        None = not estimable (key exprs aren't plain source columns, or
        sampling disabled)."""
        s_cfg = int(self.config.exec.group_by.ndv_sample_size)
        if s_cfg <= 0 or source.nrows == 0:
            return None
        aliases = {src_node.id}
        for n_ in chain:
            if isinstance(n_, nd.Project):
                return None  # projection rebinds the namespace
            aliases.add(n_.id)
        idxs = []
        for k in node.keys:
            if isinstance(k, ir.ColumnRef) and k.node.id in aliases:
                idxs.append(k.index)
            else:
                return None
        import pandas as pd

        nrows = source.nrows
        s = min(s_cfg, nrows)
        stride = max(1, nrows // s)
        frame = {}
        for j, i in enumerate(idxs):
            c = source.columns[i]
            frame[f"k{j}"] = np.asarray(
                jax.device_get(c.data[::stride][:s]))
            if c.mask is not None:
                frame[f"m{j}"] = np.asarray(
                    jax.device_get(c.mask[::stride][:s]))
        vc = pd.DataFrame(frame).value_counts(dropna=False)
        u = len(vc)
        if u == 0:
            return None
        f1 = int((vc == 1).sum())
        f2 = int((vc == 2).sum())
        est = u + (f1 * f1) / (2.0 * max(f2, 1))
        return int(min(max(est, u), nrows))

    def _probe_hot_key_share(self, keys, nrows: int) -> float:
        """Estimated hottest-key row share from a host-side prefix sample
        (``DistConfig.skew_sample_size`` rows).  Drives the raw-shuffle
        vs pair-split choice (reference analog: partition sizing sampling,
        RelAlgExecutor.cpp:691-860)."""
        import numpy as np
        import pandas as pd
        s = min(int(self.config.dist.skew_sample_size), nrows)
        if s <= 0:
            return 1.0  # unknown: assume the worst, stay skew-proof
        frame = {}
        for i, k in enumerate(keys):
            arr = np.asarray(jax.device_get(k.data[:s]))
            if k.mask is not None:
                m = np.asarray(jax.device_get(k.mask[:s]))
                arr = np.where(m, arr, arr.dtype.type(0))
                frame[f"m{i}"] = m
            frame[f"k{i}"] = arr
        counts = pd.DataFrame(frame).value_counts(dropna=False)
        return float(counts.iloc[0]) / float(s) if len(counts) else 0.0

    def _exec_aggregate_dist_distinct(self, node, source, chain, src_node,
                                      used, size, plan_key):
        """DISTINCT-class distributed aggregation.  Probes for key skew:
        under the ``heavy_hitter_threshold`` the cheaper raw-row shuffle
        runs (one all_to_all); above it the skew-proof pair-split route
        (parallel/dist_groupby.dist_groupby_distinct_split) spreads hot
        keys by (key, value) hash.  None -> GSPMD fallback."""
        from ..parallel import dist_groupby as dg

        ndev = self._mesh.devices.size
        nrows0 = source.nrows

        prep = self.code_cache.get_or_build(
            plan_key + "|distprep",
            lambda: jax.jit(self._build_prep_fn(node, chain, src_node, used,
                                                size, nrows0)))
        keys, operands, rm = prep([source.columns[i] for i in used],
                                  source.row_mask)
        rows_per_shard = max(1, nrows0 // ndev)
        group_cap = self._dist_group_cap(node, ndev, rows_per_shard)
        hot = self._probe_hot_key_share(keys, nrows0)
        split = hot > self.config.dist.heavy_hitter_threshold / ndev
        run = (dg.dist_groupby_distinct_split if split
               else dg.dist_groupby_shuffled)
        self._dist_agg_route = "distinct_split" if split else "shuffled"
        slack = 2.0
        attempts = 3 if self.config.exec.allow_retry else 1
        for _ in range(attempts):
            fn = self._jitted_dist_groupby(
                run, plan_key, node, rows_per_shard, group_cap, slack,
                shared_salt=(run is dg.dist_groupby_distinct_split))
            key_cols, agg_cols, gvalid, overflow = fn(keys, operands, rm)
            if int(overflow) == 0:
                cols = list(key_cols) + list(agg_cols)
                return ExecTable(list(node.fields), list(node.output_types),
                                 cols, ndev * group_cap, gvalid)
            _LOG.warning("dist agg overflow (%d): widening to "
                         "group_cap=%d slack=%.1f", int(overflow),
                         group_cap * 2, slack * 2.0)
            group_cap *= 2
            slack *= 2.0
            if not split:  # raw shuffle overflowed: skew was real after
                run = dg.dist_groupby_distinct_split  # all -> go skew-proof
                self._dist_agg_route = "distinct_split"
                split = True
        return None

    def _exec_aggregate_dist_shuffled(self, node, source, chain, src_node,
                                      used, size, plan_key):
        """Raw-row shuffle distribution for holistic aggregates
        (parallel/dist_groupby.dist_groupby_shuffled) with the
        widen-and-retry ladder; None -> GSPMD fallback."""
        from ..parallel import dist_groupby as dg

        ndev = self._mesh.devices.size
        nrows0 = source.nrows

        prep = self.code_cache.get_or_build(
            plan_key + "|distprep",
            lambda: jax.jit(self._build_prep_fn(node, chain, src_node, used,
                                                size, nrows0)))
        keys, operands, rm = prep([source.columns[i] for i in used],
                                  source.row_mask)
        rows_per_shard = max(1, nrows0 // ndev)
        group_cap = self._dist_group_cap(node, ndev, rows_per_shard)
        slack = 2.0
        attempts = 3 if self.config.exec.allow_retry else 1
        self._dist_agg_route = "shuffled"
        for _ in range(attempts):
            fn = self._jitted_dist_groupby(
                dg.dist_groupby_shuffled, plan_key, node, rows_per_shard,
                group_cap, slack)
            key_cols, agg_cols, gvalid, overflow = fn(keys, operands, rm)
            if int(overflow) == 0:
                cols = list(key_cols) + list(agg_cols)
                return ExecTable(list(node.fields), list(node.output_types),
                                 cols, ndev * group_cap, gvalid)
            _LOG.warning("dist agg overflow (%d): widening to "
                         "group_cap=%d slack=%.1f", int(overflow),
                         group_cap * 2, slack * 2.0)
            group_cap *= 2
            slack *= 2.0
        return None

    def _build_prep_fn(self, node, chain, src_node, used, size, nrows0):
        def fn(sub_cols, row_mask):
            source_cols = self._expand_cols(sub_cols, used, size)
            env, final, rm = self._chain_env(src_node, source_cols, chain,
                                            row_mask, nrows=nrows0)
            resolve = lambda ref: env[ref.node.id][ref.index]
            keys = [
                _broadcast(self.scalar.evaluate(k, resolve), nrows0)
                for k in node.keys
            ]
            operands = []
            for a in node.aggs:
                op = (_broadcast(self.scalar.evaluate(a.operand, resolve),
                                 nrows0) if a.operand is not None else None)
                op2 = (_broadcast(self.scalar.evaluate(a.operand2, resolve),
                                  nrows0)
                       if getattr(a, "operand2", None) is not None else None)
                operands.append((op, op2))
            return keys, operands, rm

        return fn

    # -- fragment-streamed aggregation (reference: per-fragment kernels,
    # QueryFragmentDescriptor.h:64): a scan whose used columns exceed
    # the budget executes chunk-by-chunk over fragment groups with ONE
    # compiled program and elementwise partial-slot merging — a table
    # larger than HBM streams through the device, and the watchdog gets
    # a check point per chunk.
    def _fragment_stream_plan(self, node, source, chain, src_node, used):
        """None, or (table, chunks, chunk_rows): consecutive-fragment
        chunks covering the scan, all padded to ``chunk_rows``."""
        from ..parallel.dist_groupby import _COMBINE

        # dist sessions stream too (VERDICT-r2 gap): chunks device_put
        # row-sharded, GSPMD runs the per-chunk perfect agg; a scan-pad
        # row_mask is irrelevant because chunks re-slice the host table
        if source.row_mask is not None and self._mesh is None:
            return None
        if isinstance(source.columns, _PrunedScanColumns):
            return None  # pruning already shrank the resident data
        if not isinstance(src_node, nd.Scan):
            return None
        if not all(a.kind in _COMBINE and not a.distinct
                   and a.kind != ir.AggKind.APPROX_QUANTILE
                   for a in node.aggs):
            return None
        # window functions see ALL rows by definition — a per-chunk
        # evaluation would restart them at every chunk boundary
        from .optimizer import _contains_window

        for n_ in chain:
            exprs = (n_.exprs if isinstance(n_, nd.Project)
                     else [n_.condition])
            if any(_contains_window(e) for e in exprs):
                return None
        if any(_contains_window(e)
               for e in list(node.keys)
               + [a.operand for a in node.aggs if a.operand is not None]):
            return None
        table = src_node.table
        frags = table.fragments
        if len(frags) < 2 or table.nrows == 0:
            return None
        bpr = 0  # bytes per row over used columns
        for i in used:
            col = table.column(source.fields[i])
            bpr += col.data.dtype.itemsize + (
                1 if col.validity is not None else 0)
        budget = (self.config.exec.scan_stream_bytes
                  or self.config.storage.device_cache_budget_bytes // 2)
        if bpr * table.nrows <= budget:
            return None
        target = max(1, budget // max(bpr, 1))
        chunks = []
        cur_start = None
        cur_rows = 0
        for (r0, r1) in frags:
            if cur_start is None:
                cur_start, cur_rows = r0, r1 - r0
            elif cur_rows + (r1 - r0) > target:
                chunks.append((cur_start, r0))
                cur_start, cur_rows = r0, r1 - r0
            else:
                cur_rows += r1 - r0
        chunks.append((cur_start, frags[-1][1]))
        if len(chunks) < 2:
            return None
        chunk_rows = max(r1 - r0 for r0, r1 in chunks)
        if self._mesh is not None:  # shardable chunk shape
            ndev = self._mesh.devices.size
            chunk_rows += (-chunk_rows) % ndev
        return table, chunks, chunk_rows

    def _exec_aggregate_fragmented(self, node, source, chain, src_node,
                                   used, size, layout, plan) -> ExecTable:
        from ..parallel.dist_groupby import _COMBINE

        table, chunks, chunk_rows = plan
        self._frag_stream_chunks = len(chunks)
        n = layout.entry_count if layout is not None else 1
        key = chain_key(
            _schema_sig(source), chain, node,
            self._dict_generation_sig(chain, node)
            + f"fragstream/{n}/{chunk_rows}/u{used}"
            + (f"/l{layout.mins}{layout.sizes}" if layout else ""))

        def build():
            def fn(sub_cols, pad_valid):
                source_cols = self._expand_cols(sub_cols, used, size)
                env, final, rm = self._chain_env(
                    src_node, source_cols, chain, pad_valid,
                    nrows=chunk_rows)
                resolve = lambda ref: env[ref.node.id][ref.index]
                specs = self._build_specs(node, resolve, chunk_rows)
                if layout is not None:
                    keys = [
                        _broadcast(self.scalar.evaluate(k, resolve),
                                   chunk_rows)
                        for k in node.keys
                    ]
                    gid, in_range = gb.perfect_gid(keys, layout, rm)
                else:
                    live = (jnp.ones((chunk_rows,), jnp.bool_)
                            if rm is None else rm)
                    gid = jnp.where(live, 0, 1).astype(jnp.int32)
                    in_range = live
                slots = [gb._agg_slots(s, gid, in_range, n, False).slots
                         for s in specs]
                exists = gb._seg_sum(in_range, gid, n + 1, False)[:n] > 0
                return slots, exists

            return jax.jit(fn)

        def combine_build():
            def fn(acc, slots, acc_exists, exists):
                out = []
                for a_spec, acc_s, new_s in zip(node.aggs, acc, slots):
                    rules = _COMBINE[a_spec.kind]
                    merged = []
                    for rule, a, b in zip(rules, acc_s, new_s):
                        if rule == "sum":
                            merged.append(a + b)
                        elif rule == "min":
                            merged.append(jnp.minimum(a, b))
                        else:
                            merged.append(jnp.maximum(a, b))
                    out.append(merged)
                return out, acc_exists | exists

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        combine = self.code_cache.get_or_build(key + "|comb", combine_build)
        sharding = None
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(self._mesh,
                                     PartitionSpec(self._mesh.axis_names[0]))

        def put(arr):
            return (jnp.asarray(arr) if sharding is None
                    else jax.device_put(np.asarray(arr), sharding))

        acc = exists = None
        for (r0, r1) in chunks:
            rows = r1 - r0
            sub_cols = []
            for i in used:
                col = table.column(source.fields[i])
                data = np.asarray(col.data[r0:r1])
                mask = (np.asarray(col.validity[r0:r1])
                        if col.validity is not None else None)
                if rows < chunk_rows:
                    pad = chunk_rows - rows
                    data = np.concatenate(
                        [data, np.zeros((pad,) + data.shape[1:],
                                        data.dtype)])
                    if mask is not None:
                        mask = np.concatenate(
                            [mask, np.zeros((pad,) + mask.shape[1:],
                                            np.bool_)])
                sub_cols.append(MaskedCol(
                    put(data), put(mask) if mask is not None else None))
            pad_valid = (None if rows == chunk_rows else
                         put(np.arange(chunk_rows) < rows))
            slots, ex = fn(sub_cols, pad_valid)
            if acc is None:
                acc, exists = slots, ex
            else:
                acc, exists = combine(acc, slots, exists, ex)
            self._check_watchdog_budget()

        agg_cols = []
        for a, slots in zip(node.aggs, acc):
            spec = gb.AggSpec(a.kind, None, a.type, a.distinct, a.arg1,
                              a.interpolation, **self._sketch_kwargs())
            agg_cols.append(gb.AggResult(list(slots)).finalize(spec, None))
        if layout is not None:
            key_cols = gb.perfect_key_columns_from_types(
                [k.type for k in node.keys], layout)
            return ExecTable(list(node.fields), list(node.output_types),
                             key_cols + agg_cols, n, exists)
        cols = [MaskedCol(c.data, c.mask) for c in agg_cols]
        return ExecTable(list(node.fields), list(node.output_types), cols, 1)

    def _check_watchdog_budget(self) -> None:
        """Mid-step deadline check between fragment chunks — finer
        granularity than the reference's between-kernel checks allow us
        otherwise (DynamicWatchdog.h:26-28; an XLA program itself is
        not interruptible, but the chunk loop is)."""
        if self._deadline is not None and _time.monotonic() > self._deadline:
            raise ExecError("watchdog: query time budget exceeded")

    def _agg_nogroup(self, node: nd.Aggregate, source: ExecTable,
                     chain, src_node) -> ExecTable:
        terminal_exprs = [a.operand for a in node.aggs
                          if a.operand is not None]
        used = self._used_columns(src_node, chain, terminal_exprs)
        key = chain_key(_schema_sig(source), chain, node,
                        self._dict_generation_sig(chain, node)
                        + f"nogroup/u{used}/n{source.nrows}")
        nrows0 = source.nrows
        size = len(source.fields)
        plan = self._fragment_stream_plan(node, source, chain, src_node,
                                          used)
        if plan is not None:
            return self._exec_aggregate_fragmented(
                node, source, chain, src_node, used, size, None, plan)

        def build():
            def fn(sub_cols, row_mask):
                source_cols = self._expand_cols(sub_cols, used, size)
                env, final, rm = self._chain_env(src_node, source_cols, chain,
                                                row_mask, nrows=nrows0)
                resolve = lambda ref: env[ref.node.id][ref.index]
                specs = self._build_specs(node, resolve, nrows0)
                scalars = gb.nogroup_agg(specs, nrows0, rm)
                return [
                    MaskedCol(jnp.reshape(s.data, (1,)),
                              jnp.reshape(s.mask, (1,))
                              if s.mask is not None else None)
                    for s in scalars
                ]

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        cols = fn([source.columns[i] for i in used], source.row_mask)
        return ExecTable(list(node.fields), list(node.output_types), cols, 1)

    def _build_specs(self, node: nd.Aggregate, resolve, nrows) -> List[gb.AggSpec]:
        specs = []
        for agg in node.aggs:
            operand = None
            if agg.operand is not None:
                operand = _broadcast(
                    self.scalar.evaluate(agg.operand, resolve), nrows)
            operand2 = None
            if getattr(agg, "operand2", None) is not None:
                operand2 = _broadcast(
                    self.scalar.evaluate(agg.operand2, resolve), nrows)
            specs.append(gb.AggSpec(agg.kind, operand, agg.type, agg.distinct,
                                    agg.arg1, agg.interpolation, operand2,
                                    **self._sketch_kwargs()))
        return specs

    def _sketch_kwargs(self):
        g = self.config.exec.group_by
        return dict(hll_p=g.hll_precision, hll_budget=g.hll_register_budget,
                    td_c=g.tdigest_centroids,
                    td_budget=g.tdigest_centroid_budget)

    def _pallas_groupby_mode(self, node: nd.Aggregate, layout,
                             nrows: int) -> Optional[str]:
        """Route eligible COUNT-class perfect-hash aggregations through
        the Pallas one-hot-matmul kernel (ops/pallas_groupby.py) in the
        512 < entries <= ~4096 window.  Opt-in (exec.prefer_pallas_groupby):
        the factored one-hot contraction (ops/onehot.py) measured 3x
        faster, so the default path is XLA.  f32 accumulation is exact
        for counts below 2^24 rows."""
        if not self.config.exec.prefer_pallas_groupby:
            return None
        if layout is None or layout.entry_count <= gb.DENSE_SCATTER_LIMIT:
            return None
        if nrows >= (1 << 24):
            return None
        if not all(a.kind == ir.AggKind.COUNT and not a.distinct
                   for a in node.aggs):
            return None
        from ..ops import pallas_groupby as pk

        n_slots = 1 + sum(
            1 for a in node.aggs
            if a.operand is not None and a.operand.type.nullable)
        if not pk.supported2(layout.entry_count, n_slots):
            return None
        if self.config.exec.interpret_pallas:
            return "interpret"
        return "real" if jax.default_backend() != "cpu" else None

    def _static_perfect_layout(self, node: nd.Aggregate):
        ranges = []
        for k in node.keys:
            ok = (k.type.is_integer() or k.type.is_boolean()
                  or k.type.is_dict_encoded_string()
                  or (k.type.is_date()
                      and k.type.unit == t.TimeUnit.DAY))  # type: ignore[attr-defined]
            if not ok:
                return None
            r = rng.infer_range(k)
            if r is None:
                return None
            ranges.append(r)
        return gb.choose_perfect_layout(
            [k.type for k in node.keys], ranges,
            self.config.exec.group_by.perfect_hash_entries_limit)

    def _dynamic_perfect_layout(self, node: nd.Aggregate, source: ExecTable,
                                chain, src_node):
        """Probe key min/max with a jitted reduction when fragment stats
        can't bound the expression (e.g. cast(float as int) keys)."""
        for k in node.keys:
            ok = (k.type.is_integer() or k.type.is_boolean()
                  or k.type.is_dict_encoded_string()
                  or (k.type.is_date()
                      and k.type.unit == t.TimeUnit.DAY))  # type: ignore[attr-defined]
            if not ok:
                return None, None
        key = chain_key(_schema_sig(source), chain, node,
                        self._dict_generation_sig(chain, node)
                        + f"rangeprobe/n{source.nrows}")
        used = self._used_columns(src_node, chain, list(node.keys))
        # key on the *used* columns only: unused columns stay lazy
        cache_objs = [source.columns[i].data for i in used] + [source.row_mask]
        cached = self._layout_cache.get(key, cache_objs)
        if cached is not None:
            return cached
        nrows0 = source.nrows
        size = len(source.fields)

        def build():
            def fn(sub_cols, row_mask):
                source_cols = self._expand_cols(sub_cols, used, size)
                env, final, rm = self._chain_env(src_node, source_cols, chain,
                                                row_mask, nrows=nrows0)
                resolve = lambda ref: env[ref.node.id][ref.index]
                out = []
                for kx in node.keys:
                    v = _broadcast(self.scalar.evaluate(kx, resolve), nrows0)
                    data = v.data.astype(jnp.int64)
                    live = combine_masks(v.mask, rm)
                    if live is not None:
                        big = jnp.iinfo(jnp.int64)
                        lo = jnp.min(jnp.where(live, data, big.max))
                        hi = jnp.max(jnp.where(live, data, big.min))
                    else:
                        lo = jnp.min(data)
                        hi = jnp.max(data)
                    out.append(jnp.stack([lo, hi]))
                return jnp.stack(out)  # (n_keys, 2): ONE host transfer

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        probed = np.asarray(fn([source.columns[i] for i in used],
                               source.row_mask))  # host sync
        ranges = []
        for (lo_i, hi_i), k in zip(probed.tolist(), node.keys):
            if lo_i > hi_i:  # no live rows
                lo_i, hi_i = 0, 0
            ranges.append((int(lo_i), int(hi_i), k.type.nullable))
        layout = gb.choose_perfect_layout(
            [k.type for k in node.keys], ranges,
            self.config.exec.group_by.perfect_hash_entries_limit)
        result = (layout, tuple(ranges))
        self._layout_cache.put(key, cache_objs, result)
        return result

    # ------------------------------------------------------------------
    def _exec_sort(self, node: nd.Sort, results) -> ExecTable:
        source, chain, src_node = self._resolve_chain(node.inputs[0], results)
        if source.nrows == 0 or not node.sort_fields:
            inp = (self._exec_chain_root(node.inputs[0], results)
                   if chain else source)
            inp = inp.compact()
            if node.limit is not None or node.offset:
                idx = jnp.arange(inp.nrows, dtype=jnp.int32)
                return inp.gather(srt.apply_limit(idx, node.limit, node.offset))
            return inp
        sort_types = [node.inputs[0].output_types[f.field_index]
                      for f in node.sort_fields]
        has_proj = any(isinstance(n, nd.Project) for n in chain)
        used = (list(range(len(source.fields))) if not has_proj
                else self._used_columns(src_node, chain, []))
        key = chain_key(_schema_sig(source), chain, node,
                        self._dict_generation_sig(chain, node)
                        + f"u{used}/n{source.nrows}")
        nrows0 = source.nrows
        size = len(source.fields)

        # streaming top-n: one sort key + small LIMIT -> lax.top_k of the
        # orderable key instead of a full sort (reference: StreamingTopN,
        # per-fragment heaps; ties resolve by row order like stable sort)
        topn = None
        if (len(node.sort_fields) == 1 and node.limit is not None
                and 0 < node.offset + node.limit
                <= self.config.exec.streaming_topn_max
                and node.offset + node.limit < source.nrows):
            topn = node.offset + node.limit

        # distributed sessions: full sorts route through the sampled
        # range-partition sort (parallel/dist_sort.py); small-LIMIT sorts
        # keep the global top_k fast path (GSPMD parallelizes it)
        if topn is None and self._mesh is not None:
            out = self._exec_sort_dist(node, results)
            if out is not None:
                return out

        def build():
            def fn(sub_cols, row_mask):
                source_cols = self._expand_cols(sub_cols, used, size)
                env, final, rm = self._chain_env(src_node, source_cols, chain,
                                                row_mask, nrows=nrows0)
                cols = env[final.id]
                scols = [
                    self._sortable(cols[f.field_index], ty)
                    for f, ty in zip(node.sort_fields, sort_types)
                ]
                if topn is not None:
                    f0 = node.sort_fields[0]
                    col0 = scols[0]
                    key = gb._orderable_int64(col0.data)
                    if f0.desc:
                        key = ~key
                    imin = jnp.iinfo(jnp.int64).min
                    imax = jnp.iinfo(jnp.int64).max
                    if col0.mask is not None or rm is not None:
                        # reserve strict sentinel levels: live-real keys <
                        # live-NULL (nulls-last) < filtered-dead rows, so a
                        # dead row can never displace a live row inside the
                        # LIMIT window (costs key resolution only at the 3
                        # extreme int64 values, where ties break by row id)
                        key = jnp.clip(key, imin + 1, imax - 2)
                    if col0.mask is not None:
                        sentinel = imin if f0.nulls_first else imax - 1
                        key = jnp.where(col0.mask, key, sentinel)
                    if rm is not None:
                        key = jnp.where(rm, key, imax)
                    _, perm = jax.lax.top_k(~key, topn)
                    perm = perm.astype(jnp.int32)
                    out = [
                        MaskedCol(c.data[perm],
                                  c.mask[perm] if c.mask is not None else None)
                        for c in cols
                    ]
                else:
                    # ONE payload-carrying sort: argsort + per-column
                    # permutation gathers cost ~1.3-2.2 s per column at
                    # 1e8 rows (ops/sortops.py header)
                    from ..ops import sortops as so

                    skeys = srt.sort_keys_int64(
                        scols, [f.desc for f in node.sort_fields],
                        [f.nulls_first for f in node.sort_fields])
                    if rm is not None:  # dead rows last
                        skeys = [~rm] + skeys
                    pay = so.PayloadSet()
                    slots = []
                    # array (2D) columns can't ride lax.sort directly:
                    # carry one row-index payload and permute them after
                    n_in = cols[0].data.shape[0] if cols else 0
                    need_perm = any(
                        c.data.ndim > 1
                        or (c.mask is not None and c.mask.ndim > 1)
                        for c in cols)
                    perm_slot = (pay.add(jax.lax.iota(jnp.int32, n_in))
                                 if need_perm else None)
                    for c in cols:
                        di = pay.add(c.data) if c.data.ndim == 1 else None
                        mi = (pay.add(c.mask)
                              if c.mask is not None and c.mask.ndim == 1
                              else None)
                        slots.append((di, mi))
                    sorted_keys, sorted_pay = so.sort_with_payload(
                        skeys, pay.arrays)
                    if rm is not None:
                        rm = ~sorted_keys[0]
                    perm = (sorted_pay[perm_slot] if perm_slot is not None
                            else None)
                    out = []
                    for c, (di, mi) in zip(cols, slots):
                        data = (sorted_pay[di] if di is not None
                                else c.data[perm])
                        if c.mask is None:
                            mask = None
                        else:
                            mask = (sorted_pay[mi] if mi is not None
                                    else c.mask[perm])
                        out.append(MaskedCol(data, mask))
                # LIMIT/OFFSET as an in-jit validity window: no host sync,
                # no data-dependent shapes
                nrows = out[0].data.shape[0] if out else 0
                live = (jnp.asarray(nrows, jnp.int64) if rm is None
                        else rm.sum())
                pos = jnp.arange(nrows, dtype=jnp.int64)
                end = live if node.limit is None else jnp.minimum(
                    live, node.offset + node.limit)
                window = (pos >= node.offset) & (pos < end)
                return out, window

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        cols, window = fn([source.columns[i] for i in used], source.row_mask)
        out_rows = int(cols[0].data.shape[0]) if cols else source.nrows
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         out_rows, window)

    def _exec_sort_dist(self, node: nd.Sort, results) -> Optional[ExecTable]:
        """Range-partitioned distributed sort (SURVEY.md P7): rows stay
        sharded; shard-order concatenation is the global ORDER BY order.
        Returns None to fall back (tiny inputs, overflow exhaustion)."""
        from ..parallel.dist_sort import dist_sort

        mesh = self._mesh
        ndev = mesh.devices.size
        table = self._input_table_masked(node.inputs[0], results)
        if table.nrows < ndev * 4:
            return None
        table = self._pad_rows(table, ndev)
        in_types = node.inputs[0].output_types
        sort_types = [in_types[f.field_index] for f in node.sort_fields]
        scols = [
            self._sortable(table.columns[f.field_index], ty)
            for f, ty in zip(node.sort_fields, sort_types)
        ]
        descs = [f.desc for f in node.sort_fields]
        nfs = [f.nulls_first for f in node.sort_fields]
        rows_per_shard = table.nrows // ndev
        axis = self.config.dist.mesh_axis
        from .codecache import _h

        plan_sig = _h(["distsort", _schema_sig(table), table.nrows, ndev,
                       tuple((f.field_index, f.desc, f.nulls_first)
                             for f in node.sort_fields)])
        slack = 2.0
        attempts = 3 if self.config.exec.allow_retry else 1
        for _ in range(attempts):
            fn = self.code_cache.get_or_build(
                plan_sig + f"|s{slack}",
                lambda: jax.jit(functools.partial(
                    dist_sort, mesh, descs=descs, nulls_firsts=nfs,
                    rows_per_shard=rows_per_shard, axis=axis, slack=slack)))
            cols, valid, overflow = fn(scols, payload_cols=list(table.columns),
                                       row_valid=table.row_mask)
            if int(overflow) == 0:
                break
            slack *= 2.0
        else:
            return None
        out_rows = int(valid.shape[0])
        if node.limit is not None or node.offset:
            end = (None if node.limit is None else node.offset + node.limit)
            win_fn = self.code_cache.get_or_build(
                plan_sig + f"|win{node.offset}/{end}",
                lambda: jax.jit(lambda v: v & (
                    lambda pos: (pos >= node.offset)
                    & (pos < (v.sum() if end is None else
                              jnp.minimum(v.sum(), end)))
                )(jnp.cumsum(v.astype(jnp.int64)) - 1)))
            valid = win_fn(valid)
        return ExecTable(list(node.fields), list(node.output_types),
                         list(cols), out_rows, valid)

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
    def _materialize_input(self, node: nd.Node, results) -> ExecTable:
        """Dense ExecTable for a join/union input (compacts lazily)."""
        source, chain, src_node = self._resolve_chain(node, results)
        if not chain:
            return source.compact()
        return self._exec_chain_root(node, results).compact()

    def _input_table_masked(self, node: nd.Node, results) -> ExecTable:
        """Join/union input WITHOUT compaction: keeps the row_mask (and
        any sharding) so distributed operators consume rows in place."""
        source, chain, src_node = self._resolve_chain(node, results)
        if not chain:
            return source
        return self._exec_chain_root(node, results)

    def _pad_rows(self, table: ExecTable, multiple: int) -> ExecTable:
        """Pad the row axis to a multiple of the shard count; padding
        rides the row_mask as dead rows."""
        pad = (-table.nrows) % multiple
        if pad == 0:
            return table
        key = f"padrows/{_schema_sig(table)}/{table.nrows}+{pad}"

        def build():
            def fn(cols, rm):
                out = []
                for c in cols:
                    data = jnp.concatenate(
                        [c.data,
                         jnp.zeros((pad,) + c.data.shape[1:], c.data.dtype)])
                    mask = None
                    if c.mask is not None:
                        mask = jnp.concatenate(
                            [c.mask,
                             jnp.zeros((pad,) + c.mask.shape[1:],
                                       jnp.bool_)])
                    out.append(MaskedCol(data, mask))
                base = (jnp.ones((table.nrows,), jnp.bool_) if rm is None
                        else rm)
                return out, jnp.concatenate(
                    [base, jnp.zeros((pad,), jnp.bool_)])

            return jax.jit(fn)

        fn = self.code_cache.get_or_build(key, build)
        cols, rm = fn(list(table.columns), table.row_mask)
        return ExecTable(table.fields, table.types, cols,
                         table.nrows + pad, rm)

    # ------------------------------------------------------------------
    def _exec_join_dist(self, node: nd.Join, results) -> Optional[ExecTable]:
        """Mesh-distributed join (parallel/dist_join.py): replicated-
        build when the build side is small, shuffle-partitioned
        otherwise.  Returns None to fall back to the single-device path
        (empty inputs, unsupported residuals)."""
        from ..parallel import dist_join as dj

        jt = node.join_type
        if node.residual is not None and jt != nd.JoinType.INNER:
            return None
        mesh = self._mesh
        ndev = mesh.devices.size
        lhs = self._input_table_masked(node.inputs[0], results)
        rhs = self._input_table_masked(node.inputs[1], results)
        if lhs.nrows < ndev or rhs.nrows == 0 or ndev <= 1:
            return None
        lhs = self._pad_rows(lhs, ndev)

        def eval_keys(exprs, table):
            resolve = (lambda ref: table.columns[ref.index])
            return [
                _broadcast(self.scalar.evaluate(e, resolve), table.nrows)
                for e in exprs
            ]

        lhs_keys = eval_keys([l for l, _ in node.key_pairs], lhs)

        from .codecache import _h, expr_sig

        sig_ids = {node.inputs[0].id: "L", node.inputs[1].id: "R"}
        plan_sig = _h([
            "distjoin",
            ";".join(f"{expr_sig(l, sig_ids)}={expr_sig(r, sig_ids)}"
                     for l, r in node.key_pairs),
            jt.value, _schema_sig(lhs), _schema_sig(rhs),
            lhs.nrows, rhs.nrows, ndev,
        ])
        axis = self.config.dist.mesh_axis

        # strategy choice from the cost model (exec/cost.py): broadcast
        # replicates the build side over ICI; partition moves each side
        # once (reference analog: per-device replicas vs partitioned
        # fragments, PerfectJoinHashTable.cpp:370-400)
        from . import cost as _cost

        broadcast = _cost.dist_join_strategy(
            lhs.live_count(), rhs.live_count(), ndev,
            self.config.dist.broadcast_join_threshold) == "broadcast"
        if broadcast:
            rhs_d = rhs.compact()
            if rhs_d.nrows == 0:
                return None
            rhs_keys = self._translated_rhs_keys(
                node, eval_keys([r for _, r in node.key_pairs], rhs_d))
            cnt_fn = self.code_cache.get_or_build(
                plan_sig + f"|bcnt/{rhs_d.nrows}",
                lambda: jax.jit(functools.partial(
                    dj.count_candidates_broadcast, mesh, axis=axis)))
            # device-side max: the per-shard totals stay sharded, and a
            # global array's shards are not host-readable cross-process
            # (multi-controller); jnp.max yields a replicated scalar
            totals = cnt_fn(lhs_keys, lhs.row_mask, rhs_keys)
            pair_cap = _next_pow2(max(64, int(jnp.max(totals))))
            join_fn = self.code_cache.get_or_build(
                plan_sig + f"|bjoin/{rhs_d.nrows}/{pair_cap}",
                lambda: jax.jit(functools.partial(
                    dj.dist_join_broadcast, mesh, join_type=jt,
                    pair_cap=pair_cap, axis=axis)))
            out_cols, out_mask, ov = join_fn(
                list(lhs.columns), lhs_keys, lhs.row_mask,
                list(rhs_d.columns), rhs_keys)
            if int(ov) > 0:  # cap was exact; any overflow -> fallback
                return None
            if out_cols is None:  # SEMI/ANTI keep-mask over lhs rows
                return ExecTable(list(node.fields), list(node.output_types),
                                 list(lhs.columns), lhs.nrows, out_mask)
        else:
            rhs = self._pad_rows(rhs, ndev)
            rhs_keys = self._translated_rhs_keys(
                node, eval_keys([r for _, r in node.key_pairs], rhs))
            hist_fn = self.code_cache.get_or_build(
                plan_sig + f"|phist/{rhs.nrows}",
                lambda: jax.jit(functools.partial(
                    dj.partition_histograms, mesh, axis=axis)))
            hp, hb = hist_fn(lhs_keys, lhs.row_mask, rhs_keys, rhs.row_mask)
            # jnp.max: replicated scalars (sharded buffers are not
            # host-readable cross-process in multi-controller runs)
            probe_cap = _next_pow2(max(64, int(jnp.max(hp))))
            build_cap = _next_pow2(max(64, int(jnp.max(hb))))
            cand_fn = self.code_cache.get_or_build(
                plan_sig + f"|pcnt/{rhs.nrows}/{probe_cap}/{build_cap}",
                lambda: jax.jit(functools.partial(
                    dj.count_candidates_partitioned, mesh,
                    probe_cap=probe_cap, build_cap=build_cap, axis=axis)))
            totals = cand_fn(lhs_keys, lhs.row_mask,
                             rhs_keys, rhs.row_mask)
            pair_cap = _next_pow2(max(64, int(jnp.max(totals))))
            join_fn = self.code_cache.get_or_build(
                plan_sig + f"|pjoin/{rhs.nrows}/{probe_cap}/{build_cap}"
                f"/{pair_cap}",
                lambda: jax.jit(functools.partial(
                    dj.dist_join_partitioned, mesh, join_type=jt,
                    probe_cap=probe_cap, build_cap=build_cap,
                    pair_cap=pair_cap, axis=axis)))
            out_cols, out_mask, ov = join_fn(
                list(lhs.columns), lhs_keys, lhs.row_mask,
                list(rhs.columns), rhs_keys, rhs.row_mask)
            if int(ov) > 0:
                return None

        nrows = int(out_cols[0].data.shape[0]) if out_cols else 0
        out = ExecTable(list(node.fields), list(node.output_types),
                        list(out_cols), nrows, out_mask)
        if node.residual is not None:
            resolve_out = lambda ref: out.columns[ref.index]
            cond = self.scalar.evaluate(
                _rebind_to_join_output(node.residual, node), resolve_out)
            m = cond.data.astype(jnp.bool_)
            if cond.mask is not None:
                m = m & cond.mask
            rm = m if out.row_mask is None else (out.row_mask & m)
            out = ExecTable(out.fields, out.types, out.columns, out.nrows, rm)
        return out

    def _translated_rhs_keys(self, node: nd.Join, rhs_keys):
        """Cross-dictionary string keys: translate rhs codes into the lhs
        dictionary (reference: StringDictionaryTranslationMgr)."""
        for i, (le, re_) in enumerate(node.key_pairs):
            lt, rt = le.type, re_.type
            if (lt.is_dict_encoded_string() and rt.is_dict_encoded_string()
                    and lt.dict_id != rt.dict_id):  # type: ignore[attr-defined]
                data, mask = self.scalar.translate_dict_codes(
                    rhs_keys[i].data, rhs_keys[i].mask, rt, lt)
                rhs_keys[i] = MaskedCol(data, mask)
        return rhs_keys

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
        # masked inputs: a filtered probe/build side keeps its row_mask
        # instead of paying an eager compaction (one 1.3-2.2 s/1e8-row
        # gather PER COLUMN — the dominant cost of filtered joins like
        # TPC-H Q3's shipdate-filtered lineitem).  Dead rows fold into
        # the key NULL sentinels below, so they can never match.
        lhs = self._input_table_masked(node.inputs[0], results)
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
        rhs_keys = eval_keys([r for _, r in node.key_pairs], rhs, 1)
        # cross-dictionary string keys: translate rhs codes into the lhs
        # dictionary (reference: StringDictionaryTranslationMgr)
        for i, (le, re_) in enumerate(node.key_pairs):
            lt, rt = le.type, re_.type
            if (lt.is_dict_encoded_string() and rt.is_dict_encoded_string()
                    and lt.dict_id != rt.dict_id):  # type: ignore[attr-defined]
                data, mask = self.scalar.translate_dict_codes(
                    rhs_keys[i].data, rhs_keys[i].mask, rt, lt)
                rhs_keys[i] = MaskedCol(data, mask)
            elif lhs_keys[i].data.dtype != rhs_keys[i].data.dtype:
                # mixed numeric key types (e.g. INT = DOUBLE from an IN
                # subquery): hash_keys encodes each side's raw bits, so
                # 31 and 31.0 would never match — promote both sides to
                # the common SQL type first (reference: Analyzer
                # normalizes operand types before hash-join key check,
                # normalize_column_pairs)
                ld, rd = lhs_keys[i].data.dtype, rhs_keys[i].data.dtype
                if (jnp.issubdtype(ld, jnp.number)
                        and jnp.issubdtype(rd, jnp.number)):
                    ct = jnp.promote_types(ld, rd)
                    if ld != ct:
                        lhs_keys[i] = MaskedCol(
                            lhs_keys[i].data.astype(ct), lhs_keys[i].mask)
                    if rd != ct:
                        rhs_keys[i] = MaskedCol(
                            rhs_keys[i].data.astype(ct), rhs_keys[i].mask)
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

        # perfect (dense direct-index) join: single int-ish key with a
        # small value range and unique build keys (reference:
        # PerfectJoinHashTable; falls back to the sorted-hash table on
        # duplicates or oversized range, like HashJoin::getInstance)
        self._join_route = "perfect"  # refined to "spread" inside
        perfect_out = self._try_perfect_join(node, lhs, rhs, lhs_keys,
                                             rhs_keys, plan_sig, ht_objs, jt)
        if perfect_out is not None:
            return perfect_out
        self._join_route = "hash"
        table = self._hashtable_cache.get(plan_sig + "|ht", ht_objs)
        if table is None:
            build_fn = self.code_cache.get_or_build(
                plan_sig + "|build",
                lambda: jax.jit(lambda ks: jn.build(ks)))
            table = build_fn(rhs_keys)
            self._hashtable_cache.put(plan_sig + "|ht", ht_objs, table)

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
        else:
            expand_fn = self.code_cache.get_or_build(
                plan_sig + f"|expand{total}",
                lambda: jax.jit(lambda tbl, lo_, hi_, lks, rks: (
                    lambda pair: (pair[0], pair[1],
                                  jn.verify_pairs(rks, lks, pair[0], pair[1]))
                )(jn.expand_pairs(tbl, lo_, hi_, total))))
            l_idx, r_idx, ok = expand_fn(table, lo, hi, lhs_keys, rhs_keys)
            if node.residual is not None and jt != nd.JoinType.INNER:
                ok = ok & self._residual_on_pairs(node, lhs, rhs, l_idx, r_idx)
            m = int(ok.sum())  # host sync: verified match count
            keep_fn = self.code_cache.get_or_build(
                plan_sig + f"|keep{total}/{m}",
                lambda: jax.jit(lambda li, ri, okk: (
                    lambda kp: (li[kp], ri[kp])
                )(nonzero_indices(okk, m))))
            l_keep, r_keep = keep_fn(l_idx, r_idx, ok)

        if jt == nd.JoinType.INNER:
            out = self._pair_table(node, lhs, rhs, l_keep, r_keep)
            if node.residual is not None:
                out = self._apply_residual(node, out)
            return out

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
                          plan_sig, ht_objs, jt):
        if len(node.key_pairs) != 1:
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
            bk = rhs_keys[0]
            stats = jnp.stack([jnp.min(bk.fill(0)), jnp.max(bk.fill(0))])
            lo, hi = (int(x) for x in np.asarray(stats))  # host sync
            range_size = hi - lo + 1
            # density guard: a dense table costs range_size entries of
            # memory, so tiny builds with huge ranges stay on the hash
            # route — but SPARSE bounded ranges (e.g. a filtered FK
            # build keeping 9% of [0, 15M) in TPC-H Q3) must still
            # qualify: the sorted-hash probe + expand costs seconds and
            # a compile per candidate-count where the dense table costs
            # range_size*4B once (measured Q3 @SF10: 11.3 s -> sub-s)
            if (range_size <= 0
                    or range_size > self.config.exec.join.perfect_hash_range_limit
                    or range_size > max(rhs.nrows, 1) * 1024
                    or range_size > max(rhs.nrows * 8, 1 << 16)
                    and lhs.nrows < self.config.exec.join.spread_join_min_rows):
                self._hashtable_cache.put(sig, ht_objs, (None, None, False))
                return None
            build_fn = self.code_cache.get_or_build(
                f"pjbuild/{range_size}/{lo}/{rhs.nrows}/{bk.data.dtype}",
                lambda: jax.jit(functools.partial(
                    jn.build_perfect, min_key=lo, range_size=range_size)))
            table, unique, n_set = build_fn(bk)
            if not bool(unique):  # duplicate keys: OneToMany -> generic
                self._hashtable_cache.put(sig, ht_objs, (None, None, False))
                return None
            # every slot occupied => probe matching needs no table gather
            complete = int(n_set) == range_size
            cached = (table, range_size, complete)
            self._hashtable_cache.put(sig, ht_objs, cached)
        table, range_size, complete = cached
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

        bslot_key = (
            f"pjbslots/{range_size}/{table.min_key}/{rhs.nrows}"
            f"/{rhs_keys[0].data.dtype}/{rhs_keys[0].mask is None}")
        bslot_fn = self.code_cache.get_or_build(
            bslot_key, lambda: jax.jit(functools.partial(
                jn.build_slots, min_key=table.min_key,
                range_size=range_size)))

        if jt == nd.JoinType.INNER:
            m = int(matched.sum())
            if m == lhs.nrows and lhs.row_mask is None:
                if complete and node.residual is None:
                    out = self._try_spread_join(
                        node, lhs, rhs, slots, sig, range_size,
                        lambda: bslot_fn(rhs_keys[0]), ht_objs)
                    if out is not None:
                        self._join_route = "spread"
                        return out
                # every probe row matched (FK-style join): skip the keep
                # compaction entirely, lhs columns pass through untouched
                out = self._pair_table_slots(
                    node, lhs, rhs, None, slots, None, sig,
                    lambda: bslot_fn(rhs_keys[0]), range_size, ht_objs)
            else:
                keep = nonzero_indices(matched, m)
                out = self._pair_table_slots(
                    node, lhs, rhs, keep, slots[keep], None, sig,
                    lambda: bslot_fn(rhs_keys[0]), range_size, ht_objs)
            if node.residual is not None:
                out = self._apply_residual(node, out)
            return out
        # LEFT (one-to-one): value-table lookup at match or pad null
        if node.residual is not None:
            raise ExecError(
                "residual ON condition on LEFT join not supported yet")
        return self._pair_table_slots(
            node, lhs, rhs, None, slots, matched, sig,
            lambda: bslot_fn(rhs_keys[0]), range_size, ht_objs,
            lhs_mask=lhs.row_mask)

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
                         table.columns, table.nrows, table.row_mask)

    def _value_table(self, sig, ci, c, bslots_fn, range_size, rhs_nrows,
                     ht_objs):
        """One rhs column scattered into key-slot order, cached per plan
        + buffer identity (reference: HashtableRecycler.h:32).  The cache
        identity includes the build KEY buffers (``ht_objs``) — the slot
        layout depends on the key column, so a rebuilt key buffer under a
        live value buffer must invalidate the table."""
        vt_sig = sig + f"|vt{ci}"
        id_objs = [c.data] + list(ht_objs)
        cached = self._hashtable_cache.get(vt_sig, id_objs)
        if cached is None:
            vt_fn = self.code_cache.get_or_build(
                f"vtbuild/{range_size}/{rhs_nrows}/{c.data.dtype}"
                f"/{c.data.shape[1:]}/{c.mask is None}",
                lambda: jax.jit(functools.partial(
                    jn.build_value_table, range_size=range_size)))
            cached = vt_fn(c, bslots_fn())
            self._hashtable_cache.put(vt_sig, id_objs, cached)
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
        if not all(self._spreadable_dtype(c.data.dtype) for c in rcols):
            return None  # f64/u64: no exact TPU delta encoding
        memo: dict = {}

        def bslots():
            if "bs" not in memo:
                memo["bs"] = bslots_fn()
            return memo["bs"]

        vts = [self._value_table(sig, i, c, bslots, range_size, rhs.nrows,
                                 ht_objs)
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

        def bslots():
            if "bs" not in memo:
                memo["bs"] = bslots_fn()
            return memo["bs"]

        def lthunk(c):
            if l_idx is None:
                return lambda: c
            return lambda: MaskedCol(
                c.data[l_idx], c.mask[l_idx] if c.mask is not None else None)

        def rthunk(c, ci):
            def thunk():
                vtd, vtm = self._value_table(sig, ci, c, bslots,
                                             range_size, rhs.nrows, ht_objs)
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

        cols = _LazyThunkColumns(
            [lthunk(c) for c in lhs.columns]
            + [rthunk(c, ci) for ci, c in enumerate(rhs.columns)])
        nrows = lhs.nrows if l_idx is None else int(l_idx.shape[0])
        return ExecTable(list(node.fields), list(node.output_types),
                         cols, nrows, lhs_mask)

    def _pair_table(self, node: nd.Join, lhs: ExecTable, rhs: ExecTable,
                    l_idx, r_idx) -> ExecTable:
        """Join output with LAZY per-column gathers: a downstream step
        that uses only some columns never pays the HBM random-gather for
        the rest (measured 1.3 s per 1e8-row gather — the dominant join
        cost).  ``l_idx=None`` = identity (every probe row matched, in
        order): lhs columns pass through untouched."""
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
                         cols, int(r_idx.shape[0]))

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
        n = int(mask.sum())
        return out.gather(nonzero_indices(mask, n))

    # ------------------------------------------------------------------
    def _exec_union(self, node: nd.LogicalUnion, results) -> ExecTable:
        # masked inputs: a filtered branch contributes its row_mask to
        # the union's row_mask instead of paying per-column compaction
        # gathers; in dist sessions the sharded branches concatenate
        # without materializing (the P8 union gap)
        parts = [self._input_table_masked(i, results) for i in node.inputs]
        # zero-row inputs contribute nothing and may lack shape info
        # (e.g. an array column's width) — drop them up front
        live = [p for p in parts if p.nrows > 0]
        if not live:
            return ExecTable.empty(list(node.fields),
                                   list(node.output_types))
        row_mask = None
        if any(p.row_mask is not None for p in live):
            row_mask = jnp.concatenate([
                (p.row_mask if p.row_mask is not None
                 else jnp.ones((p.nrows,), jnp.bool_)) for p in live])
        cols: List[MaskedCol] = []
        for ci, ty in enumerate(node.output_types):
            dt = jnp.dtype(ty.physical_dtype())
            parts_c = [p.columns[ci] for p in live]
            if ty.is_array():
                # pad widths to the union's max (element masks mark pads)
                width = max(c.data.shape[1] for c in parts_c)
                def wpad(c):
                    k = c.data.shape[1]
                    if k == width:
                        return c
                    padshape = (c.data.shape[0], width - k)
                    d = jnp.concatenate(
                        [c.data, jnp.zeros(padshape, c.data.dtype)], axis=1)
                    m = (c.mask if c.mask is not None
                         else jnp.ones(c.data.shape, jnp.bool_))
                    m = jnp.concatenate(
                        [m, jnp.zeros(padshape, jnp.bool_)], axis=1)
                    return MaskedCol(d, m)
                parts_c = [wpad(c) for c in parts_c]
            data = jnp.concatenate([c.data.astype(dt) for c in parts_c])
            if any(c.mask is not None for c in parts_c):
                mask = jnp.concatenate([
                    (c.mask if c.mask is not None
                     else jnp.ones(c.data.shape, jnp.bool_))
                    for c in parts_c])
            else:
                mask = None
            cols.append(MaskedCol(data, mask))
        return ExecTable(list(node.fields), list(node.output_types), cols,
                         sum(p.nrows for p in live), row_mask)

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
