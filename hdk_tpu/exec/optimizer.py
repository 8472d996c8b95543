"""DAG optimizer passes.

Reference: QueryEngine/RelAlgOptimizer.cpp (1682 LoC) — mark-noops,
eliminate-identical-copies, fold-filters, eliminate-dead-columns,
coalesce — and QueryOptimizer/CanonicalizeQuery.cpp (builder-DAG
canonicalization).  Documented in docs/source/execution/optimizer.rst.

Implemented passes (each a pure rewrite producing a new DAG):
  * eliminate_identity_projections — drop no-op Projects
    (RelAlgOptimizer.cpp mark-noops / eliminate-copies);
  * fold_filters — merge adjacent Filters into one AND condition
    (RelAlgOptimizer.cpp fold-filters);
  * constant folding happens implicitly at trace time (XLA), so the
    reference's fold pass is unnecessary here.

Dead-column elimination is planned with the column-pruning executor
work (tracked for a later milestone).
"""

from __future__ import annotations

from typing import Dict

from .. import types as t
from ..config import Config
from ..ir import expr as ir
from ..ir import node as nd


def _remap_expr(e: ir.Expr, mapping: Dict[int, nd.Node]) -> ir.Expr:
    if isinstance(e, ir.ColumnRef):
        new_node = mapping.get(e.node.id)
        if new_node is not None and new_node is not e.node:
            return ir.ColumnRef(e.type, new_node, e.index)
        return e
    ops = [_remap_expr(o, mapping) for o in e.operands()]
    return e.rebuild(*ops) if ops else e


def _rebuild_node(node: nd.Node, new_inputs, mapping) -> nd.Node:
    """Clone a node with rewritten inputs/exprs."""
    if isinstance(node, nd.Scan):
        return node
    if isinstance(node, nd.Project):
        return nd.Project(new_inputs[0],
                          [_remap_expr(e, mapping) for e in node.exprs],
                          node.fields)
    if isinstance(node, nd.Filter):
        return nd.Filter(new_inputs[0], _remap_expr(node.condition, mapping))
    if isinstance(node, nd.Aggregate):
        return nd.Aggregate(new_inputs[0],
                            [_remap_expr(e, mapping) for e in node.keys],
                            [_remap_expr(a, mapping) for a in node.aggs],
                            node.fields)
    if isinstance(node, nd.Join):
        pairs = [(_remap_expr(l, mapping), _remap_expr(r, mapping))
                 for l, r in node.key_pairs]
        residual = (_remap_expr(node.residual, mapping)
                    if node.residual is not None else None)
        return nd.Join(new_inputs[0], new_inputs[1], pairs, node.join_type,
                       residual)
    if isinstance(node, nd.Sort):
        return nd.Sort(new_inputs[0], node.sort_fields, node.limit, node.offset)
    if isinstance(node, nd.LogicalUnion):
        return nd.LogicalUnion(new_inputs, node.all)
    if isinstance(node, nd.LogicalValues):
        return node
    raise TypeError(f"unknown node {node!r}")


def _transform(dag: nd.QueryDag, visit) -> nd.QueryDag:
    """Bottom-up rewrite.  ``visit(node)`` may return a replacement node
    (must be schema-compatible)."""
    mapping: Dict[int, nd.Node] = {}
    for node in dag.topo_order():
        new_inputs = [mapping[i.id] for i in node.inputs]
        changed = any(ni is not oi for ni, oi in zip(new_inputs, node.inputs))
        cur = _rebuild_node(node, new_inputs, mapping) if changed else node
        replacement = visit(cur)
        mapping[node.id] = replacement if replacement is not None else cur
    return nd.QueryDag(mapping[dag.root.id])


def eliminate_identity_projections(dag: nd.QueryDag) -> nd.QueryDag:
    def visit(node: nd.Node):
        if isinstance(node, nd.Project) and node.is_identity():
            inp = node.inputs[0]
            if node.fields == inp.fields:
                return inp
        return None

    return _transform(dag, visit)


def fold_filters(dag: nd.QueryDag) -> nd.QueryDag:
    def visit(node: nd.Node):
        if isinstance(node, nd.Filter) and isinstance(node.inputs[0], nd.Filter):
            inner = node.inputs[0]
            cond = ir.BinOp(
                t.boolean(node.condition.type.nullable
                          or inner.condition.type.nullable),
                ir.BinOpKind.AND, inner.condition, node.condition)
            # the merged filter reads columns through the removed one;
            # remap refs onto the inner filter's input
            remapped = _remap_expr(cond, {inner.id: inner.inputs[0]})
            return nd.Filter(inner.inputs[0], remapped)
        return None

    return _transform(dag, visit)


def optimize_dag(dag: nd.QueryDag, config: Config) -> nd.QueryDag:
    dag = eliminate_identity_projections(dag)
    dag = fold_filters(dag)
    return dag
