"""SQL AST node definitions (parser output, binder input)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union


@dataclass
class Lit:
    value: object  # int | float | str | bool | None
    kind: str = ""  # "", "date", "time", "timestamp"


@dataclass
class Col:
    name: str
    table: Optional[str] = None


@dataclass
class Star:
    table: Optional[str] = None


@dataclass
class Fn:
    name: str
    args: List[object]
    distinct: bool = False


@dataclass
class Bin:
    op: str
    lhs: object
    rhs: object


@dataclass
class Un:
    op: str  # 'not' | 'neg'
    operand: object


@dataclass
class Case:
    branches: List[tuple]  # (cond, value)
    else_value: Optional[object]
    operand: Optional[object] = None  # simple CASE <operand> WHEN v THEN ...


@dataclass
class CastE:
    operand: object
    type_name: str


@dataclass
class ExtractE:
    field: str
    operand: object


@dataclass
class LikeE:
    operand: object
    pattern: object
    escape: Optional[str] = None
    case_insensitive: bool = False
    is_regexp: bool = False
    negated: bool = False


@dataclass
class InE:
    operand: object
    values: List[object]
    negated: bool = False


@dataclass
class IsNullE:
    operand: object
    negated: bool = False


@dataclass
class BetweenE:
    operand: object
    lo: object
    hi: object
    negated: bool = False


@dataclass
class InSubquery:
    operand: object
    query: "Query"
    negated: bool = False


@dataclass
class ExistsE:
    query: "Query"
    negated: bool = False


@dataclass
class ScalarSub:
    query: "Query"


@dataclass
class Over:
    """fn(...) OVER (PARTITION BY ... ORDER BY ...)."""

    fn: "Fn"
    partition_by: List[object]
    order_by: List["OrderItem"]


@dataclass
class SelectItem:
    expr: object
    alias: Optional[str] = None


@dataclass
class TableRef:
    name: Optional[str] = None
    alias: Optional[str] = None
    subquery: Optional["Query"] = None

    @property
    def bind_name(self) -> str:
        return self.alias or self.name or "?"


@dataclass
class JoinClause:
    kind: str  # inner | left | semi | anti
    table: TableRef
    on: Optional[object]


@dataclass
class OrderItem:
    expr: object
    desc: bool = False
    nulls_first: Optional[bool] = None


@dataclass
class SelectStmt:
    items: List[SelectItem]
    distinct: bool = False
    from_table: Optional[TableRef] = None
    joins: List[JoinClause] = field(default_factory=list)
    where: Optional[object] = None
    group_by: List[object] = field(default_factory=list)
    having: Optional[object] = None
    order_by: List[OrderItem] = field(default_factory=list)
    limit: Optional[int] = None
    offset: int = 0


@dataclass
class Query:
    """UNION ALL chain of selects (order/limit live on the members)."""

    selects: List[SelectStmt]
    # trailing ORDER BY / LIMIT applying to the union result
    order_by: List[OrderItem] = field(default_factory=list)
    limit: Optional[int] = None
    offset: int = 0
