"""AST for the reference's query language.

Mirrors the IR of /root/reference/src/query/{query,statement,filter}.go and
src/query/location.go, minus execution machinery: Statement = location +
object type + filter tree; filters are Tag/Key/Not/And/Or/SubStatement.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

QUERY_TYPES = ("nodes", "ways", "relations", "child_relations")

# object table backing each query type (child_relations also scans relations;
# /root/reference/src/osm/types.go:30-37)
BASE_TYPE = {
    "nodes": "node",
    "ways": "way",
    "relations": "relation",
    "child_relations": "relation",
}


@dataclass(frozen=True)
class Bbox:
    min_lon: float
    min_lat: float
    max_lon: float
    max_lat: float


@dataclass(frozen=True)
class ContextAware:
    """`this` location — only valid for sub-statements."""


Location = Union[Bbox, ContextAware]


@dataclass(frozen=True)
class TagFilter:
    """key <op> value with op in = != > >= < <=  (filter.go:103-128)."""

    key: str
    op: str
    value: str


@dataclass(frozen=True)
class KeyFilter:
    """key=* (present) / key!=* (absent)  (filter.go:150-156)."""

    key: str
    present: bool


@dataclass(frozen=True)
class Not:
    expr: "FilterExpr"


@dataclass(frozen=True)
class And:
    a: "FilterExpr"
    b: "FilterExpr"


@dataclass(frozen=True)
class Or:
    a: "FilterExpr"
    b: "FilterExpr"


@dataclass(frozen=True)
class Statement:
    location: Location
    query_type: str  # one of QUERY_TYPES
    filter: "FilterExpr"


@dataclass(frozen=True)
class SubStatement:
    """Correlated existential check `this.<type>{...}` (filter.go:166-337).

    ``buffer_m`` set => the reference's DOCUMENTED-BUT-UNIMPLEMENTED
    `this.buffer(5m).<type>{...}` form (README.md:154-181): EXISTS a feature
    of <type> within buffer_m meters of the outer feature's geometry that
    satisfies the inner filter (spatial proximity instead of membership).
    """

    statement: Statement
    buffer_m: float | None = None


FilterExpr = Union[TagFilter, KeyFilter, Not, And, Or, SubStatement]


@dataclass(frozen=True)
class Query:
    statements: tuple[Statement, ...]
