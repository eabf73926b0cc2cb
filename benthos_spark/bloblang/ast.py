"""Bloblang AST nodes.

One AST, two backends (columns.py / interp.py). Node shapes follow the
reference's query.Function tree (internal/bloblang/query/expression.go,
field.go, arithmetic.go) without its execution model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Union

PathSeg = Union[str, int]


@dataclass(frozen=True)
class Node:
    pass


# -- expressions ------------------------------------------------------------


@dataclass(frozen=True)
class Lit(Node):
    value: Any  # None | bool | int | float | str


@dataclass(frozen=True)
class ArrayLit(Node):
    items: tuple


@dataclass(frozen=True)
class ObjectLit(Node):
    # keys are expression nodes (usually Lit(str)); dynamic keys allowed
    pairs: tuple  # tuple[(Node, Node), ...]


@dataclass(frozen=True)
class ContextRef(Node):
    """`this.path` (name=None) or a named lambda context `loc.path`
    (query.NewFieldFunction / NewNamedContextFieldFunction,
    internal/bloblang/parser/query_function_parser.go:260)."""

    name: Optional[str]
    path: tuple  # tuple[PathSeg, ...]


@dataclass(frozen=True)
class RootRef(Node):
    """`root.path` read of the document under construction
    (query.NewRootFieldFunction)."""

    path: tuple


@dataclass(frozen=True)
class VarRef(Node):
    """`$name` (variableLiteralParser, query_function_parser.go:195)."""

    name: str


@dataclass(frozen=True)
class MetaRef(Node):
    """`@key` / `@` (metadataLiteralParser, query_function_parser.go:226).
    key None = whole metadata object."""

    key: Optional[str]


@dataclass(frozen=True)
class FuncCall(Node):
    name: str
    args: tuple
    named: tuple = ()  # tuple[(str, Node), ...]


@dataclass(frozen=True)
class MethodCall(Node):
    target: Node
    name: str
    args: tuple
    named: tuple = ()


@dataclass(frozen=True)
class GetField(Node):
    """Postfix field/index access on an expression (`expr.foo`, `expr.0`,
    `expr."weird key"` — fieldLiteralMapParser)."""

    target: Node
    seg: PathSeg


@dataclass(frozen=True)
class ExprTail(Node):
    """`expr.(sub expr)` — map method: evaluate sub with expr as context
    (parseFunctionTail's bracketed form, query_function_parser.go:76-97)."""

    target: Node
    sub: Node


@dataclass(frozen=True)
class Not(Node):
    expr: Node


@dataclass(frozen=True)
class Neg(Node):
    expr: Node


@dataclass(frozen=True)
class BinOp(Node):
    """op in + - * / % == != > >= < <= && || |(coalesce). Precedence is
    resolved at parse time via the reference's 4-pass scheme
    (arithmetic.go:432)."""

    op: str
    left: Node
    right: Node


@dataclass(frozen=True)
class IfExpr(Node):
    cond: Node
    then: Node
    elifs: tuple = ()  # tuple[(Node, Node), ...]
    orelse: Optional[Node] = None


@dataclass(frozen=True)
class MatchExpr(Node):
    """`match [target] { case => expr, ... }`. A case of None is `_`;
    a Lit case compares for equality with the context; any other case is
    a boolean predicate evaluated with target as context
    (query_expression_parser.go:9-66)."""

    target: Optional[Node]
    cases: tuple  # tuple[(Node | None, Node), ...]


@dataclass(frozen=True)
class Lambda(Node):
    param: str
    body: Node


# -- statements -------------------------------------------------------------


@dataclass(frozen=True)
class Assign(Node):
    """kind 'root' (plainMappingStatementParser), 'var' (let), or 'meta'.
    For kind 'root', path () means assigning root itself; for 'meta',
    path is (key,) or () for the whole map."""

    kind: str
    path: tuple
    expr: Node
    line: int = 0  # 1-based source line, for Go-parity error wrapping


@dataclass
class MappingAST:
    statements: list = field(default_factory=list)
    maps: dict = field(default_factory=dict)  # name -> list[Assign]
