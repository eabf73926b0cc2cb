"""Bloblang tokenizer + recursive-descent parser.

Grammar sources (all /root/reference/internal/bloblang/parser/):
- statements: mapping_parser.go:45 parseExecutor (import | map | let |
  meta | plain assignment), :138 singleRootMapping (a bare query is
  ``root = <query>``)
- expressions: query_parser.go:7 (match | if | lambda | brackets |
  literal | function | @meta | $var | field), query_function_parser.go:100
  parseWithTails (``.`` method/field chains, ``!`` negation; a newline is
  allowed after ``.``)
- precedence: query_arithmetic_parser.go:11 operator set;
  query/arithmetic.go:432 NewArithmeticExpression's four resolution
  passes: {* / % |coalesce} → {+ -} → comparisons → {&& ||}

This is a fresh implementation (regex tokenizer + Pratt-free pass-based
precedence), not a translation of the Go combinator library.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from benthos_spark.bloblang.ast import (
    ArrayLit,
    Assign,
    BinOp,
    ContextRef,
    ExprTail,
    FuncCall,
    GetField,
    IfExpr,
    Lambda,
    Lit,
    MappingAST,
    MatchExpr,
    MetaRef,
    MethodCall,
    Neg,
    Node,
    Not,
    ObjectLit,
    RootRef,
    VarRef,
)


class BloblangParseError(ValueError):
    def __init__(self, msg: str, line: int = 0, fatal: bool = False):
        super().__init__(f"line {line}: {msg}" if line else msg)
        self.line = line
        # fatal errors skip the single-root-mapping fallback
        # (bestMatch/IsFatal, mapping_parser.go:22-37)
        self.fatal = fatal


@dataclass
class Tok:
    kind: str  # NL IDENT NUMBER STRING OP VAR META EOF
    value: object
    line: int


_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<nl>\n)
  | (?P<ws>[ \t\r]+)
  | (?P<tstring>\"\"\"(?:[^\\]|\\.)*?\"\"\")
  | (?P<string>"(?:[^"\\\n]|\\.)*")
  | (?P<number>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<var>\$[A-Za-z0-9_]+)
  | (?P<meta>@(?:[A-Za-z0-9_]+|"(?:[^"\\\n]|\\.)*")?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>&&|\|\||==|!=|>=|<=|->|=>|[-+*/%><|!=()\[\]{},.:_])
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f", "0": "\0"}


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    line = 1
    depth = 0  # () and [] nesting: newlines inside are formatting only
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise BloblangParseError(f"unexpected character {src[pos]!r}", line)
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws" or kind == "comment":
            continue
        if kind == "nl":
            line += 1
            if depth == 0:
                if toks and toks[-1].kind != "NL":
                    toks.append(Tok("NL", None, line - 1))
            continue
        if kind == "tstring":
            val = text[3:-3]
            line += val.count("\n")
            toks.append(Tok("STRING", val, line))
        elif kind == "string":
            toks.append(Tok("STRING", _unescape(text[1:-1]), line))
        elif kind == "number":
            if "." in text or "e" in text or "E" in text:
                toks.append(Tok("NUMBER", float(text), line))
            else:
                toks.append(Tok("NUMBER", int(text), line))
        elif kind == "var":
            toks.append(Tok("VAR", text[1:], line))
        elif kind == "meta":
            key = text[1:]
            if key.startswith('"'):
                key = _unescape(key[1:-1])
            toks.append(Tok("META", key or None, line))
        elif kind == "ident":
            toks.append(Tok("IDENT", text, line))
        else:
            if text in "([":
                depth += 1
            elif text in ")]":
                depth = max(0, depth - 1)
            toks.append(Tok("OP", text, line))
    toks.append(Tok("EOF", None, line))
    return toks


_PROD_OPS = {"*", "/", "%", "|"}
_SUM_OPS = {"+", "-"}
_CMP_OPS = {"==", "!=", ">", ">=", "<", "<="}
_BOOL_OPS = {"&&", "||"}
_ALL_OPS = _PROD_OPS | _SUM_OPS | _CMP_OPS | _BOOL_OPS


def _resolve_precedence(operands: list[Node], ops: list[str]) -> Node:
    """The reference's four-pass reduction (arithmetic.go:432)."""
    for tier in (_PROD_OPS, _SUM_OPS, _CMP_OPS, _BOOL_OPS):
        new_operands, new_ops = [operands[0]], []
        for op, rhs in zip(ops, operands[1:]):
            if op in tier:
                new_operands[-1] = BinOp(op, new_operands[-1], rhs)
            else:
                new_operands.append(rhs)
                new_ops.append(op)
        operands, ops = new_operands, new_ops
    if ops:
        raise BloblangParseError(f"unresolved operators {ops}")
    return operands[0]


class Parser:
    def __init__(self, toks: list[Tok], import_loader=None):
        self.toks = toks
        self.i = 0
        self.contexts: list[str] = []  # active lambda context names
        # import "file" resolver: path -> source text (importParser,
        # mapping_parser.go:189 — imported files contribute their map
        # definitions). Default reads from the filesystem.
        self.import_loader = import_loader or (lambda p: open(p).read())

    # -- token helpers ------------------------------------------------------
    def peek(self, ahead: int = 0) -> Tok:
        j = min(self.i + ahead, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def at_op(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value in vals

    def expect_op(self, val: str) -> Tok:
        t = self.next()
        if t.kind != "OP" or t.value != val:
            raise BloblangParseError(f"expected {val!r}, got {t.value!r}", t.line)
        return t

    def skip_nl(self) -> None:
        while self.peek().kind == "NL":
            self.next()

    # -- statements ---------------------------------------------------------
    def parse_mapping(self) -> MappingAST:
        out = MappingAST()
        self.skip_nl()
        # single-root form: the whole input is one query
        # (singleRootMapping, mapping_parser.go:138)
        save = self.i
        try:
            stmt = self.parse_statement(out)
        except BloblangParseError as e:
            if e.fatal:
                raise
            self.i = save
            expr = self.parse_query()
            self.skip_nl()
            if self.peek().kind != "EOF":
                t = self.peek()
                raise BloblangParseError(f"unexpected trailing input {t.value!r}", t.line)
            out.statements.append(Assign("root", (), expr, line=1))
            return out
        if stmt is not None:
            out.statements.append(stmt)
        while True:
            # statements are newline-separated (parseExecutor requires a
            # newline between statements, mapping_parser.go:79)
            t = self.peek()
            if t.kind == "EOF":
                break
            if t.kind != "NL":
                raise BloblangParseError(
                    f"expected end of statement, got {t.value!r}", t.line
                )
            self.skip_nl()
            if self.peek().kind == "EOF":
                break
            stmt = self.parse_statement(out)
            if stmt is not None:
                out.statements.append(stmt)
        return out

    def parse_statement(self, out: MappingAST) -> Optional[Assign]:
        t = self.peek()
        if t.kind == "IDENT" and t.value == "import" and self.peek(1).kind == "STRING":
            self.next()
            path = str(self.next().value)
            try:
                src = self.import_loader(path)
            except OSError as e:
                raise BloblangParseError(
                    f"failed to import mapping {path!r}: {e}", t.line, fatal=True
                )
            sub = Parser(tokenize(src), self.import_loader).parse_mapping()
            out.maps.update(sub.maps)
            return None
        if t.kind == "IDENT" and t.value == "let":
            self.next()
            name_t = self.next()
            if name_t.kind not in ("IDENT", "STRING"):
                raise BloblangParseError("expected variable name", name_t.line)
            self.expect_op("=")
            return Assign("var", (str(name_t.value),), self.parse_query(), line=t.line)
        if t.kind == "IDENT" and t.value == "meta":
            nxt = self.peek(1)
            if (nxt.kind in ("IDENT", "STRING") and self.peek(2).kind == "OP" and self.peek(2).value == "=") or (
                nxt.kind == "OP" and nxt.value == "="
            ):
                self.next()
                key: tuple = ()
                kt = self.peek()
                if kt.kind in ("IDENT", "STRING"):
                    self.next()
                    key = (str(kt.value),)
                self.expect_op("=")
                return Assign("meta", key, self.parse_query(), line=t.line)
        if t.kind == "IDENT" and t.value == "map":
            nxt = self.peek(1)
            if nxt.kind in ("IDENT", "STRING"):
                self.next()
                name = str(self.next().value)
                self.skip_nl()
                self.expect_op("{")
                stmts: list[Assign] = []
                while True:
                    self.skip_nl()
                    if self.at_op("}"):
                        self.next()
                        break
                    sub = self.parse_statement(out)
                    if sub is not None:
                        if sub.kind == "meta":
                            raise BloblangParseError(
                                "setting meta fields from within a map is not allowed", t.line
                            )
                        stmts.append(sub)
                out.maps[name] = stmts
                return None
        # plain assignment: path = query  (root prefix optional)
        save = self.i
        try:
            path = self.parse_assign_path()
            self.expect_op("=")
        except BloblangParseError:
            self.i = save
            raise
        expr = self.parse_query()
        if path and path[0] == "root":
            path = path[1:]
        return Assign("root", tuple(path), expr, line=t.line)

    def parse_assign_path(self) -> list:
        t = self.next()
        if t.kind != "IDENT":
            raise BloblangParseError(f"expected assignment path, got {t.value!r}", t.line)
        path: list = [t.value]
        while self.at_op("."):
            self.next()
            seg = self.next()
            if seg.kind == "IDENT":
                path.append(seg.value)
            elif seg.kind == "STRING":
                path.append(seg.value)
            elif seg.kind == "NUMBER" and isinstance(seg.value, int):
                path.append(seg.value)
            else:
                raise BloblangParseError(f"bad path segment {seg.value!r}", seg.line)
        return path

    # -- expressions --------------------------------------------------------
    def parse_query(self) -> Node:
        operands = [self.parse_with_tails()]
        ops: list[str] = []
        while True:
            # a newline ends the expression (statement separator) unless
            # we're inside brackets (the tokenizer already swallowed those)
            t = self.peek()
            if t.kind == "OP" and t.value in _ALL_OPS:
                self.next()
                self.skip_nl()
                ops.append(t.value)
                operands.append(self.parse_with_tails())
            else:
                break
        return _resolve_precedence(operands, ops)

    def parse_with_tails(self) -> Node:
        negate = False
        if self.at_op("!"):
            self.next()
            negate = True
        node = self.parse_primary()
        while True:
            if self.at_op("."):
                self.next()
                self.skip_nl()  # newline allowed after '.' (parseWithTails delim)
                node = self.parse_tail(node)
            else:
                break
        if negate:
            node = Not(node)
        return node

    def parse_tail(self, target: Node) -> Node:
        t = self.peek()
        if t.kind == "OP" and t.value == "(":
            # expr.(sub) — evaluate sub with expr as context
            self.next()
            sub = self.parse_query()
            self.expect_op(")")
            return ExprTail(target, sub)
        if t.kind == "NUMBER" and isinstance(t.value, int):
            self.next()
            return GetField(target, t.value)
        if t.kind == "STRING":
            self.next()
            return GetField(target, t.value)
        if t.kind == "IDENT":
            name = t.value
            if self.peek(1).kind == "OP" and self.peek(1).value == "(":
                self.next()
                args, named = self.parse_args()
                return MethodCall(target, name, tuple(args), tuple(named))
            self.next()
            return GetField(target, name)
        raise BloblangParseError(f"expected method or field after '.', got {t.value!r}", t.line)

    def parse_args(self) -> tuple[list, list]:
        self.expect_op("(")
        args: list = []
        named: list = []
        self.skip_nl()
        if self.at_op(")"):
            self.next()
            return args, named
        while True:
            self.skip_nl()
            t = self.peek()
            if t.kind == "IDENT" and self.peek(1).kind == "OP" and self.peek(1).value == ":":
                self.next()
                self.next()
                named.append((t.value, self.parse_query()))
            else:
                args.append(self.parse_query())
            self.skip_nl()
            if self.at_op(","):
                self.next()
                continue
            self.expect_op(")")
            return args, named

    def parse_primary(self) -> Node:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return Lit(t.value)
        if t.kind == "STRING":
            self.next()
            return Lit(t.value)
        if t.kind == "VAR":
            self.next()
            return VarRef(t.value)
        if t.kind == "META":
            self.next()
            return MetaRef(t.value)
        if t.kind == "OP":
            if t.value == "-":
                self.next()
                return Neg(self.parse_with_tails())
            if t.value == "(":
                self.next()
                self.skip_nl()
                inner = self.parse_query()
                self.skip_nl()
                self.expect_op(")")
                return inner
            if t.value == "[":
                return self.parse_array()
            if t.value == "{":
                return self.parse_object()
        if t.kind == "IDENT":
            kw = t.value
            if kw == "if":
                return self.parse_if()
            if kw == "match":
                return self.parse_match()
            if kw in ("true", "false"):
                self.next()
                return Lit(kw == "true")
            if kw == "null":
                self.next()
                return Lit(None)
            nxt = self.peek(1)
            if nxt.kind == "OP" and nxt.value == "->":
                return self.parse_lambda()
            if nxt.kind == "OP" and nxt.value == "(":
                self.next()
                args, named = self.parse_args()
                return FuncCall(kw, tuple(args), tuple(named))
            self.next()
            if kw == "this":
                return ContextRef(None, ())
            if kw == "root":
                return RootRef(())
            if kw in self.contexts:
                return ContextRef(kw, ())
            return ContextRef(None, (kw,))
        raise BloblangParseError(f"unexpected token {t.value!r}", t.line)

    def parse_lambda(self) -> Node:
        t = self.next()
        param = t.value if t.kind == "IDENT" else "_"
        if param in ("root", "this"):
            raise BloblangParseError(f"context label {param!r} is not allowed", t.line)
        if param in self.contexts:
            raise BloblangParseError(
                f"context label {param!r} would shadow a parent context", t.line
            )
        self.expect_op("->")
        self.skip_nl()
        if param != "_":
            self.contexts.append(param)
        try:
            body = self.parse_query()
        finally:
            if param != "_":
                self.contexts.pop()
        return Lambda(param, body)

    def parse_if(self) -> Node:
        self.next()  # if
        cond = self.parse_query()
        self.skip_nl()
        self.expect_op("{")
        self.skip_nl()
        then = self.parse_query()
        self.skip_nl()
        self.expect_op("}")
        elifs: list = []
        orelse: Optional[Node] = None
        while True:
            save = self.i
            self.skip_nl()
            t = self.peek()
            if t.kind == "IDENT" and t.value == "else":
                self.next()
                t2 = self.peek()
                if t2.kind == "IDENT" and t2.value == "if":
                    self.next()
                    c = self.parse_query()
                    self.skip_nl()
                    self.expect_op("{")
                    self.skip_nl()
                    e = self.parse_query()
                    self.skip_nl()
                    self.expect_op("}")
                    elifs.append((c, e))
                    continue
                self.skip_nl()
                self.expect_op("{")
                self.skip_nl()
                orelse = self.parse_query()
                self.skip_nl()
                self.expect_op("}")
                break
            self.i = save
            break
        return IfExpr(cond, then, tuple(elifs), orelse)

    def parse_match(self) -> Node:
        self.next()  # match
        target: Optional[Node] = None
        if not self.at_op("{"):
            if self.peek().kind != "NL":
                target = self.parse_query()
        self.skip_nl()
        self.expect_op("{")
        cases: list = []
        while True:
            self.skip_nl()
            if self.at_op("}"):
                self.next()
                break
            t = self.peek()
            case: Optional[Node]
            if t.kind == "IDENT" and t.value == "_" and not (
                self.peek(1).kind == "OP" and self.peek(1).value == "->"
            ):
                self.next()
                case = None
            else:
                case = self.parse_query()
            self.skip_nl()
            self.expect_op("=>")
            self.skip_nl()
            result = self.parse_query()
            cases.append((case, result))
            if self.at_op(","):
                self.next()
        return MatchExpr(target, tuple(cases))

    def parse_array(self) -> Node:
        self.expect_op("[")
        items: list = []
        self.skip_nl()
        if self.at_op("]"):
            self.next()
            return ArrayLit(())
        while True:
            self.skip_nl()
            items.append(self.parse_query())
            self.skip_nl()
            if self.at_op(","):
                self.next()
                self.skip_nl()
                if self.at_op("]"):
                    self.next()
                    break
                continue
            self.expect_op("]")
            break
        return ArrayLit(tuple(items))

    def parse_object(self) -> Node:
        self.expect_op("{")
        pairs: list = []
        while True:
            self.skip_nl()
            if self.at_op("}"):
                self.next()
                break
            t = self.peek()
            if t.kind == "STRING" and self.peek(1).kind == "OP" and self.peek(1).value == ":":
                self.next()
                key: Node = Lit(t.value)
            elif t.kind == "IDENT" and self.peek(1).kind == "OP" and self.peek(1).value == ":":
                self.next()
                key = Lit(t.value)
            elif t.kind == "OP" and t.value == "(":
                self.next()
                key = self.parse_query()
                self.expect_op(")")
            else:
                # dynamic key: a full query expression (`{loc.state: ...}`,
                # query_literal_parser.go dynamic object keys)
                key = self.parse_query()
            self.skip_nl()
            self.expect_op(":")
            self.skip_nl()
            pairs.append((key, self.parse_query()))
            self.skip_nl()
            if self.at_op(","):
                self.next()
        return ObjectLit(tuple(pairs))


def parse_mapping(src: str, import_loader=None) -> MappingAST:
    """Parse Bloblang mapping source → :class:`MappingAST`
    (≙ ParseMapping, mapping_parser.go:19). ``import_loader`` resolves
    ``import "path"`` statements (defaults to filesystem reads)."""
    return Parser(tokenize(src), import_loader).parse_mapping()


def parse_query(src: str) -> Node:
    """Parse a standalone Bloblang query expression
    (≙ tryParseQuery, query_parser.go:28)."""
    p = Parser(tokenize(src))
    p.skip_nl()
    node = p.parse_query()
    p.skip_nl()
    if p.peek().kind != "EOF":
        t = p.peek()
        raise BloblangParseError(f"unexpected trailing input {t.value!r}", t.line)
    return node
