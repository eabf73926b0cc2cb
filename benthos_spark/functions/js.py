"""From-scratch JavaScript interpreter (ES5.1 core + the ES6 pieces
the reference's processor corpus uses: arrow functions, let/const,
template literals, for-of, shorthand object literals, and — round 5 —
Map/Set with SameValueZero semantics, classes (constructor / prototype
+ static methods, extends/super chains, class expressions, instanceof
against class identity, get/set accessors, public instance + static
fields, generator methods), object-literal get/set accessors, and
generator functions (`function*`, `yield` / `yield*`, two-way `next(v)`
/ `return(v)` / `throw(e)`), and recursive destructuring — nested
array/object patterns in declarations, assignments, and parameters.

The reference's `javascript` processor embeds the goja engine
(internal/impl/javascript/processor.go:26, vm.go:24). This environment
has no JS runtime, so the language itself is implemented here from the
public ECMAScript specification: a regex lexer with automatic-semicolon
insertion, a recursive-descent/Pratt parser, and a tree-walking
evaluator over plain Python values (dict = object, list = array,
float/int = Number with double semantics, str, None = null, UNDEF).

Generator execution model: a tree-walking evaluator cannot suspend
mid-walk, so each live generator body runs on a dedicated daemon
thread with strict lock-step handoff (two semaphores; exactly one of
caller/body is ever runnable, so execution stays deterministic and the
shared op budget stays race-free). An abandoned suspended generator is
finalized via weakref: a `return` is injected so the body unwinds
through its `finally` blocks and the thread exits — the thread holds
only the shared _GenCore, never the wrapper, so collection works.

Scope notes (honest gates, not stubs):
- no `with`, no async/await, no Proxy/Symbol,
- regex literals support the Python-compatible common subset
  (translated flags g/i/m/s); named backrefs and lookbehind pass
  through to `re` and may raise a clear JSThrow,
- prototypes are internal dispatch tables — user code can't extend
  built-in prototypes (a module trying gets a clear error),
- Math.random / Date.now are deterministic (counter / fixed epoch) so
  exactly-once redelivery reproduces bytes; documented divergence.
"""

from __future__ import annotations

import json
import math
import re
import threading
import weakref
from typing import Any, Callable, Optional


class JSError(ValueError):
    """Parse-time error (SyntaxError analog)."""


class JSThrow(Exception):
    """A thrown JS value (catchable by `try`)."""

    def __init__(self, value):
        self.value = value
        super().__init__(js_to_display(value))


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = _Undefined()


# =============================================================================
# Lexer
# =============================================================================

_KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for", "while",
    "do", "break", "continue", "new", "delete", "typeof", "instanceof", "in",
    "of", "this", "null", "true", "false", "undefined", "throw", "try",
    "catch", "finally", "switch", "case", "default", "void",
    "class", "extends", "super",
}

_PUNCT = [
    "===", "!==", ">>>=", "**=", "...", ">>>", "<<=", ">>=", "&&=", "||=",
    "??=", "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "++", "--", "+=",
    "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<", ">>", "**", "{", "}",
    "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/", "%", "&",
    "|", "^", "!", "~", "?", ":", "=", ".",
]

_NUM_RE = re.compile(  # ES2021 numeric separators: _ only between digits
    r"0[xX][0-9a-fA-F](?:_?[0-9a-fA-F])*|0[oO][0-7](?:_?[0-7])*|"
    r"0[bB][01](?:_?[01])*|"
    r"(?:\d(?:_?\d)*\.?(?:\d(?:_?\d)*)?|\.\d(?:_?\d)*)"
    r"(?:[eE][+-]?\d(?:_?\d)*)?"
)
_IDENT_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_WS_RE = re.compile(r"[ \t\r\f\v]+")


class Tok:
    __slots__ = ("kind", "value", "nl_before", "pos")

    def __init__(self, kind, value, nl_before, pos):
        self.kind = kind          # num str ident keyword punct regex template eof
        self.value = value
        self.nl_before = nl_before
        self.pos = pos

    def __repr__(self):
        return f"Tok({self.kind},{self.value!r})"


def _scan_string(src: str, i: int) -> tuple:
    quote = src[i]
    out = []
    i += 1
    while i < len(src):
        c = src[i]
        if c == quote:
            return "".join(out), i + 1
        if c == "\n":
            raise JSError("unterminated string literal")
        if c == "\\":
            i += 1
            if i >= len(src):
                break
            e = src[i]
            if e == "n":
                out.append("\n")
            elif e == "t":
                out.append("\t")
            elif e == "r":
                out.append("\r")
            elif e == "b":
                out.append("\b")
            elif e == "f":
                out.append("\f")
            elif e == "v":
                out.append("\v")
            elif e == "0" and (i + 1 >= len(src) or not src[i + 1].isdigit()):
                out.append("\0")
            elif e == "x":
                out.append(chr(int(src[i + 1 : i + 3], 16)))
                i += 2
            elif e == "u":
                if src[i + 1] == "{":
                    j = src.index("}", i)
                    out.append(chr(int(src[i + 2 : j], 16)))
                    i = j
                else:
                    out.append(chr(int(src[i + 1 : i + 5], 16)))
                    i += 4
            elif e == "\n":
                pass  # line continuation
            else:
                out.append(e)
            i += 1
        else:
            out.append(c)
            i += 1
    raise JSError("unterminated string literal")


def _scan_template(src: str, i: int) -> tuple:
    """Scan `...${...}...` from the backtick; returns (parts, i) where
    parts alternate literal strings and RAW expression source strings:
    ["lit", ("expr", src), "lit", ...]."""
    parts: list = []
    cur: list = []
    i += 1
    while i < len(src):
        c = src[i]
        if c == "`":
            parts.append("".join(cur))
            return parts, i + 1
        if c == "\\":
            e = src[i + 1]
            mapping = {"n": "\n", "t": "\t", "r": "\r", "`": "`", "$": "$", "\\": "\\"}
            cur.append(mapping.get(e, e))
            i += 2
            continue
        if c == "$" and i + 1 < len(src) and src[i + 1] == "{":
            parts.append("".join(cur))
            cur = []
            depth = 1
            j = i + 2
            start = j
            while j < len(src) and depth:
                if src[j] == "{":
                    depth += 1
                elif src[j] == "}":
                    depth -= 1
                elif src[j] in "\"'":
                    _, j2 = _scan_string(src, j)
                    j = j2 - 1
                j += 1
            if depth:
                raise JSError("unterminated template expression")
            parts.append(("expr", src[start : j - 1]))
            i = j
            continue
        cur.append(c)
        i += 1
    raise JSError("unterminated template literal")


_REGEX_ALLOWED_AFTER = {
    None, "(", ",", "=", ":", "[", "!", "&", "|", "?", "{", "}", ";",
    "return", "typeof", "case", "=>", "==", "===", "!=", "!==", "&&", "||",
    "+", "-", "*", "/", "%",
}


def tokenize(src: str) -> list:
    toks: list = []
    i = 0
    nl = False
    prev_relevant = None
    n = len(src)
    while i < n:
        c = src[i]
        if c == "\n":
            nl = True
            i += 1
            continue
        m = _WS_RE.match(src, i)
        if m:
            i = m.end()
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise JSError("unterminated comment")
            if "\n" in src[i:j]:
                nl = True
            i = j + 2
            continue
        if c in "\"'":
            val, i = _scan_string(src, i)
            toks.append(Tok("str", val, nl, i))
            nl = False
            prev_relevant = "str"
            continue
        if c == "`":
            parts, i = _scan_template(src, i)
            toks.append(Tok("template", parts, nl, i))
            nl = False
            prev_relevant = "str"
            continue
        if c == "/" and prev_relevant in _REGEX_ALLOWED_AFTER:
            # regex literal
            j = i + 1
            in_class = False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                elif ch == "\n":
                    raise JSError("unterminated regex literal")
                j += 1
            if j >= n:
                raise JSError("unterminated regex literal")
            body = src[i + 1 : j]
            j += 1
            fm = _IDENT_RE.match(src, j)
            flags = fm.group(0) if fm and fm.start() == j else ""
            toks.append(Tok("regex", (body, flags), nl, i))
            i = j + len(flags)
            nl = False
            prev_relevant = "str"
            continue
        m = _NUM_RE.match(src, i)
        if m and (c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit())):
            text = m.group(0).replace("_", "")
            if text[:2].lower() == "0x":
                val = float(int(text, 16))
            elif text[:2].lower() == "0o":
                val = float(int(text, 8))
            elif text[:2].lower() == "0b":
                val = float(int(text, 2))
            else:
                val = float(text)
            toks.append(Tok("num", val, nl, i))
            i = m.end()
            nl = False
            prev_relevant = "num"
            continue
        m = _IDENT_RE.match(src, i)
        if m:
            word = m.group(0)
            kind = "keyword" if word in _KEYWORDS else "ident"
            toks.append(Tok(kind, word, nl, i))
            i = m.end()
            nl = False
            prev_relevant = word if kind == "keyword" else "ident"
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(Tok("punct", p, nl, i))
                i += len(p)
                nl = False
                prev_relevant = p
                break
        else:
            raise JSError(f"unexpected character {c!r} at {i}")
    toks.append(Tok("eof", None, nl, n))
    return toks


# =============================================================================
# Parser  → tuple AST: (node_type, ...)
# =============================================================================


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0
        # generator-context stack: `yield` is a contextual keyword —
        # an expression only directly inside a generator body (nested
        # plain functions and arrows push False, per spec §14.4)
        self._gen = [False]

    # -- token helpers -----------------------------------------------------

    def peek(self, k=0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at(self, value, kind="punct") -> bool:
        t = self.peek()
        return t.kind == kind and t.value == value

    def at_kw(self, word) -> bool:
        return self.at(word, "keyword")

    def eat(self, value, kind="punct") -> bool:
        if self.at(value, kind):
            self.next()
            return True
        return False

    def expect(self, value, kind="punct") -> Tok:
        t = self.peek()
        if t.kind != kind or t.value != value:
            raise JSError(f"expected {value!r}, got {t.value!r} at {t.pos}")
        return self.next()

    def semicolon(self):
        """Consume `;` with automatic semicolon insertion."""
        if self.eat(";"):
            return
        t = self.peek()
        if t.kind == "eof" or (t.kind == "punct" and t.value == "}"):
            return
        if t.nl_before:
            return
        raise JSError(f"expected ';' before {t.value!r} at {t.pos}")

    # -- program / statements ------------------------------------------------

    def parse_program(self) -> tuple:
        body = []
        while self.peek().kind != "eof":
            body.append(self.statement())
        return ("program", body)

    def statement(self) -> tuple:
        t = self.peek()
        if t.kind == "punct":
            if t.value == "{":
                return self.block()
            if t.value == ";":
                self.next()
                return ("empty",)
        if t.kind == "keyword":
            v = t.value
            if v in ("var", "let", "const"):
                d = self.var_decl()
                self.semicolon()
                return d
            if v == "function":
                return self.function_decl()
            if v == "class":
                return self.class_decl()
            if v == "if":
                return self.if_stmt()
            if v == "for":
                return self.for_stmt()
            if v == "while":
                self.next()
                self.expect("(")
                cond = self.expression()
                self.expect(")")
                return ("while", cond, self.statement())
            if v == "do":
                self.next()
                body = self.statement()
                self.expect("while", "keyword")
                self.expect("(")
                cond = self.expression()
                self.expect(")")
                self.eat(";")
                return ("dowhile", cond, body)
            if v == "return":
                self.next()
                t2 = self.peek()
                if (t2.kind == "punct" and t2.value in (";", "}")) or \
                        t2.kind == "eof" or t2.nl_before:
                    self.semicolon() if not self.eat(";") else None
                    return ("return", None)
                e = self.expression()
                self.semicolon()
                return ("return", e)
            if v == "break":
                self.next()
                label = None
                if self.peek().kind == "ident" and not self.peek().nl_before:
                    label = self.next().value
                self.semicolon()
                return ("break", label)
            if v == "continue":
                self.next()
                label = None
                if self.peek().kind == "ident" and not self.peek().nl_before:
                    label = self.next().value
                self.semicolon()
                return ("continue", label)
            if v == "throw":
                self.next()
                if self.peek().nl_before:
                    raise JSError("newline after throw")
                e = self.expression()
                self.semicolon()
                return ("throw", e)
            if v == "try":
                return self.try_stmt()
            if v == "switch":
                return self.switch_stmt()
        # labelled statement: ident ':' statement
        if t.kind == "ident" and self.peek(1).kind == "punct" and \
                self.peek(1).value == ":":
            label = self.next().value
            self.next()
            return ("label", label, self.statement())
        e = self.expression()
        self.semicolon()
        return ("expr", e)

    def block(self) -> tuple:
        self.expect("{")
        body = []
        while not self.at("}"):
            if self.peek().kind == "eof":
                raise JSError("unterminated block")
            body.append(self.statement())
        self.expect("}")
        return ("block", body)

    def var_decl(self) -> tuple:
        kind = self.next().value  # var/let/const
        decls = []
        while True:
            target = self.binding_target()
            init = None
            if self.eat("="):
                init = self.assignment()
            decls.append((target, init))
            if not self.eat(","):
                break
        return ("vardecl", kind, decls)

    def binding_target(self):
        """identifier, or (recursively nested) array/object
        destructuring pattern. Array elements and object aliases are
        themselves binding targets, so `let [[a], {b: [c]}] = v` works."""
        if self.at("["):
            self.next()
            elems = []
            while not self.at("]"):
                if self.eat(","):
                    elems.append(None)
                    continue
                rest = self.eat("...")
                tgt = self.binding_target()
                default = self.assignment() if self.eat("=") else None
                elems.append(("rest" if rest else "elem", tgt, default))
                if not self.at("]"):
                    self.expect(",")
            self.expect("]")
            return ("apat", elems)
        if self.at("{"):
            self.next()
            props = []
            while not self.at("}"):
                key = self.ident_name()
                alias = ("id", key)
                if self.eat(":"):
                    alias = self.binding_target()
                default = self.assignment() if self.eat("=") else None
                props.append((key, alias, default))
                if not self.at("}"):
                    self.expect(",")
            self.expect("}")
            return ("opat", props)
        return ("id", self.ident_name())

    def ident_name(self) -> str:
        t = self.peek()
        if t.kind == "ident" or (t.kind == "keyword" and t.value in
                                 ("of", "in", "default", "undefined")):
            self.next()
            return t.value
        raise JSError(f"expected identifier, got {t.value!r} at {t.pos}")

    def function_decl(self) -> tuple:
        self.expect("function", "keyword")
        is_gen = self.eat("*")
        name = self.ident_name()
        params = self.param_list()
        self._gen.append(is_gen)
        try:
            body = self.block()
        finally:
            self._gen.pop()
        return ("funcdecl", name, params, body, is_gen)

    def class_decl(self, need_name: bool = True) -> tuple:
        self.expect("class", "keyword")
        name = None
        if need_name or self.peek().kind == "ident":
            name = self.ident_name()
        parent = None
        if self.eat("extends", "keyword"):
            parent = self.call_member()
        self.expect("{")
        ctor, methods, statics = None, [], []
        extra = {"get": [], "set": [], "sget": [], "sset": [],
                 "fields": [], "sfields": []}
        while not self.at("}"):
            if self.eat(";"):
                continue
            static = False
            if self.peek().kind == "ident" and self.peek().value == "static" \
                    and not (self.peek(1).kind == "punct"
                             and self.peek(1).value in ("(", "=")):
                self.next()
                static = True
            accessor = None
            # `get name(...)` / `set name(...)` — only when the token after
            # the NAME is "(" (so methods/fields literally named get/set,
            # `get() {}` and `get = 1`, still parse as members).
            if self.peek().kind in ("ident", "keyword") \
                    and self.peek().value in ("get", "set") \
                    and self.peek(1).kind in ("ident", "keyword", "str", "num") \
                    and self.peek(2).kind == "punct" \
                    and self.peek(2).value == "(":
                accessor = self.next().value
            is_gen = bool(self.eat("*"))
            if accessor and is_gen:
                raise JSError("an accessor cannot be a generator")
            mname = self.property_name()
            if not self.at("("):
                # public class field: `name = expr;` or bare `name;`
                if accessor or is_gen:
                    raise JSError(f"bad class member {mname!r}")
                init = self.assignment() if self.eat("=") else None
                self.eat(";")
                extra["sfields" if static else "fields"].append((mname, init))
                continue
            params = self.param_list()
            self._gen.append(is_gen)
            try:
                body = self.block()
            finally:
                self._gen.pop()
            if accessor == "get":
                if params:
                    raise JSError(f"getter {mname!r} must take no arguments")
                extra["sget" if static else "get"].append((mname, params, body))
            elif accessor == "set":
                if len(params) != 1:
                    raise JSError(f"setter {mname!r} must take one argument")
                extra["sset" if static else "set"].append((mname, params, body))
            elif mname == "constructor" and not static:
                if is_gen:
                    raise JSError("constructor cannot be a generator")
                ctor = (params, body)
            elif static:
                statics.append((mname, params, body, is_gen))
            else:
                methods.append((mname, params, body, is_gen))
        self.expect("}")
        return ("classdecl", name, parent, ctor, methods, statics, extra)

    def param_list(self) -> list:
        self.expect("(")
        params = []
        while not self.at(")"):
            rest = self.eat("...")
            if self.at("[") or self.at("{"):
                name = self.binding_target()  # destructured parameter
            else:
                name = self.ident_name()
            default = self.assignment() if self.eat("=") else None
            params.append(("rest" if rest else "param", name, default))
            if not self.at(")"):
                self.expect(",")
        self.expect(")")
        return params

    def if_stmt(self) -> tuple:
        self.expect("if", "keyword")
        self.expect("(")
        cond = self.expression()
        self.expect(")")
        then = self.statement()
        alt = None
        if self.eat("else", "keyword"):
            alt = self.statement()
        return ("if", cond, then, alt)

    def for_stmt(self) -> tuple:
        self.expect("for", "keyword")
        self.expect("(")
        init = None
        if not self.at(";"):
            if self.peek().kind == "keyword" and self.peek().value in (
                    "var", "let", "const"):
                init = self.var_decl()
                # for-in / for-of with a declaration
                if self.at_kw("in") or self.at_kw("of"):
                    is_of = self.next().value == "of"
                    obj = self.expression()
                    self.expect(")")
                    body = self.statement()
                    kind, decls = init[1], init[2]
                    if len(decls) != 1 or decls[0][1] is not None:
                        raise JSError("bad for-in/of declaration")
                    return ("forin_of", is_of, ("decl", kind, decls[0][0]),
                            obj, body)
            else:
                init = ("expr", self.expression(no_in=True))
                if self.at_kw("in") or self.at_kw("of"):
                    is_of = self.next().value == "of"
                    obj = self.expression()
                    self.expect(")")
                    body = self.statement()
                    return ("forin_of", is_of, ("target", init[1]), obj, body)
        self.expect(";")
        cond = None if self.at(";") else self.expression()
        self.expect(";")
        step = None if self.at(")") else self.expression()
        self.expect(")")
        body = self.statement()
        return ("for", init, cond, step, body)

    def try_stmt(self) -> tuple:
        self.expect("try", "keyword")
        block = self.block()
        catch = None
        fin = None
        if self.eat("catch", "keyword"):
            param = None
            if self.eat("("):
                param = self.binding_target()
                self.expect(")")
            catch = (param, self.block())
        if self.eat("finally", "keyword"):
            fin = self.block()
        if catch is None and fin is None:
            raise JSError("try needs catch or finally")
        return ("try", block, catch, fin)

    def switch_stmt(self) -> tuple:
        self.expect("switch", "keyword")
        self.expect("(")
        disc = self.expression()
        self.expect(")")
        self.expect("{")
        cases = []
        default_idx = None
        while not self.at("}"):
            if self.eat("case", "keyword"):
                test = self.expression()
                self.expect(":")
                stmts = []
                while not (self.at("}") or self.at_kw("case") or
                           self.at_kw("default")):
                    stmts.append(self.statement())
                cases.append((test, stmts))
            elif self.eat("default", "keyword"):
                self.expect(":")
                stmts = []
                while not (self.at("}") or self.at_kw("case") or
                           self.at_kw("default")):
                    stmts.append(self.statement())
                default_idx = len(cases)
                cases.append((None, stmts))
            else:
                raise JSError("expected case/default in switch")
        self.expect("}")
        return ("switch", disc, cases, default_idx)

    # -- expressions -----------------------------------------------------------

    def expression(self, no_in=False) -> tuple:
        e = self.assignment(no_in=no_in)
        while self.at(","):
            self.next()
            e = ("comma", e, self.assignment(no_in=no_in))
        return e

    _ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
                   "<<=", ">>=", ">>>=", "**=", "&&=", "||=", "??="}

    def assignment(self, no_in=False) -> tuple:
        t = self.peek()
        if self._gen[-1] and t.kind == "ident" and t.value == "yield":
            self.next()
            delegate = self.eat("*")
            nxt = self.peek()
            # a bare `yield` ends at a newline (restricted production)
            # or before any token that cannot start an operand
            if not delegate and (
                    nxt.kind == "eof" or nxt.nl_before
                    or (nxt.kind == "punct"
                        and nxt.value in (")", "]", "}", ",", ";", ":"))):
                return ("yield", None, False)
            return ("yield", self.assignment(no_in=no_in), delegate)
        arrow = self.try_arrow()
        if arrow is not None:
            return arrow
        left = self.conditional(no_in=no_in)
        t = self.peek()
        if t.kind == "punct" and t.value in self._ASSIGN_OPS:
            self.next()
            right = self.assignment(no_in=no_in)
            return ("assign", t.value, left, right)
        return left

    def try_arrow(self) -> Optional[tuple]:
        """Detect `ident =>` or `( params ) =>` with bounded lookahead."""
        t = self.peek()
        if t.kind == "ident" and self.peek(1).kind == "punct" and \
                self.peek(1).value == "=>":
            self.next()
            self.next()
            return self.arrow_body([("param", t.value, None)])
        if t.kind == "punct" and t.value == "(":
            # scan to the matching paren
            depth = 0
            j = self.i
            while j < len(self.toks):
                tk = self.toks[j]
                if tk.kind == "punct":
                    if tk.value == "(":
                        depth += 1
                    elif tk.value == ")":
                        depth -= 1
                        if depth == 0:
                            break
                j += 1
            nxt = self.toks[j + 1] if j + 1 < len(self.toks) else None
            if nxt is not None and nxt.kind == "punct" and nxt.value == "=>":
                params = self.param_list()
                self.expect("=>")
                return self.arrow_body(params)
        return None

    def arrow_body(self, params) -> tuple:
        self._gen.append(False)  # yield is not legal inside an arrow
        try:
            if self.at("{"):
                return ("arrow", params, self.block(), False)
            return ("arrow", params, self.assignment(), True)
        finally:
            self._gen.pop()

    def conditional(self, no_in=False) -> tuple:
        cond = self.binary(0, no_in=no_in)
        if self.eat("?"):
            a = self.assignment()
            self.expect(":")
            b = self.assignment(no_in=no_in)
            return ("cond", cond, a, b)
        return cond

    _BIN_PREC = {
        "??": 1, "||": 2, "&&": 3, "|": 4, "^": 5, "&": 6,
        "==": 7, "!=": 7, "===": 7, "!==": 7,
        "<": 8, ">": 8, "<=": 8, ">=": 8, "instanceof": 8, "in": 8,
        "<<": 9, ">>": 9, ">>>": 9,
        "+": 10, "-": 10,
        "*": 11, "/": 11, "%": 11,
        "**": 12,
    }

    def binary(self, min_prec: int, no_in=False) -> tuple:
        left = self.unary()
        while True:
            t = self.peek()
            op = None
            if t.kind == "punct" and t.value in self._BIN_PREC:
                op = t.value
            elif t.kind == "keyword" and t.value in ("instanceof", "in"):
                if t.value == "in" and no_in:
                    break
                op = t.value
            if op is None:
                break
            prec = self._BIN_PREC[op]
            if prec < min_prec:
                break
            self.next()
            right = self.binary(prec + (0 if op == "**" else 1), no_in=no_in)
            left = ("bin", op, left, right)
        return left

    def unary(self) -> tuple:
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "~", "+", "-", "++", "--"):
            self.next()
            if t.value in ("++", "--"):
                return ("update", t.value, self.unary(), True)
            return ("unary", t.value, self.unary())
        if t.kind == "keyword" and t.value in ("typeof", "delete", "void"):
            self.next()
            return ("unary", t.value, self.unary())
        return self.postfix()

    def postfix(self) -> tuple:
        e = self.call_member()
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--") and not t.nl_before:
            self.next()
            return ("update", t.value, e, False)
        return e

    def call_member(self) -> tuple:
        if self.at_kw("new"):
            self.next()
            callee = self.call_member_no_call()
            args = self.arguments() if self.at("(") else []
            e = ("new", callee, args)
        else:
            e = self.primary()
        while True:
            if self.at("."):
                self.next()
                name = self.property_name()
                e = ("member", e, ("lit", name), False)
            elif self.at("["):
                self.next()
                idx = self.expression()
                self.expect("]")
                e = ("member", e, idx, True)
            elif self.at("("):
                e = ("call", e, self.arguments())
            else:
                return e

    def call_member_no_call(self) -> tuple:
        e = self.primary()
        while True:
            if self.at("."):
                self.next()
                e = ("member", e, ("lit", self.property_name()), False)
            elif self.at("["):
                self.next()
                idx = self.expression()
                self.expect("]")
                e = ("member", e, idx, True)
            else:
                return e

    def property_name(self) -> str:
        t = self.next()
        if t.kind in ("ident", "keyword"):
            return t.value
        raise JSError(f"expected property name, got {t.value!r}")

    def arguments(self) -> list:
        self.expect("(")
        args = []
        while not self.at(")"):
            if self.eat("..."):
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if not self.at(")"):
                self.expect(",")
        self.expect(")")
        return args

    def primary(self) -> tuple:
        t = self.peek()
        if t.kind == "num":
            self.next()
            return ("lit", t.value)
        if t.kind == "str":
            self.next()
            return ("lit", t.value)
        if t.kind == "template":
            self.next()
            parts = []
            for p in t.value:
                if isinstance(p, tuple):
                    sub = Parser(p[1])
                    parts.append(("expr", sub.expression()))
                    if sub.peek().kind != "eof":
                        raise JSError("bad template expression")
                else:
                    parts.append(("str", p))
            return ("template", parts)
        if t.kind == "regex":
            self.next()
            return ("regex", t.value[0], t.value[1])
        if t.kind == "ident":
            self.next()
            return ("id", t.value)
        if t.kind == "keyword":
            v = t.value
            if v == "true":
                self.next()
                return ("lit", True)
            if v == "false":
                self.next()
                return ("lit", False)
            if v == "null":
                self.next()
                return ("lit", None)
            if v == "undefined":
                self.next()
                return ("lit", UNDEF)
            if v == "this":
                self.next()
                return ("this",)
            if v == "function":
                self.next()
                is_gen = self.eat("*")
                name = None
                if self.peek().kind == "ident":
                    name = self.next().value
                params = self.param_list()
                self._gen.append(is_gen)
                try:
                    body = self.block()
                finally:
                    self._gen.pop()
                return ("funcexpr", name, params, body, is_gen)
            if v == "class":
                d = self.class_decl(need_name=False)
                return ("classexpr",) + d[1:]
            if v == "super":
                self.next()
                return ("super",)
            if v in ("of", "in", "default"):  # contextual as identifier
                self.next()
                return ("id", v)
        if t.kind == "punct":
            if t.value == "(":
                self.next()
                e = self.expression()
                self.expect(")")
                return e
            if t.value == "[":
                self.next()
                elems = []
                while not self.at("]"):
                    if self.at(","):
                        self.next()
                        elems.append(("lit", UNDEF))
                        continue
                    if self.eat("..."):
                        elems.append(("spread", self.assignment()))
                    else:
                        elems.append(self.assignment())
                    if not self.at("]"):
                        self.expect(",")
                self.expect("]")
                return ("array", elems)
            if t.value == "{":
                return self.object_literal()
        raise JSError(f"unexpected token {t.value!r} at {t.pos}")

    def object_literal(self) -> tuple:
        self.expect("{")
        props = []
        while not self.at("}"):
            if self.eat("..."):
                props.append(("spread", self.assignment()))
            elif self.peek().kind in ("ident", "keyword") \
                    and self.peek().value in ("get", "set") \
                    and self.peek(1).kind in ("ident", "keyword", "str", "num") \
                    and self.peek(2).kind == "punct" \
                    and self.peek(2).value == "(":
                kind = self.next().value
                t = self.next()
                pname = (js_number_to_string(t.value) if t.kind == "num"
                         else str(t.value))
                params = self.param_list()
                body = self.block()
                if kind == "get" and params:
                    raise JSError(f"getter {pname!r} must take no arguments")
                if kind == "set" and len(params) != 1:
                    raise JSError(f"setter {pname!r} must take one argument")
                props.append(("accessor", kind, pname, params, body))
            elif self.at("*"):
                # generator method shorthand: { *name(params){ ... } }
                self.next()
                gname = self.property_name()
                params = self.param_list()
                self._gen.append(True)
                try:
                    body = self.block()
                finally:
                    self._gen.pop()
                props.append(("kv", ("lit", gname),
                              ("funcexpr", gname, params, body, True)))
            else:
                computed = False
                t = self.peek()
                if self.at("["):
                    self.next()
                    key = self.assignment()
                    self.expect("]")
                    computed = True
                elif t.kind == "str":
                    self.next()
                    key = ("lit", t.value)
                elif t.kind == "num":
                    self.next()
                    key = ("lit", js_number_to_string(t.value))
                else:
                    key = ("lit", self.property_name())
                if self.at("(") and not computed:
                    # method shorthand
                    params = self.param_list()
                    self._gen.append(False)
                    try:
                        body = self.block()
                    finally:
                        self._gen.pop()
                    props.append(("kv", key,
                                  ("funcexpr", key[1], params, body, False)))
                elif self.eat(":"):
                    props.append(("kv", key, self.assignment()))
                else:
                    # shorthand {a}
                    props.append(("kv", key, ("id", key[1])))
            if not self.at("}"):
                self.expect(",")
        self.expect("}")
        return ("object", props)


def parse_js(src: str) -> tuple:
    return Parser(src).parse_program()


# =============================================================================
# Values & conversions (spec §7 abstract operations)
# =============================================================================


class JSFunction:
    __slots__ = ("name", "params", "body", "env", "is_arrow", "is_expr",
                 "this_val", "home", "is_generator")

    def __init__(self, name, params, body, env, is_arrow=False, is_expr=False,
                 this_val=UNDEF, home=None, is_generator=False):
        self.name = name or ""
        self.params = params
        self.body = body
        self.env = env
        self.is_arrow = is_arrow
        self.is_expr = is_expr          # arrow with expression body
        self.this_val = this_val        # captured `this` for arrows
        self.home = home                # defining JSClass (for `super`)
        self.is_generator = is_generator


class JSClass:
    """ES2015 class (spec §14.5-14.6 subset: constructor, prototype +
    static methods, extends/super, get/set accessors (instance and
    static), public fields, generator methods). Instances are
    :class:`JSInstance` dicts — own fields are enumerable data
    properties, methods/accessors live on the class chain
    (non-enumerable, like a real prototype)."""

    __slots__ = ("name", "parent", "ctor", "methods", "statics",
                 "getters", "setters", "sgetters", "ssetters",
                 "fields", "props", "env")

    def __init__(self, name, parent, ctor, methods, statics):
        self.name = name or ""
        self.parent = parent            # JSClass | None
        self.ctor = ctor                # JSFunction | None
        self.methods = methods          # {name: JSFunction}
        self.statics = statics          # {name: JSFunction}
        self.getters = {}               # {name: JSFunction} (instance get)
        self.setters = {}               # {name: JSFunction} (instance set)
        self.sgetters = {}              # {name: JSFunction} (static get)
        self.ssetters = {}              # {name: JSFunction} (static set)
        self.fields = []                # [(name, init_expr|None)]
        self.props = {}                 # static data properties (C.x = 1)
        self.env = None                 # defining env (field initializers)

    def _find(self, attr, key):
        c = self
        while c is not None:
            m = getattr(c, attr).get(key)
            if m is not None:
                return m
            c = c.parent
        return None

    def find_method(self, key):
        return self._find("methods", key)

    def find_static(self, key):
        return self._find("statics", key)

    def find_getter(self, key):
        return self._find("getters", key)

    def find_setter(self, key):
        return self._find("setters", key)

    def find_static_getter(self, key):
        return self._find("sgetters", key)

    def find_static_setter(self, key):
        return self._find("ssetters", key)


class JSInstance(dict):
    """An object created by `new <class>`: a plain JS object (dict) plus
    the class pointer for method lookup and instanceof."""

    __slots__ = ("jsclass",)


class JSAccessorObject(dict):
    """An object-literal object that carries get/set accessor
    properties (spec §12.2.6). Accessors behave as enumerable own
    properties: reads invoke the getter, writes invoke the setter (a
    getter-only write is a sloppy-mode no-op), and keys()/items()/`in`
    include them — so for-in, Object.keys, JSON.stringify and
    js_export all see getter values with no special-casing. The
    C-level dict fast paths (dict(obj), dict.update(obj)) bypass these
    overrides, so object spread and Object.assign copy explicitly via
    .items()."""

    __slots__ = ("getters", "setters", "interp", "order")

    def __init__(self, interp):
        super().__init__()
        self.getters = {}
        self.setters = {}
        self.interp = interp
        self.order = []   # first-definition key order (spec: redefining
        #                   a property keeps its original position)

    def _track(self, key):
        if key not in self.order:
            self.order.append(key)

    def define(self, key, value):
        """Literal-construction semantics: a later data property
        replaces any accessor of the same name."""
        self.getters.pop(key, None)
        self.setters.pop(key, None)
        self._track(key)
        dict.__setitem__(self, key, value)

    def define_accessor(self, kind, key, fn):
        dict.pop(self, key, None)
        self._track(key)
        (self.getters if kind == "get" else self.setters)[key] = fn

    def __contains__(self, key):
        return (dict.__contains__(self, key) or key in self.getters
                or key in self.setters)

    def __getitem__(self, key):
        g = self.getters.get(key)
        if g is not None:
            return self.interp.call_function(g, self, [])
        if dict.__contains__(self, key):
            return dict.__getitem__(self, key)
        if key in self.setters:
            return UNDEF
        raise KeyError(key)

    def get(self, key, default=None):
        return self[key] if key in self else default

    def __setitem__(self, key, value):
        s = self.setters.get(key)
        if s is not None:
            self.interp.call_function(s, self, [value])
            return
        if key in self.getters:
            return  # getter-only property: sloppy-mode silent no-op
        self._track(key)
        dict.__setitem__(self, key, value)

    def __delitem__(self, key):
        had = key in self
        self.getters.pop(key, None)
        self.setters.pop(key, None)
        if key in self.order:
            self.order.remove(key)
        if dict.__contains__(self, key):
            dict.__delitem__(self, key)
        elif not had:
            raise KeyError(key)

    def keys(self):
        # definition order; untracked keys (C-level inserts that
        # bypassed __setitem__, e.g. dict.update) appended at the end
        out = [k for k in self.order
               if dict.__contains__(self, k) or k in self.getters
               or k in self.setters]
        out.extend(k for k in dict.keys(self) if k not in self.order)
        return out

    def __iter__(self):
        return iter(self.keys())

    def values(self):
        return [self[k] for k in self.keys()]

    def items(self):
        return [(k, self[k]) for k in self.keys()]


class _GenReturn(Exception):
    """Raised inside a generator body when the caller injects
    `gen.return(v)` — unwinds through `finally` blocks like a return."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


class _GenCore:
    """State shared between a JSGenerator wrapper and its body thread.
    The body thread references ONLY this core (never the wrapper), so
    abandoning a suspended generator lets the wrapper be collected:
    its weakref.finalize injects a return, the body unwinds through
    its finally blocks, and the thread exits. The two semaphores
    enforce strict lock-step handoff — exactly one of caller/body is
    runnable at any instant, so evaluation order (and the shared op
    budget) stays deterministic."""

    __slots__ = ("to_body", "to_caller", "inbox", "outbox", "state")

    def __init__(self):
        self.to_body = threading.Semaphore(0)
        self.to_caller = threading.Semaphore(0)
        self.inbox = None        # ("next"|"throw"|"return", value)
        self.outbox = None       # ("yield"|"return"|"error", value)
        self.state = "start"     # start | running | suspended | done

    def do_yield(self, value):
        """Body side of a `yield`: publish the value, sleep until the
        caller resumes, then surface whatever was injected."""
        self.outbox = ("yield", value)
        self.to_caller.release()
        self.to_body.acquire()
        kind, v = self.inbox
        if kind == "throw":
            raise v if isinstance(v, BaseException) else JSThrow(v)
        if kind == "return":
            raise _GenReturn(v)
        return v


def _abandon_gen_core(core: _GenCore) -> None:
    """weakref.finalize hook: unblock an abandoned suspended body so
    its thread unwinds (running finally blocks) and exits."""
    if core.state == "suspended":
        core.state = "done"
        core.inbox = ("return", UNDEF)
        core.to_body.release()


def _generator_body(interp, fn, env, core: _GenCore) -> None:
    try:
        v = interp._run_function_body(fn, env)
        core.outbox = ("return", v)
    except _GenReturn as r:
        core.outbox = ("return", r.value)
    except BaseException as e:  # JSThrow / JSError / op budget
        core.outbox = ("error", e)
    core.to_caller.release()


class JSGenerator:
    """Generator object (spec §27.5 subset: next/return/throw, iterable
    via for-of / spread / Array.from / yield*). See the module
    docstring for the thread-handoff execution model."""

    def __init__(self, interp, fn, env):
        self.interp = interp
        self.fn = fn
        self.env = env
        self.core = _GenCore()
        env.declare("__gen__", self.core)
        self._finalizer = weakref.finalize(self, _abandon_gen_core, self.core)

    def resume(self, kind: str, value):
        core = self.core
        if core.state == "running":
            raise JSThrow("TypeError: Generator is already running")
        if core.state == "done":
            if kind == "next":
                return {"value": UNDEF, "done": True}
            if kind == "return":
                return {"value": value, "done": True}
            raise value if isinstance(value, BaseException) else JSThrow(value)
        if core.state == "start":
            if kind == "return":
                core.state = "done"
                return {"value": value, "done": True}
            if kind == "throw":
                core.state = "done"
                raise value if isinstance(value, BaseException) \
                    else JSThrow(value)
            # first next(): the sent value is discarded (spec), the
            # body starts executing now
            core.state = "running"
            threading.Thread(
                target=_generator_body, name="js-generator",
                args=(self.interp, self.fn, self.env, core),
                daemon=True).start()
        else:  # suspended
            core.state = "running"
            core.inbox = (kind, value)
            core.to_body.release()
        core.to_caller.acquire()
        out, v = core.outbox
        if out == "yield":
            core.state = "suspended"
            return {"value": v, "done": False}
        core.state = "done"
        if out == "return":
            return {"value": v, "done": True}
        raise v

    def py_iter(self):
        while True:
            r = self.resume("next", UNDEF)
            if r["done"]:
                return
            yield r["value"]

    def __iter__(self):
        return self.py_iter()


class JSNativeIterator(JSGenerator):
    """Built-in iterator object (Array.prototype.keys/values/entries):
    a pre-materialized sequence exposed through the same next()/
    return()/throw() + for-of/spread protocol as JSGenerator, with no
    body thread."""

    def __init__(self, values):
        self._vals = list(values)
        self._i = 0

    def resume(self, kind: str, value):
        if kind == "return":
            self._i = len(self._vals)
            return {"value": value, "done": True}
        if kind == "throw":
            self._i = len(self._vals)
            raise value if isinstance(value, BaseException) else JSThrow(value)
        if self._i >= len(self._vals):
            return {"value": UNDEF, "done": True}
        v = self._vals[self._i]
        self._i += 1
        return {"value": v, "done": False}

    def py_iter(self):
        while self._i < len(self._vals):
            v = self._vals[self._i]
            self._i += 1
            yield v


def js_iter_values(v, interp=None):
    """Iterator-protocol values of a JS iterable (for-of / spread /
    Array.from / yield* share this). Lists/strings are snapshotted;
    a generator is consumed lazily (it may be infinite)."""
    if isinstance(v, list):
        return list(v)
    if isinstance(v, str):
        return list(v)
    if isinstance(v, JSMap):
        return v.iter_pairs()
    if isinstance(v, JSSet):
        return v.iter_values()
    if isinstance(v, JSGenerator):
        return v.py_iter()
    raise JSThrow(f"TypeError: {js_to_display(v)} is not iterable")


class NativeFunction:
    __slots__ = ("name", "fn")

    def __init__(self, name, fn):
        self.name = name
        self.fn = fn                    # fn(interp, this, args) -> value


class JSRegExp:
    __slots__ = ("source", "flags", "pattern", "last_index")

    def __init__(self, source: str, flags: str):
        self.source = source
        self.flags = flags
        pyflags = 0
        if "i" in flags:
            pyflags |= re.IGNORECASE
        if "m" in flags:
            pyflags |= re.MULTILINE
        if "s" in flags:
            pyflags |= re.DOTALL
        try:
            self.pattern = re.compile(_js_regex_to_py(source), pyflags)
        except re.error as e:
            raise JSThrow(f"SyntaxError: Invalid regular expression: {e}")
        self.last_index = 0


def _js_regex_to_py(src: str) -> str:
    # the common subset is compatible; translate \d etc. as-is and JS
    # escapes Python's re also understands. Convert (?<name>) fine too.
    return src


def _same_value_zero_key(v):
    """Hashable key under SameValueZero (spec 7.2.10): NaN keys collide,
    +0/-0 collide, primitives by value, everything else by identity (the
    original value is retained in the entry, so id() stays stable)."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, (int, float)):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        return ("num", f + 0.0)
    if isinstance(v, str):
        return ("str", v)
    if v is None:
        return ("null",)
    if v is UNDEF:
        return ("undef",)
    return ("ref", id(v))


class JSMap:
    """ES2015 Map (spec §23.1 subset): insertion-ordered, SameValueZero
    keys; get/set/has/delete/clear/size/forEach/keys/values/entries and
    for-of yield [key, value] pairs."""

    __slots__ = ("entries",)

    def __init__(self):
        self.entries: dict = {}  # svz-key -> (orig_key, value)

    def iter_pairs(self):
        return [[k, v] for k, v in self.entries.values()]


class JSSet:
    """ES2015 Set (spec §23.2 subset): insertion-ordered, SameValueZero
    membership; add/has/delete/clear/size/forEach and for-of yield the
    values."""

    __slots__ = ("entries",)

    def __init__(self):
        self.entries: dict = {}  # svz-key -> value

    def iter_values(self):
        return list(self.entries.values())


def js_typeof(v) -> str:
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "object"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (JSFunction, NativeFunction, _CallableNamespace, JSClass)):
        return "function"
    return "object"


def js_truthy(v) -> bool:
    if v is UNDEF or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_number_to_string(n) -> str:
    if isinstance(n, bool):
        return "true" if n else "false"
    f = float(n)
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    r = repr(f)
    if "e" in r:
        # JS style: 1e+30 / 1e-07 -> 1e-7
        mant, exp = r.split("e")
        exp_i = int(exp)
        if mant.endswith(".0"):
            mant = mant[:-2]
        return f"{mant}e{'+' if exp_i >= 0 else '-'}{abs(exp_i)}"
    return r


def js_to_string(v, interp=None) -> str:
    if isinstance(v, str):
        return v
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_number_to_string(v)
    if isinstance(v, list):
        return ",".join(
            "" if e is UNDEF or e is None else js_to_string(e, interp)
            for e in v
        )
    if isinstance(v, dict):
        ts = v.get("toString")
        if isinstance(ts, (JSFunction, NativeFunction)) and interp is not None:
            return js_to_string(interp.call_function(ts, v, []), interp)
        if "message" in v and v.get("name"):
            return f"{v['name']}: {js_to_string(v['message'], interp)}"
        return "[object Object]"
    if isinstance(v, (JSFunction, NativeFunction)):
        return f"function {v.name}() {{ [native code] }}"
    if isinstance(v, JSRegExp):
        return f"/{v.source}/{v.flags}"
    if isinstance(v, JSMap):
        return "[object Map]"
    if isinstance(v, JSSet):
        return "[object Set]"
    if isinstance(v, JSGenerator):
        return "[object Generator]"
    if isinstance(v, JSClass):
        return f"class {v.name} {{ [native code] }}"
    return str(v)


def js_to_display(v) -> str:
    try:
        return js_to_string(v)
    except Exception:
        return repr(v)


def js_to_number(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is UNDEF:
        return float("nan")
    if v is None:
        return 0.0
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0.0
        try:
            if s[:2].lower() == "0x":
                return float(int(s, 16))
            if s[:2].lower() == "0o":
                return float(int(s, 8))
            if s[:2].lower() == "0b":
                return float(int(s, 2))
            if s == "Infinity" or s == "+Infinity":
                return float("inf")
            if s == "-Infinity":
                return float("-inf")
            return float(s)
        except ValueError:
            return float("nan")
    if isinstance(v, list):
        if len(v) == 0:
            return 0.0
        if len(v) == 1:
            return js_to_number(v[0])
        return float("nan")
    return float("nan")


def js_to_int32(v) -> int:
    f = js_to_number(v)
    if math.isnan(f) or math.isinf(f):
        return 0
    i = int(f) & 0xFFFFFFFF
    return i - 0x100000000 if i & 0x80000000 else i


def js_to_uint32(v) -> int:
    f = js_to_number(v)
    if math.isnan(f) or math.isinf(f):
        return 0
    return int(f) & 0xFFFFFFFF


def js_strict_eq(a, b) -> bool:
    if a is UNDEF and b is UNDEF:
        return True
    if a is None and b is None:
        return True
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return False
        return fa == fb
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def js_loose_eq(a, b) -> bool:
    if js_strict_eq(a, b):
        return True
    nullish_a = a is None or a is UNDEF
    nullish_b = b is None or b is UNDEF
    if nullish_a or nullish_b:
        return nullish_a and nullish_b
    na = isinstance(a, (int, float)) and not isinstance(a, bool)
    nb = isinstance(b, (int, float)) and not isinstance(b, bool)
    if na and isinstance(b, str):
        return js_strict_eq(a, js_to_number(b))
    if isinstance(a, str) and nb:
        return js_strict_eq(js_to_number(a), b)
    if isinstance(a, bool):
        return js_loose_eq(js_to_number(a), b)
    if isinstance(b, bool):
        return js_loose_eq(a, js_to_number(b))
    if (na or isinstance(a, str)) and isinstance(b, (dict, list)):
        return js_loose_eq(a, js_to_primitive(b))
    if isinstance(a, (dict, list)) and (nb or isinstance(b, str)):
        return js_loose_eq(js_to_primitive(a), b)
    return False


def js_to_primitive(v):
    if isinstance(v, (dict, list)):
        return js_to_string(v)
    return v


def js_add(a, b):
    pa, pb = js_to_primitive(a), js_to_primitive(b)
    if isinstance(pa, str) or isinstance(pb, str):
        return js_to_string(pa) + js_to_string(pb)
    return js_to_number(pa) + js_to_number(pb)


def js_mod(a: float, b: float) -> float:
    if b == 0 or math.isnan(a) or math.isnan(b) or math.isinf(a):
        return float("nan")
    if math.isinf(b):
        return a
    if a == 0:
        return a
    return math.fmod(a, b)


# =============================================================================
# Environment & control flow
# =============================================================================


class Env:
    __slots__ = ("vars", "parent", "consts", "lexical")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent
        self.consts: set = set()
        self.lexical: set = set()   # names declared via let/const here

    def lookup(self, name: str):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise JSThrow(f"ReferenceError: {name} is not defined")

    def has(self, name: str) -> bool:
        e = self
        while e is not None:
            if name in e.vars:
                return True
            e = e.parent
        return False

    def assign(self, name: str, value) -> None:
        e = self
        while e is not None:
            if name in e.vars:
                if name in e.consts:
                    raise JSThrow(
                        f"TypeError: Assignment to constant variable.")
                e.vars[name] = value
                return
            e = e.parent
        # sloppy-mode implicit global
        root = self
        while root.parent is not None:
            root = root.parent
        root.vars[name] = value

    def declare(self, name: str, value, const=False, kind=None) -> None:
        """kind: "let"/"const" enforce the spec's no-redeclaration rule
        (goja parity: a global `let` re-run without IIFE encapsulation
        fails on the second invocation — the reference documents this
        exact caveat in the javascript processor's examples); "var" may
        not shadow a lexical name in the same scope; None (internal:
        params, this, arguments, hoisted functions) never errors."""
        if kind in ("let", "const") and name in self.vars:
            raise JSThrow(
                f"SyntaxError: Identifier '{name}' has already been "
                "declared")
        if kind == "var" and name in self.lexical:
            raise JSThrow(
                f"SyntaxError: Identifier '{name}' has already been "
                "declared")
        self.vars[name] = value
        if kind in ("let", "const"):
            self.lexical.add(name)
        if const:
            self.consts.add(name)


class _Break(Exception):
    def __init__(self, label=None):
        self.label = label


class _Continue(Exception):
    def __init__(self, label=None):
        self.label = label


class _Return(Exception):
    def __init__(self, value):
        self.value = value


# =============================================================================
# Interpreter
# =============================================================================


def _hoist(body: list, env: Env, interp) -> None:
    """Hoist `var` names (as undefined) and function declarations."""
    def walk_stmt(s):
        t = s[0]
        if t == "vardecl" and s[1] == "var":
            for target, _ in s[2]:
                for name in _pattern_names(target):
                    if name not in env.vars:
                        env.declare(name, UNDEF)
        elif t == "funcdecl":
            env.declare(s[1], JSFunction(s[1], s[2], s[3], env,
                                         is_generator=s[4]))
        elif t == "if":
            walk_stmt(s[2])
            if s[3]:
                walk_stmt(s[3])
        elif t == "block":
            for st in s[1]:
                walk_stmt(st)
        elif t in ("while", "dowhile"):
            walk_stmt(s[2])
        elif t == "for":
            if s[1] is not None and s[1][0] == "vardecl":
                walk_stmt(s[1])
            walk_stmt(s[4])
        elif t == "forin_of":
            if s[2][0] == "decl" and s[2][1] == "var":
                for name in _pattern_names(s[2][2]):
                    if name not in env.vars:
                        env.declare(name, UNDEF)
            walk_stmt(s[4])
        elif t == "try":
            walk_stmt(s[1])
            if s[2]:
                walk_stmt(s[2][1])
            if s[3]:
                walk_stmt(s[3])
        elif t == "switch":
            for _, stmts in s[2]:
                for st in stmts:
                    walk_stmt(st)
        elif t == "label":
            walk_stmt(s[2])

    for s in body:
        walk_stmt(s)


def _pattern_names(target) -> list:
    t = target[0]
    if t == "id":
        return [target[1]]
    if t == "apat":
        out = []
        for e in target[1]:
            if e is not None:
                out.extend(_pattern_names(e[1]))
        return out
    if t == "opat":
        out = []
        for _, alias, _ in target[1]:
            out.extend(_pattern_names(alias))
        return out
    return []


class Interpreter:
    def __init__(self, extra_globals: Optional[dict] = None,
                 console_writer: Optional[Callable] = None,
                 max_ops: int = 50_000_000):
        # builtins live in a PARENT scope of the user's global scope
        # (the global-object analog): `let Math = 5` legally shadows,
        # while re-declaring a user-level `let` errors like goja.
        self.global_env = Env()
        self.console_writer = console_writer or (lambda lvl, msg: None)
        self._ops = 0
        self.max_ops = max_ops
        self._rand_state = 0x9E3779B97F4A7C15
        install_globals(self)
        if extra_globals:
            for k, v in extra_globals.items():
                self.global_env.declare(k, v)
        self.global_env = Env(self.global_env)

    # -- public API ---------------------------------------------------------

    def run(self, program) -> Any:
        if isinstance(program, str):
            program = parse_js(program)
        # the op budget bounds ONE program execution — the runner pool
        # reuses interpreters across messages, so a cumulative counter
        # would start failing healthy messages after enough traffic
        self._ops = 0
        env = self.global_env
        _hoist(program[1], env, self)
        result = UNDEF
        for stmt in program[1]:
            result = self.exec_stmt(stmt, env)
        return result

    def call_function(self, fn, this, args: list):
        if isinstance(fn, NativeFunction):
            return fn.fn(self, this, args)
        if isinstance(fn, _CallableNamespace):
            return fn.fn(self, this, args)
        if isinstance(fn, JSClass):
            raise JSThrow(
                f"TypeError: Class constructor {fn.name} cannot be invoked "
                "without 'new'")
        if not isinstance(fn, JSFunction):
            raise JSThrow(f"TypeError: {js_to_display(fn)} is not a function")
        env = Env(fn.env)
        if fn.name and not fn.is_arrow:
            # named function expressions can call themselves by name
            env.declare(fn.name, fn)
        this_val = fn.this_val if fn.is_arrow else this
        env.declare("this", this_val)
        if fn.home is not None:
            env.declare("__home__", fn.home)
        if not fn.is_arrow:
            env.declare("arguments", list(args))
        i = 0
        for kind, name, default in fn.params:
            if kind == "rest":
                v = list(args[i:])
                i = len(args)
            else:
                v = args[i] if i < len(args) else UNDEF
                if v is UNDEF and default is not None:
                    v = self.eval_expr(default, env)
                i += 1
            if isinstance(name, tuple):   # destructured parameter
                self._bind_pattern(name, v, env, declare="var")
            else:
                env.declare(name, v)
        if fn.is_generator:
            # arguments are bound eagerly (above, incl. defaults), the
            # body is deferred until the first next() — spec §25.4
            return JSGenerator(self, fn, env)
        return self._run_function_body(fn, env)

    def _run_function_body(self, fn, env):
        if fn.is_expr:
            return self.eval_expr(fn.body, env)
        _hoist(fn.body[1], env, self)
        try:
            for stmt in fn.body[1]:
                self.exec_stmt(stmt, env)
        except _Return as r:
            return r.value
        return UNDEF

    # -- statements ----------------------------------------------------------

    def exec_stmt(self, s, env: Env):
        self._ops += 1
        if self._ops > self.max_ops:
            raise JSThrow("RangeError: script exceeded operation budget")
        t = s[0]
        if t == "expr":
            return self.eval_expr(s[1], env)
        if t == "vardecl":
            kind = s[1]
            for target, init in s[2]:
                v = self.eval_expr(init, env) if init is not None else UNDEF
                self._bind_pattern(target, v, env, declare=kind,
                                   const=(kind == "const"))
            return UNDEF
        if t == "funcdecl":
            env.declare(s[1], JSFunction(s[1], s[2], s[3], env,
                                         is_generator=s[4]))
            return UNDEF
        if t == "classdecl":
            env.declare(s[1], self._build_class(s, env), kind="let")
            return UNDEF
        if t == "block":
            benv = Env(env)
            r = UNDEF
            for st in s[1]:
                r = self.exec_stmt(st, benv)
            return r
        if t == "if":
            if js_truthy(self.eval_expr(s[1], env)):
                return self.exec_stmt(s[2], env)
            if s[3] is not None:
                return self.exec_stmt(s[3], env)
            return UNDEF
        if t in ("while", "dowhile", "for", "forin_of"):
            return self._exec_loop(s, env, None)
        if t == "label":
            body = s[2]
            try:
                if body[0] in ("while", "dowhile", "for", "forin_of"):
                    return self._exec_loop(body, env, s[1])
                return self.exec_stmt(body, env)
            except _Break as b:
                if b.label != s[1]:
                    raise
                return UNDEF
        if t == "return":
            raise _Return(UNDEF if s[1] is None else self.eval_expr(s[1], env))
        if t == "break":
            raise _Break(s[1])
        if t == "continue":
            raise _Continue(s[1])
        if t == "throw":
            raise JSThrow(self.eval_expr(s[1], env))
        if t == "try":
            _, block, catch, fin = s
            try:
                try:
                    self.exec_stmt(block, env)
                except JSThrow as e:
                    if catch is None:
                        raise
                    cenv = Env(env)
                    if catch[0] is not None:
                        self._bind_pattern(catch[0], e.value, cenv,
                                           declare="let")
                    self.exec_stmt(catch[1], cenv)
            finally:
                if fin is not None:
                    self.exec_stmt(fin, env)
            return UNDEF
        if t == "switch":
            _, disc_e, cases, default_idx = s
            disc = self.eval_expr(disc_e, env)
            senv = Env(env)
            start = None
            for idx, (test, _) in enumerate(cases):
                if test is not None and js_strict_eq(
                        disc, self.eval_expr(test, senv)):
                    start = idx
                    break
            if start is None:
                start = default_idx
            if start is not None:
                try:
                    for _, stmts in cases[start:]:
                        for st in stmts:
                            self.exec_stmt(st, senv)
                except _Break as b:
                    if b.label is not None:
                        raise
            return UNDEF
        if t == "empty":
            return UNDEF
        raise JSError(f"unknown statement {t}")

    def _exec_loop(self, s, env: Env, label):
        t = s[0]
        if t == "while":
            while js_truthy(self.eval_expr(s[1], env)):
                try:
                    self.exec_stmt(s[2], env)
                except _Break as b:
                    if b.label not in (None, label):
                        raise
                    break
                except _Continue as c:
                    if c.label not in (None, label):
                        raise
                    continue
            return UNDEF
        if t == "dowhile":
            while True:
                try:
                    self.exec_stmt(s[2], env)
                except _Break as b:
                    if b.label not in (None, label):
                        raise
                    break
                except _Continue as c:
                    if c.label not in (None, label):
                        raise
                if not js_truthy(self.eval_expr(s[1], env)):
                    break
            return UNDEF
        if t == "for":
            fenv = Env(env)
            init, cond, step, body = s[1], s[2], s[3], s[4]
            if init is not None:
                if init[0] == "vardecl":
                    self.exec_stmt(init, fenv)
                else:
                    self.eval_expr(init[1], fenv)
            while cond is None or js_truthy(self.eval_expr(cond, fenv)):
                try:
                    self.exec_stmt(body, Env(fenv))
                except _Break as b:
                    if b.label not in (None, label):
                        raise
                    break
                except _Continue as c:
                    if c.label not in (None, label):
                        raise
                if step is not None:
                    self.eval_expr(step, fenv)
            return UNDEF
        return self._exec_forin_of(s, env, label)

    def _exec_forin_of(self, s, env: Env, label=None):
        _, is_of, binding, obj_e, body = s
        obj = self.eval_expr(obj_e, env)
        if is_of:
            if isinstance(obj, str):
                seq = list(obj)
            elif isinstance(obj, list):
                seq = list(obj)
            elif isinstance(obj, JSMap):
                seq = obj.iter_pairs()
            elif isinstance(obj, JSSet):
                seq = obj.iter_values()
            elif isinstance(obj, JSGenerator):
                seq = obj.py_iter()   # lazy — the source may be infinite
            elif isinstance(obj, dict):
                raise JSThrow("TypeError: object is not iterable")
            else:
                raise JSThrow(
                    f"TypeError: {js_to_display(obj)} is not iterable")
        else:
            if isinstance(obj, dict):
                seq = list(obj.keys())
            elif isinstance(obj, list):
                seq = [str(i) for i in range(len(obj))]
            elif isinstance(obj, str):
                seq = [str(i) for i in range(len(obj))]
            elif obj is None or obj is UNDEF:
                seq = []
            else:
                seq = []
        for item in seq:
            ienv = Env(env)
            if binding[0] == "decl":
                self._bind_pattern(binding[2], item, ienv, declare=binding[1],
                                   const=(binding[1] == "const"))
            else:
                self._assign_target(binding[1], item, ienv)
            try:
                self.exec_stmt(body, ienv)
            except _Break as b:
                if b.label not in (None, label):
                    raise
                break
            except _Continue as c:
                if c.label not in (None, label):
                    raise
                continue
        return UNDEF

    def _bind_pattern(self, target, value, env: Env, declare=None,
                      const=False):
        t = target[0]
        if t == "id":
            if declare == "var":
                # var goes to nearest function/global env — approximated
                # by assignment after hoisting declared it there
                if env.has(target[1]):
                    env.assign(target[1], value)
                else:
                    env.declare(target[1], value)
            elif declare in ("let", "const"):
                env.declare(target[1], value, const=const, kind=declare)
            else:
                env.assign(target[1], value)
            return
        if t == "apat":
            if isinstance(value, list):
                src = value
            elif isinstance(value, (str, JSMap, JSSet)):
                src = list(js_iter_values(value, self))
            elif isinstance(value, JSGenerator):
                if any(e is not None and e[0] == "rest" for e in target[1]):
                    src = list(value.py_iter())
                else:
                    # pull only as many values as the pattern binds —
                    # the generator may be infinite
                    src, it = [], value.py_iter()
                    for _ in range(len(target[1])):
                        try:
                            src.append(next(it))
                        except StopIteration:
                            break
            else:
                raise JSThrow("TypeError: cannot destructure non-array")
            for i, e in enumerate(target[1]):
                if e is None:
                    continue
                kind, tgt, default = e
                if kind == "rest":
                    self._bind_pattern(tgt, src[i:], env,
                                       declare=declare, const=const)
                    break
                v = src[i] if i < len(src) else UNDEF
                if v is UNDEF and default is not None:
                    v = self.eval_expr(default, env)
                self._bind_pattern(tgt, v, env, declare=declare, const=const)
            return
        if t == "opat":
            if not isinstance(value, dict):
                raise JSThrow("TypeError: cannot destructure non-object")
            for key, alias, default in target[1]:
                v = value.get(key, UNDEF)
                if v is UNDEF and default is not None:
                    v = self.eval_expr(default, env)
                self._bind_pattern(alias, v, env, declare=declare,
                                   const=const)
            return
        raise JSError(f"bad binding target {t}")

    # -- expressions -----------------------------------------------------------

    def eval_expr(self, e, env: Env):
        self._ops += 1
        if self._ops > self.max_ops:
            raise JSThrow("RangeError: script exceeded operation budget")
        t = e[0]
        if t == "lit":
            return e[1]
        if t == "id":
            return env.lookup(e[1])
        if t == "this":
            return env.lookup("this") if env.has("this") else UNDEF
        if t == "template":
            out = []
            for p in e[1]:
                if p[0] == "str":
                    out.append(p[1])
                else:
                    out.append(js_to_string(self.eval_expr(p[1], env), self))
            return "".join(out)
        if t == "regex":
            return JSRegExp(e[1], e[2])
        if t == "array":
            out = []
            for el in e[1]:
                if el[0] == "spread":
                    v = self.eval_expr(el[1], env)
                    if isinstance(v, list):
                        out.extend(v)
                    elif isinstance(v, (str, JSMap, JSSet, JSGenerator)):
                        out.extend(js_iter_values(v, self))
                    else:
                        raise JSThrow("TypeError: spread of non-iterable")
                else:
                    out.append(self.eval_expr(el, env))
            return out
        if t == "object":
            has_accessors = any(p[0] == "accessor" for p in e[1])
            obj: dict = JSAccessorObject(self) if has_accessors else {}
            for p in e[1]:
                if p[0] == "spread":
                    v = self.eval_expr(p[1], env)
                    if isinstance(v, dict):
                        # .items() so source getters are read (spread
                        # copies VALUES; accessors don't transfer) and
                        # define-semantics on the target
                        for k, val in list(v.items()):
                            if has_accessors:
                                obj.define(k, val)
                            else:
                                obj[k] = val
                    continue
                if p[0] == "accessor":
                    _, kind, pname, params, body = p
                    obj.define_accessor(
                        kind, pname,
                        JSFunction(f"{kind} {pname}", params, body, env))
                    continue
                _, key_e, val_e = p
                key = key_e[1] if key_e[0] == "lit" else js_to_string(
                    self.eval_expr(key_e, env), self)
                val = self.eval_expr(val_e, env)
                if has_accessors:
                    obj.define(js_to_string(key, self), val)
                else:
                    obj[js_to_string(key, self)] = val
            return obj
        if t == "funcexpr":
            return JSFunction(e[1], e[2], e[3], env, is_generator=e[4])
        if t == "yield":
            if not env.has("__gen__"):
                raise JSThrow("SyntaxError: yield outside a generator")
            core = env.lookup("__gen__")
            if e[2]:
                return self._yield_star(e[1], env, core)
            v = self.eval_expr(e[1], env) if e[1] is not None else UNDEF
            return core.do_yield(v)
        if t == "classexpr":
            return self._build_class(e, env)
        if t == "super":
            raise JSThrow("SyntaxError: 'super' keyword unexpected here")
        if t == "arrow":
            this_val = env.lookup("this") if env.has("this") else UNDEF
            return JSFunction("", e[1], e[2], env, is_arrow=True,
                              is_expr=e[3], this_val=this_val)
        if t == "cond":
            return self.eval_expr(
                e[2] if js_truthy(self.eval_expr(e[1], env)) else e[3], env)
        if t == "comma":
            self.eval_expr(e[1], env)
            return self.eval_expr(e[2], env)
        if t == "bin":
            return self._eval_bin(e, env)
        if t == "unary":
            return self._eval_unary(e, env)
        if t == "update":
            return self._eval_update(e, env)
        if t == "assign":
            return self._eval_assign(e, env)
        if t == "member":
            if e[1] == ("super",):
                home = self._super_home(env)
                key = e[2][1] if e[2][0] == "lit" and not e[3] else \
                    js_to_string(self.eval_expr(e[2], env), self)
                m = home.parent.find_method(str(key))
                if m is None:
                    g = home.parent.find_getter(str(key))
                    if g is not None:
                        this = env.lookup("this") if env.has("this") else UNDEF
                        return self.call_function(g, this, [])
                return m if m is not None else UNDEF
            obj = self.eval_expr(e[1], env)
            key = e[2][1] if e[2][0] == "lit" and not e[3] else \
                self.eval_expr(e[2], env)
            return self.get_property(obj, key)
        if t == "call":
            return self._eval_call(e, env)
        if t == "new":
            return self._eval_new(e, env)
        raise JSError(f"unknown expression {t}")

    def _eval_bin(self, e, env):
        op = e[1]
        if op == "&&":
            l = self.eval_expr(e[2], env)
            return self.eval_expr(e[3], env) if js_truthy(l) else l
        if op == "||":
            l = self.eval_expr(e[2], env)
            return l if js_truthy(l) else self.eval_expr(e[3], env)
        if op == "??":
            l = self.eval_expr(e[2], env)
            return self.eval_expr(e[3], env) if l is None or l is UNDEF else l
        a = self.eval_expr(e[2], env)
        b = self.eval_expr(e[3], env)
        if op == "+":
            return js_add(a, b)
        if op == "-":
            return js_to_number(a) - js_to_number(b)
        if op == "*":
            return js_to_number(a) * js_to_number(b)
        if op == "/":
            na, nb = js_to_number(a), js_to_number(b)
            if nb == 0:
                if na == 0 or math.isnan(na):
                    return float("nan")
                sign = math.copysign(1, na) * math.copysign(1, nb)
                return float("inf") * sign
            return na / nb
        if op == "%":
            return js_mod(js_to_number(a), js_to_number(b))
        if op == "**":
            try:
                r = js_to_number(a) ** js_to_number(b)
                return float(r)
            except OverflowError:
                return float("inf")
        if op == "==":
            return js_loose_eq(a, b)
        if op == "!=":
            return not js_loose_eq(a, b)
        if op == "===":
            return js_strict_eq(a, b)
        if op == "!==":
            return not js_strict_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
            na, nb = js_to_number(a), js_to_number(b)
            if math.isnan(na) or math.isnan(nb):
                return False
            return {"<": na < nb, ">": na > nb,
                    "<=": na <= nb, ">=": na >= nb}[op]
        if op == "&":
            return float(js_to_int32(js_to_int32(a) & js_to_int32(b)))
        if op == "|":
            return float(js_to_int32(js_to_int32(a) | js_to_int32(b)))
        if op == "^":
            return float(js_to_int32(js_to_int32(a) ^ js_to_int32(b)))
        if op == "<<":
            return float(js_to_int32(
                (js_to_int32(a) << (js_to_uint32(b) & 31)) & 0xFFFFFFFF))
        if op == ">>":
            return float(js_to_int32(a) >> (js_to_uint32(b) & 31))
        if op == ">>>":
            return float(js_to_uint32(a) >> (js_to_uint32(b) & 31))
        if op == "instanceof":
            return self._instanceof(a, b)
        if op == "in":
            if isinstance(b, dict):
                return js_to_string(a, self) in b
            if isinstance(b, list):
                n = js_to_number(a)
                return not math.isnan(n) and 0 <= int(n) < len(b)
            raise JSThrow("TypeError: 'in' on non-object")
        raise JSError(f"unknown binary op {op}")

    def _instanceof(self, a, b):
        if isinstance(b, JSClass):
            c = a.jsclass if isinstance(a, JSInstance) else None
            while c is not None:
                if c is b:
                    return True
                c = c.parent
            return False
        name = getattr(b, "name", None)
        if name == "Array":
            return isinstance(a, list)
        if name == "Object":
            return isinstance(a, (dict, list))
        if name == "Function":
            return isinstance(a, (JSFunction, NativeFunction))
        if name == "RegExp":
            return isinstance(a, JSRegExp)
        if name == "Map":
            return isinstance(a, JSMap)
        if name == "Set":
            return isinstance(a, JSSet)
        if name in ("Error", "TypeError", "RangeError", "SyntaxError"):
            return isinstance(a, dict) and "message" in a and "name" in a
        return False

    def _eval_unary(self, e, env):
        op = e[1]
        if op == "typeof":
            if e[2][0] == "id" and not env.has(e[2][1]):
                return "undefined"
            return js_typeof(self.eval_expr(e[2], env))
        if op == "delete":
            target = e[2]
            if target[0] != "member":
                return True
            obj = self.eval_expr(target[1], env)
            key = target[2][1] if target[2][0] == "lit" and not target[3] \
                else self.eval_expr(target[2], env)
            if isinstance(obj, dict):
                # `del` (not dict.pop) so JSAccessorObject.__delitem__
                # also clears accessor slots
                try:
                    del obj[js_to_string(key, self)]
                except KeyError:
                    pass
                return True
            if isinstance(obj, list):
                n = js_to_number(key)
                i = int(n) if not math.isnan(n) else -1
                if 0 <= i < len(obj):
                    obj[i] = UNDEF
                return True
            return True
        v = self.eval_expr(e[2], env)
        if op == "!":
            return not js_truthy(v)
        if op == "-":
            return -js_to_number(v)
        if op == "+":
            return js_to_number(v)
        if op == "~":
            return float(~js_to_int32(v) if js_to_int32(v) != -0x80000000
                         else 0x7FFFFFFF)
        if op == "void":
            return UNDEF
        raise JSError(f"unknown unary {op}")

    def _eval_update(self, e, env):
        _, op, target, prefix = e
        old = js_to_number(self._read_target(target, env))
        new = old + (1 if op == "++" else -1)
        self._assign_target(target, new, env)
        return new if prefix else old

    def _read_target(self, target, env):
        if target[0] == "id":
            return env.lookup(target[1])
        if target[0] == "member":
            obj = self.eval_expr(target[1], env)
            key = target[2][1] if target[2][0] == "lit" and not target[3] \
                else self.eval_expr(target[2], env)
            return self.get_property(obj, key)
        raise JSThrow("ReferenceError: invalid assignment target")

    def _assign_target(self, target, value, env):
        if target[0] == "id":
            env.assign(target[1], value)
            return
        if target[0] == "member":
            obj = self.eval_expr(target[1], env)
            key = target[2][1] if target[2][0] == "lit" and not target[3] \
                else self.eval_expr(target[2], env)
            self.set_property(obj, key, value)
            return
        if target[0] in ("apat", "opat", "array", "object"):
            # destructuring assignment (without declaration)
            pat = _expr_to_pattern(target)
            self._bind_pattern(pat, value, env, declare=None)
            return
        raise JSThrow("ReferenceError: invalid assignment target")

    _COMPOUND = {
        "+=": js_add,
        "-=": lambda a, b: js_to_number(a) - js_to_number(b),
        "*=": lambda a, b: js_to_number(a) * js_to_number(b),
        "/=": lambda a, b: js_to_number(a) / js_to_number(b)
        if js_to_number(b) != 0 else float("inf") * math.copysign(
            1, js_to_number(a)) if js_to_number(a) != 0 else float("nan"),
        "%=": lambda a, b: js_mod(js_to_number(a), js_to_number(b)),
        "&=": lambda a, b: float(js_to_int32(a) & js_to_int32(b)),
        "|=": lambda a, b: float(js_to_int32(a) | js_to_int32(b)),
        "^=": lambda a, b: float(js_to_int32(a) ^ js_to_int32(b)),
        "**=": lambda a, b: float(js_to_number(a) ** js_to_number(b)),
        "<<=": lambda a, b: float(js_to_int32(
            (js_to_int32(a) << (js_to_uint32(b) & 31)) & 0xFFFFFFFF)),
        ">>=": lambda a, b: float(js_to_int32(a) >> (js_to_uint32(b) & 31)),
        ">>>=": lambda a, b: float(js_to_uint32(a) >> (js_to_uint32(b) & 31)),
    }

    def _eval_assign(self, e, env):
        _, op, target, value_e = e
        if op == "=":
            v = self.eval_expr(value_e, env)
            self._assign_target(target, v, env)
            return v
        if op in ("&&=", "||=", "??="):
            cur = self._read_target(target, env)
            if op == "&&=" and not js_truthy(cur):
                return cur
            if op == "||=" and js_truthy(cur):
                return cur
            if op == "??=" and not (cur is None or cur is UNDEF):
                return cur
            v = self.eval_expr(value_e, env)
            self._assign_target(target, v, env)
            return v
        cur = self._read_target(target, env)
        v = self._COMPOUND[op](cur, self.eval_expr(value_e, env))
        self._assign_target(target, v, env)
        return v

    def _eval_call(self, e, env):
        _, callee, arg_es = e
        args = []
        for a in arg_es:
            if a[0] == "spread":
                v = self.eval_expr(a[1], env)
                if isinstance(v, list):
                    args.extend(v)
                elif isinstance(v, (str, JSMap, JSSet, JSGenerator)):
                    args.extend(js_iter_values(v, self))
                else:
                    raise JSThrow("TypeError: spread of non-iterable")
            else:
                args.append(self.eval_expr(a, env))
        if callee == ("super",):
            # super(...) — run the parent constructor chain on this,
            # then this class's field initializers (spec: fields of a
            # derived class initialize when super() returns)
            home = self._super_home(env)
            this = env.lookup("this") if env.has("this") else UNDEF
            self._construct_init(home.parent, this, args)
            if isinstance(this, (JSInstance, dict)):
                self._init_fields(home, this)
            return UNDEF
        if callee[0] == "member":
            if callee[1] == ("super",):
                home = self._super_home(env)
                key = callee[2][1] if callee[2][0] == "lit" and not callee[3] \
                    else js_to_string(self.eval_expr(callee[2], env), self)
                fn = home.parent.find_method(str(key))
                if fn is None:
                    raise JSThrow(
                        f"TypeError: (intermediate value).{key} is not a "
                        "function")
                this = env.lookup("this") if env.has("this") else UNDEF
                return self.call_function(fn, this, args)
            obj = self.eval_expr(callee[1], env)
            key = callee[2][1] if callee[2][0] == "lit" and not callee[3] \
                else js_to_string(self.eval_expr(callee[2], env), self)
            fn = self.get_property(obj, key)
            if fn is UNDEF or fn is None:
                raise JSThrow(
                    f"TypeError: {js_to_display(obj)[:40]}.{key} is not a "
                    "function")
            return self.call_function(fn, obj, args)
        fn = self.eval_expr(callee, env)
        return self.call_function(fn, UNDEF, args)

    def _yield_star(self, inner_e, env, core):
        """`yield* expr` — delegate to an inner iterable. For a
        generator, two-way traffic is forwarded (sent values, throw(),
        return()) and the delegation's value is the inner generator's
        return value (spec §27.5.3.7); for plain iterables each value
        is yielded and the delegation evaluates to undefined."""
        inner = self.eval_expr(inner_e, env)
        if isinstance(inner, JSGenerator):
            sent = UNDEF
            res = inner.resume("next", sent)
            while True:
                if res["done"]:
                    return res["value"]
                try:
                    sent = core.do_yield(res["value"])
                except _GenReturn as r:
                    inner.resume("return", r.value)
                    raise
                except JSThrow as exc:
                    # forward to the inner generator; if it doesn't
                    # catch, resume() re-raises out of this body
                    res = inner.resume("throw", exc)
                    continue
                res = inner.resume("next", sent)
        for v in js_iter_values(inner, self):
            core.do_yield(v)
        return UNDEF

    def _build_class(self, node, env) -> "JSClass":
        _, name, parent_e, ctor_node, method_nodes, static_nodes, extra = node
        parent = None
        if parent_e is not None:
            parent = self.eval_expr(parent_e, env)
            if not isinstance(parent, JSClass):
                raise JSThrow(
                    f"TypeError: Class extends value {js_to_display(parent)} "
                    "is not a constructor")
        cls = JSClass(name, parent, None, {}, {})
        # inner scope carrying the class binding itself (spec: the
        # class name is in scope inside the class body — static field
        # initializers and class-expression methods can reference it)
        cenv = Env(env)
        if name:
            cenv.declare(name, cls, kind="const")
        cls.env = cenv
        if ctor_node is not None:
            cls.ctor = JSFunction("constructor", ctor_node[0], ctor_node[1],
                                  cenv, home=cls)
        for mname, params, body, is_gen in method_nodes:
            cls.methods[mname] = JSFunction(mname, params, body, cenv,
                                            home=cls, is_generator=is_gen)
        for mname, params, body, is_gen in static_nodes:
            cls.statics[mname] = JSFunction(mname, params, body, cenv,
                                            home=cls, is_generator=is_gen)
        for slot, key in (("getters", "get"), ("setters", "set"),
                          ("sgetters", "sget"), ("ssetters", "sset")):
            for mname, params, body in extra[key]:
                getattr(cls, slot)[mname] = JSFunction(
                    mname, params, body, cenv, home=cls)
        cls.fields = list(extra["fields"])
        for fname, init_e in extra["sfields"]:
            fenv = Env(cenv)
            fenv.declare("this", cls)
            fenv.declare("__home__", cls)
            cls.props[fname] = (self.eval_expr(init_e, fenv)
                                if init_e is not None else UNDEF)
        return cls

    def _init_fields(self, cls: "JSClass", this) -> None:
        """Evaluate class field initializers onto `this` (spec: at the
        top of a base-class constructor / right after super() returns
        in a derived one; `this` is the instance)."""
        for fname, init_e in cls.fields:
            fenv = Env(cls.env)
            fenv.declare("this", this)
            fenv.declare("__home__", cls)
            this[fname] = (self.eval_expr(init_e, fenv)
                           if init_e is not None else UNDEF)

    def _construct_init(self, cls: "JSClass", this, args) -> None:
        """Run the constructor chain onto `this` (spec: a missing
        constructor is `constructor(...a){ super(...a) }`). Field
        initialization: for a class with its own ctor and a parent,
        the explicit super() call inside the ctor triggers
        _init_fields (see _eval_call); otherwise fields run here,
        parent-first."""
        if cls.ctor is not None:
            if cls.parent is None:
                self._init_fields(cls, this)
            self.call_function(cls.ctor, this, args)
        else:
            if cls.parent is not None:
                self._construct_init(cls.parent, this, args)
            self._init_fields(cls, this)

    def _super_home(self, env) -> "JSClass":
        if not env.has("__home__"):
            raise JSThrow("SyntaxError: 'super' keyword unexpected here")
        home = env.lookup("__home__")
        if home.parent is None:
            raise JSThrow(
                f"SyntaxError: 'super' used in class {home.name!r} which "
                "does not extend anything")
        return home

    def _eval_new(self, e, env):
        _, callee_e, arg_es = e
        fn = self.eval_expr(callee_e, env)
        args = [self.eval_expr(a, env) for a in arg_es]
        if isinstance(fn, JSClass):
            inst = JSInstance()
            inst.jsclass = fn
            self._construct_init(fn, inst, args)
            return inst
        name = getattr(fn, "name", "")
        if name in ("Error", "TypeError", "RangeError", "SyntaxError"):
            msg = js_to_string(args[0], self) if args else ""
            return {"name": name, "message": msg,
                    "stack": f"{name}: {msg}"}
        if name == "Array":
            if len(args) == 1 and isinstance(args[0], (int, float)):
                return [UNDEF] * int(args[0])
            return list(args)
        if name == "Object":
            return {}
        if name == "RegExp":
            src = args[0] if args else ""
            if isinstance(src, JSRegExp):
                return src
            return JSRegExp(js_to_string(src, self),
                            js_to_string(args[1], self) if len(args) > 1
                            else "")
        if name == "Map":
            m = JSMap()
            if args and args[0] is not UNDEF and args[0] is not None:
                src = args[0]
                if isinstance(src, (JSMap, JSGenerator)):
                    src = list(js_iter_values(src, self))
                if not isinstance(src, list):
                    raise JSThrow("TypeError: Map constructor argument is not iterable")
                for pair in src:
                    if not isinstance(pair, list) or len(pair) < 2:
                        raise JSThrow("TypeError: Iterator value is not an entry object")
                    m.entries[_same_value_zero_key(pair[0])] = (pair[0], pair[1])
            return m
        if name == "Set":
            s = JSSet()
            if args and args[0] is not UNDEF and args[0] is not None:
                src = args[0]
                vals = (
                    src.iter_values() if isinstance(src, JSSet)
                    else src.iter_pairs() if isinstance(src, JSMap)
                    else list(src) if isinstance(src, (list, str))
                    else list(src.py_iter()) if isinstance(src, JSGenerator)
                    else None
                )
                if vals is None:
                    raise JSThrow("TypeError: Set constructor argument is not iterable")
                for v in vals:
                    s.entries[_same_value_zero_key(v)] = v
            return s
        if name == "Date":
            raise JSThrow(
                "TypeError: Date is not supported by this engine — wall-clock "
                "time would break exactly-once redelivery (re-running a batch "
                "must reproduce bytes). Stamp event time upstream in the "
                "pipeline (the message's event_ts column / metadata) instead")
        if isinstance(fn, JSFunction):
            if fn.is_generator:
                raise JSThrow(
                    f"TypeError: {fn.name or 'anonymous'} is not a "
                    "constructor (generator functions cannot be new'd)")
            obj: dict = {}
            r = self.call_function(fn, obj, args)
            return r if isinstance(r, (dict, list)) else obj
        raise JSThrow(f"TypeError: {js_to_display(fn)} is not a constructor")

    # -- property access ------------------------------------------------------

    def get_property(self, obj, key):
        if obj is None or obj is UNDEF:
            raise JSThrow(
                f"TypeError: Cannot read properties of "
                f"{'null' if obj is None else 'undefined'} (reading "
                f"'{js_to_display(key)}')")
        if isinstance(key, (int, float)) and not isinstance(key, bool):
            if isinstance(obj, list):
                i = int(key)
                if 0 <= i < len(obj):
                    return obj[i]
                return UNDEF
            if isinstance(obj, str):
                i = int(key)
                if 0 <= i < len(obj):
                    return obj[i]
                return UNDEF
            key = js_number_to_string(key)
        key = js_to_string(key, self)
        if isinstance(obj, JSGenerator):
            if key == "next":
                return NativeFunction("next", lambda i, t, a: obj.resume(
                    "next", a[0] if a else UNDEF))
            if key == "return":
                return NativeFunction("return", lambda i, t, a: obj.resume(
                    "return", a[0] if a else UNDEF))
            if key == "throw":
                return NativeFunction("throw", lambda i, t, a: obj.resume(
                    "throw", a[0] if a else UNDEF))
            return UNDEF
        if isinstance(obj, JSClass):
            if key == "name":
                return obj.name
            g = obj.find_static_getter(key)
            if g is not None:
                return self.call_function(g, obj, [])
            m = obj.find_static(key)
            if m is not None:
                return m
            c = obj
            while c is not None:
                if key in c.props:
                    return c.props[key]
                c = c.parent
            return UNDEF
        if isinstance(obj, dict):
            if key in obj:
                return obj[key]
            if isinstance(obj, JSInstance):
                if key == "constructor":
                    return obj.jsclass
                g = obj.jsclass.find_getter(key)
                if g is not None:
                    return self.call_function(g, obj, [])
                m = obj.jsclass.find_method(key)
                if m is not None:
                    return m
            return _object_proto(self, obj, key)
        if isinstance(obj, list):
            if key == "length":
                return float(len(obj))
            if key.lstrip("-").isdigit():
                i = int(key)
                return obj[i] if 0 <= i < len(obj) else UNDEF
            return _array_proto(self, obj, key)
        if isinstance(obj, str):
            if key == "length":
                return float(len(obj))
            if key.isdigit():
                i = int(key)
                return obj[i] if i < len(obj) else UNDEF
            return _string_proto(self, obj, key)
        if isinstance(obj, bool):
            return _generic_proto(self, obj, key)
        if isinstance(obj, (int, float)):
            return _number_proto(self, obj, key)
        if isinstance(obj, JSRegExp):
            if key == "source":
                return obj.source
            if key == "flags":
                return obj.flags
            if key == "lastIndex":
                return float(obj.last_index)
            if key == "global":
                return "g" in obj.flags
            return _regex_proto(self, obj, key)
        if isinstance(obj, JSMap):
            if key == "size":
                return float(len(obj.entries))
            return _map_proto(self, obj, key)
        if isinstance(obj, JSSet):
            if key == "size":
                return float(len(obj.entries))
            return _set_proto(self, obj, key)
        if isinstance(obj, (JSFunction, NativeFunction)):
            if key == "name":
                return obj.name
            if key == "call":
                return NativeFunction("call", lambda i, t, a: i.call_function(
                    obj, a[0] if a else UNDEF, a[1:]))
            if key == "apply":
                return NativeFunction("apply", lambda i, t, a: i.call_function(
                    obj, a[0] if a else UNDEF,
                    a[1] if len(a) > 1 and isinstance(a[1], list) else []))
            if key == "bind":
                def _bind(i, t, a):
                    bound_this = a[0] if a else UNDEF
                    pre = a[1:]
                    return NativeFunction(
                        obj.name,
                        lambda i2, t2, a2: i2.call_function(
                            obj, bound_this, pre + a2))
                return NativeFunction("bind", _bind)
            return UNDEF
        return UNDEF

    def set_property(self, obj, key, value):
        if isinstance(obj, JSClass):
            k = js_to_string(key, self)
            s = obj.find_static_setter(k)
            if s is not None:
                self.call_function(s, obj, [value])
            elif obj.find_static_getter(k) is None:
                obj.props[k] = value
            return  # static getter-only: sloppy-mode no-op
        if isinstance(obj, JSInstance):
            k = js_to_string(key, self)
            if not dict.__contains__(obj, k):
                s = obj.jsclass.find_setter(k)
                if s is not None:
                    self.call_function(s, obj, [value])
                    return
                if obj.jsclass.find_getter(k) is not None:
                    return  # getter-only accessor: sloppy-mode no-op
            dict.__setitem__(obj, k, value)
            return
        if isinstance(obj, dict):
            obj[js_to_string(key, self)] = value
            return
        if isinstance(obj, list):
            if isinstance(key, str) and key == "length":
                n = int(js_to_number(value))
                del obj[n:]
                while len(obj) < n:
                    obj.append(UNDEF)
                return
            n = js_to_number(key)
            if math.isnan(n):
                raise JSThrow("TypeError: bad array index")
            i = int(n)
            while len(obj) <= i:
                obj.append(UNDEF)
            obj[i] = value
            return
        if isinstance(obj, JSRegExp) and key == "lastIndex":
            obj.last_index = int(js_to_number(value))
            return
        if obj is None or obj is UNDEF:
            raise JSThrow(
                f"TypeError: Cannot set properties of "
                f"{'null' if obj is None else 'undefined'}")
        # setting on primitives is a silent no-op in sloppy mode


def _expr_to_pattern(e):
    """Convert an expression AST used as a destructuring assignment
    target into a binding pattern."""
    if e[0] in ("apat", "opat", "id"):
        return e
    if e[0] == "array":
        elems = []
        for el in e[1]:
            if el[0] == "id":
                elems.append(("elem", el, None))
            elif el[0] in ("array", "object"):
                elems.append(("elem", _expr_to_pattern(el), None))
            elif el[0] == "spread" and el[1][0] == "id":
                elems.append(("rest", el[1], None))
            elif el[0] == "lit" and el[1] is UNDEF:
                elems.append(None)
            else:
                raise JSThrow("SyntaxError: unsupported destructuring")
        return ("apat", elems)
    if e[0] == "object":
        props = []
        for p in e[1]:
            if p[0] != "kv" or p[1][0] != "lit" or \
                    p[2][0] not in ("id", "array", "object"):
                raise JSThrow("SyntaxError: unsupported destructuring")
            props.append((p[1][1], _expr_to_pattern(p[2]), None))
        return ("opat", props)
    raise JSThrow("SyntaxError: unsupported destructuring target")


# =============================================================================
# Built-in prototypes (dispatch tables, spec §21-25 subset)
# =============================================================================


def _nf(name):
    def deco(fn):
        return NativeFunction(name, fn)
    return deco


def _cmp_default(a, b) -> int:
    sa, sb = js_to_string(a), js_to_string(b)
    return -1 if sa < sb else (1 if sa > sb else 0)


def _map_proto(interp, m: JSMap, key: str):
    if key == "get":
        return NativeFunction("get", lambda i, t, a: t.entries.get(
            _same_value_zero_key(a[0] if a else UNDEF), (None, UNDEF))[1])
    if key == "set":
        def _set(i, t, a):
            k = a[0] if a else UNDEF
            t.entries[_same_value_zero_key(k)] = (k, a[1] if len(a) > 1 else UNDEF)
            return t
        return NativeFunction("set", _set)
    if key == "has":
        return NativeFunction("has", lambda i, t, a: _same_value_zero_key(
            a[0] if a else UNDEF) in t.entries)
    if key == "delete":
        return NativeFunction("delete", lambda i, t, a: t.entries.pop(
            _same_value_zero_key(a[0] if a else UNDEF), _MISS) is not _MISS)
    if key == "clear":
        return NativeFunction("clear", lambda i, t, a: (t.entries.clear(), UNDEF)[1])
    if key == "forEach":
        def _foreach(i, t, a):
            fn = a[0] if a else UNDEF
            this_arg = a[1] if len(a) > 1 else UNDEF
            for k, v in list(t.entries.values()):
                i.call_function(fn, this_arg, [v, k, t])
            return UNDEF
        return NativeFunction("forEach", _foreach)
    if key == "keys":
        return NativeFunction("keys", lambda i, t, a: [k for k, _ in t.entries.values()])
    if key == "values":
        return NativeFunction("values", lambda i, t, a: [v for _, v in t.entries.values()])
    if key == "entries":
        return NativeFunction("entries", lambda i, t, a: t.iter_pairs())
    if key == "toString":
        return NativeFunction("toString", lambda i, t, a: "[object Map]")
    return UNDEF


def _set_proto(interp, s: JSSet, key: str):
    if key == "add":
        def _add(i, t, a):
            v = a[0] if a else UNDEF
            t.entries[_same_value_zero_key(v)] = v
            return t
        return NativeFunction("add", _add)
    if key == "has":
        return NativeFunction("has", lambda i, t, a: _same_value_zero_key(
            a[0] if a else UNDEF) in t.entries)
    if key == "delete":
        return NativeFunction("delete", lambda i, t, a: t.entries.pop(
            _same_value_zero_key(a[0] if a else UNDEF), _MISS) is not _MISS)
    if key == "clear":
        return NativeFunction("clear", lambda i, t, a: (t.entries.clear(), UNDEF)[1])
    if key == "forEach":
        def _foreach(i, t, a):
            fn = a[0] if a else UNDEF
            this_arg = a[1] if len(a) > 1 else UNDEF
            for v in list(t.entries.values()):
                i.call_function(fn, this_arg, [v, v, t])
            return UNDEF
        return NativeFunction("forEach", _foreach)
    if key in ("keys", "values"):
        return NativeFunction(key, lambda i, t, a: t.iter_values())
    if key == "entries":
        return NativeFunction("entries", lambda i, t, a: [[v, v] for v in t.iter_values()])
    if key == "toString":
        return NativeFunction("toString", lambda i, t, a: "[object Set]")
    return UNDEF


_MISS = object()  # sentinel for Map/Set delete


def _array_proto(interp, arr: list, key: str):
    if key == "push":
        return NativeFunction("push", lambda i, t, a: (
            t.extend(a), float(len(t)))[1])
    if key == "pop":
        return NativeFunction("pop", lambda i, t, a: t.pop() if t else UNDEF)
    if key == "shift":
        return NativeFunction("shift", lambda i, t, a: t.pop(0) if t else UNDEF)
    if key == "unshift":
        def _unshift(i, t, a):
            t[0:0] = a
            return float(len(t))
        return NativeFunction("unshift", _unshift)
    if key == "slice":
        def _slice(i, t, a):
            s = int(js_to_number(a[0])) if a and a[0] is not UNDEF else 0
            e = int(js_to_number(a[1])) if len(a) > 1 and a[1] is not UNDEF \
                else len(t)
            return t[_norm_idx(s, len(t)):_norm_idx(e, len(t))]
        return NativeFunction("slice", _slice)
    if key == "splice":
        def _splice(i, t, a):
            start = _norm_idx(int(js_to_number(a[0])) if a else 0, len(t))
            dc = int(js_to_number(a[1])) if len(a) > 1 else len(t) - start
            dc = max(0, min(dc, len(t) - start))
            removed = t[start:start + dc]
            t[start:start + dc] = list(a[2:])
            return removed
        return NativeFunction("splice", _splice)
    if key == "indexOf":
        def _indexof(i, t, a):
            x = a[0] if a else UNDEF
            for idx, v in enumerate(t):
                if js_strict_eq(v, x):
                    return float(idx)
            return -1.0
        return NativeFunction("indexOf", _indexof)
    if key == "lastIndexOf":
        def _lindexof(i, t, a):
            x = a[0] if a else UNDEF
            for idx in range(len(t) - 1, -1, -1):
                if js_strict_eq(t[idx], x):
                    return float(idx)
            return -1.0
        return NativeFunction("lastIndexOf", _lindexof)
    if key == "includes":
        def _includes(i, t, a):
            x = a[0] if a else UNDEF
            for v in t:
                if js_strict_eq(v, x) or (
                        isinstance(v, float) and isinstance(x, float)
                        and math.isnan(v) and math.isnan(x)):
                    return True
            return False
        return NativeFunction("includes", _includes)
    if key == "join":
        def _join(i, t, a):
            sep = js_to_string(a[0], i) if a and a[0] is not UNDEF else ","
            return sep.join(
                "" if v is None or v is UNDEF else js_to_string(v, i)
                for v in t)
        return NativeFunction("join", _join)
    if key == "map":
        def _map(i, t, a):
            f = a[0]
            return [i.call_function(f, UNDEF, [v, float(ix), t])
                    for ix, v in enumerate(t)]
        return NativeFunction("map", _map)
    if key == "filter":
        def _filter(i, t, a):
            f = a[0]
            return [v for ix, v in enumerate(t) if js_truthy(
                i.call_function(f, UNDEF, [v, float(ix), t]))]
        return NativeFunction("filter", _filter)
    if key == "forEach":
        def _foreach(i, t, a):
            f = a[0]
            for ix, v in enumerate(t):
                i.call_function(f, UNDEF, [v, float(ix), t])
            return UNDEF
        return NativeFunction("forEach", _foreach)
    if key == "reduce":
        def _reduce(i, t, a):
            f = a[0]
            if len(a) > 1:
                acc = a[1]
                start = 0
            else:
                if not t:
                    raise JSThrow(
                        "TypeError: Reduce of empty array with no initial "
                        "value")
                acc = t[0]
                start = 1
            for ix in range(start, len(t)):
                acc = i.call_function(f, UNDEF, [acc, t[ix], float(ix), t])
            return acc
        return NativeFunction("reduce", _reduce)
    if key == "concat":
        def _concat(i, t, a):
            out = list(t)
            for v in a:
                if isinstance(v, list):
                    out.extend(v)
                else:
                    out.append(v)
            return out
        return NativeFunction("concat", _concat)
    if key == "reverse":
        def _reverse(i, t, a):
            t.reverse()
            return t
        return NativeFunction("reverse", _reverse)
    if key == "sort":
        def _sort(i, t, a):
            import functools

            if a and a[0] is not UNDEF:
                f = a[0]

                def cmp(x, y):
                    r = js_to_number(i.call_function(f, UNDEF, [x, y]))
                    return -1 if r < 0 else (1 if r > 0 else 0)
            else:
                cmp = _cmp_default
            undef = [v for v in t if v is UNDEF]
            rest = [v for v in t if v is not UNDEF]
            rest.sort(key=functools.cmp_to_key(cmp))
            t[:] = rest + undef
            return t
        return NativeFunction("sort", _sort)
    if key == "find":
        def _find(i, t, a):
            f = a[0]
            for ix, v in enumerate(t):
                if js_truthy(i.call_function(f, UNDEF, [v, float(ix), t])):
                    return v
            return UNDEF
        return NativeFunction("find", _find)
    if key == "findIndex":
        def _findix(i, t, a):
            f = a[0]
            for ix, v in enumerate(t):
                if js_truthy(i.call_function(f, UNDEF, [v, float(ix), t])):
                    return float(ix)
            return -1.0
        return NativeFunction("findIndex", _findix)
    if key == "some":
        def _some(i, t, a):
            f = a[0]
            return any(js_truthy(i.call_function(f, UNDEF, [v, float(ix), t]))
                       for ix, v in enumerate(t))
        return NativeFunction("some", _some)
    if key == "every":
        def _every(i, t, a):
            f = a[0]
            return all(js_truthy(i.call_function(f, UNDEF, [v, float(ix), t]))
                       for ix, v in enumerate(t))
        return NativeFunction("every", _every)
    if key == "flat":
        def _flat(i, t, a):
            depth = int(js_to_number(a[0])) if a and a[0] is not UNDEF else 1

            def go(lst, d):
                out = []
                for v in lst:
                    if isinstance(v, list) and d > 0:
                        out.extend(go(v, d - 1))
                    else:
                        out.append(v)
                return out
            return go(t, depth)
        return NativeFunction("flat", _flat)
    if key == "flatMap":
        def _flatmap(i, t, a):
            f = a[0]
            out = []
            for ix, v in enumerate(t):
                r = i.call_function(f, UNDEF, [v, float(ix), t])
                if isinstance(r, list):
                    out.extend(r)
                else:
                    out.append(r)
            return out
        return NativeFunction("flatMap", _flatmap)
    if key == "at":
        def _at(i, t, a):
            ix = int(js_to_number(a[0])) if a and a[0] is not UNDEF else 0
            if ix < 0:
                ix += len(t)
            return t[ix] if 0 <= ix < len(t) else UNDEF
        return NativeFunction("at", _at)
    if key == "fill":
        def _fill(i, t, a):
            v = a[0] if a else UNDEF
            s = _norm_idx(int(js_to_number(a[1])), len(t)) \
                if len(a) > 1 and a[1] is not UNDEF else 0
            e = _norm_idx(int(js_to_number(a[2])), len(t)) \
                if len(a) > 2 and a[2] is not UNDEF else len(t)
            for ix in range(s, e):
                t[ix] = v
            return t
        return NativeFunction("fill", _fill)
    if key == "findLast" or key == "findLastIndex":
        want_index = key == "findLastIndex"

        def _findlast(i, t, a):
            f = a[0]
            for ix in range(len(t) - 1, -1, -1):
                if js_truthy(i.call_function(f, UNDEF, [t[ix], float(ix), t])):
                    return float(ix) if want_index else t[ix]
            return -1.0 if want_index else UNDEF
        return NativeFunction(key, _findlast)
    if key == "toString":
        return NativeFunction("toString",
                              lambda i, t, a: js_to_string(t, i))
    if key == "keys":
        return NativeFunction("keys", lambda i, t, a: JSNativeIterator(
            float(ix) for ix in range(len(t))))
    if key == "values":
        return NativeFunction("values", lambda i, t, a: JSNativeIterator(t))
    if key == "entries":
        return NativeFunction("entries", lambda i, t, a: JSNativeIterator(
            [float(ix), v] for ix, v in enumerate(t)))
    return UNDEF


def _norm_idx(i: int, n: int) -> int:
    if i < 0:
        return max(0, n + i)
    return min(i, n)


def _string_proto(interp, s: str, key: str):
    if key == "charAt":
        return NativeFunction("charAt", lambda i, t, a: (
            t[int(js_to_number(a[0]))] if a and 0 <= int(js_to_number(a[0]))
            < len(t) else ""))
    if key == "at":
        def _sat(i, t, a):
            ix = int(js_to_number(a[0])) if a and a[0] is not UNDEF else 0
            if ix < 0:
                ix += len(t)
            return t[ix] if 0 <= ix < len(t) else UNDEF
        return NativeFunction("at", _sat)
    if key == "charCodeAt":
        def _cca(i, t, a):
            ix = int(js_to_number(a[0])) if a else 0
            return float(ord(t[ix])) if 0 <= ix < len(t) else float("nan")
        return NativeFunction("charCodeAt", _cca)
    if key == "codePointAt":
        def _cpa(i, t, a):
            ix = int(js_to_number(a[0])) if a else 0
            return float(ord(t[ix])) if 0 <= ix < len(t) else UNDEF
        return NativeFunction("codePointAt", _cpa)
    if key == "indexOf":
        return NativeFunction("indexOf", lambda i, t, a: float(
            t.find(js_to_string(a[0], i) if a else "undefined",
                   int(js_to_number(a[1])) if len(a) > 1 else 0)))
    if key == "lastIndexOf":
        return NativeFunction("lastIndexOf", lambda i, t, a: float(
            t.rfind(js_to_string(a[0], i) if a else "undefined")))
    if key == "includes":
        return NativeFunction("includes", lambda i, t, a: (
            js_to_string(a[0], i) in t) if a else False)
    if key == "startsWith":
        return NativeFunction("startsWith", lambda i, t, a: t.startswith(
            js_to_string(a[0], i)) if a else False)
    if key == "endsWith":
        return NativeFunction("endsWith", lambda i, t, a: t.endswith(
            js_to_string(a[0], i)) if a else False)
    if key == "slice":
        def _slice(i, t, a):
            st = int(js_to_number(a[0])) if a and a[0] is not UNDEF else 0
            en = int(js_to_number(a[1])) if len(a) > 1 and a[1] is not UNDEF \
                else len(t)
            return t[_norm_idx(st, len(t)):_norm_idx(en, len(t))]
        return NativeFunction("slice", _slice)
    if key == "substring":
        def _substring(i, t, a):
            st = max(0, min(len(t), int(js_to_number(a[0])) if a else 0))
            en = max(0, min(len(t), int(js_to_number(a[1]))
                            if len(a) > 1 and a[1] is not UNDEF else len(t)))
            if st > en:
                st, en = en, st
            return t[st:en]
        return NativeFunction("substring", _substring)
    if key == "substr":
        def _substr(i, t, a):
            st = int(js_to_number(a[0])) if a else 0
            if st < 0:
                st = max(0, len(t) + st)
            ln = int(js_to_number(a[1])) if len(a) > 1 and a[1] is not UNDEF \
                else len(t) - st
            return t[st:st + max(0, ln)]
        return NativeFunction("substr", _substr)
    if key == "toUpperCase":
        return NativeFunction("toUpperCase", lambda i, t, a: t.upper())
    if key == "toLowerCase":
        return NativeFunction("toLowerCase", lambda i, t, a: t.lower())
    if key == "trim":
        return NativeFunction("trim", lambda i, t, a: t.strip(
            " \t\n\r\f\v ﻿"))
    if key == "trimStart":
        return NativeFunction("trimStart", lambda i, t, a: t.lstrip(
            " \t\n\r\f\v ﻿"))
    if key == "trimEnd":
        return NativeFunction("trimEnd", lambda i, t, a: t.rstrip(
            " \t\n\r\f\v ﻿"))
    if key == "split":
        def _split(i, t, a):
            if not a or a[0] is UNDEF:
                return [t]
            sep = a[0]
            limit = int(js_to_number(a[1])) if len(a) > 1 and \
                a[1] is not UNDEF else -1
            if isinstance(sep, JSRegExp):
                parts = sep.pattern.split(t)
            else:
                sep = js_to_string(sep, i)
                parts = list(t) if sep == "" else t.split(sep)
            if limit >= 0:
                parts = parts[:limit]
            return parts
        return NativeFunction("split", _split)
    if key == "replace" or key == "replaceAll":
        all_mode = key == "replaceAll"

        def _replace(i, t, a):
            pat, rep = a[0], a[1] if len(a) > 1 else UNDEF

            def rep_fn(m):
                if isinstance(rep, (JSFunction, NativeFunction)):
                    groups = [g if g is not None else UNDEF
                              for g in m.groups()]
                    return js_to_string(i.call_function(
                        rep, UNDEF,
                        [m.group(0), *groups, float(m.start()), t]), i)
                r = js_to_string(rep, i)
                out = []
                k = 0
                while k < len(r):
                    if r[k] == "$" and k + 1 < len(r):
                        c = r[k + 1]
                        if c == "$":
                            out.append("$")
                            k += 2
                            continue
                        if c == "&":
                            out.append(m.group(0))
                            k += 2
                            continue
                        if c.isdigit():
                            gi = int(c)
                            if gi <= len(m.groups()):
                                out.append(m.group(gi) or "")
                                k += 2
                                continue
                    out.append(r[k])
                    k += 1
                return "".join(out)
            if isinstance(pat, JSRegExp):
                count = 0 if ("g" in pat.flags or all_mode) else 1
                return pat.pattern.sub(rep_fn, t, count=count)
            ps = js_to_string(pat, i)
            if isinstance(rep, (JSFunction, NativeFunction)):
                idx = t.find(ps)
                if idx < 0:
                    return t
                rv = js_to_string(i.call_function(
                    rep, UNDEF, [ps, float(idx), t]), i)
                if all_mode:
                    # call per occurrence
                    out, start = [], 0
                    while True:
                        idx = t.find(ps, start)
                        if idx < 0:
                            out.append(t[start:])
                            break
                        out.append(t[start:idx])
                        out.append(js_to_string(i.call_function(
                            rep, UNDEF, [ps, float(idx), t]), i))
                        start = idx + max(1, len(ps))
                    return "".join(out)
                return t[:idx] + rv + t[idx + len(ps):]
            rs = js_to_string(rep, i)
            return t.replace(ps, rs) if all_mode else t.replace(ps, rs, 1)
        return NativeFunction(key, _replace)
    if key == "match":
        def _match(i, t, a):
            pat = a[0] if a else UNDEF
            rx = pat if isinstance(pat, JSRegExp) else JSRegExp(
                js_to_string(pat, i), "")
            if "g" in rx.flags:
                out = [m.group(0) for m in rx.pattern.finditer(t)]
                return out if out else None
            m = rx.pattern.search(t)
            if m is None:
                return None
            res = [m.group(0)] + [g if g is not None else UNDEF
                                  for g in m.groups()]
            return res
        return NativeFunction("match", _match)
    if key == "search":
        def _search(i, t, a):
            pat = a[0] if a else UNDEF
            rx = pat if isinstance(pat, JSRegExp) else JSRegExp(
                js_to_string(pat, i), "")
            m = rx.pattern.search(t)
            return float(m.start()) if m else -1.0
        return NativeFunction("search", _search)
    if key == "repeat":
        return NativeFunction("repeat", lambda i, t, a: t * int(
            js_to_number(a[0])) if a else "")
    if key == "padStart":
        def _padstart(i, t, a):
            n = int(js_to_number(a[0])) if a else 0
            fill = js_to_string(a[1], i) if len(a) > 1 and a[1] is not UNDEF \
                else " "
            if len(t) >= n or not fill:
                return t
            pad = (fill * n)[: n - len(t)]
            return pad + t
        return NativeFunction("padStart", _padstart)
    if key == "padEnd":
        def _padend(i, t, a):
            n = int(js_to_number(a[0])) if a else 0
            fill = js_to_string(a[1], i) if len(a) > 1 and a[1] is not UNDEF \
                else " "
            if len(t) >= n or not fill:
                return t
            pad = (fill * n)[: n - len(t)]
            return t + pad
        return NativeFunction("padEnd", _padend)
    if key == "concat":
        return NativeFunction("concat", lambda i, t, a: t + "".join(
            js_to_string(x, i) for x in a))
    if key == "toString" or key == "valueOf":
        return NativeFunction(key, lambda i, t, a: t)
    if key == "localeCompare":
        def _lc(i, t, a):
            o = js_to_string(a[0], i) if a else "undefined"
            return -1.0 if t < o else (1.0 if t > o else 0.0)
        return NativeFunction("localeCompare", _lc)
    return UNDEF


def _number_proto(interp, n, key: str):
    if key == "toString":
        def _tostr(i, t, a):
            if a and a[0] is not UNDEF:
                radix = int(js_to_number(a[0]))
                if radix == 10:
                    return js_number_to_string(t)
                iv = int(t)
                if iv != t:
                    raise JSThrow(
                        "RangeError: non-integer radix toString not "
                        "supported")
                digs = "0123456789abcdefghijklmnopqrstuvwxyz"
                neg = iv < 0
                iv = abs(iv)
                out = ""
                while True:
                    out = digs[iv % radix] + out
                    iv //= radix
                    if iv == 0:
                        break
                return ("-" if neg else "") + out
            return js_number_to_string(t)
        return NativeFunction("toString", _tostr)
    if key == "toFixed":
        def _tofixed(i, t, a):
            d = int(js_to_number(a[0])) if a and a[0] is not UNDEF else 0
            return f"{float(t):.{d}f}"
        return NativeFunction("toFixed", _tofixed)
    if key == "toPrecision":
        def _toprec(i, t, a):
            if not a or a[0] is UNDEF:
                return js_number_to_string(t)
            p = int(js_to_number(a[0]))
            return f"{float(t):.{p}g}"
        return NativeFunction("toPrecision", _toprec)
    if key == "valueOf":
        return NativeFunction("valueOf", lambda i, t, a: t)
    return UNDEF


def _generic_proto(interp, v, key: str):
    if key == "toString":
        return NativeFunction("toString", lambda i, t, a: js_to_string(t, i))
    if key == "valueOf":
        return NativeFunction("valueOf", lambda i, t, a: t)
    return UNDEF


def _object_proto(interp, obj: dict, key: str):
    if key == "hasOwnProperty":
        return NativeFunction("hasOwnProperty", lambda i, t, a: (
            js_to_string(a[0], i) in t) if a else False)
    if key == "toString":
        return NativeFunction("toString", lambda i, t, a: js_to_string(t, i))
    if key == "valueOf":
        return NativeFunction("valueOf", lambda i, t, a: t)
    return UNDEF


def _regex_proto(interp, rx: JSRegExp, key: str):
    if key == "test":
        def _test(i, t, a):
            s = js_to_string(a[0], i) if a else "undefined"
            return t.pattern.search(s) is not None
        return NativeFunction("test", _test)
    if key == "exec":
        def _exec(i, t, a):
            s = js_to_string(a[0], i) if a else "undefined"
            pos = t.last_index if "g" in t.flags else 0
            m = t.pattern.search(s, pos)
            if m is None:
                t.last_index = 0
                return None
            if "g" in t.flags:
                t.last_index = m.end()
            res = [m.group(0)] + [g if g is not None else UNDEF
                                  for g in m.groups()]
            return res
        return NativeFunction("exec", _exec)
    if key == "toString":
        return NativeFunction("toString", lambda i, t, a: js_to_string(t, i))
    return UNDEF


# =============================================================================
# Globals
# =============================================================================


def _json_stringify(interp, value, indent=None) -> Any:
    """JSON.stringify semantics: undefined/function at the root ->
    undefined; inside objects -> skipped; inside arrays -> null."""

    def enc(v, depth):
        if depth > 200:
            raise JSThrow("TypeError: Converting circular structure to JSON")
        if v is None:
            return "null"
        if v is UNDEF or isinstance(v, (JSFunction, NativeFunction)):
            return None
        if isinstance(v, (JSMap, JSSet, JSGenerator)):
            return "{}"  # no enumerable own properties, like real JS
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            f = float(v)
            if math.isnan(f) or math.isinf(f):
                return "null"
            return js_number_to_string(f)
        if isinstance(v, str):
            return json.dumps(v, ensure_ascii=False)
        if isinstance(v, list):
            items = []
            for e in v:
                s = enc(e, depth + 1)
                items.append("null" if s is None else s)
            if indent:
                if not items:
                    return "[]"
                pad = indent * (depth + 1)
                inner = (",\n" + pad).join(items)
                return "[\n" + pad + inner + "\n" + indent * depth + "]"
            return "[" + ",".join(items) + "]"
        if isinstance(v, dict):
            items = []
            for k, e in v.items():
                s = enc(e, depth + 1)
                if s is None:
                    continue
                ks = json.dumps(str(k), ensure_ascii=False)
                if indent:
                    items.append(f"{ks}: {s}")
                else:
                    items.append(f"{ks}:{s}")
            if indent:
                if not items:
                    return "{}"
                pad = indent * (depth + 1)
                inner = (",\n" + pad).join(items)
                return "{\n" + pad + inner + "\n" + indent * depth + "}"
            return "{" + ",".join(items) + "}"
        if isinstance(v, JSRegExp):
            return "{}"
        return None

    out = enc(value, 0)
    return UNDEF if out is None else out


def _splitmix64(state: int) -> tuple:
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z = z ^ (z >> 31)
    return state, z


def install_globals(interp: Interpreter) -> None:
    g = interp.global_env

    # -- Object ---------------------------------------------------------------
    def _keys(i, t, a):
        v = a[0] if a else UNDEF
        if isinstance(v, dict):
            return list(v.keys())
        if isinstance(v, list):
            return [str(ix) for ix in range(len(v))]
        if isinstance(v, str):
            return [str(ix) for ix in range(len(v))]
        return []

    def _values(i, t, a):
        v = a[0] if a else UNDEF
        if isinstance(v, dict):
            return list(v.values())
        if isinstance(v, list):
            return list(v)
        return []

    def _entries(i, t, a):
        v = a[0] if a else UNDEF
        if isinstance(v, dict):
            return [[k, val] for k, val in v.items()]
        if isinstance(v, list):
            return [[str(ix), val] for ix, val in enumerate(v)]
        return []

    def _assign(i, t, a):
        if not a or not isinstance(a[0], dict):
            raise JSThrow("TypeError: Object.assign target must be object")
        tgt = a[0]
        for src in a[1:]:
            if isinstance(src, dict):
                # explicit loop: reads source getters, triggers target
                # setters (dict.update's C path would bypass both)
                for k, v in list(src.items()):
                    tgt[k] = v
        return tgt

    def _freeze(i, t, a):
        return a[0] if a else UNDEF

    obj_ns = {
        "keys": NativeFunction("keys", _keys),
        "values": NativeFunction("values", _values),
        "entries": NativeFunction("entries", _entries),
        "assign": NativeFunction("assign", _assign),
        "freeze": NativeFunction("freeze", _freeze),
        "fromEntries": NativeFunction("fromEntries", lambda i, t, a: {
            js_to_string(kv[0], i): kv[1]
            for kv in js_iter_values(a[0] if a else [])}),
        "getOwnPropertyNames": NativeFunction("getOwnPropertyNames", _keys),
        "create": NativeFunction("create", lambda i, t, a: {}),
    }
    object_fn = NativeFunction(
        "Object", lambda i, t, a: a[0] if a and isinstance(
            a[0], (dict, list)) else {})
    for k, v in obj_ns.items():
        pass
    # attach statics via a dict wrapper: member access on NativeFunction
    # doesn't reach dicts, so Object is exposed as a dict of statics that
    # is ALSO callable through _instanceof/new handling by name.
    obj_dict = dict(obj_ns)
    g.declare("Object", _CallableNamespace("Object", object_fn, obj_dict))

    # -- JSON -----------------------------------------------------------------
    def _stringify(i, t, a):
        v = a[0] if a else UNDEF
        indent = None
        if len(a) > 2 and a[2] is not UNDEF:
            sp = a[2]
            if isinstance(sp, (int, float)) and not isinstance(sp, bool):
                indent = " " * min(10, int(sp))
            elif isinstance(sp, str):
                indent = sp[:10]
            if indent == "":
                indent = None
        return _json_stringify(i, v, indent)

    def _parse(i, t, a):
        s = js_to_string(a[0], i) if a else "undefined"
        try:
            return json.loads(s, parse_int=float, parse_float=float)
        except json.JSONDecodeError as e:
            raise JSThrow(f"SyntaxError: Unexpected token in JSON: {e.msg}")

    g.declare("JSON", {
        "stringify": NativeFunction("stringify", _stringify),
        "parse": NativeFunction("parse", _parse),
    })

    # -- Math -----------------------------------------------------------------
    def _random(i, t, a):
        i._rand_state, z = _splitmix64(i._rand_state)
        return (z >> 11) / float(1 << 53)

    def _minmax(fn, empty):
        def go(i, t, a):
            if not a:
                return empty
            nums = [js_to_number(x) for x in a]
            if any(math.isnan(x) for x in nums):
                return float("nan")
            return fn(nums)
        return go

    def _round(i, t, a):
        x = js_to_number(a[0]) if a else float("nan")
        if math.isnan(x) or math.isinf(x):
            return x
        return float(math.floor(x + 0.5))  # JS rounds .5 up (toward +inf)

    math_ns = {
        "floor": NativeFunction("floor", lambda i, t, a: float(math.floor(
            js_to_number(a[0]))) if a and not math.isnan(js_to_number(a[0]))
            and not math.isinf(js_to_number(a[0])) else js_to_number(
                a[0] if a else UNDEF)),
        "ceil": NativeFunction("ceil", lambda i, t, a: float(math.ceil(
            js_to_number(a[0]))) if a and not math.isnan(js_to_number(a[0]))
            and not math.isinf(js_to_number(a[0])) else js_to_number(
                a[0] if a else UNDEF)),
        "round": NativeFunction("round", _round),
        "trunc": NativeFunction("trunc", lambda i, t, a: float(math.trunc(
            js_to_number(a[0]))) if a and not math.isnan(js_to_number(a[0]))
            and not math.isinf(js_to_number(a[0])) else js_to_number(
                a[0] if a else UNDEF)),
        "abs": NativeFunction("abs", lambda i, t, a: abs(js_to_number(
            a[0])) if a else float("nan")),
        "sign": NativeFunction("sign", lambda i, t, a: (
            float("nan") if math.isnan(js_to_number(a[0]))
            else float(0) if js_to_number(a[0]) == 0
            else math.copysign(1.0, js_to_number(a[0]))) if a
            else float("nan")),
        "min": NativeFunction("min", _minmax(min, float("inf"))),
        "max": NativeFunction("max", _minmax(max, float("-inf"))),
        "pow": NativeFunction("pow", lambda i, t, a: float(
            js_to_number(a[0]) ** js_to_number(a[1])) if len(a) > 1
            else float("nan")),
        "sqrt": NativeFunction("sqrt", lambda i, t, a: math.sqrt(
            js_to_number(a[0])) if a and js_to_number(a[0]) >= 0
            else float("nan")),
        "cbrt": NativeFunction("cbrt", lambda i, t, a: math.copysign(
            abs(js_to_number(a[0])) ** (1 / 3), js_to_number(a[0]))
            if a else float("nan")),
        "log": NativeFunction("log", lambda i, t, a: math.log(js_to_number(
            a[0])) if a and js_to_number(a[0]) > 0 else (
            float("-inf") if a and js_to_number(a[0]) == 0
            else float("nan"))),
        "log2": NativeFunction("log2", lambda i, t, a: math.log2(
            js_to_number(a[0])) if a and js_to_number(a[0]) > 0
            else float("nan")),
        "log10": NativeFunction("log10", lambda i, t, a: math.log10(
            js_to_number(a[0])) if a and js_to_number(a[0]) > 0
            else float("nan")),
        "exp": NativeFunction("exp", lambda i, t, a: math.exp(js_to_number(
            a[0])) if a else float("nan")),
        "sin": NativeFunction("sin", lambda i, t, a: math.sin(js_to_number(
            a[0])) if a else float("nan")),
        "cos": NativeFunction("cos", lambda i, t, a: math.cos(js_to_number(
            a[0])) if a else float("nan")),
        "tan": NativeFunction("tan", lambda i, t, a: math.tan(js_to_number(
            a[0])) if a else float("nan")),
        "atan2": NativeFunction("atan2", lambda i, t, a: math.atan2(
            js_to_number(a[0]), js_to_number(a[1])) if len(a) > 1
            else float("nan")),
        "hypot": NativeFunction("hypot", lambda i, t, a: math.hypot(
            *[js_to_number(x) for x in a])),
        "random": NativeFunction("random", _random),
        "PI": math.pi,
        "E": math.e,
        "LN2": math.log(2),
        "LN10": math.log(10),
        "SQRT2": math.sqrt(2),
    }
    g.declare("Math", math_ns)

    # -- constructors / conversion fns ----------------------------------------
    g.declare("Array", _CallableNamespace(
        "Array",
        NativeFunction("Array", lambda i, t, a: (
            [UNDEF] * int(a[0]) if len(a) == 1 and isinstance(
                a[0], (int, float)) and not isinstance(a[0], bool)
            else list(a))),
        {
            "isArray": NativeFunction("isArray", lambda i, t, a: isinstance(
                a[0] if a else UNDEF, list)),
            "from": NativeFunction("from", lambda i, t, a: _array_from(
                i, a)),
            "of": NativeFunction("of", lambda i, t, a: list(a)),
        }))
    g.declare("String", _CallableNamespace(
        "String",
        NativeFunction("String", lambda i, t, a: js_to_string(
            a[0], i) if a else ""),
        {
            "fromCharCode": NativeFunction("fromCharCode", lambda i, t, a:
                                           "".join(chr(int(js_to_number(x)))
                                                   for x in a)),
            "fromCodePoint": NativeFunction("fromCodePoint", lambda i, t, a:
                                            "".join(chr(int(js_to_number(x)))
                                                    for x in a)),
        }))
    g.declare("Number", _CallableNamespace(
        "Number",
        NativeFunction("Number", lambda i, t, a: js_to_number(
            a[0]) if a else 0.0),
        {
            "isInteger": NativeFunction("isInteger", lambda i, t, a: (
                isinstance(a[0], (int, float)) and not isinstance(
                    a[0], bool) and not math.isnan(float(a[0]))
                and not math.isinf(float(a[0]))
                and float(a[0]) == int(a[0])) if a else False),
            "isFinite": NativeFunction("isFinite", lambda i, t, a: (
                isinstance(a[0], (int, float)) and not isinstance(
                    a[0], bool) and math.isfinite(float(a[0])))
                if a else False),
            "isNaN": NativeFunction("isNaN", lambda i, t, a: (
                isinstance(a[0], float) and math.isnan(a[0]))
                if a else False),
            "parseFloat": NativeFunction("parseFloat", lambda i, t, a:
                                         _parse_float(i, a)),
            "parseInt": NativeFunction("parseInt", lambda i, t, a:
                                       _parse_int(i, a)),
            "MAX_SAFE_INTEGER": float(2**53 - 1),
            "MIN_SAFE_INTEGER": float(-(2**53 - 1)),
            "MAX_VALUE": 1.7976931348623157e308,
            "MIN_VALUE": 5e-324,
            "EPSILON": 2.220446049250313e-16,
            "POSITIVE_INFINITY": float("inf"),
            "NEGATIVE_INFINITY": float("-inf"),
            "NaN": float("nan"),
        }))
    g.declare("Boolean", NativeFunction(
        "Boolean", lambda i, t, a: js_truthy(a[0]) if a else False))
    for name in ("Error", "TypeError", "RangeError", "SyntaxError"):
        g.declare(name, NativeFunction(name, (
            lambda nm: lambda i, t, a: {
                "name": nm,
                "message": js_to_string(a[0], i) if a else "",
                "stack": f"{nm}: {js_to_string(a[0], i) if a else ''}",
            })(name)))
    g.declare("RegExp", NativeFunction(
        "RegExp", lambda i, t, a: JSRegExp(
            js_to_string(a[0], i) if a else "",
            js_to_string(a[1], i) if len(a) > 1 and a[1] is not UNDEF
            else "")))
    g.declare("Function", NativeFunction("Function", lambda i, t, a: (
        (_ for _ in ()).throw(JSThrow(
            "TypeError: Function constructor is not supported")))))
    # Map/Set require `new` (spec 23.1.1/23.2.1: [[Call]] throws);
    # _eval_new dispatches on the NativeFunction's name before calling it.
    for _ctor in ("Map", "Set"):
        g.declare(_ctor, NativeFunction(_ctor, (
            lambda nm: lambda i, t, a: (_ for _ in ()).throw(JSThrow(
                f"TypeError: Constructor {nm} requires 'new'")))(_ctor)))
    g.declare("parseInt", NativeFunction(
        "parseInt", lambda i, t, a: _parse_int(i, a)))
    g.declare("parseFloat", NativeFunction(
        "parseFloat", lambda i, t, a: _parse_float(i, a)))
    g.declare("isNaN", NativeFunction("isNaN", lambda i, t, a: math.isnan(
        js_to_number(a[0] if a else UNDEF))))
    g.declare("isFinite", NativeFunction(
        "isFinite", lambda i, t, a: math.isfinite(
            js_to_number(a[0] if a else UNDEF))))
    g.declare("NaN", float("nan"))
    g.declare("Infinity", float("inf"))
    g.declare("globalThis", {})
    g.declare("encodeURIComponent", NativeFunction(
        "encodeURIComponent", lambda i, t, a: _uri_encode(
            js_to_string(a[0], i) if a else "undefined",
            safe="!'()*-._~")))
    g.declare("decodeURIComponent", NativeFunction(
        "decodeURIComponent", lambda i, t, a: _uri_decode(
            js_to_string(a[0], i) if a else "undefined")))
    g.declare("encodeURI", NativeFunction(
        "encodeURI", lambda i, t, a: _uri_encode(
            js_to_string(a[0], i) if a else "undefined",
            safe="!#$&'()*+,-./:;=?@_~")))
    g.declare("decodeURI", NativeFunction(
        "decodeURI", lambda i, t, a: _uri_decode(
            js_to_string(a[0], i) if a else "undefined")))

    # -- console → host logger ---------------------------------------------
    def _console(level):
        def fn(i, t, a):
            i.console_writer(level, " ".join(js_to_display(x) for x in a))
            return UNDEF
        return NativeFunction(level, fn)

    g.declare("console", {
        "log": _console("log"),
        "info": _console("log"),
        "warn": _console("warn"),
        "error": _console("error"),
        "debug": _console("log"),
    })

    # -- Date: deterministic minimal gate ------------------------------------
    g.declare("Date", _CallableNamespace(
        "Date",
        NativeFunction("Date", lambda i, t, a: (_ for _ in ()).throw(
            JSThrow("TypeError: Date is not supported by this engine "
                    "(deterministic subset); pass timestamps in as data"))),
        {"now": NativeFunction("now", lambda i, t, a: 0.0)}))


class _CallableNamespace(dict):
    """A callable global (String(...), Array(...)) that also carries
    static members (String.fromCharCode) — a dict subclass so
    get_property's object path finds the statics, plus a .fn slot so
    call_function can invoke it."""

    def __init__(self, name: str, call_fn: NativeFunction, statics: dict):
        super().__init__(statics)
        self.name = name
        self.fn = call_fn.fn


def _array_from(interp, a):
    src = a[0] if a else UNDEF
    if isinstance(src, list):
        out = list(src)
    elif isinstance(src, str):
        out = list(src)
    elif isinstance(src, JSMap):
        out = src.iter_pairs()
    elif isinstance(src, JSSet):
        out = src.iter_values()
    elif isinstance(src, JSGenerator):
        out = list(src.py_iter())
    elif isinstance(src, dict) and "length" in src:
        n = int(js_to_number(src["length"]))
        out = [src.get(str(ix), UNDEF) for ix in range(n)]
    else:
        out = []
    if len(a) > 1 and isinstance(a[1], (JSFunction, NativeFunction)):
        out = [interp.call_function(a[1], UNDEF, [v, float(ix)])
               for ix, v in enumerate(out)]
    return out


def _parse_int(interp, a):
    s = js_to_string(a[0], interp).strip() if a else "undefined"
    radix = int(js_to_number(a[1])) if len(a) > 1 and a[1] is not UNDEF else 0
    sign = 1
    if s[:1] in "+-":
        if s[0] == "-":
            sign = -1
        s = s[1:]
    if radix == 0:
        if s[:2].lower() == "0x":
            radix = 16
            s = s[2:]
        else:
            radix = 10
    elif radix == 16 and s[:2].lower() == "0x":
        s = s[2:]
    digs = "0123456789abcdefghijklmnopqrstuvwxyz"[:radix]
    out = 0
    seen = False
    for c in s.lower():
        d = digs.find(c)
        if d < 0:
            break
        out = out * radix + d
        seen = True
    return float(sign * out) if seen else float("nan")


def _parse_float(interp, a):
    s = js_to_string(a[0], interp).strip() if a else "undefined"
    m = re.match(r"[+-]?(?:Infinity|\d+\.?\d*(?:[eE][+-]?\d+)?|"
                 r"\.\d+(?:[eE][+-]?\d+)?)", s)
    if not m:
        return float("nan")
    tok = m.group(0)
    if tok.endswith("Infinity"):
        return float("-inf") if tok.startswith("-") else float("inf")
    return float(tok)


def _uri_encode(s: str, safe: str) -> str:
    out = []
    for b in s.encode("utf-8"):
        c = chr(b)
        if c.isalnum() and c.isascii() or c in safe:
            out.append(c)
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


def _uri_decode(s: str) -> str:
    out = bytearray()
    i = 0
    while i < len(s):
        if s[i] == "%" and i + 2 < len(s) + 1:
            try:
                out.append(int(s[i + 1:i + 3], 16))
                i += 3
                continue
            except ValueError:
                raise JSThrow("URIError: URI malformed")
        out.extend(s[i].encode("utf-8"))
        i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        raise JSThrow("URIError: URI malformed")


# =============================================================================
# Host boundary (goja Export analog, casts.go)
# =============================================================================


def js_export(v):
    """JS value → plain Python (goja's Export: integral floats become
    ints, undefined → None)."""
    if v is UNDEF:
        return None
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        f = float(v)
        if math.isfinite(f) and f == int(f) and abs(f) <= 2**53:
            return int(f)
        return f
    if isinstance(v, list):
        return [js_export(e) for e in v]
    if isinstance(v, dict):
        return {str(k): js_export(val) for k, val in v.items()
                if not isinstance(val, (JSFunction, NativeFunction))}
    if isinstance(v, (JSFunction, NativeFunction, JSGenerator)):
        return None
    if isinstance(v, JSRegExp):
        return f"/{v.source}/{v.flags}"
    return v


def js_import(v):
    """Plain Python → JS value (numbers stay as-is; None → null)."""
    if isinstance(v, dict):
        return {str(k): js_import(val) for k, val in v.items()}
    if isinstance(v, (list, tuple)):
        return [js_import(e) for e in v]
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    return v
