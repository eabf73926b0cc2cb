"""From-scratch POSIX-AWK-subset interpreter for the `awk` processor.

The reference embeds goawk (/root/reference/internal/impl/awk/
processor.go:26 — github.com/benhoyt/goawk) and feeds each message
through an AWK program with benthos-specific custom functions. No AWK
runtime exists in this sandbox, so this module implements the language
core from the public POSIX specification (lexer → recursive-descent
parser → tree-walking interpreter):

 - patterns: BEGIN / END / expression / /regex/ / range (p1, p2)
 - statements: print, printf, if/else, while, do-while, both for
   forms, break/continue/next/exit/return, delete, blocks, getline
   (plain and `getline var` from the record stream)
 - expressions: full precedence ladder incl. string concatenation,
   `in`, `~`/`!~`, ternary, pre/post ++/--, compound assignment,
   `$n` field access and assignment (rebuilds $0 with OFS), arrays
   with SUBSEP multi-dimension subscripts
 - built-ins: length, substr, index, split, sub, gsub, match,
   sprintf, int, sin, cos, atan2, exp, log, sqrt, rand, srand,
   tolower, toupper; special vars NF NR FNR FS OFS ORS RS SUBSEP
   RSTART RLENGTH CONVFMT OFMT FILENAME
 - POSIX value model: numeric strings ("strnum") from field splitting
   and getline compare numerically; uninitialized is ""/0

Deliberate exclusions (raise a clear AwkError at parse time): output
redirection (`print > "file"`, `| "cmd"`), getline from files/pipes,
system(), and nextfile — a message processor has no file system or
subprocess surface (the reference's `command`/`subprocess` processors
cover that escape hatch).

Determinism: rand()/srand() use a splitmix64 counter stream seeded by
srand's argument (default 0), so programs using rand are reproducible
across retries — required for exactly-once redelivery.
"""

from __future__ import annotations

import io
import math
import re
from typing import Any, Callable

__all__ = ["AwkError", "AwkProgram", "compile_program"]


class AwkError(ValueError):
    pass


# --------------------------------------------------------------- values


class Strnum(str):
    """A string that came from input (field splitting, getline, -v
    vars): if it looks numeric it compares numerically (POSIX)."""


_NUMERIC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_NUM_PREFIX_RE = re.compile(r"^[ \t\n]*[+-]?(0[xX][0-9a-fA-F]+|\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?)")


def _looks_numeric(s: str) -> bool:
    return bool(_NUMERIC_RE.match(s.strip()))


def to_num(v) -> float:
    if v is None:
        return 0.0
    if isinstance(v, float):
        return v
    m = _NUM_PREFIX_RE.match(v)
    if not m:
        return 0.0
    t = m.group(0).strip()
    try:
        if t[-1] in "+-" or t.lower().endswith(("e", "e+", "e-")):
            t = t.rstrip("+-").rstrip("eE").rstrip("+-")
        return float(int(t, 16)) if "x" in t.lower() else float(t)
    except ValueError:
        return 0.0


def _num_str(n: float, fmt: str) -> str:
    if n != n or n in (float("inf"), float("-inf")):
        return {float("inf"): "inf", float("-inf"): "-inf"}.get(n, "nan")
    if n == int(n) and abs(n) < 1e16:
        return str(int(n))
    return fmt % n


def to_bool(v) -> bool:
    if v is None:
        return False
    if isinstance(v, float):
        return v != 0.0
    if isinstance(v, Strnum):
        return to_num(v) != 0.0 if _looks_numeric(v) else v != ""
    return v != ""


# ---------------------------------------------------------------- lexer

_KEYWORDS = {
    "BEGIN", "END", "function", "func", "if", "else", "while", "for", "do",
    "break", "continue", "next", "exit", "return", "delete", "in",
    "getline", "print", "printf",
}

_TWO_CHAR = ["<=", ">=", "==", "!=", "&&", "||", "++", "--", "+=", "-=",
             "*=", "/=", "%=", "^=", "!~", ">>"]


def _lex(src: str) -> list[tuple[str, Any]]:
    toks: list[tuple[str, Any]] = []
    i, n = 0, len(src)
    # whether a '/' here would be division (previous token ends an operand)
    def prev_is_operand() -> bool:
        if not toks:
            return False
        t, v = toks[-1]
        return t in ("NUMBER", "STRING", "NAME") or (t == "OP" and v in (")", "]", "$"))

    while i < n:
        c = src[i]
        if c in " \t":
            i += 1
            continue
        if c == "\\" and i + 1 < n and src[i + 1] == "\n":
            i += 2
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "\n":
            toks.append(("NEWLINE", "\n"))
            i += 1
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and src[j] != '"':
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"',
                              "\\": "\\", "/": "/", "a": "\a", "b": "\b",
                              "f": "\f", "v": "\v"}.get(esc)
                    if mapped is not None:
                        buf.append(mapped)
                        j += 2
                        continue
                    if esc.isdigit():  # octal
                        k = j + 1
                        oct_digits = ""
                        while k < n and src[k].isdigit() and len(oct_digits) < 3:
                            oct_digits += src[k]
                            k += 1
                        buf.append(chr(int(oct_digits, 8)))
                        j = k
                        continue
                    buf.append("\\")
                    buf.append(esc)
                    j += 2
                    continue
                buf.append(src[j])
                j += 1
            if j >= n:
                raise AwkError("unterminated string literal")
            toks.append(("STRING", "".join(buf)))
            i = j + 1
            continue
        if c == "/" and not prev_is_operand():
            j = i + 1
            buf = []
            in_class = False
            while j < n:
                ch = src[j]
                if ch == "\\" and j + 1 < n:
                    buf.append(src[j : j + 2])
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                elif ch == "\n":
                    raise AwkError("newline in regex literal")
                buf.append(ch)
                j += 1
            if j >= n:
                raise AwkError("unterminated regex literal")
            toks.append(("REGEX", "".join(buf)))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = _NUM_PREFIX_RE.match(src[i:])
            text = m.group(0)  # no leading space here (skipped above)
            toks.append(("NUMBER", float(int(text, 16)) if "x" in text.lower() else float(text)))
            i += len(text)
            continue
        two = src[i : i + 2]
        if two in _TWO_CHAR:
            toks.append(("OP", two))
            i += 2
            continue
        if c in "{}()[];,<>=!+-*/%^?:~$&|":
            toks.append(("OP", c))
            i += 1
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            if word in _KEYWORDS:
                toks.append(("KW", "function" if word == "func" else word))
            else:
                toks.append(("NAME", word))
            i = j
            continue
        raise AwkError(f"unexpected character {c!r} in AWK program")
    toks.append(("EOF", None))
    return toks


# --------------------------------------------------------------- parser


class _Parser:
    def __init__(self, toks: list[tuple[str, Any]]):
        self.toks = toks
        self.i = 0

    # -- token helpers
    def peek(self, skip_nl=False):
        j = self.i
        if skip_nl:
            while self.toks[j][0] == "NEWLINE":
                j += 1
        return self.toks[j]

    def next(self, skip_nl=False):
        if skip_nl:
            while self.toks[self.i][0] == "NEWLINE":
                self.i += 1
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, typ, val=None, skip_nl=False):
        j = self.i
        if skip_nl:
            while self.toks[j][0] == "NEWLINE":
                j += 1
        t = self.toks[j]
        if t[0] == typ and (val is None or t[1] == val):
            self.i = j + 1
            return True
        return False

    def expect(self, typ, val=None, skip_nl=False):
        if not self.accept(typ, val, skip_nl):
            got = self.peek(skip_nl)
            raise AwkError(f"expected {val or typ}, got {got[1]!r}")

    def skip_terms(self):
        while self.toks[self.i][0] == "NEWLINE" or (
            self.toks[self.i] == ("OP", ";")
        ):
            self.i += 1

    # -- program structure
    def parse_program(self):
        items = []
        funcs = {}
        self.skip_terms()
        while self.peek()[0] != "EOF":
            if self.accept("KW", "function"):
                name = self.next()[1]
                self.expect("OP", "(")
                params = []
                if not self.accept("OP", ")"):
                    while True:
                        params.append(self.next()[1])
                        if self.accept("OP", ")"):
                            break
                        self.expect("OP", ",")
                body = self.parse_block()
                funcs[name] = (params, body)
            elif self.accept("KW", "BEGIN"):
                items.append(("BEGIN", None, self.parse_block()))
            elif self.accept("KW", "END"):
                items.append(("END", None, self.parse_block()))
            else:
                pattern = None
                if self.peek() != ("OP", "{"):
                    pattern = self.parse_expr()
                    if self.accept("OP", ","):
                        pattern = ("range", pattern, self.parse_expr())
                if self.peek(skip_nl=False) == ("OP", "{"):
                    body = self.parse_block()
                    if not body:
                        # goawk quirk the reference's tests pin ("no
                        # print 1", processor_test.go): an EMPTY action
                        # behaves like the missing-action default print
                        body = [("print", [], None)]
                else:
                    body = [("print", [], None)]
                items.append(("rule", pattern, body))
            self.skip_terms()
        return items, funcs

    def parse_block(self):
        self.expect("OP", "{", skip_nl=True)
        stmts = []
        self.skip_terms()
        while not self.accept("OP", "}"):
            stmts.append(self.parse_stmt())
            self.skip_terms()
        return stmts

    # -- statements
    def parse_simple_or_block(self):
        if self.peek(skip_nl=True) == ("OP", "{"):
            return self.parse_block()
        while self.toks[self.i][0] == "NEWLINE":
            self.i += 1
        return [self.parse_stmt()]

    def parse_stmt(self):
        t, v = self.peek()
        if (t, v) == ("OP", "{"):
            return ("block", self.parse_block())
        if t == "KW":
            if v == "if":
                self.next()
                self.expect("OP", "(", skip_nl=True)
                cond = self.parse_expr()
                self.expect("OP", ")", skip_nl=True)
                then = self.parse_simple_or_block()
                els = None
                save = self.i
                self.skip_terms()  # `;` and newlines may precede else
                if self.accept("KW", "else"):
                    els = self.parse_simple_or_block()
                else:
                    self.i = save
                return ("if", cond, then, els)
            if v == "while":
                self.next()
                self.expect("OP", "(", skip_nl=True)
                cond = self.parse_expr()
                self.expect("OP", ")", skip_nl=True)
                return ("while", cond, self.parse_simple_or_block())
            if v == "do":
                self.next()
                body = self.parse_simple_or_block()
                self.expect("KW", "while", skip_nl=True)
                self.expect("OP", "(", skip_nl=True)
                cond = self.parse_expr()
                self.expect("OP", ")")
                return ("dowhile", cond, body)
            if v == "for":
                self.next()
                self.expect("OP", "(", skip_nl=True)
                # for (k in arr)
                save = self.i
                if self.peek()[0] == "NAME":
                    name = self.next()[1]
                    if self.accept("KW", "in"):
                        arr = self.next()[1]
                        if self.accept("OP", ")"):
                            return ("forin", name, arr, self.parse_simple_or_block())
                    self.i = save
                init = None if self.peek() == ("OP", ";") else self.parse_expr()
                self.expect("OP", ";")
                cond = None if self.peek() == ("OP", ";") else self.parse_expr()
                self.expect("OP", ";")
                post = None if self.peek() == ("OP", ")") else self.parse_expr()
                self.expect("OP", ")", skip_nl=True)
                return ("for", init, cond, post, self.parse_simple_or_block())
            if v in ("break", "continue", "next"):
                self.next()
                return (v,)
            if v == "exit":
                self.next()
                code = None
                if not self._at_stmt_end():
                    code = self.parse_expr()
                return ("exit", code)
            if v == "return":
                self.next()
                val = None
                if not self._at_stmt_end():
                    val = self.parse_expr()
                return ("return", val)
            if v == "delete":
                self.next()
                name = self.next()[1]
                if self.accept("OP", "["):
                    idx = [self.parse_expr()]
                    while self.accept("OP", ","):
                        idx.append(self.parse_expr())
                    self.expect("OP", "]")
                    return ("delete", name, idx)
                return ("delete", name, None)
            if v in ("print", "printf"):
                self.next()
                args = []
                if not self._at_stmt_end():
                    args.append(self.parse_expr(no_gt=True))
                    while self.accept("OP", ","):
                        args.append(self.parse_expr(no_gt=True))
                if self.peek()[1] in (">", ">>", "|") and self.peek()[0] == "OP":
                    raise AwkError(
                        "output redirection is not supported in the message "
                        "processor (no file system surface)"
                    )
                return (v, args, None)
        return ("expr", self.parse_expr())

    def _at_stmt_end(self):
        t, v = self.peek()
        return t in ("NEWLINE", "EOF") or (t == "OP" and v in (";", "}"))

    # -- expressions (precedence climbing)
    def parse_expr(self, no_gt=False):
        return self.parse_ternary(no_gt)

    def parse_ternary(self, no_gt=False):
        cond = self.parse_or(no_gt)
        if self.accept("OP", "?"):
            a = self.parse_ternary()
            self.expect("OP", ":", skip_nl=True)
            b = self.parse_ternary(no_gt)
            return ("ternary", cond, a, b)
        # assignment (right-assoc, lowest): only after we know it's a target
        t, v = self.peek()
        if t == "OP" and v in ("=", "+=", "-=", "*=", "/=", "%=", "^="):
            if cond[0] not in ("var", "index", "field"):
                raise AwkError(f"cannot assign to {cond[0]}")
            self.next()
            rhs = self.parse_ternary(no_gt)
            return ("assign", v, cond, rhs)
        return cond

    def parse_or(self, no_gt):
        l = self.parse_and(no_gt)
        while self.accept("OP", "||"):
            while self.toks[self.i][0] == "NEWLINE":
                self.i += 1
            l = ("or", l, self.parse_and(no_gt))
        return l

    def parse_and(self, no_gt):
        l = self.parse_in(no_gt)
        while self.accept("OP", "&&"):
            while self.toks[self.i][0] == "NEWLINE":
                self.i += 1
            l = ("and", l, self.parse_in(no_gt))
        return l

    def parse_in(self, no_gt):
        l = self.parse_match(no_gt)
        while self.peek() == ("KW", "in"):
            self.next()
            arr = self.next()[1]
            l = ("in", [l], arr)
        return l

    def parse_match(self, no_gt):
        l = self.parse_rel(no_gt)
        while True:
            if self.accept("OP", "~"):
                l = ("matchop", l, self.parse_rel(no_gt), False)
            elif self.accept("OP", "!~"):
                l = ("matchop", l, self.parse_rel(no_gt), True)
            else:
                return l

    def parse_rel(self, no_gt):
        l = self.parse_concat(no_gt)
        t, v = self.peek()
        if t == "OP" and v in ("<", "<=", "==", "!=", ">=", ">"):
            if v == ">" and no_gt:
                return l
            self.next()
            return ("cmp", v, l, self.parse_concat(no_gt))
        return l

    _CONCAT_START = {"NUMBER", "STRING", "NAME", "REGEX"}

    def parse_concat(self, no_gt):
        l = self.parse_add(no_gt)
        while True:
            t, v = self.peek()
            starts = (
                t in self._CONCAT_START
                or (t == "OP" and v in ("(", "$", "!", "-", "+"))
                or (t == "KW" and v == "getline")
            )
            # unary +/- can't start a concat operand (they're additive ops)
            if t == "OP" and v in ("-", "+"):
                starts = False
            if not starts:
                return l
            l = ("concat", l, self.parse_add(no_gt))

    def parse_add(self, no_gt):
        l = self.parse_mul(no_gt)
        while True:
            t, v = self.peek()
            if t == "OP" and v in ("+", "-"):
                self.next()
                l = ("arith", v, l, self.parse_mul(no_gt))
            else:
                return l

    def parse_mul(self, no_gt):
        l = self.parse_unary(no_gt)
        while True:
            t, v = self.peek()
            if t == "OP" and v in ("*", "/", "%"):
                self.next()
                l = ("arith", v, l, self.parse_unary(no_gt))
            else:
                return l

    def parse_unary(self, no_gt):
        t, v = self.peek()
        if t == "OP" and v == "!":
            self.next()
            return ("not", self.parse_unary(no_gt))
        if t == "OP" and v == "-":
            self.next()
            return ("neg", self.parse_unary(no_gt))
        if t == "OP" and v == "+":
            self.next()
            return ("pos", self.parse_unary(no_gt))
        return self.parse_pow(no_gt)

    def parse_pow(self, no_gt):
        l = self.parse_postfix(no_gt)
        if self.accept("OP", "^"):
            return ("arith", "^", l, self.parse_unary(no_gt))  # right assoc
        return l

    def parse_postfix(self, no_gt):
        t, v = self.peek()
        if t == "OP" and v in ("++", "--"):
            self.next()
            target = self.parse_postfix(no_gt)
            if target[0] not in ("var", "index", "field"):
                raise AwkError(f"cannot {v} a non-lvalue")
            return ("incdec", "pre", v, target)
        e = self.parse_primary(no_gt)
        while True:
            t, v = self.peek()
            if t == "OP" and v in ("++", "--") and e[0] in ("var", "index", "field"):
                self.next()
                e = ("incdec", "post", v, e)
            else:
                return e

    def parse_primary(self, no_gt):
        t, v = self.next()
        if t == "NUMBER":
            return ("num", v)
        if t == "STRING":
            return ("str", v)
        if t == "REGEX":
            return ("regex", v)
        if t == "KW" and v == "getline":
            if self.peek()[0] == "NAME":
                return ("getline", self.next()[1])
            return ("getline", None)
        if t == "OP" and v == "$":
            return ("field", self.parse_postfix(no_gt))
        if t == "OP" and v == "(":
            e = self.parse_expr()
            # grouping (a, b) in arr
            if self.peek() == ("OP", ","):
                keys = [e]
                while self.accept("OP", ","):
                    keys.append(self.parse_expr())
                self.expect("OP", ")")
                self.expect("KW", "in")
                arr = self.next()[1]
                return ("in", keys, arr)
            self.expect("OP", ")")
            return e
        if t == "NAME":
            if self.peek() == ("OP", "("):
                # call — AWK requires no space between name and ( for
                # user calls; we accept it uniformly
                self.next()
                args = []
                if not self.accept("OP", ")", skip_nl=True):
                    while True:
                        args.append(self.parse_expr())
                        if self.accept("OP", ")", skip_nl=True):
                            break
                        self.expect("OP", ",", skip_nl=True)
                return ("call", v, args)
            if self.peek() == ("OP", "["):
                self.next()
                idx = [self.parse_expr()]
                while self.accept("OP", ","):
                    idx.append(self.parse_expr())
                self.expect("OP", "]")
                return ("index", v, idx)
            return ("var", v)
        raise AwkError(f"unexpected token {v!r} in expression")


# ----------------------------------------------------------- interpreter


class _Next(Exception):
    pass


class _Exit(Exception):
    def __init__(self, code):
        self.code = code


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


def _ere_to_py(pattern: str) -> "re.Pattern":
    """POSIX ERE → Python re. The dialects agree on the corpus's
    surface; translate the POSIX character classes."""
    out = pattern
    for posix, py in [
        ("[:alpha:]", "a-zA-Z"), ("[:digit:]", "0-9"), ("[:alnum:]", "a-zA-Z0-9"),
        ("[:space:]", r" \t\n\r\f\v"), ("[:upper:]", "A-Z"), ("[:lower:]", "a-z"),
        ("[:punct:]", re.escape(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")),
        ("[:xdigit:]", "0-9a-fA-F"), ("[:blank:]", " \\t"),
    ]:
        out = out.replace(posix, py)
    try:
        return re.compile(out)
    except re.error as e:
        raise AwkError(f"invalid regex /{pattern}/: {e}")


_MAX_STEPS = 10_000_000  # runaway-loop backstop per message


class AwkProgram:
    """A compiled AWK program; `run()` executes it over one input text."""

    def __init__(self, src: str):
        items, funcs = _Parser(_lex(src)).parse_program()
        self.items = items
        self.funcs = funcs
        self._re_cache: dict[str, re.Pattern] = {}
        self.array_params = self._infer_array_params()

    def _infer_array_params(self) -> dict[str, set[int]]:
        """Which parameter positions each user function uses as arrays
        (POSIX: type follows use; needed so an UNDEFINED caller variable
        passed bare becomes an array by reference, not a scalar copy).
        Direct uses (indexing, for-in, delete, `in`, split's 2nd arg)
        seed the sets; bare-name pass-through to other calls propagates
        to a fixpoint."""
        uses: dict[str, set[str]] = {}
        passes: dict[str, list[tuple[str, int, str]]] = {}

        def walk(fname, node):
            if not isinstance(node, tuple):
                return
            op = node[0]
            if op == "index":
                uses[fname].add(node[1])
            elif op == "in":
                uses[fname].add(node[2])
                for k in node[1]:
                    walk(fname, k)
                return
            elif op == "forin":
                uses[fname].add(node[2])
            elif op == "delete":
                uses[fname].add(node[1])
            elif op == "call":
                if node[1] == "split" and len(node[2]) > 1 and node[2][1][0] == "var":
                    uses[fname].add(node[2][1][1])
                if node[1] == "length" and node[2] and node[2][0][0] == "var":
                    pass  # length() works on both; not array evidence
                for ai, a in enumerate(node[2]):
                    if a[0] == "var" and node[1] in self.funcs:
                        passes[fname].append((node[1], ai, a[1]))
                    walk(fname, a)
                return
            for child in node[1:]:
                if isinstance(child, tuple):
                    walk(fname, child)
                elif isinstance(child, list):
                    for c in child:
                        walk(fname, c)

        bodies = {"": [b for _, _, b in self.items]}
        uses[""] = set()
        passes[""] = []
        for body_group in bodies[""]:
            for st in body_group or []:
                walk("", st)
        for fname, (params, body) in self.funcs.items():
            uses[fname] = set()
            passes[fname] = []
            for st in body:
                walk(fname, st)
        result = {f: set() for f in self.funcs}
        changed = True
        while changed:
            changed = False
            for caller in list(passes):
                for callee, ai, varname in passes[caller]:
                    callee_params = self.funcs[callee][0]
                    if ai >= len(callee_params):
                        continue
                    callee_is_arr = (
                        callee_params[ai] in uses[callee] or ai in result[callee]
                    )
                    if not callee_is_arr:
                        continue
                    if ai not in result[callee]:
                        result[callee].add(ai)
                        changed = True
                    # the passed variable is an array in the CALLER too
                    if caller in self.funcs:
                        cp = self.funcs[caller][0]
                        if varname in cp:
                            pi = cp.index(varname)
                            if pi not in result[caller]:
                                result[caller].add(pi)
                                changed = True
                            if varname not in uses[caller]:
                                uses[caller].add(varname)
                                changed = True
                    elif varname not in uses[caller]:
                        uses[caller].add(varname)
                        changed = True
            for fname, (params, _body) in self.funcs.items():
                for pi, p in enumerate(params):
                    if p in uses[fname] and pi not in result[fname]:
                        result[fname].add(pi)
                        changed = True
        return result

    # -- regex cache
    def _rx(self, pattern: str) -> re.Pattern:
        r = self._re_cache.get(pattern)
        if r is None:
            r = _ere_to_py(pattern)
            self._re_cache[pattern] = r
        return r

    def run(
        self,
        stdin: str = "",
        vars: dict[str, str] | None = None,
        funcs: dict[str, Callable] | None = None,
    ) -> tuple[str, int]:
        """Execute over ``stdin`` (records split on RS, default newline).
        Returns (stdout, exit_code). ``vars`` pre-initializes globals as
        strnums (the -v surface the processor codecs use); ``funcs``
        are host-provided custom functions (the benthos surface)."""
        return _Interp(self, stdin, vars or {}, funcs or {}).run()


def compile_program(src: str) -> AwkProgram:
    return AwkProgram(src)


class _Interp:
    def __init__(self, prog: AwkProgram, stdin: str, vars, funcs):
        self.prog = prog
        self.globals: dict[str, Any] = {
            "FS": " ", "OFS": " ", "ORS": "\n", "RS": "\n", "NR": 0.0,
            "FNR": 0.0, "NF": 0.0, "SUBSEP": "\x1c", "RSTART": 0.0,
            "RLENGTH": -1.0, "CONVFMT": "%.6g", "OFMT": "%.6g",
            "FILENAME": "",
        }
        for k, v in vars.items():
            self.globals[k] = Strnum(v)
        self.custom = funcs
        self.out = io.StringIO()
        self.fields: list[str] = []
        self.record = ""
        self.locals_stack: list[dict] = []
        self.steps = 0
        rs = "\n"
        self.records = stdin.split(rs)
        if self.records and self.records[-1] == "":
            self.records.pop()
        self.rec_i = 0
        self._rand_state = 0
        self._rand_seq = 0
        self.range_active: dict[int, bool] = {}

    # ---------------- variables
    def _scope_for(self, name):
        if self.locals_stack and name in self.locals_stack[-1]:
            return self.locals_stack[-1]
        return self.globals

    def get_var(self, name):
        if name == "NF":
            return float(len(self.fields))
        scope = self._scope_for(name)
        v = scope.get(name)
        if isinstance(v, dict):
            raise AwkError(f"cannot use array {name!r} as a scalar")
        return v

    def set_var(self, name, value):
        if name == "NF":
            nf = int(to_num(value))
            if nf < len(self.fields):
                self.fields = self.fields[:nf]
            else:
                self.fields += [""] * (nf - len(self.fields))
            self._rebuild_record()
            return
        self._scope_for(name)[name] = value

    def get_array(self, name) -> dict:
        scope = self._scope_for(name)
        v = scope.get(name)
        if v is None:
            v = {}
            scope[name] = v
        if not isinstance(v, dict):
            raise AwkError(f"cannot use scalar {name!r} as an array")
        return v

    # ---------------- record / fields
    def set_record(self, text: str):
        self.record = text
        fs = self.to_str(self.globals.get("FS"))
        self.fields = self._split_fs(text, fs)

    def _split_fs(self, text: str, fs: str) -> list[str]:
        if fs == " ":
            return text.split()
        if text == "":
            return []
        if len(fs) == 1:
            return text.split(fs)
        return self._rxc(fs).split(text)

    def _rebuild_record(self):
        ofs = self.to_str(self.globals.get("OFS"))
        self.record = ofs.join(self.to_str(f) if not isinstance(f, str) else f for f in self.fields)

    def get_field(self, idx: int):
        if idx == 0:
            return Strnum(self.record)
        if 1 <= idx <= len(self.fields):
            return Strnum(self.fields[idx - 1])
        return Strnum("")

    def set_field(self, idx: int, value):
        s = self.to_str(value)
        if idx == 0:
            self.set_record(s)
            return
        if idx < 0:
            raise AwkError("negative field index")
        while len(self.fields) < idx:
            self.fields.append("")
        self.fields[idx - 1] = s
        self._rebuild_record()

    # ---------------- conversions
    def to_str(self, v, output=False) -> str:
        if v is None:
            return ""
        if isinstance(v, float):
            return _num_str(v, self.to_str(self.globals.get("OFMT" if output else "CONVFMT")) or "%.6g")
        return v

    # ---------------- run
    def run(self) -> tuple[str, int]:
        code = 0
        try:
            for it, (kind, pattern, body) in enumerate(self.prog.items):
                if kind == "BEGIN":
                    self.exec_stmts(body)
            main_rules = [
                (i, p, b) for i, (k, p, b) in enumerate(self.prog.items) if k == "rule"
            ]
            has_main_or_end = main_rules or any(k == "END" for k, _, _ in self.prog.items)
            if has_main_or_end:
                while self.rec_i < len(self.records):
                    rec = self.records[self.rec_i]
                    self.rec_i += 1
                    self.globals["NR"] = self.globals["NR"] + 1.0
                    self.globals["FNR"] = self.globals["FNR"] + 1.0
                    self.set_record(rec)
                    try:
                        for ri, pattern, body in main_rules:
                            if self._pattern_matches(ri, pattern):
                                self.exec_stmts(body)
                    except _Next:
                        continue
            for kind, pattern, body in self.prog.items:
                if kind == "END":
                    self.exec_stmts(body)
        except _Exit as e:
            # POSIX runs END after exit-from-main; the corpus (and the
            # reference's usage) only needs the exit STATUS — keep the
            # simpler skip-END semantics and document it
            code = int(to_num(e.code)) if e.code is not None else 0
        return self.out.getvalue(), code

    def _pattern_matches(self, rule_i, pattern) -> bool:
        if pattern is None:
            return True
        if pattern[0] == "range":
            active = self.range_active.get(rule_i, False)
            if not active:
                if to_bool(self._pat_val(pattern[1])):
                    self.range_active[rule_i] = not to_bool(self._pat_val(pattern[2]))
                    return True
                return False
            if to_bool(self._pat_val(pattern[2])):
                self.range_active[rule_i] = False
            return True
        return to_bool(self._pat_val(pattern))

    def _pat_val(self, pattern):
        if pattern[0] == "regex":
            return 1.0 if self.prog._rx(pattern[1]).search(self.record) else 0.0
        return self.eval(pattern)

    # ---------------- statements
    def exec_stmts(self, stmts):
        for s in stmts:
            self.exec_stmt(s)

    def exec_stmt(self, s):
        self.steps += 1
        if self.steps > _MAX_STEPS:
            raise AwkError("AWK program exceeded the per-message step budget")
        op = s[0]
        if op == "expr":
            self.eval(s[1])
        elif op == "print":
            args = s[1]
            if not args:
                text = self.record
            else:
                ofs = self.to_str(self.globals.get("OFS"))
                text = ofs.join(self.to_str(self.eval(a), output=True) for a in args)
            self.out.write(text)
            self.out.write(self.to_str(self.globals.get("ORS")))
        elif op == "printf":
            args = [self.eval(a) for a in s[1]]
            if not args:
                raise AwkError("printf needs a format argument")
            self.out.write(self._sprintf(self.to_str(args[0]), args[1:]))
        elif op == "block":
            self.exec_stmts(s[1])
        elif op == "if":
            if to_bool(self.eval(s[1])):
                self.exec_stmts(s[2])
            elif s[3] is not None:
                self.exec_stmts(s[3])
        elif op == "while":
            while to_bool(self.eval(s[1])):
                try:
                    self.exec_stmts(s[2])
                except _Break:
                    break
                except _Continue:
                    continue
        elif op == "dowhile":
            while True:
                try:
                    self.exec_stmts(s[2])
                except _Break:
                    break
                except _Continue:
                    pass
                if not to_bool(self.eval(s[1])):
                    break
        elif op == "for":
            if s[1] is not None:
                self.eval(s[1])
            while s[2] is None or to_bool(self.eval(s[2])):
                try:
                    self.exec_stmts(s[4])
                except _Break:
                    break
                except _Continue:
                    pass
                if s[3] is not None:
                    self.eval(s[3])
        elif op == "forin":
            arr = self.get_array(s[2])
            for k in list(arr.keys()):
                self.set_var(s[1], Strnum(k))
                try:
                    self.exec_stmts(s[3])
                except _Break:
                    break
                except _Continue:
                    continue
        elif op == "break":
            raise _Break()
        elif op == "continue":
            raise _Continue()
        elif op == "next":
            raise _Next()
        elif op == "exit":
            raise _Exit(self.eval(s[1]) if s[1] is not None else None)
        elif op == "return":
            raise _Return(self.eval(s[1]) if s[1] is not None else None)
        elif op == "delete":
            arr = self.get_array(s[1])
            if s[2] is None:
                arr.clear()
            else:
                arr.pop(self._subscript(s[2]), None)
        else:
            raise AwkError(f"unknown statement {op!r}")

    def _subscript(self, idx_exprs) -> str:
        subsep = self.to_str(self.globals.get("SUBSEP"))
        return subsep.join(self.to_str(self.eval(e)) for e in idx_exprs)

    # ---------------- expressions
    def eval(self, e):
        self.steps += 1
        if self.steps > _MAX_STEPS:
            raise AwkError("AWK program exceeded the per-message step budget")
        op = e[0]
        if op == "num":
            return e[1]
        if op == "str":
            return e[1]
        if op == "regex":
            # a bare regex in expression position matches against $0
            return 1.0 if self.prog._rx(e[1]).search(self.record) else 0.0
        if op == "var":
            return self.get_var(e[1])
        if op == "field":
            return self.get_field(int(to_num(self.eval(e[1]))))
        if op == "index":
            arr = self.get_array(e[1])
            key = self._subscript(e[2])
            if key not in arr:
                arr[key] = None  # referencing creates (POSIX)
            return arr[key]
        if op == "assign":
            return self._assign(e[1], e[2], e[3])
        if op == "incdec":
            old = to_num(self._lvalue_get(e[3]))
            new = old + (1.0 if e[2] == "++" else -1.0)
            self._lvalue_set(e[3], new)
            return old if e[1] == "post" else new
        if op == "ternary":
            return self.eval(e[2]) if to_bool(self.eval(e[1])) else self.eval(e[3])
        if op == "or":
            return 1.0 if (to_bool(self.eval(e[1])) or to_bool(self.eval(e[2]))) else 0.0
        if op == "and":
            return 1.0 if (to_bool(self.eval(e[1])) and to_bool(self.eval(e[2]))) else 0.0
        if op == "not":
            return 0.0 if to_bool(self.eval(e[1])) else 1.0
        if op == "neg":
            return -to_num(self.eval(e[1]))
        if op == "pos":
            return to_num(self.eval(e[1]))
        if op == "cmp":
            return 1.0 if self._compare(e[1], self.eval(e[2]), self.eval(e[3])) else 0.0
        if op == "concat":
            return self.to_str(self.eval(e[1])) + self.to_str(self.eval(e[2]))
        if op == "arith":
            a, b = to_num(self.eval(e[2])), to_num(self.eval(e[3]))
            o = e[1]
            if o == "+":
                return a + b
            if o == "-":
                return a - b
            if o == "*":
                return a * b
            if o == "/":
                if b == 0:
                    raise AwkError("division by zero")
                return a / b
            if o == "%":
                if b == 0:
                    raise AwkError("division by zero in %")
                return math.fmod(a, b)
            if o == "^":
                return a**b
        if op == "matchop":
            subject = self.to_str(self.eval(e[1]))
            pat = e[2][1] if e[2][0] == "regex" else self.to_str(self.eval(e[2]))
            hit = bool(self.prog._rx(pat).search(subject))
            return 1.0 if (hit != e[3]) else 0.0
        if op == "in":
            arr = self.get_array(e[2])
            key = self._subscript(e[1])
            return 1.0 if key in arr else 0.0
        if op == "call":
            return self._call(e[1], e[2])
        if op == "getline":
            if self.rec_i >= len(self.records):
                return 0.0
            rec = self.records[self.rec_i]
            self.rec_i += 1
            self.globals["NR"] = self.globals["NR"] + 1.0
            self.globals["FNR"] = self.globals["FNR"] + 1.0
            if e[1] is None:
                self.set_record(rec)
            else:
                self.set_var(e[1], Strnum(rec))
            return 1.0
        raise AwkError(f"unknown expression {op!r}")

    def _compare(self, op, a, b) -> bool:
        numeric = (
            (a is None or isinstance(a, float) or (isinstance(a, Strnum) and _looks_numeric(a)))
            and (b is None or isinstance(b, float) or (isinstance(b, Strnum) and _looks_numeric(b)))
        )
        if numeric:
            x, y = to_num(a), to_num(b)
        else:
            x, y = self.to_str(a), self.to_str(b)
        return {
            "<": x < y, "<=": x <= y, ">": x > y, ">=": x >= y,
            "==": x == y, "!=": x != y,
        }[op]

    def _lvalue_get(self, t):
        if t[0] == "var":
            return self.get_var(t[1])
        if t[0] == "field":
            return self.get_field(int(to_num(self.eval(t[1]))))
        arr = self.get_array(t[1])
        return arr.get(self._subscript(t[2]))

    def _lvalue_set(self, t, value):
        if t[0] == "var":
            self.set_var(t[1], value)
        elif t[0] == "field":
            self.set_field(int(to_num(self.eval(t[1]))), value)
        else:
            self.get_array(t[1])[self._subscript(t[2])] = value

    def _assign(self, op, target, rhs_expr):
        rhs = self.eval(rhs_expr)
        if op == "=":
            val = rhs
        else:
            cur = to_num(self._lvalue_get(target))
            r = to_num(rhs)
            if op == "+=":
                val = cur + r
            elif op == "-=":
                val = cur - r
            elif op == "*=":
                val = cur * r
            elif op == "/=":
                if r == 0:
                    raise AwkError("division by zero")
                val = cur / r
            elif op == "%=":
                if r == 0:
                    raise AwkError("division by zero in %")
                val = math.fmod(cur, r)
            else:
                val = cur**r
        self._lvalue_set(target, val)
        return val

    # ---------------- function calls
    def _call(self, name, arg_exprs):
        builtin = getattr(self, f"_fn_{name}", None)
        if name in self.prog.funcs:
            return self._call_user(name, arg_exprs)
        if name in self.custom:
            args = [self.eval(a) for a in arg_exprs]
            return self._call_custom(name, args)
        if builtin is not None:
            return builtin(arg_exprs)
        raise AwkError(f"call to undefined function {name!r}")

    def _call_user(self, name, arg_exprs):
        params, body = self.prog.funcs[name]
        if len(arg_exprs) > len(params):
            raise AwkError(f"too many args in call to {name}()")
        frame: dict[str, Any] = {}
        arr_positions = self.prog.array_params.get(name, set())
        for i, p in enumerate(params):
            if i < len(arg_exprs):
                a = arg_exprs[i]
                # arrays pass by reference — including a caller variable
                # that is still UNDEFINED but used as an array inside the
                # callee (POSIX type-follows-use)
                if a[0] == "var":
                    scope = self._scope_for(a[1])
                    cur = scope.get(a[1])
                    if isinstance(cur, dict):
                        frame[p] = cur
                        continue
                    if cur is None and i in arr_positions:
                        fresh: dict = {}
                        scope[a[1]] = fresh
                        frame[p] = fresh
                        continue
                frame[p] = self.eval(a)
            else:
                frame[p] = None  # extra params are locals
        self.locals_stack.append(frame)
        try:
            self.exec_stmts(body)
            return None
        except _Return as r:
            return r.value
        finally:
            self.locals_stack.pop()

    def _call_custom(self, name, args):
        fn = self.custom[name]
        import inspect

        try:
            sig = inspect.signature(fn)
            variadic = any(
                p.kind == inspect.Parameter.VAR_POSITIONAL for p in sig.parameters.values()
            )
            nparams = len(
                [p for p in sig.parameters.values() if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
            )
        except (TypeError, ValueError):
            variadic, nparams = True, 0
        if not variadic:
            if len(args) > nparams:
                raise AwkError(f"too many args in call to {name}()")
            args = args + [""] * (nparams - len(args))  # goawk pads missing
        # host funcs see AWK-normalized values: numbers as float, rest str
        norm = [a if isinstance(a, float) else self.to_str(a) for a in args]
        try:
            res = fn(*norm)
        except AwkError:
            raise
        except Exception as exc:
            raise AwkError(f"{name}: {exc}")
        if res is None:
            return None
        if isinstance(res, bool):
            return 1.0 if res else 0.0
        if isinstance(res, (int, float)):
            return float(res)
        return str(res)

    # ---------------- builtins
    def _one(self, args, default=None):
        if not args:
            if default is not None:
                return default
            raise AwkError("missing argument")
        return self.eval(args[0])

    def _fn_length(self, args):
        if not args:
            return float(len(self.record))
        a = args[0]
        if a[0] == "var":
            cur = self._scope_for(a[1]).get(a[1])
            if isinstance(cur, dict):
                return float(len(cur))
        return float(len(self.to_str(self.eval(a))))

    def _fn_substr(self, args):
        s = self.to_str(self.eval(args[0]))
        m = int(to_num(self.eval(args[1])))
        if len(args) > 2:
            ln = int(to_num(self.eval(args[2])))
        else:
            ln = len(s) - m + 1 if m > 0 else len(s)
        # POSIX clamping
        start = max(m, 1)
        end = m + max(ln, 0)
        return s[start - 1 : max(end - 1, start - 1)]

    def _fn_index(self, args):
        s = self.to_str(self.eval(args[0]))
        t = self.to_str(self.eval(args[1]))
        return float(s.find(t) + 1)

    def _fn_split(self, args):
        s = self.to_str(self.eval(args[0]))
        if args[1][0] not in ("var", "index"):
            raise AwkError("split() second argument must be an array")
        arr = self.get_array(args[1][1])
        arr.clear()
        fs = (
            (args[2][1] if args[2][0] == "regex" else self.to_str(self.eval(args[2])))
            if len(args) > 2
            else self.to_str(self.globals.get("FS"))
        )
        parts = self._split_fs(s, fs)
        for i, p in enumerate(parts, 1):
            arr[str(i)] = Strnum(p)
        return float(len(parts))

    def _sub_impl(self, args, count):
        pat = args[0][1] if args[0][0] == "regex" else self.to_str(self.eval(args[0]))
        repl = self.to_str(self.eval(args[1]))
        target = args[2] if len(args) > 2 else ("field", ("num", 0.0))
        s = self.to_str(self._lvalue_get(target))
        rx = self.prog._rx(pat)

        def rfn(m):
            out = []
            i = 0
            while i < len(repl):
                c = repl[i]
                if c == "\\" and i + 1 < len(repl) and repl[i + 1] in ("&", "\\"):
                    out.append(repl[i + 1])
                    i += 2
                elif c == "&":
                    out.append(m.group(0))
                    i += 1
                else:
                    out.append(c)
                    i += 1
            return "".join(out)

        new, n = rx.subn(rfn, s, count=count)
        if n:
            self._lvalue_set(target, new)
        return float(n)

    def _fn_sub(self, args):
        return self._sub_impl(args, 1)

    def _fn_gsub(self, args):
        return self._sub_impl(args, 0)

    def _fn_match(self, args):
        s = self.to_str(self.eval(args[0]))
        pat = args[1][1] if args[1][0] == "regex" else self.to_str(self.eval(args[1]))
        m = self.prog._rx(pat).search(s)
        if m is None:
            self.globals["RSTART"] = 0.0
            self.globals["RLENGTH"] = -1.0
            return 0.0
        self.globals["RSTART"] = float(m.start() + 1)
        self.globals["RLENGTH"] = float(m.end() - m.start())
        return float(m.start() + 1)

    def _fn_sprintf(self, args):
        vals = [self.eval(a) for a in args]
        return self._sprintf(self.to_str(vals[0]), vals[1:])

    def _fn_int(self, args):
        n = to_num(self._one(args))
        return float(math.trunc(n))

    def _fn_sin(self, args):
        return math.sin(to_num(self._one(args)))

    def _fn_cos(self, args):
        return math.cos(to_num(self._one(args)))

    def _fn_atan2(self, args):
        return math.atan2(to_num(self.eval(args[0])), to_num(self.eval(args[1])))

    def _fn_exp(self, args):
        return math.exp(to_num(self._one(args)))

    def _fn_log(self, args):
        n = to_num(self._one(args))
        if n <= 0:
            return -math.inf if n == 0 else math.nan
        return math.log(n)

    def _fn_sqrt(self, args):
        return math.sqrt(max(to_num(self._one(args)), 0.0))

    def _fn_rand(self, args):
        # deterministic splitmix64 stream (see module docstring)
        x = (self._rand_state + 0x9E3779B97F4A7C15 * (self._rand_seq + 1)) & (2**64 - 1)
        self._rand_seq += 1
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & (2**64 - 1)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & (2**64 - 1)
        x ^= x >> 31
        return (x >> 11) / float(1 << 53)

    def _fn_srand(self, args):
        prev = float(self._rand_state)
        self._rand_state = int(to_num(self._one(args, default=("num", 0.0))))
        self._rand_seq = 0
        return prev

    def _fn_tolower(self, args):
        return self.to_str(self._one(args)).lower()

    def _fn_toupper(self, args):
        return self.to_str(self._one(args)).upper()

    def _fn_system(self, args):
        raise AwkError("system() is not available in the message processor")

    # ---------------- printf engine
    _FMT_RE = re.compile(r"%([-+ 0#]*)(\d+|\*)?(?:\.(\d+|\*))?([diouxXeEfgGcs%])")

    def _sprintf(self, fmt: str, args: list) -> str:
        out = []
        pos = 0
        ai = 0

        def take():
            nonlocal ai
            v = args[ai] if ai < len(args) else None
            ai += 1
            return v

        for m in self._FMT_RE.finditer(fmt):
            out.append(fmt[pos : m.start()])
            pos = m.end()
            flags, width, prec, conv = m.groups()
            if conv == "%":
                out.append("%")
                continue
            if width == "*":
                width = str(int(to_num(take())))
            if prec == "*":
                prec = str(int(to_num(take())))
            spec = "%" + flags + (width or "") + (("." + prec) if prec is not None else "")
            v = take()
            if conv in "di":
                out.append((spec + "d") % int(to_num(v)))
            elif conv in "ouxX":
                iv = int(to_num(v))
                out.append((spec + conv.replace("u", "d")) % (iv & 0xFFFFFFFFFFFFFFFF if iv < 0 and conv != "u" else iv))
            elif conv in "eEfgG":
                out.append((spec + conv) % to_num(v))
            elif conv == "c":
                if isinstance(v, float):
                    out.append((spec + "s") % chr(int(v)))
                else:
                    sv = self.to_str(v)
                    out.append((spec + "s") % (sv[0] if sv else ""))
            elif conv == "s":
                out.append((spec + "s") % self.to_str(v))
        out.append(fmt[pos:])
        return "".join(out)

    # regex from dynamic strings shares the program cache
    def _rxc(self, pattern: str) -> re.Pattern:
        return self.prog._rx(pattern)
