"""`javascript` processor — run a JS program per message.

Reference: internal/impl/javascript/processor.go (embeds the goja
engine; config fields `code` / `file`, vm.go pools one runtime per
parallel lane and reuses it across invocations). Here the engine is
this repo's own from-scratch interpreter (functions/js.py); the
`benthos` host object mirrors functions.go:

- v0_msg_as_string / v0_msg_set_string     (functions.go:147,160)
- v0_msg_as_structured / v0_msg_set_structured (functions.go:175,195)
- v0_msg_get_meta / v0_msg_set_meta / v0_msg_exists_meta
  (functions.go:205-255)
- v0_fetch — synchronous HTTP           (functions.go:90)

Host-function failures are thrown into the script as string values
(vm.go setFunction: panic(rt.ToValue(err.Error()))), so `try/catch`
in user code observes the same error strings — including Go
encoding/json's first-error text for a non-JSON AsStructured call.

One interpreter per executor worker per program hash, reused across
messages exactly like the reference's runner pool — global state
outlives invocations (the reference documents the same caveat).
"""

from __future__ import annotations

import hashlib
import json
import logging
from dataclasses import dataclass
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from benthos_spark.operators.processors import (
    ERROR_COL,
    META_COL,
    Processor,
    ensure_error_col,
    ensure_meta_col,
)

logger = logging.getLogger("benthos_spark.javascript")

_RUNNERS: dict = {}


def go_json_error(s: str) -> str:
    """First-error text of Go encoding/json.Unmarshal for input `s`
    (public behavior, mirrored so scripts catching host errors see the
    reference's exact strings, e.g. processor_test.go:216:
    "invalid character 'o' in literal null (expecting 'u')")."""
    i = 0
    n = len(s)

    def skip_ws(j):
        while j < n and s[j] in " \t\r\n":
            j += 1
        return j

    def value(j):
        j = skip_ws(j)
        if j >= n:
            return None, "unexpected end of JSON input"
        c = s[j]
        for lit in ("null", "true", "false"):
            if c == lit[0]:
                for k, ch in enumerate(lit):
                    if j + k >= n:
                        return None, "unexpected end of JSON input"
                    if s[j + k] != ch:
                        return None, (
                            f"invalid character {_qc(s[j + k])} in literal "
                            f"{lit} (expecting {_qc(ch)})")
                return j + len(lit), None
        if c == '"':
            j += 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == '"':
                    return j + 1, None
                j += 1
            return None, "unexpected end of JSON input"
        if c == "-" or c.isdigit():
            k = j + 1
            while k < n and (s[k].isdigit() or s[k] in ".eE+-"):
                k += 1
            return k, None
        if c == "{":
            j = skip_ws(j + 1)
            if j < n and s[j] == "}":
                return j + 1, None
            while True:
                j = skip_ws(j)
                if j >= n:
                    return None, "unexpected end of JSON input"
                if s[j] != '"':
                    return None, (f"invalid character {_qc(s[j])} looking "
                                  "for beginning of object key string")
                j, err = value(j)
                if err:
                    return None, err
                j = skip_ws(j)
                if j >= n or s[j] != ":":
                    return None, (f"invalid character "
                                  f"{_qc(s[j]) if j < n else 'EOF'} after "
                                  "object key")
                j, err = value(j + 1)
                if err:
                    return None, err
                j = skip_ws(j)
                if j < n and s[j] == ",":
                    j += 1
                    continue
                if j < n and s[j] == "}":
                    return j + 1, None
                return None, (f"invalid character "
                              f"{_qc(s[j]) if j < n else 'EOF'} after "
                              "object key:value pair")
        if c == "[":
            j = skip_ws(j + 1)
            if j < n and s[j] == "]":
                return j + 1, None
            while True:
                j, err = value(j)
                if err:
                    return None, err
                j = skip_ws(j)
                if j < n and s[j] == ",":
                    j += 1
                    continue
                if j < n and s[j] == "]":
                    return j + 1, None
                return None, (f"invalid character "
                              f"{_qc(s[j]) if j < n else 'EOF'} after "
                              "array element")
        return None, (f"invalid character {_qc(c)} looking for beginning "
                      "of value")

    j, err = value(i)
    if err:
        return err
    j = skip_ws(j)
    if j < n:
        return f"invalid character {_qc(s[j])} after top-level value"
    return "unexpected end of JSON input"


def _qc(c: str) -> str:
    if c == "'":
        return "'\\''"
    if c in ("\n",):
        return "'\\n'"
    if c in ("\t",):
        return "'\\t'"
    if not c.isprintable():
        return f"'\\x{ord(c):02x}'"
    return f"'{c}'"


def _deep_copy_js(v):
    if isinstance(v, dict):
        return {k: _deep_copy_js(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_deep_copy_js(x) for x in v]
    return v


class _Runner:
    """vmRunner analog (vm.go:16): one interpreter + the per-message
    target slots, reused across invocations."""

    def __init__(self, code: str):
        from benthos_spark.functions import js

        self.js = js
        self.program = js.parse_js(code)
        self.interp = js.Interpreter(
            extra_globals={"benthos": self._host_object()},
            console_writer=self._console,
        )
        # per-message state
        self.content: Optional[bytes] = None
        self.structured = None          # parsed cache
        self.meta: dict = {}

    @staticmethod
    def _console(level: str, msg: str) -> None:
        getattr(logger, {"log": "info"}.get(level, level))(msg)

    def _host_object(self) -> dict:
        from benthos_spark.functions.js import (
            UNDEF, JSThrow, NativeFunction, js_export, js_import,
            js_to_string,
        )

        def _as_bytes(self_r=self):
            if self_r.structured is not None:
                return json.dumps(
                    js_export(self_r.structured), separators=(",", ":"),
                    ensure_ascii=False).encode("utf-8")
            return self_r.content or b""

        def as_string(i, t, a):
            return _as_bytes().decode("utf-8", errors="replace")

        def set_string(i, t, a):
            if not a:
                raise JSThrow("argument at position 0 is undefined")
            self.content = js_to_string(a[0], i).encode("utf-8")
            self.structured = None
            return UNDEF

        def as_structured(i, t, a):
            # AsStructured semantics (functions.go:195 → message.
            # AsStructured): the script receives a COPY — mutations
            # don't touch the message until v0_msg_set_structured is
            # called (pinned by TestProcessorStructuredImut).
            if self.structured is not None:
                return _deep_copy_js(self.structured)
            raw = (self.content or b"").decode("utf-8", errors="replace")
            try:
                return js_import(
                    json.loads(raw, parse_int=float, parse_float=float))
            except json.JSONDecodeError:
                raise JSThrow(go_json_error(raw))

        def set_structured(i, t, a):
            if not a:
                raise JSThrow("argument at position 0 is undefined")
            self.structured = a[0]
            self.content = None
            return UNDEF

        def get_meta(i, t, a):
            if not a or a[0] is UNDEF:
                raise JSThrow("argument at position 0 is undefined")
            name = js_to_string(a[0], i)
            if name not in self.meta:
                raise JSThrow("key not found")
            return js_import(self.meta[name])

        def exists_meta(i, t, a):
            if not a or a[0] is UNDEF:
                raise JSThrow("argument at position 0 is undefined")
            return js_to_string(a[0], i) in self.meta

        def set_meta(i, t, a):
            if len(a) < 2 or a[0] is UNDEF:
                raise JSThrow("argument at position 0 is undefined")
            self.meta[js_to_string(a[0], i)] = js_export(a[1])
            return UNDEF

        def fetch(i, t, a):
            import urllib.request

            if not a or a[0] is UNDEF:
                raise JSThrow("argument at position 0 is undefined")
            url = js_to_string(a[0], i)
            headers = a[1] if len(a) > 1 and isinstance(a[1], dict) else {}
            method = js_to_string(a[2], i) if len(a) > 2 and \
                a[2] is not UNDEF else "GET"
            body = js_to_string(a[3], i) if len(a) > 3 and \
                a[3] is not UNDEF else ""
            req = urllib.request.Request(
                url, data=body.encode("utf-8") if body else None,
                method=method)
            for k, v in headers.items():
                req.add_header(str(k), js_to_string(v, i))
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    return {"status": float(resp.status),
                            "body": resp.read().decode("utf-8",
                                                        errors="replace")}
            except urllib.error.HTTPError as e:
                return {"status": float(e.code),
                        "body": e.read().decode("utf-8", errors="replace")}
            except Exception as e:  # network failure -> thrown host error
                raise JSThrow(str(e))

        return {
            "v0_fetch": NativeFunction("v0_fetch", fetch),
            "v0_msg_as_string": NativeFunction("v0_msg_as_string", as_string),
            "v0_msg_set_string": NativeFunction("v0_msg_set_string",
                                                set_string),
            "v0_msg_as_structured": NativeFunction("v0_msg_as_structured",
                                                   as_structured),
            "v0_msg_set_structured": NativeFunction("v0_msg_set_structured",
                                                    set_structured),
            "v0_msg_get_meta": NativeFunction("v0_msg_get_meta", get_meta),
            "v0_msg_set_meta": NativeFunction("v0_msg_set_meta", set_meta),
            "v0_msg_exists_meta": NativeFunction("v0_msg_exists_meta",
                                                 exists_meta),
        }

    def run(self, content: bytes, meta: dict) -> tuple:
        """Returns (new_content_bytes, new_meta, err)."""
        from benthos_spark.functions.js import JSError, JSThrow, js_export

        self.content = bytes(content)
        self.structured = None
        self.meta = dict(meta or {})
        try:
            self.interp.run(self.program)
        except JSThrow as e:
            # uncaught throw fails the message (the reference fails the
            # whole batch; per-message is the Spark-native granularity
            # and strictly less lossy)
            return self.content or b"", self.meta, str(e)
        except (JSError, RecursionError) as e:
            return self.content or b"", self.meta, str(e)
        if self.structured is not None:
            out = json.dumps(
                js_export(self.structured), separators=(",", ":"),
                ensure_ascii=False).encode("utf-8")
        else:
            out = self.content or b""
        return out, self.meta, None


def get_runner(code: str) -> _Runner:
    key = hashlib.sha256(code.encode("utf-8")).hexdigest()
    runner = _RUNNERS.get(key)
    if runner is None:
        runner = _Runner(code)
        _RUNNERS[key] = runner
    return runner


@dataclass
class JavaScript(Processor):
    """Config-wired `javascript` processor: `code` (inline) or `file`
    path, applied per message over an Arrow-batched UDF. Metadata is
    carried in the `_meta` map column; meta values that aren't strings
    are JSON-encoded into the map (Spark's map<string,string>) and can
    be decoded downstream with parse_json."""

    code: str = ""
    file: str = ""
    col: str = "value"

    def __post_init__(self):
        if bool(self.code) == bool(self.file):
            raise ValueError(
                "javascript processor: exactly one of `code` or `file` "
                "must be set")
        if self.file:
            with open(self.file, "r", encoding="utf-8") as f:
                self.code = f.read()
        # fail fast on the driver (parse errors surface at build time,
        # like the reference compiling the program in the constructor,
        # processor.go:129)
        get_runner(self.code)

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        df = ensure_meta_col(df)
        code = self.code

        @F.pandas_udf("struct<v:binary,m:map<string,string>,e:string>")
        def run(vals: pd.Series, metas: pd.Series) -> pd.DataFrame:
            runner = get_runner(code)
            out_v, out_m, out_e = [], [], []
            for v, m in zip(vals, metas):
                content, meta, err = runner.run(
                    b"" if v is None else bytes(v), m or {})
                out_v.append(content)
                out_m.append({
                    k: (val if isinstance(val, str) else json.dumps(
                        val, separators=(",", ":"), ensure_ascii=False))
                    for k, val in meta.items()
                })
                out_e.append(err)
            return pd.DataFrame({"v": out_v, "m": out_m, "e": out_e})

        src = F.col(self.col)
        res = run(src.cast("binary"), F.col(META_COL))
        return (
            df.withColumn("_j", res)
            .withColumn(self.col, F.col("_j.v") if
                        dict(df.dtypes).get(self.col) == "binary"
                        else F.col("_j.v").cast("string"))
            .withColumn(META_COL, F.col("_j.m"))
            .withColumn(ERROR_COL, F.coalesce(F.col(ERROR_COL),
                                              F.col("_j.e")))
            .drop("_j")
        )
