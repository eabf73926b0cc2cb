"""`awk` processor — AWK programs over messages with the reference's
custom function surface.

Mirrors /root/reference/internal/impl/awk/processor.go: the program
runs per message with codec-defined input (`none` → " ", `text` → the
content, `json` → flattened JSON paths as variables), metadata
variables for non-none codecs, and the benthos function family
(json_get/set/append/delete/length/type, metadata_get/set,
timestamp_*, create_json_object/array, base64_*, print_log). Output
semantics match Process(): non-empty program stdout replaces the
content (trailing newline stripped); otherwise JSON mutations made by
json_set*/append/delete are serialized back; otherwise the content is
unchanged. Failures set the ``_error`` slot instead of failing the
batch (part.go error model).

The AWK language itself is the from-scratch interpreter in
functions/awk.py (the reference embeds goawk; none exists here).

JSON parity notes (pinned in tests/test_awk.py):
 - numbers parse as float64 like Go's encoding/json (`json_type` of 5
   is "float"); integral floats marshal without a decimal point;
 - objects marshal with SORTED keys, compact separators (Go map
   marshal order) — the one divergence is Go's HTML escaping of <>&,
   which we do not apply;
 - `json_append` on a non-array wraps the old value first (gabs
   ArrayAppendP), and paths address arrays by numeric component
   ("obj.1.foo").

Scale: interpreted per message inside an Arrow batch — the designed
slow path, same tier as the reference's own goawk embedding (it also
interprets per message). Bulk mappings belong to Bloblang/jq columnar
tiers; awk is the power-tool escape hatch.
"""

from __future__ import annotations

import base64
import binascii
import datetime as _dt
import json
import math
from dataclasses import dataclass, field
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from benthos_spark.functions.awk import AwkError, compile_program
from benthos_spark.operators.processors import (
    ERROR_COL,
    META_COL,
    Processor,
    ensure_error_col,
    ensure_meta_col,
)

_INVALID_VAR = __import__("re").compile(r"[^a-zA-Z0-9_]")

# Go auto-detect layouts (processor.go getTime), translated at parse
_AUTO_LAYOUTS = [
    "Mon Jan 02 15:04:05 -0700 2006",  # RubyDate
    "Mon, 02 Jan 2006 15:04:05 -0700",  # RFC1123Z
    "Mon, 02 Jan 2006 15:04:05 MST",  # RFC1123
    "2006-01-02T15:04:05Z07:00",  # RFC3339
    "02 Jan 06 15:04 MST",  # RFC822
    "02 Jan 06 15:04 -0700",  # RFC822Z
    "Mon, 2 Jan 2006 15:04:05 -0700",
    "2006-01-02T15:04:05MST",
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05",
    "2006-01-02T15:04:05Z0700",
    "2006-01-02",
]


def _go_parse_time(date_str: str, layout: str) -> _dt.datetime:
    from benthos_spark.bloblang.interp import BloblangError, _go_strptime

    if date_str == "":
        return _dt.datetime.now(_dt.timezone.utc)
    if layout:
        try:
            return _go_strptime(date_str, layout)
        except BloblangError as e:
            raise AwkError(str(e))
    for lay in _AUTO_LAYOUTS:
        try:
            return _go_strptime(date_str, lay)
        except BloblangError:
            continue
    raise AwkError(f"failed to detect datetime format of: {date_str}")


def _go_format_time(ts: _dt.datetime, layout: str) -> str:
    from benthos_spark.bloblang.interp import _go_strftime

    return _go_strftime(ts, layout or "2006-01-02T15:04:05Z07:00")


def _awk_int(v) -> int:
    """AWK value → int without float64 precision loss: nanosecond
    timestamps exceed 2^53, so numeric STRINGS parse as true ints."""
    if isinstance(v, str):
        s = v.strip()
        try:
            return int(s)
        except ValueError:
            return int(float(s or "0"))
    return int(v)


def _format_unix_nano(unix_nano: int, layout: str) -> str:
    """Go time.Format for a nanosecond timestamp: Python datetimes hold
    microseconds only, so fractional-second layout directives are
    substituted with the true nanos via a placeholder that survives the
    layout translation (raw digits would collide with tokens like 04)."""
    from benthos_spark.bloblang.interp import _GO_FRAC_RE, _go_strftime

    secs, nanos = divmod(unix_nano, 1_000_000_000)
    ts = _dt.datetime.fromtimestamp(secs, _dt.timezone.utc)
    layout = layout or "2006-01-02T15:04:05Z07:00"
    fracs: list[str] = []

    def sub(m):
        width = len(m.group(1))
        digits = f"{nanos:09d}"[:width]
        if m.group(1)[0] == "9":
            digits = digits.rstrip("0")
            fracs.append(("." + digits) if digits else "")
        else:
            fracs.append("." + digits)
        return "\x01FRAC\x01"

    marked = _GO_FRAC_RE.sub(sub, layout)
    out = _go_strftime(ts, marked)
    for f in fracs:
        out = out.replace("\x01FRAC\x01", f, 1)
    return out


# ------------------------------------------------------------- JSON ops


def _marshal(v: Any) -> str:
    def fix(o):
        if isinstance(o, float) and not isinstance(o, bool):
            if o == int(o) and abs(o) < 1e15 and not math.isinf(o):
                return int(o)
            return o
        if isinstance(o, dict):
            return {k: fix(x) for k, x in o.items()}
        if isinstance(o, list):
            return [fix(x) for x in o]
        return o

    return json.dumps(fix(v), sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def _path_parts(path: str) -> list[str]:
    return path.split(".") if path else []


def _path_get(doc: Any, path: str):
    """gabs Path(): walk dots; numeric components index arrays. Returns
    (found, value)."""
    cur = doc
    for part in _path_parts(path):
        if isinstance(cur, dict):
            if part not in cur:
                return False, None
            cur = cur[part]
        elif isinstance(cur, list):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return False, None
        else:
            return False, None
    return True, cur


def _path_set(doc: Any, path: str, value: Any) -> Any:
    """gabs SetP(): create intermediate objects; numeric components on
    existing arrays index in place. Returns the (possibly new) root."""
    parts = _path_parts(path)
    if not parts:
        return value
    if not isinstance(doc, (dict, list)):
        doc = {}
    cur = doc
    for i, part in enumerate(parts):
        last = i == len(parts) - 1
        if isinstance(cur, list):
            try:
                idx = int(part)
            except ValueError:
                return doc  # gabs fails silently; mirror
            if not (0 <= idx < len(cur)):
                return doc
            if last:
                cur[idx] = value
            else:
                if not isinstance(cur[idx], (dict, list)):
                    cur[idx] = {}
                cur = cur[idx]
        else:
            if last:
                cur[part] = value
            else:
                nxt = cur.get(part)
                if not isinstance(nxt, (dict, list)):
                    nxt = {}
                    cur[part] = nxt
                cur = nxt
    return doc


def _path_delete(doc: Any, path: str) -> None:
    parts = _path_parts(path)
    if not parts or not isinstance(doc, (dict, list)):
        return
    cur = doc
    for part in parts[:-1]:
        if isinstance(cur, dict):
            cur = cur.get(part)
        elif isinstance(cur, list):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return
        else:
            return
    last = parts[-1]
    if isinstance(cur, dict):
        cur.pop(last, None)
    elif isinstance(cur, list):
        try:
            cur.pop(int(last))
        except (ValueError, IndexError):
            pass


def _path_append(doc: Any, path: str, value: Any) -> Any:
    """gabs ArrayAppendP(): missing → [v]; non-array → [old, v]."""
    found, cur = _path_get(doc, path)
    if not found:
        return _path_set(doc, path, [value])
    if isinstance(cur, list):
        cur.append(value)
        return doc
    return _path_set(doc, path, [cur, value])


def _flatten_for_awk(path: str, data: Any) -> dict[str, str]:
    """processor.go flattenForAWK: arrays flatten WITHOUT an index (later
    elements overwrite), scalars render with Go %v."""
    m: dict[str, str] = {}
    if isinstance(data, dict):
        for k, v in data.items():
            new_path = f"{path}.{k}" if path else k
            m.update(_flatten_for_awk(new_path, v))
    elif isinstance(data, list):
        for ele in data:
            m.update(_flatten_for_awk(path, ele))
    else:
        if isinstance(data, bool):
            m[path] = "true" if data else "false"
        elif isinstance(data, float):
            m[path] = str(int(data)) if data == int(data) and abs(data) < 1e15 else repr(data)
        elif data is None:
            m[path] = "<nil>"
        else:
            m[path] = str(data)
    return m


# ------------------------------------------------------------ processor


def run_awk_message(
    program,
    codec: str,
    content: str,
    meta: dict[str, str],
    logs: list[tuple[str, str]] | None = None,
) -> tuple[str, dict[str, str]]:
    """Process one message; returns (new content, new metadata). Raises
    AwkError on program failure (caller maps to the _error slot)."""
    meta = dict(meta)
    doc_holder: dict[str, Any] = {}
    mutated = [False]

    def get_doc(for_write: bool):
        if "doc" not in doc_holder:
            try:
                doc_holder["doc"] = json.loads(content, parse_int=float)
            except (ValueError, TypeError):
                raise AwkError("failed to parse message into json")
        if for_write:
            mutated[0] = True
        return doc_holder["doc"]

    def json_get(path):
        found, v = _path_get(get_doc(False), path)
        if not found or v is None:
            return "null"
        if isinstance(v, str):
            return v
        return _marshal(v)

    def json_set(path, v):
        doc_holder["doc"] = _path_set(get_doc(True), path, v)
        return 0

    def json_append(path, v):
        doc_holder["doc"] = _path_append(get_doc(True), path, v)
        return 0

    def json_type(path):
        found, v = _path_get(get_doc(False), path)
        if not found:
            return "undefined"
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            return "array"
        return "object"

    def json_length(path):
        _, v = _path_get(get_doc(False), path)
        if isinstance(v, (str, list)):
            return len(v)
        return 0

    def _b64decode(s):
        try:
            return base64.b64decode(s, validate=True).decode("utf-8", "replace")
        except (binascii.Error, ValueError) as e:
            raise AwkError(f"base64_decode: {e}")

    def create_json_object(*vals):
        svals = [v if isinstance(v, str) else _num_s(v) for v in vals]
        pairs = {svals[i]: svals[i + 1] for i in range(0, len(svals) - 1, 2)}
        return _marshal(pairs)

    def create_json_array(*vals):
        return _marshal([v if isinstance(v, str) else _num_s(v) for v in vals])

    def _num_s(v):
        if isinstance(v, float) and v == int(v):
            return str(int(v))
        return str(v)

    funcs = {
        "metadata_get": lambda k: meta.get(k, ""),
        "metadata_set": lambda k, v: meta.__setitem__(k, v if isinstance(v, str) else _num_s(v)),
        "json_get": json_get,
        "json_set": lambda p, v: json_set(p, v if isinstance(v, str) else _num_s(v)),
        "json_set_int": lambda p, v: json_set(p, int(float(v))),
        "json_set_float": lambda p, v: json_set(p, float(v)),
        "json_set_bool": lambda p, v: json_set(p, bool(float(v)) if not isinstance(v, str) else v != ""),
        "json_append": lambda p, v: json_append(p, v if isinstance(v, str) else _num_s(v)),
        "json_append_int": lambda p, v: json_append(p, int(float(v))),
        "json_append_float": lambda p, v: json_append(p, float(v)),
        "json_append_bool": lambda p, v: json_append(p, bool(float(v)) if not isinstance(v, str) else v != ""),
        "json_delete": lambda p: (_path_delete(get_doc(True), p), 0)[1],
        "json_length": json_length,
        "json_type": json_type,
        "create_json_object": create_json_object,
        "create_json_array": create_json_array,
        "timestamp_unix": lambda d="", f="": float(int(_go_parse_time(str(d), str(f)).timestamp())),
        "timestamp_unix_nano": lambda d="", f="": float(int(_go_parse_time(str(d), str(f)).timestamp() * 1e9)),
        "timestamp_format": lambda u, f="": _go_format_time(
            _dt.datetime.fromtimestamp(_awk_int(u), _dt.timezone.utc), str(f)
        ),
        "timestamp_format_nano": lambda u, f="": _format_unix_nano(_awk_int(u), str(f)),
        "base64_encode": lambda s: base64.b64encode(str(s).encode()).decode(),
        "base64_decode": _b64decode,
        "print_log": lambda msg, level="": (logs or []).append((str(level) or "INFO", str(msg))),
    }

    variables: dict[str, str] = {}
    if codec == "json":
        try:
            parsed = json.loads(content, parse_int=float)
        except (ValueError, TypeError) as e:
            raise AwkError(f"failed to parse part into json: {e}")
        for k, v in _flatten_for_awk("", parsed).items():
            variables[_INVALID_VAR.sub("_", k)] = v
        stdin = " "
    elif codec == "text":
        stdin = content
    else:
        stdin = " "
    if codec != "none":
        for k, v in meta.items():
            variables[_INVALID_VAR.sub("_", k)] = v

    stdout, status = program.run(stdin, vars=variables, funcs=funcs)
    if status != 0:
        raise AwkError(
            f"awk interpreter returned non-zero exit code: {status}"
        )
    if stdout:
        if stdout.endswith("\n"):
            stdout = stdout[:-1]
        return stdout, meta
    if mutated[0] and "doc" in doc_holder:
        return _marshal(doc_holder["doc"]), meta
    return content, meta


@dataclass
class AwkProcessor(Processor):
    """`awk` processor (internal/impl/awk/processor.go:26): run an AWK
    program per message. ``col`` is the content column; metadata rides
    the ``_meta`` map; failures set ``_error`` and keep the content."""

    program: str
    codec: str = "text"
    col: str = "content"
    logs: list = field(default_factory=list)

    def __post_init__(self):
        if self.codec not in ("none", "text", "json"):
            raise AwkError(f"unrecognised codec: {self.codec}")
        # compile once at construction — config-lint parity with the
        # reference (a bad program fails pipeline compile, reader.go)
        self._compiled_check = compile_program(self.program)

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_meta_col(ensure_error_col(df))
        prog_src, codec, col = self.program, self.codec, self.col
        cols = list(df.columns)
        schema = df.schema

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            prog = compile_program(prog_src)
            for pdf in batches:
                out_content = []
                out_meta = []
                out_err = []
                for i in range(len(pdf)):
                    content = pdf[col].iat[i]
                    content = "" if content is None else str(content)
                    meta_raw = pdf[META_COL].iat[i]
                    meta = dict(meta_raw) if meta_raw is not None else {}
                    err = pdf[ERROR_COL].iat[i]
                    try:
                        new_content, new_meta = run_awk_message(prog, codec, content, meta)
                        out_content.append(new_content)
                        out_meta.append(new_meta)
                        out_err.append(err)
                    except AwkError as e:
                        out_content.append(content)
                        out_meta.append(meta)
                        out_err.append(str(e))
                res = pdf.copy()
                res[col] = out_content
                res[META_COL] = out_meta
                res[ERROR_COL] = out_err
                yield res[cols]

        return df.mapInPandas(fn, schema=schema)
