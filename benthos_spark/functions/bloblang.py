"""The Bloblang expression layer as PySpark Column helpers.

Bloblang (/root/reference/internal/bloblang/) is the reference's
per-message expression language: functions + methods evaluated by an AST
interpreter per message (internal/bloblang/mapping/executor.go:64-147).
Here every function/method is a thin, named wrapper over a JVM-side
Catalyst expression so whole-stage codegen executes the mapping — no
interpreter, no Python in the hot path.

Each helper cites its reference analogue (file:line into /root/reference)
so coverage can be checked against SURVEY.md §2.5. Helpers take/return
``pyspark.sql.Column`` (strings are parsed with ``F.expr``).

Also implements **field interpolation** ``${! expr }``
(internal/bloblang/field/expression.go:19-60): :func:`interpolate` turns
an interpolated config string into one ``concat`` Column.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(e) -> Column:
    return F.expr(e) if isinstance(e, str) else e


# ---------------------------------------------------------------------------
# functions (internal/bloblang/query/functions.go)
# ---------------------------------------------------------------------------


def now() -> Column:
    """functions.go:755 ``now()``."""
    return F.current_timestamp()


def timestamp_unix() -> Column:
    """functions.go:773 ``timestamp_unix()``."""
    return F.unix_timestamp(F.current_timestamp())


def uuid_v4() -> Column:
    """functions.go:857 ``uuid_v4()`` — non-deterministic, test-only."""
    return F.expr("uuid()")


def random_int(max_val: int = 1 << 31) -> Column:
    """functions.go:675 ``random_int()``."""
    return (F.rand() * max_val).cast("long")


def counter() -> Column:
    """pure/bloblang_general.go:16 ``counter()`` — per-partition monotone
    ids (global dense numbering would serialize; the reference's counter
    is process-global which a distributed engine cannot share)."""
    return F.monotonically_increasing_id()


def throw(msg) -> Column:
    """functions.go:827 ``throw()``."""
    return F.raise_error(_c(msg))


def range_(start, stop, step=1) -> Column:
    """functions.go:371 ``range()``."""
    return F.sequence(F.lit(start), F.lit(stop - 1) if isinstance(stop, int) else _c(stop), F.lit(step))


def json_path(col, path: str) -> Column:
    """functions.go:421 ``json("a.b")`` / jsonpath/bloblang_jsonpath.go:19."""
    return F.get_json_object(_c(col), path if path.startswith("$") else f"$.{path}")


# ---------------------------------------------------------------------------
# string methods (internal/bloblang/query/methods_strings.go)
# ---------------------------------------------------------------------------


def capitalize(col) -> Column:
    """methods_strings.go:60 ``capitalize()``."""
    return F.initcap(_c(col))


def uppercase(col) -> Column:
    """methods_strings.go:905."""
    return F.upper(_c(col))


def lowercase(col) -> Column:
    """methods_strings.go:933."""
    return F.lower(_c(col))


def trim(col, cutset: str | None = None) -> Column:
    """methods_strings.go:1926."""
    return F.trim(_c(col)) if cutset is None else F.btrim(_c(col), F.lit(cutset))


def trim_prefix(col, prefix: str) -> Column:
    """methods_strings.go:1962."""
    c = _c(col)
    return F.when(c.startswith(prefix), F.substring(c, len(prefix) + 1, 1 << 30)).otherwise(c)


def trim_suffix(col, suffix: str) -> Column:
    """methods_strings.go:1994."""
    c = _c(col)
    return F.when(c.endswith(suffix), F.substring(c, 1, F.length(c) - len(suffix))).otherwise(c)


def has_prefix(col, prefix) -> Column:
    """methods_strings.go:650."""
    return _c(col).startswith(prefix)


def has_suffix(col, suffix) -> Column:
    """methods_strings.go:683."""
    return _c(col).endswith(suffix)


def index_of(col, sub) -> Column:
    """methods_strings.go:475 — 0-based like the reference (instr is 1-based;
    -1 = absent on both)."""
    return (F.instr(_c(col), sub) - 1).cast("int")


def encode_b64(col) -> Column:
    """methods_strings.go:87 ``encode("base64")``."""
    return F.base64(_c(col).cast("binary"))


def decode_b64(col) -> Column:
    """methods_strings.go:193 ``decode("base64")``."""
    return F.unbase64(_c(col))


def encode_hex(col) -> Column:
    """methods_strings.go:87 ``encode("hex")`` (lowercase, like Go)."""
    return F.lower(F.hex(_c(col).cast("binary")))


def decode_hex(col) -> Column:
    """methods_strings.go:193 ``decode("hex")``."""
    return F.unhex(_c(col))


def hash_(col, algorithm: str = "sha256") -> Column:
    """methods_strings.go:716 ``hash("sha256"|"md5"|"xxhash64"|...)``."""
    c = _c(col)
    if algorithm == "md5":
        return F.md5(c)
    if algorithm == "sha1":
        return F.sha1(c)
    if algorithm in ("sha256", "sha512"):
        return F.sha2(c, int(algorithm[3:]))
    if algorithm == "xxhash64":
        return F.xxhash64(c)
    if algorithm == "crc32":
        return F.crc32(c.cast("binary"))
    raise ValueError(f"unsupported hash {algorithm}")


def join(col, sep: str = "") -> Column:
    """methods_strings.go:856 ``join()`` over an array column."""
    return F.array_join(_c(col), sep)


def split(col, sep: str) -> Column:
    """methods_strings.go:1811 — literal separator (Bloblang splits on a
    literal; Spark's split takes a regex, so we escape)."""
    return F.split(_c(col), re.escape(sep))


def replace_all(col, old: str, new: str) -> Column:
    """methods_strings.go:1383 — literal replacement."""
    return F.replace(_c(col), F.lit(old), F.lit(new))


def re_replace_all(col, pattern: str, replacement: str) -> Column:
    """methods_strings.go:1764."""
    return F.regexp_replace(_c(col), pattern, replacement)


def re_match(col, pattern: str) -> Column:
    """methods_strings.go:1717 ``re_match`` — unanchored like Go's
    ``MatchString`` (rlike is unanchored too)."""
    return _c(col).rlike(pattern)


def re_find_all(col, pattern: str) -> Column:
    """methods_strings.go:1493."""
    return F.regexp_extract_all(_c(col), F.lit(pattern), 0)


def format_(fmt: str, *cols) -> Column:
    """methods_strings.go:629 ``format()`` (printf-style)."""
    return F.format_string(fmt, *[_c(c) for c in cols])


def quote(col) -> Column:
    """methods_strings.go:1334 — JSON-style double-quoting (escapes
    embedded quotes/backslashes/control chars like Go strconv.Quote,
    returning the value WITH surrounding double quotes). to_json of a
    1-element array yields ``["<escaped>"]``; strip the brackets."""
    j = F.to_json(F.array(_c(col)))
    return F.substring(j, F.lit(2), F.length(j) - F.lit(2))


def reverse(col) -> Column:
    """methods_strings.go:1293."""
    return F.reverse(_c(col))


def length(col) -> Column:
    """methods_structured.go:869 ``length()`` — chars for strings."""
    return F.length(_c(col))


def slice_(col, start: int, stop: int) -> Column:
    """methods_structured.go:1393 ``slice()`` on strings (0-based
    [start, stop))."""
    return F.substring(_c(col), start + 1, stop - start)


def strip_html(col) -> Column:
    """methods_strings.go:1879 — tag-removal approximation."""
    return F.regexp_replace(_c(col), r"<[^>]*>", "")


def escape_url_query(col) -> Column:
    """methods_strings.go:532."""
    return F.url_encode(_c(col))


def unescape_url_query(col) -> Column:
    """methods_strings.go:553."""
    return F.url_decode(_c(col))


def parse_json(col, schema: str) -> Column:
    """methods_strings.go:1075 — schema-on-read (the reference is dynamic;
    Spark wants the shape declared)."""
    return F.from_json(_c(col), schema)


def format_json(col) -> Column:
    """methods_strings.go:1179."""
    return F.to_json(_c(col))


def parse_csv(col, schema: str) -> Column:
    """methods_strings.go:961."""
    return F.from_csv(_c(col), F.lit(schema))


def parse_url(col, part: str = "HOST") -> Column:
    """methods_strings.go:1243."""
    return F.parse_url(_c(col), F.lit(part))


def parse_xml(col, schema: str) -> Column:
    """xml/bloblang.go:14 ``parse_xml`` — schema-on-read like parse_json."""
    return F.from_xml(_c(col), F.lit(schema))


def format_xml(col) -> Column:
    """xml/bloblang.go:61 ``format_xml`` over a struct column."""
    return F.to_xml(_c(col))


# ---------------------------------------------------------------------------
# number methods (methods_numbers.go; pure/bloblang_numbers.go)
# ---------------------------------------------------------------------------


def floor(col) -> Column:
    """methods_numbers.go:39."""
    return F.floor(_c(col))


def ceil(col) -> Column:
    """methods_numbers.go (ceil)."""
    return F.ceil(_c(col))


def round_(col, scale: int = 0) -> Column:
    """methods_numbers.go:206."""
    return F.round(_c(col), scale)


def abs_(col) -> Column:
    """pure/bloblang_numbers.go:145."""
    return F.abs(_c(col))


def max_(*cols) -> Column:
    """methods_numbers.go:120 (pairwise max → greatest)."""
    return F.greatest(*[_c(c) for c in cols])


def min_(*cols) -> Column:
    """methods_numbers.go:163."""
    return F.least(*[_c(c) for c in cols])


def number(col) -> Column:
    """methods.go:405 ``number()`` — lenient cast, null on failure."""
    return _c(col).try_cast("double")


# ---------------------------------------------------------------------------
# timestamp methods (internal/impl/pure/bloblang_time.go)
# ---------------------------------------------------------------------------


def ts_round(col, unit: str) -> Column:
    """bloblang_time.go:50 ``ts_round`` — truncate to hour/day/..."""
    return F.date_trunc(unit, _c(col))


def ts_tz(col, tz: str) -> Column:
    """bloblang_time.go:82."""
    return F.from_utc_timestamp(_c(col), tz)


def ts_parse(col, fmt: str) -> Column:
    """bloblang_time.go:252 ``ts_parse`` (Java pattern, not Go layout)."""
    return F.to_timestamp(_c(col), fmt)


def ts_format(col, fmt: str) -> Column:
    """bloblang_time.go:388."""
    return F.date_format(_c(col), fmt)


def ts_unix(col) -> Column:
    """bloblang_time.go:492."""
    return F.unix_timestamp(_c(col))


def ts_unix_milli(col) -> Column:
    """bloblang_time.go:518."""
    return F.unix_millis(_c(col))


def ts_sub(a, b) -> Column:
    """bloblang_time.go:617 — difference in seconds."""
    return F.unix_timestamp(_c(a)) - F.unix_timestamp(_c(b))


def ts_add_seconds(col, seconds) -> Column:
    """bloblang_time.go:116 ``ts_add_iso8601`` (seconds form)."""
    return F.timestamp_add("SECOND", F.lit(seconds) if isinstance(seconds, int) else _c(seconds), _c(col))


# ---------------------------------------------------------------------------
# array / object methods (methods_structured.go; pure/bloblang_objects.go)
# ---------------------------------------------------------------------------


def all_(col, pred: Callable[[Column], Column]) -> Column:
    """methods_structured.go:17."""
    return F.forall(_c(col), pred)


def any_(col, pred: Callable[[Column], Column]) -> Column:
    """methods_structured.go:63."""
    return F.exists(_c(col), pred)


def append(col, *values) -> Column:
    """methods_structured.go:114."""
    return F.concat(_c(col), F.array(*[F.lit(v) for v in values]))


def contains(col, value) -> Column:
    """methods_structured.go:178."""
    return F.array_contains(_c(col), value)


def filter_(col, pred: Callable[[Column], Column]) -> Column:
    """methods_structured.go:366."""
    return F.filter(_c(col), pred)


def map_each(col, fn: Callable[[Column], Column]) -> Column:
    """methods_structured.go:911."""
    return F.transform(_c(col), fn)


def map_each_key(col, fn: Callable[[Column], Column]) -> Column:
    """methods_structured.go:993 (map columns)."""
    return F.transform_keys(_c(col), lambda k, v: fn(k))


def fold(col, zero, fn: Callable[[Column, Column], Column]) -> Column:
    """methods_structured.go:639."""
    return F.aggregate(_c(col), F.lit(zero), fn)


def sum_(col) -> Column:
    """methods_structured.go:1499 — left-fold sum (deterministic order)."""
    return F.aggregate(_c(col), F.lit(0.0), lambda acc, v: acc + v.cast("double"))


def flatten(col) -> Column:
    """methods_structured.go:605."""
    return F.flatten(_c(col))


def index(col, i: int) -> Column:
    """methods_structured.go:696 — negative indices from the end, like
    the reference."""
    return F.element_at(_c(col), i + 1 if i >= 0 else i)


def keys(col) -> Column:
    """methods_structured.go:808."""
    return F.map_keys(_c(col))


def values(col) -> Column:
    """methods_structured.go:1646."""
    return F.map_values(_c(col))


def key_values(col) -> Column:
    """methods_structured.go:837."""
    return F.map_entries(_c(col))


def merge(a, b) -> Column:
    """methods_structured.go:1046 (map merge; right wins like assign)."""
    return F.map_concat(_c(a), _c(b))


def sort(col) -> Column:
    """methods_structured.go:1202."""
    return F.array_sort(_c(col))


def sort_by(col, key_fn: Callable[[Column], Column]) -> Column:
    """methods_structured.go:1308 — comparator form of array_sort."""
    return F.array_sort(
        _c(col),
        lambda a, b: F.when(key_fn(a) < key_fn(b), -1).when(key_fn(a) > key_fn(b), 1).otherwise(0),
    )


def unique(col) -> Column:
    """methods_structured.go:1544."""
    return F.array_distinct(_c(col))


def enumerated(col) -> Column:
    """methods_structured.go:244 — array of (index, value) structs."""
    c = _c(col)
    return F.transform(c, lambda v, i: F.struct(i.alias("index"), v.alias("value")))


def zip_(a, b) -> Column:
    """pure/bloblang_objects.go:101."""
    return F.arrays_zip(_c(a), _c(b))


def concat_arrays(*cols) -> Column:
    """pure/bloblang_objects.go:66."""
    return F.concat(*[_c(c) for c in cols])


def without(col, *fields: str) -> Column:
    """methods_structured.go:1674 — struct minus fields."""
    return _c(col).dropFields(*fields)


def with_only(col, *fields: str) -> Column:
    """pure/bloblang_objects.go:37 ``with()``."""
    c = _c(col)
    return F.struct(*[c.getField(f).alias(f) for f in fields])


def get(col, path: str) -> Column:
    """methods.go:229 — dotted path into a struct."""
    c = _c(col)
    for part in path.split("."):
        c = c.getField(part)
    return c


def or_(col, default) -> Column:
    """methods.go:445 ``or()`` / catch-with-default."""
    return F.coalesce(_c(col), F.lit(default) if not isinstance(default, Column) else default)


def type_of(col) -> Column:
    """methods.go:469 ``type()`` — returns the BLOBLANG type name
    (string/bytes/number/bool/array/object/timestamp/null), not Spark's
    typeof() SQL name."""
    c = _c(col)
    t = F.typeof(c)
    mapped = (
        F.when(c.isNull(), F.lit("null"))
        .when(t.isin("tinyint", "smallint", "int", "bigint", "float", "double") | t.startswith("decimal"), "number")
        .when(t == "string", "string")
        .when(t == "boolean", "bool")
        .when(t == "binary", "bytes")
        .when(t.startswith("timestamp") | (t == "date"), "timestamp")
        .when(t.startswith("array"), "array")
        .when(t.startswith("struct") | t.startswith("map"), "object")
        .otherwise(t)
    )
    return mapped


def encrypt_aes(col, key, mode: str = "CBC") -> Column:
    """methods_strings.go:279 ``encrypt_aes`` — JVM-side ``aes_encrypt``
    (the IV is generated and embedded in the ciphertext, so decrypt needs
    only the key — the reference carries the IV alongside instead)."""
    return F.aes_encrypt(_c(col), _c(key), F.lit(mode), F.lit("PKCS"))


def decrypt_aes(col, key, mode: str = "CBC") -> Column:
    """methods_strings.go:367 ``decrypt_aes``."""
    return F.aes_decrypt(_c(col), _c(key), F.lit(mode), F.lit("PKCS"))


_HTML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&#34;"), ("'", "&#39;")]


def escape_html(col) -> Column:
    """methods_strings.go:454 (Go html.EscapeString table)."""
    c = _c(col)
    for raw, esc in _HTML_ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def unescape_html(col) -> Column:
    """methods_strings.go:511."""
    c = _c(col)
    for raw, esc in reversed(_HTML_ESCAPES):
        c = F.replace(c, F.lit(esc), F.lit(raw))
    return c


def filepath_join(*cols) -> Column:
    """methods_strings.go:574 — join path segments with '/'."""
    return F.concat_ws("/", *[_c(c) for c in cols])


def filepath_split(col) -> Column:
    """methods_strings.go:605 — (dir, file) pair as a struct."""
    c = _c(col)
    ix = F.length(c) - F.length(F.substring_index(c, "/", -1)) - 1
    return F.struct(
        F.when(ix > 0, F.substring(c, 1, ix)).otherwise(F.lit("")).alias("dir"),
        F.substring_index(c, "/", -1).alias("file"),
    )


def snowflake_id(machine_id: int = 0) -> Column:
    """lang/bloblang.go:101 ``snowflake_id`` — 41-bit millis since epoch
    | 10-bit machine | 12-bit sequence (sequence from the per-partition
    monotonic counter; uniqueness holds per partition like the
    reference's per-process generator)."""
    millis = F.unix_millis(F.current_timestamp())
    seq = F.monotonically_increasing_id().bitwiseAND(F.lit(0xFFF))
    return (
        F.shiftleft(millis, 22)
        + F.lit((machine_id & 0x3FF) << 12)
        + seq
    )


_CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def ulid() -> Column:
    """pure extended ``ulid()`` (internal/impl/pure/extended) — 48-bit
    timestamp + 80 random bits in Crockford base32. Built from JVM-side
    primitives (no UDF): time prefix sorts, randomness from rand()."""
    millis = F.unix_millis(F.current_timestamp())
    # 10 time chars: millis in base32, left-padded
    time_part = F.lpad(F.conv(millis.cast("string"), 10, 32), 10, "0")
    rand_parts = [
        F.substring(F.conv((F.rand() * (1 << 30)).cast("long").cast("string"), 10, 32), 1, 4)
        for _ in range(4)
    ]
    raw = F.upper(F.concat(time_part, F.lpad(F.concat(*rand_parts), 16, "0")))
    # conv() uses 0-9A-V digits; translate into the Crockford alphabet
    return F.translate(raw, "0123456789ABCDEFGHIJKLMNOPQRSTUV", _CROCKFORD)


def nanoid(size: int = 21) -> Column:
    """functions.go:874 ``nanoid()`` — url-safe random id, built from
    uuid entropy (JVM-side, no UDF)."""
    ent = F.concat(F.regexp_replace(F.expr("uuid()"), "-", ""), F.regexp_replace(F.expr("uuid()"), "-", ""))
    return F.substring(ent, 1, size)


def ksuid() -> Column:
    """functions.go:912 ``ksuid()`` — 32-bit seconds since the KSUID
    epoch (2014-05-13) + 128 random bits, base62-ish rendering."""
    secs = F.unix_timestamp(F.current_timestamp()) - F.lit(1400000000)
    ent = F.regexp_replace(F.expr("uuid()"), "-", "")
    return F.concat(F.lpad(F.conv(secs.cast("string"), 10, 36), 6, "0"), F.substring(ent, 1, 21))


def not_empty(col) -> Column:
    """methods_structured.go:1150 — null out empty strings/arrays so
    downstream `or()`/`catch` defaults fire."""
    c = _c(col)
    return F.when(F.length(F.concat_ws("", F.array(c.cast("string")))) > 0, c)


def catch_(col, fallback) -> Column:
    """methods.go:119 ``catch()`` — the expression-level error recovery:
    null (the Column-world failure value, e.g. from try_cast/try_divide)
    falls back."""
    return F.coalesce(_c(col), fallback if isinstance(fallback, Column) else F.lit(fallback))


def parse_form_url_encoded(col) -> Column:
    """pure/bloblang_string.go:14 — query string → map with url-decoded
    values (str_to_map + transform_values, all JVM-side)."""
    m = F.str_to_map(_c(col), F.lit("&"), F.lit("="))
    return F.transform_values(m, lambda k, v: F.url_decode(v))


def squash(cols: list[Column]) -> Column:
    """pure/bloblang_objects.go:13 ``squash()`` — merge an array of maps,
    later keys win."""
    out = None
    for c in cols:
        out = c if out is None else F.map_concat(F.map_filter(out, lambda k, v: ~F.map_contains_key(c, k)), c)
    return out


def collapse(df, col: str, sep: str = ".") -> Column:
    """methods_structured.go:143 ``collapse()`` — flatten a struct column
    to a {dot.path: value} map. Schema-driven (leaf paths come from the
    DataFrame schema), values stringified like the reference's dynamic
    model."""
    from pyspark.sql import types as T

    def leaves(dt, prefix):
        if isinstance(dt, T.StructType):
            out = []
            for f in dt.fields:
                out += leaves(f.dataType, prefix + [f.name])
            return out
        return [prefix]

    schema = df.schema[col].dataType
    pairs = []
    for path in leaves(schema, []):
        c = F.col(col)
        for part in path:
            c = c.getField(part)
        pairs += [F.lit(sep.join(path)), c.cast("string")]
    return F.create_map(*pairs)


# ---------------------------------------------------------------------------
# field interpolation `${! expr }` (internal/bloblang/field/expression.go)
# ---------------------------------------------------------------------------

_INTERP_RE = re.compile(r"\$\{!\s*(.*?)\s*\}")


def interpolate(template: str) -> Column:
    """Compile an interpolated config string into ONE concat Column:
    ``interpolate("c-${! this.codec.uppercase() }.wav")`` ≙ the
    reference's field expressions (field/expression.go:19-60,
    parser/field_parser.go) used in every config string. Static
    segments stay literals; dynamic segments are REAL Bloblang queries
    compiled to Columns (bloblang/columns.py); segments that don't
    parse as Bloblang fall back to Spark-SQL ``F.expr`` so existing
    configs keep working. Either way the result is JVM-side."""
    parts: list[Column] = []
    pos = 0
    for m in _INTERP_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(_interp_expr(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def _interp_expr(src: str) -> Column:
    try:
        from benthos_spark.bloblang.columns import UnsupportedBloblang, _Env, _compile
        from benthos_spark.bloblang.parser import BloblangParseError, parse_query

        node = parse_query(src)
        return _compile(node, _Env(schema=None))
    except Exception:
        return F.expr(src)




_STRFTIME_JAVA = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d", "H": "HH",
    "I": "hh", "M": "mm", "S": "ss", "f": "SSSSSS", "p": "a", "j": "DDD",
    "a": "EEE", "A": "EEEE", "b": "MMM", "B": "MMMM", "Z": "zzz", "z": "xx",
}


def strftime_to_java(fmt: str) -> str:
    """C strftime → Java DateTimeFormatter pattern (the subset the
    ts_strftime/ts_strptime doc examples use). Raises ValueError on
    unknown % codes so the Column tier can fall back."""
    out = []
    lit = []

    def flush():
        if lit:
            text = "".join(lit)
            if any(ch.isalpha() or ch == "'" for ch in text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            lit.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise ValueError("dangling %")
            code = fmt[i + 1]
            i += 2
            if code == "%":
                lit.append("%")
                continue
            if code not in _STRFTIME_JAVA:
                raise ValueError(f"strftime code %{code} not mapped")
            flush()
            out.append(_STRFTIME_JAVA[code])
        else:
            lit.append(ch)
            i += 1
    flush()
    return "".join(out)


def ts_strftime(col, fmt: str) -> Column:
    """methods (impl/pure/bloblang_time.go ts_strftime) — C-format output."""
    return F.date_format(_c(col), strftime_to_java(fmt))


def ts_strptime(col, fmt: str) -> Column:
    """ts_strptime — C-format parse to a (UTC-session) timestamp."""
    return F.to_timestamp(_c(col), strftime_to_java(fmt))


def filepath_split_pair(col) -> Column:
    """methods_strings.go filepath_split — [dir-with-trailing-slash,
    file] two-element array (Go filepath.Split semantics)."""
    c = _c(col)
    file = F.when(c.contains("/"), F.substring_index(c, "/", -1)).otherwise(c)
    dirp = c.substr(F.lit(1), F.length(c) - F.length(file))
    return F.array(dirp, file)


def parse_duration(col) -> Column:
    """Go time.ParseDuration → nanoseconds (bloblang_time.go
    parse_duration): regexp-extract the (number)(unit) pairs, fold a sum
    — all Catalyst higher-order expressions, no UDF. Invalid inputs
    yield NULL (the interpreter raises; the Column tier is a typed
    projection where null is the error channel)."""
    c = F.trim(_c(col).cast("string"))
    sign = F.when(c.startswith("-"), -1.0).otherwise(1.0)
    body = F.regexp_replace(c, r"^[+-]", "")
    pat = r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)"
    nums = F.regexp_extract_all(body, F.lit(pat), 1)
    units = F.regexp_extract_all(body, F.lit(pat), 2)
    mult = F.create_map(
        F.lit("ns"), F.lit(1.0), F.lit("us"), F.lit(1e3), F.lit("µs"), F.lit(1e3),
        F.lit("ms"), F.lit(1e6), F.lit("s"), F.lit(1e9),
        F.lit("m"), F.lit(60e9), F.lit("h"), F.lit(3600e9),
    )
    total = F.aggregate(
        F.zip_with(nums, units, lambda n, u: n.cast("double") * mult[u]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # validity: the concatenated matches must reproduce the whole body
    rebuilt = F.array_join(F.zip_with(nums, units, lambda n, u: F.concat(n, u)), "")
    ok = (F.size(nums) > 0) & (rebuilt == body)
    return F.when(ok, (sign * total).cast("long"))


def parse_duration_iso8601(col) -> Column:
    """ISO-8601 duration → nanoseconds (Gregorian year, month = year/12 —
    the reference's fixed-unit interpretation). NULL on invalid."""
    c = F.trim(_c(col).cast("string"))
    pat = (r"^P(?:(\d+(?:\.\d+)?)Y)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)W)?"
           r"(?:(\d+(?:\.\d+)?)D)?(?:T(?:(\d+(?:\.\d+)?)H)?(?:(\d+(?:\.\d+)?)M)?"
           r"(?:(\d+(?:\.\d+)?)S)?)?$")

    def grp(i):
        g = F.regexp_extract(c, pat, i)
        return F.when(g == "", 0.0).otherwise(g.cast("double"))

    year_s = 365.2425 * 86400.0
    total_s = (
        grp(1) * year_s + grp(2) * (year_s / 12.0) + grp(3) * (7 * 86400.0)
        + grp(4) * 86400.0 + grp(5) * 3600.0 + grp(6) * 60.0 + grp(7)
    )
    any_part = sum((F.regexp_extract(c, pat, i) != "").cast("int") for i in range(1, 8))
    ok = c.rlike(pat) & (any_part > 0)
    return F.when(ok, (total_s * 1e9).cast("long"))
