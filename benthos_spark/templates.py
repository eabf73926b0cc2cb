"""Config templates — YAML-defined reusable components rendered by a
Bloblang mapping over the user's field values.

Mirrors the reference's template system (internal/template/config.go:
37-49 `Config{Name, Type, Fields, Mapping, Tests}`; template.go:58
`ExpandToNode` runs the mapping with the parsed field values as the
input document and the produced value IS the expanded component
config). The Bloblang engine is our own interpreter
(bloblang/interp.py), including the gabs ``-`` array-append assignment
segment templates rely on to build processor lists.

Semantics implemented:
 - `fields:` declare the template's surface: a field without a
   `default` is REQUIRED; `type` is validated loosely (string/int/
   float/bool/unknown; `kind: list/map/scalar` checks the shape);
 - `mapping:` runs with `this` = the field values (defaults applied);
   the result must be an object — the expanded component config;
 - expansion happens at config-compile time inside the component
   dispatchers (config.py), so a template name is used exactly like a
   built-in component and can itself expand to other templates
   (cycle-guarded);
 - `tests:` are the reference's embedded expansion tests (config →
   expected expanded YAML) — `python -m benthos_spark template lint`
   runs them, and `load_template_files` surfaces failures as lints.

`metrics_mapping` is accepted and ignored: metric names are engine-
specific (streaming/metrics.py documents ours), so renames written for
the reference's registry have nothing to attach to here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml

__all__ = [
    "Template",
    "TemplateError",
    "parse_template",
    "register_template",
    "clear_templates",
    "load_template_files",
    "lookup",
    "expand",
    "run_template_tests",
]


class TemplateError(ValueError):
    pass


_TYPES = ("input", "processor", "output", "cache", "rate_limit")


@dataclass
class Template:
    name: str
    type: str
    fields: list[dict] = field(default_factory=list)
    mapping: str = ""
    tests: list[dict] = field(default_factory=list)


_REGISTRY: dict[tuple[str, str], Template] = {}


def parse_template(src: str | dict) -> Template:
    doc = yaml.safe_load(src) if isinstance(src, str) else src
    if not isinstance(doc, dict):
        raise TemplateError("template file must be a YAML object")
    name = doc.get("name")
    ttype = doc.get("type")
    if not name or not isinstance(name, str):
        raise TemplateError("template needs a `name`")
    if ttype not in _TYPES:
        raise TemplateError(f"template `type` must be one of {_TYPES}, got {ttype!r}")
    mapping = doc.get("mapping")
    if not mapping or not isinstance(mapping, str):
        raise TemplateError("template needs a `mapping` (Bloblang source)")
    fields_conf = doc.get("fields") or []
    for f in fields_conf:
        if not isinstance(f, dict) or "name" not in f:
            raise TemplateError("each template field needs a `name`")
        kind = f.get("kind")
        if kind not in (None, "scalar", "list", "map"):
            raise TemplateError(f"unrecognised field kind: {kind}")
    # compile the mapping now: a bad template fails at registration,
    # not first use (reference lints at InitTemplates)
    from benthos_spark.bloblang.interp import Executor

    try:
        Executor(mapping)
    except Exception as e:  # parse + compile errors both lint here
        raise TemplateError(f"template mapping failed to compile: {e}")
    return Template(
        name=name,
        type=ttype,
        fields=list(fields_conf),
        mapping=mapping,
        tests=list(doc.get("tests") or []),
    )


def register_template(t: Template) -> None:
    _REGISTRY[(t.type, t.name)] = t


def clear_templates() -> None:
    _REGISTRY.clear()


def lookup(ttype: str, name: str) -> Template | None:
    return _REGISTRY.get((ttype, name))


def load_template_files(paths: list[str]) -> list[str]:
    """Parse + register template files; returns lints (embedded test
    failures). Parse errors raise (reference InitTemplates contract)."""
    lints: list[str] = []
    for path in paths:
        with open(path) as f:
            t = parse_template(f.read())
        for failure in run_template_tests(t):
            lints.append(f"template file {path}: {failure}")
        register_template(t)
    return lints


def _check_kind(name: str, value: Any, kind: str | None, ftype: str | None) -> None:
    if kind == "list" and not isinstance(value, list):
        raise TemplateError(f"field {name!r} must be a list")
    if kind == "map" and not isinstance(value, dict):
        raise TemplateError(f"field {name!r} must be a map")
    if kind in (None, "scalar") and ftype:
        ok = {
            "string": lambda v: isinstance(v, str),
            "int": lambda v: isinstance(v, int) and not isinstance(v, bool),
            "float": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
            "bool": lambda v: isinstance(v, bool),
            "unknown": lambda v: True,
        }.get(ftype)
        if ok is not None and not ok(value):
            raise TemplateError(f"field {name!r} must be a {ftype}")


def expand(t: Template, conf: dict | None) -> dict:
    """Field values (+defaults) → the expanded component config."""
    from benthos_spark.bloblang.interp import BloblangError, Executor

    conf = dict(conf or {})
    values: dict[str, Any] = {}
    for f in t.fields:
        fname = f["name"]
        if fname in conf:
            values[fname] = conf.pop(fname)
        elif "default" in f:
            values[fname] = f["default"]
        else:
            raise TemplateError(f"template {t.name!r}: field {fname!r} is required")
        _check_kind(fname, values[fname], f.get("kind"), f.get("type"))
    if conf:
        extra = ", ".join(sorted(conf))
        raise TemplateError(f"template {t.name!r}: unrecognised fields: {extra}")
    try:
        result, _meta = Executor(t.mapping).map_part(values)
    except BloblangError as e:
        raise TemplateError(f"template {t.name!r} mapping failed: {e}")
    if not isinstance(result, dict):
        raise TemplateError(
            f"template {t.name!r} mapping must produce an object, got "
            f"{type(result).__name__}"
        )
    return result


def run_template_tests(t: Template) -> list[str]:
    """The reference's embedded expansion tests: each provides a field
    config and the expected expanded component YAML."""
    failures: list[str] = []
    for case in t.tests:
        name = case.get("name", "?")
        try:
            got = expand(t, case.get("config") or {})
        except TemplateError as e:
            failures.append(f"test {name!r}: {e}")
            continue
        if "expected" in case and case["expected"] != got:
            failures.append(
                f"test {name!r}: expansion mismatch:\n  got:      {got}\n"
                f"  expected: {case['expected']}"
            )
    return failures
