"""From-scratch JSON Schema (draft-07 core subset) validator.

The reference's schema-registry JSON serde validates messages with
gojsonschema (internal/impl/confluent/serde_json.go:12-66) and its
`json_schema` processor does the same (internal/impl/pure, via
xeipuuv/gojsonschema). This module implements the validation keywords
those paths exercise, from the public draft-07 spec only:

  type, enum, const, properties, required, additionalProperties,
  patternProperties, items (schema or tuple) + additionalItems,
  minItems/maxItems/uniqueItems, minLength/maxLength/pattern,
  minimum/maximum/exclusiveMinimum/exclusiveMaximum/multipleOf,
  allOf/anyOf/oneOf/not, $ref (in-document "#/..." pointers and
  registry-reference roots by "$id"/name), definitions, format (noop).

Errors mirror gojsonschema's shape loosely: a list of "<path>: <msg>"
strings; an empty list means valid.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any


class JsonSchemaError(ValueError):
    pass


def _is_int(v: Any) -> bool:
    return (isinstance(v, int) and not isinstance(v, bool)) or (
        isinstance(v, float) and v.is_integer()
    )


_TYPE_CHECKS = {
    "null": lambda v: v is None,
    "boolean": lambda v: isinstance(v, bool),
    "integer": _is_int,
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "string": lambda v: isinstance(v, str),
    "array": lambda v: isinstance(v, list),
    "object": lambda v: isinstance(v, dict),
}


class Schema:
    """A compiled schema: the root document plus a store of referenced
    documents (registry references land here keyed by their name and,
    when present, their ``$id``)."""

    def __init__(self, root: Any, refs: dict[str, Any] | None = None):
        if isinstance(root, str):
            root = json.loads(root)
        self.root = root
        self.refs: dict[str, Any] = {}
        for name, doc in (refs or {}).items():
            if isinstance(doc, str):
                doc = json.loads(doc)
            self.refs[name] = doc
            if isinstance(doc, dict) and isinstance(doc.get("$id"), str):
                self.refs[doc["$id"]] = doc

    # -- $ref resolution ----------------------------------------------------

    def _pointer(self, doc: Any, ptr: str) -> Any:
        cur = doc
        for raw in ptr.split("/"):
            if raw == "":
                continue
            tok = raw.replace("~1", "/").replace("~0", "~")
            if isinstance(cur, list):
                cur = cur[int(tok)]
            elif isinstance(cur, dict) and tok in cur:
                cur = cur[tok]
            else:
                raise JsonSchemaError(f"unresolvable $ref pointer {ptr!r}")
        return cur

    def resolve(self, ref: str, doc: Any) -> tuple[Any, Any]:
        """Return (schema, owning_document) for a $ref string."""
        base, _, frag = ref.partition("#")
        if base:
            if base not in self.refs:
                raise JsonSchemaError(f"unresolvable $ref document {base!r}")
            doc = self.refs[base]
        if not frag or frag == "/":
            return doc, doc
        return self._pointer(doc, frag), doc

    # -- validation -----------------------------------------------------------

    def validate(self, value: Any) -> list[str]:
        errs: list[str] = []
        self._validate(self.root, self.root, value, "(root)", errs, depth=0)
        return errs

    def _validate(self, sch: Any, doc: Any, v: Any, path: str, errs: list[str], depth: int):
        if depth > 64:
            raise JsonSchemaError("schema recursion too deep")
        if sch is True or sch is None:
            return
        if sch is False:
            errs.append(f"{path}: schema forbids any value")
            return
        if not isinstance(sch, dict):
            raise JsonSchemaError(f"invalid schema node {sch!r}")

        if "$ref" in sch:
            target, tdoc = self.resolve(sch["$ref"], doc)
            self._validate(target, tdoc, v, path, errs, depth + 1)
            return

        t = sch.get("type")
        if t is not None:
            types = t if isinstance(t, list) else [t]
            if not any(_TYPE_CHECKS.get(x, lambda _: False)(v) for x in types):
                errs.append(f"{path}: invalid type, expected {t}")
                return

        if "enum" in sch and v not in sch["enum"]:
            errs.append(f"{path}: must be one of enum values")
        if "const" in sch and v != sch["const"]:
            errs.append(f"{path}: must equal const value")

        for key in ("allOf", "anyOf", "oneOf"):
            if key in sch:
                sub_errs = []
                passed = 0
                for i, sub in enumerate(sch[key]):
                    e: list[str] = []
                    self._validate(sub, doc, v, path, e, depth + 1)
                    if not e:
                        passed += 1
                    sub_errs.append(e)
                if key == "allOf" and passed != len(sch[key]):
                    for e in sub_errs:
                        errs.extend(e)
                elif key == "anyOf" and passed == 0:
                    errs.append(f"{path}: does not match any allowed schema")
                elif key == "oneOf" and passed != 1:
                    errs.append(f"{path}: must match exactly one schema ({passed} matched)")
        if "not" in sch:
            e: list[str] = []
            self._validate(sch["not"], doc, v, path, e, depth + 1)
            if not e:
                errs.append(f"{path}: must not match the 'not' schema")

        if isinstance(v, (int, float)) and not isinstance(v, bool):
            if "minimum" in sch and v < sch["minimum"]:
                errs.append(f"{path}: must be >= {sch['minimum']}")
            if "maximum" in sch and v > sch["maximum"]:
                errs.append(f"{path}: must be <= {sch['maximum']}")
            if "exclusiveMinimum" in sch and v <= sch["exclusiveMinimum"]:
                errs.append(f"{path}: must be > {sch['exclusiveMinimum']}")
            if "exclusiveMaximum" in sch and v >= sch["exclusiveMaximum"]:
                errs.append(f"{path}: must be < {sch['exclusiveMaximum']}")
            if "multipleOf" in sch:
                q = v / sch["multipleOf"]
                if not math.isclose(q, round(q), abs_tol=1e-9):
                    errs.append(f"{path}: must be a multiple of {sch['multipleOf']}")

        if isinstance(v, str):
            if "minLength" in sch and len(v) < sch["minLength"]:
                errs.append(f"{path}: string length must be >= {sch['minLength']}")
            if "maxLength" in sch and len(v) > sch["maxLength"]:
                errs.append(f"{path}: string length must be <= {sch['maxLength']}")
            if "pattern" in sch and not re.search(sch["pattern"], v):
                errs.append(f"{path}: does not match pattern {sch['pattern']!r}")

        if isinstance(v, list):
            if "minItems" in sch and len(v) < sch["minItems"]:
                errs.append(f"{path}: array length must be >= {sch['minItems']}")
            if "maxItems" in sch and len(v) > sch["maxItems"]:
                errs.append(f"{path}: array length must be <= {sch['maxItems']}")
            if sch.get("uniqueItems"):
                seen = []
                for item in v:
                    if item in seen:
                        errs.append(f"{path}: array items must be unique")
                        break
                    seen.append(item)
            items = sch.get("items")
            if isinstance(items, list):
                for i, item in enumerate(v):
                    if i < len(items):
                        self._validate(items[i], doc, item, f"{path}.{i}", errs, depth + 1)
                    elif "additionalItems" in sch:
                        self._validate(
                            sch["additionalItems"], doc, item, f"{path}.{i}", errs, depth + 1
                        )
            elif items is not None:
                for i, item in enumerate(v):
                    self._validate(items, doc, item, f"{path}.{i}", errs, depth + 1)

        if isinstance(v, dict):
            for req in sch.get("required", ()):
                if req not in v:
                    errs.append(f"{path}: {req} is required")
            props = sch.get("properties", {})
            pat_props = sch.get("patternProperties", {})
            add = sch.get("additionalProperties")
            for k, val in v.items():
                matched = False
                if k in props:
                    matched = True
                    self._validate(props[k], doc, val, f"{path}.{k}", errs, depth + 1)
                for pat, sub in pat_props.items():
                    if re.search(pat, k):
                        matched = True
                        self._validate(sub, doc, val, f"{path}.{k}", errs, depth + 1)
                if not matched:
                    if add is False:
                        errs.append(f"{path}: additional property {k!r} is not allowed")
                    elif isinstance(add, (dict, bool)):
                        self._validate(add, doc, val, f"{path}.{k}", errs, depth + 1)


def compile_schema(root: Any, refs: dict[str, Any] | None = None) -> Schema:
    return Schema(root, refs)


def validate(schema: Any, value: Any) -> list[str]:
    """One-shot validation; `schema` may be a JSON string or parsed doc."""
    return compile_schema(schema).validate(value)
