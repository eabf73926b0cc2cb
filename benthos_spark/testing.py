"""Declarative pipeline unit tests — the `benthos test` harness
(/root/reference/internal/cli/test/case.go:16-90; output conditions
internal/cli/test/condition.go:42-96) on DataFrames.

A case YAML looks like the reference's::

    tests:
      - name: routes urgent orders
        target_processors:
          - mutation: {tier: "CASE WHEN priority <= 2 THEN 'urgent' ELSE 'normal' END"}
        input_batch:
          - json: {id: 1, priority: 1}
            metadata: {topic: orders}
          - json: {id: 2, priority: 5}
        output_batch:
          - json_equals: {id: 1, priority: 1, tier: urgent}
            metadata_equals: {topic: orders}
          - json_contains: {tier: normal}

Processors come from the same registry as pipeline configs
(benthos_spark.config), so a case exercises exactly what production
wiring runs. Rows are matched by ORDER of the output batch after a
deterministic sort on the input's column order (the reference preserves
arrival order; a distributed engine imposes one).

Matcher parity (condition.go): ``json_equals``, ``json_contains``,
``content_equals`` (string payload column `content`),
``content_matches`` (regex), ``metadata_equals``.
"""

from __future__ import annotations

import json
import re
from typing import Any

import yaml
from pyspark.sql import Row, SparkSession

from benthos_spark.config import _proc
from benthos_spark.operators.processors import META_COL, WithMeta, compose


class CaseFailure(AssertionError):
    pass


def _rows_from_input(spark: SparkSession, batch: list[dict]):
    payloads = []
    metas = []
    for msg in batch:
        if "json" in msg:
            payloads.append(dict(msg["json"]))
        elif "content" in msg:
            payloads.append({"content": msg["content"]})
        else:
            raise ValueError("input message needs `json` or `content`")
        metas.append({str(k): str(v) for k, v in (msg.get("metadata") or {}).items()})
    keys = list(payloads[0].keys())
    for p in payloads:
        if list(p.keys()) != keys:
            raise ValueError("all input messages in a case must share the same fields")
    # the case index rides in the metadata side-channel, which (like the
    # reference's Part metadata) survives document-replacing mappings
    for i, m in enumerate(metas):
        m["__case_ix"] = str(i)
    df = spark.createDataFrame([Row(**p, _case_ix=i) for i, p in enumerate(payloads)])
    meta_df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(metas)], f"_case_ix bigint, {META_COL} map<string,string>"
    )
    return df.join(meta_df, "_case_ix", "left").drop("_case_ix")


def _check_row(expected: dict, got: Row, ix: int) -> None:
    d = got.asDict(recursive=True)
    meta = d.pop(META_COL, None) or {}
    d.pop("_case_ix", None)
    for cond, arg in expected.items():
        if cond == "json_equals":
            if d != arg:
                raise CaseFailure(f"row {ix}: json_equals: got {d!r}, want {arg!r}")
        elif cond == "json_contains":
            for k, v in arg.items():
                if d.get(k) != v:
                    raise CaseFailure(f"row {ix}: json_contains[{k}]: got {d.get(k)!r}, want {v!r}")
        elif cond == "content_equals":
            if d.get("content") != arg:
                raise CaseFailure(f"row {ix}: content_equals: got {d.get('content')!r}")
        elif cond == "content_matches":
            if not re.search(arg, str(d.get("content"))):
                raise CaseFailure(f"row {ix}: content_matches {arg!r}: got {d.get('content')!r}")
        elif cond == "metadata_equals":
            for k, v in arg.items():
                if meta.get(k) != str(v):
                    raise CaseFailure(f"row {ix}: metadata[{k}]: got {meta.get(k)!r}, want {v!r}")
        else:
            raise ValueError(f"unknown condition {cond!r}")


def _resolve_pointer(doc: dict, pointer: str):
    """`/pipeline/processors`-style JSON pointer into the config doc
    (the reference's target_processors addressing,
    internal/cli/test/case.go:16-90)."""
    cur = doc
    for seg in pointer.strip("/").split("/"):
        if isinstance(cur, list):
            cur = cur[int(seg)]
        else:
            cur = cur[seg]
    return cur


def run_case(spark: SparkSession, case: dict, config_doc: dict | None = None) -> None:
    """Run one declarative case; raises CaseFailure on mismatch.
    ``target_processors`` is either an inline processor list or a JSON
    pointer (string) into ``config_doc`` — the `benthos test` form where
    tests live next to the pipeline they exercise."""
    target = case.get("target_processors", [])
    if isinstance(target, str):
        if config_doc is None:
            raise ValueError("pointer target_processors needs the config document")
        target = _resolve_pointer(config_doc, target)
    procs = [_proc(p) for p in target]
    df = _rows_from_input(spark, case["input_batch"])
    out = compose(df, procs)
    rows = sorted(out.collect(), key=lambda r: int((r[META_COL] or {}).get("__case_ix", 0)))
    expected = case.get("output_batch", [])
    if len(rows) != len(expected):
        raise CaseFailure(
            f"{case.get('name', '?')}: expected {len(expected)} output rows, got {len(rows)}"
        )
    for ix, (exp, got) in enumerate(zip(expected, rows)):
        _check_row(exp, got, ix)


def run_cases(spark: SparkSession, yaml_text: str) -> list[str]:
    """Run a `tests:` document; returns the passing case names (raises on
    the first failure, pytest-style)."""
    doc = yaml.safe_load(yaml_text)
    passed = []
    for case in doc["tests"]:
        run_case(spark, case, config_doc=doc)
        passed.append(case.get("name", "?"))
    return passed


# -- reference golden-suite runner ------------------------------------------
#
# Executes the reference's own test YAMLs (config/test/bloblang/
# *_test.yaml: target_mapping + input_batch + output_batches), the
# `benthos test` file format (internal/cli/test/case.go:16-90). The
# mapping runs through the real Bloblang Executor per message — the
# same engine the BloblangMapping processor ships to executors.


def run_reference_suite(spark: SparkSession, yaml_path: str) -> list[str]:
    """Run a reference-format test file; returns passed case names.
    All matcher forms assert for real, including `bloblang:` predicate
    checks — error() equality works because the interpreter emits the
    Go-format error strings ("failed assignment (line N): … from field
    `this.x`")."""
    import os

    from benthos_spark.bloblang.interp import DELETED, BloblangError, Executor

    with open(yaml_path) as f:
        doc = yaml.safe_load(f)
    base = os.path.dirname(os.path.abspath(yaml_path))
    results = []
    for case in doc["tests"]:
        name = case.get("name", "?")
        target = case.get("target_mapping")
        steps = None  # post-mapping batch steps (unarchive json_array)
        if not target:
            # pointer form: /pipeline/processors or file.yaml#/pointer
            # where every processor is a bloblang/mapping source
            # (the reference's own suite files are this shape)
            ptr = case.get("target_processors")
            if not isinstance(ptr, str):
                results.append(f"SKIP {name} (no target_mapping/pointer)")
                continue
            cfg_doc = doc
            if "#" in ptr:
                rel, ptr = ptr.split("#", 1)
                with open(os.path.join(base, rel)) as f:
                    cfg_doc = yaml.safe_load(f)
            procs = _resolve_pointer(cfg_doc, ptr)
            srcs = []
            for p in procs:
                (pname, pconf), = p.items()
                if pname in ("bloblang", "mapping") and isinstance(pconf, str):
                    srcs.append(pconf)
                elif pname == "unarchive" and pconf.get("format") == "json_array":
                    steps = steps or []
                    steps.append("unarchive_json_array")
                else:
                    srcs = None
                    break
            if not srcs:
                results.append(f"SKIP {name} (non-bloblang processors)")
                continue
            src = "\n".join(srcs)
        else:
            src = open(os.path.join(base, target)).read()
        env_vars = case.get("environment") or {}
        saved = {k: os.environ.get(k) for k in env_vars}
        os.environ.update({k: str(v) for k, v in env_vars.items()})
        try:
            from benthos_spark.bloblang.interp import Raw

            ex = Executor(src)
            docs_in = []
            for msg in case["input_batch"]:
                content = msg["content"]
                try:
                    docs_in.append(json.loads(content))
                except (json.JSONDecodeError, TypeError):
                    docs_in.append(Raw(content))
            outputs = []
            errors = []
            for ix, doc_in in enumerate(docs_in):
                meta_in = dict(case["input_batch"][ix].get("metadata") or {})
                try:
                    out, _meta = ex.map_part(doc_in, meta_in, batch=docs_in, index=ix)
                    if out is DELETED:
                        continue
                    outputs.append(out)
                    errors.append(None)
                except BloblangError as e:
                    outputs.append(doc_in)  # reference: message unchanged, error flagged
                    errors.append(str(e))
            for step in steps or []:
                if step == "unarchive_json_array":
                    flat, ferr = [], []
                    for o, e2 in zip(outputs, errors):
                        if isinstance(o, list):
                            flat.extend(o)
                            ferr.extend([e2] * len(o))
                        else:
                            flat.append(o)
                            ferr.append(e2)
                    outputs, errors = flat, ferr
            (expected_batch,) = case["output_batches"]
            if len(outputs) != len(expected_batch):
                raise CaseFailure(
                    f"{name}: expected {len(expected_batch)} messages, got {len(outputs)}"
                )
            skipped = False
            for ix, (exp, got, err) in enumerate(zip(expected_batch, outputs, errors)):
                for cond, arg in exp.items():
                    if cond == "json_equals":
                        if got != arg:
                            raise CaseFailure(f"{name}[{ix}]: json_equals {got!r} != {arg!r}")
                    elif cond == "content_equals":
                        got_s = got if isinstance(got, str) else json.dumps(
                            got, separators=(",", ":"), ensure_ascii=False
                        )
                        if got_s != arg:
                            # Go marshals maps with sorted keys; compare
                            # parsed values when both sides are JSON
                            try:
                                if json.loads(got_s) == json.loads(arg):
                                    continue
                            except (json.JSONDecodeError, TypeError):
                                pass
                            raise CaseFailure(f"{name}[{ix}]: content_equals {got_s!r} != {arg!r}")
                    elif cond == "bloblang":
                        # evaluate the predicate with OUR interpreter over
                        # the output message, error() bound to the recorded
                        # error (the reference runs the same check with its
                        # engine — test/case.go). Error-string equality now
                        # asserts for real: the interpreter produces the
                        # Go-format messages ("failed assignment (line N):
                        # … from field `this.x`").
                        from benthos_spark.bloblang.interp import Executor

                        try:
                            verdict, _ = Executor(f"root = ({arg})").map_part(
                                got, error=err
                            )
                        except Exception as e:
                            raise CaseFailure(
                                f"{name}[{ix}]: bloblang check failed to evaluate: {e}"
                            )
                        if verdict is not True:
                            raise CaseFailure(
                                f"{name}[{ix}]: bloblang check {arg!r} -> {verdict!r} "
                                f"(error={err!r})"
                            )
                    else:
                        raise ValueError(f"unknown condition {cond!r}")
            results.append((f"SKIP-PARTIAL {name}" if skipped else name))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    return results
