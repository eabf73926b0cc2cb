"""Bloblang doc-example conformance corpus.

tests/fixtures/blobl_examples.json is extracted from the reference's
own method/function documentation examples
(internal/bloblang/query/methods*.go + functions.go NewExampleSpec
calls) by tools/extract_blobl_examples.py. Every runnable example's
mapping is executed through our interpreter and compared against the
documented output; `Error(...)`-documented examples must raise.
Nondeterministic/gated examples carry a `skip` reason in the fixture.
"""

from __future__ import annotations

import json
import os

import pytest

from benthos_spark.bloblang.interp import DELETED, Executor, Raw, _format_json

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "blobl_examples.json")

with open(FIXTURE) as f:
    EXAMPLES = json.load(f)


def _parse(content):
    try:
        return json.loads(content)
    except (json.JSONDecodeError, TypeError):
        return Raw(content)


def _ids():
    out = []
    for i, e in enumerate(EXAMPLES):
        head = e["mapping"].split("\n")[0][:48]
        out.append(f"{i:03d}-{head}")
    return out


@pytest.mark.parametrize("example", EXAMPLES, ids=_ids())
def test_doc_example(example):
    if "skip" in example:
        pytest.skip(example["skip"])
    expect_error = example["output"].startswith("Error(")
    ex = Executor(example["mapping"])
    if expect_error:
        with pytest.raises(Exception):
            out, _ = ex.map_part(_parse(example["input"]))
            if out is DELETED:
                raise AssertionError("deleted, not errored")
        return
    out, _ = ex.map_part(_parse(example["input"]))
    if out is DELETED:
        got = "<Message deleted>"
    elif isinstance(out, bytes):
        got = out.decode("utf-8", "replace")
    elif isinstance(out, str):
        got = str(out)
    else:
        got = json.loads(_format_json(out))
    raw_want = example["output"]
    want = _parse(raw_want)
    assert (got == want) or (isinstance(got, str) and got == raw_want), (
        f"{example['mapping']!r}: {got!r} != {want!r}"
    )


def test_corpus_size_sanity():
    runnable = [e for e in EXAMPLES if "skip" not in e]
    assert len(runnable) >= 200, "conformance corpus unexpectedly shrank"


def test_column_tier_agrees_with_documented_outputs(spark):
    """Dual-backend consistency: every doc example whose input is a flat
    typed row AND whose mapping compiles in the Column tier must produce
    the documented output through the JVM path too (no divergence
    between the Arrow interpreter and the Column compiler)."""
    from benthos_spark.bloblang.columns import UnsupportedBloblang, compile_mapping
    from benthos_spark.bloblang.parser import BloblangParseError, parse_mapping

    def flatish(d):
        if not isinstance(d, dict) or not d:
            return False
        for v in d.values():
            if isinstance(v, dict) or v is None:
                return False
            if isinstance(v, list) and any(isinstance(x, (dict, list)) for x in v):
                return False
        return True

    compilable = 0
    for e in EXAMPLES:
        if "skip" in e or e["output"].startswith("Error("):
            continue
        try:
            doc = json.loads(e["input"])
        except (json.JSONDecodeError, TypeError):
            continue
        if not flatish(doc):
            continue
        try:
            ast = parse_mapping(e["mapping"])
            df = spark.createDataFrame([doc])
            compiled = compile_mapping(ast, df.schema)
            rows = compiled.apply(df, mutate=False).collect()
        except Exception:
            continue  # dynamic-tier-only example
        compilable += 1
        try:
            want = json.loads(e["output"])
        except (json.JSONDecodeError, TypeError):
            want = e["output"]
        got = rows[0].asDict(recursive=True) if rows else "<deleted>"
        if isinstance(got, dict):
            import datetime as _dt

            from benthos_spark.bloblang.interp import _ts_json

            got = {
                k: _ts_json(v.replace(tzinfo=_dt.timezone.utc) if v.tzinfo is None else v)
                if isinstance(v, _dt.datetime)
                else v
                for k, v in got.items()
            }
        ok = got == want
        if not ok and isinstance(want, dict) and isinstance(got, dict):
            ok = set(got) == set(want) and all(
                got.get(k) == v
                or (
                    isinstance(v, (int, float))
                    and not isinstance(v, bool)
                    and isinstance(got.get(k), (int, float))
                    and abs(got.get(k) - v) < 1e-9
                )
                for k, v in want.items()
            )
        assert ok, f"Column tier diverges on {e['mapping']!r}: {got!r} != {want!r}"
    assert compilable >= 50, f"Column tier compiled only {compilable} examples"
