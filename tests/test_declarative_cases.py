"""Declarative YAML case harness (`benthos test` parity, SURVEY.md §5
layer 2) — cases re-expressed from the reference's config/test corpus
shapes on our column model."""

from __future__ import annotations

import pytest

from benthos_spark.testing import CaseFailure, run_case, run_cases

CASES = """
tests:
  - name: mutation routes tiers
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

  - name: filter drops short content (deduplicate.yaml shape)
    target_processors:
      - filter: "length(content) > 3"
    input_batch:
      - json: {content: tiny}
      - json: {content: ab}
    output_batch:
      - content_equals: tiny

  - name: grok parses content
    target_processors:
      - grok: {col: content, pattern: "%{LOGLEVEL:level} %{GREEDYDATA:message}"}
    input_batch:
      - json: {content: "ERROR disk on fire"}
    output_batch:
      - json_contains: {level: ERROR, message: "disk on fire"}
        content_matches: "disk"

  - name: mapping builds new document
    target_processors:
      - mapping: {doubled: "v * 2", label: "'x'"}
    input_batch:
      - json: {v: 21}
    output_batch:
      - json_equals: {doubled: 42, label: x}
"""


def test_case_corpus(spark):
    assert run_cases(spark, CASES) == [
        "mutation routes tiers",
        "filter drops short content (deduplicate.yaml shape)",
        "grok parses content",
        "mapping builds new document",
    ]


def test_failure_reports_condition(spark):
    case = {
        "target_processors": [{"mutation": {"x": "1"}}],
        "input_batch": [{"json": {"a": 1}}],
        "output_batch": [{"json_contains": {"x": 999}}],
    }
    with pytest.raises(CaseFailure, match="json_contains"):
        run_case(spark, case)


def test_row_count_mismatch(spark):
    case = {
        "target_processors": [{"filter": "a > 10"}],
        "input_batch": [{"json": {"a": 1}}],
        "output_batch": [{"json_contains": {"a": 1}}],
    }
    with pytest.raises(CaseFailure, match="expected 1 output rows, got 0"):
        run_case(spark, case)


REF_SUITES = "/root/reference/config/test/bloblang"


def test_reference_cities_suite(spark):
    from benthos_spark.testing import run_reference_suite

    got = run_reference_suite(spark, f"{REF_SUITES}/cities_test.yaml")
    assert got == ["test cities mapping"]


def test_reference_csv_formatter_suite(spark):
    from benthos_spark.testing import run_reference_suite

    got = run_reference_suite(spark, f"{REF_SUITES}/csv_formatter_test.yaml")
    # case 2 asserts the Go engine's exact error string — our interpreter
    # now produces the same "failed assignment (line N): … from field
    # `this.0`" format, so the equality check runs for real (no skip)
    assert got == ["Consistent objects", "Empty"]


def test_reference_github_releases_suite(spark):
    from benthos_spark.testing import run_reference_suite

    got = run_reference_suite(spark, f"{REF_SUITES}/github_releases_test.yaml")
    assert got == ["Github releases mapping"]


def test_target_processors_pointer(spark):
    """`benthos test` form: the tests section points into the pipeline
    it exercises (/pipeline/processors pointer)."""
    from benthos_spark.testing import run_cases

    yaml_text = """
pipeline:
  processors:
    - mutation: {tier: "CASE WHEN priority <= 2 THEN 'urgent' ELSE 'normal' END"}
tests:
  - name: routes by priority
    target_processors: /pipeline/processors
    input_batch:
      - json: {id: 1, priority: 1}
      - json: {id: 2, priority: 5}
    output_batch:
      - json_contains: {tier: urgent}
      - json_contains: {tier: normal}
"""
    assert run_cases(spark, yaml_text) == ["routes by priority"]


def test_target_processors_pointer_with_bloblang(spark):
    from benthos_spark.testing import run_cases

    yaml_text = """
pipeline:
  processors:
    - mapping: |
        root.id = this.id
        root.label = if this.v > 10 { "big" } else { "small" }
tests:
  - name: bloblang block via pointer
    target_processors: /pipeline/processors
    input_batch:
      - json: {id: 1, v: 50}
      - json: {id: 2, v: 3}
    output_batch:
      - json_equals: {id: 1, label: big}
      - json_equals: {id: 2, label: small}
"""
    assert run_cases(spark, yaml_text) == ["bloblang block via pointer"]


def test_entire_reference_bloblang_test_directory(spark):
    """ALL of config/test/bloblang/*.yaml runs verbatim: golden
    .blobl mappings, pointer-form bloblang processors (incl. cross-file
    `./file.yaml#/pointer`), batch functions (from_all/batch_index in
    windowed.yaml), and the unarchive json_array step. Bloblang
    predicate checks (incl. Go-exact error-string equality) assert for
    real — zero skips."""
    import glob

    from benthos_spark.testing import run_reference_suite

    passed, skipped = [], []
    for path in sorted(glob.glob(f"{REF_SUITES}/*.yaml")):
        for name in run_reference_suite(spark, path):
            (skipped if str(name).startswith("SKIP") else passed).append(f"{path.rsplit('/',1)[-1]}:{name}")
    assert len(passed) == 21, passed
    assert skipped == []
