"""Tracing: per-component event capture (TracingSummary) and the span
layer — reference internal/bundle/tracing (events/input/processor/output
wrappers, bundle_test.go scenarios) and internal/tracing/otel.go.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from benthos_spark.config import ConfigError, _tracer, run_config
from benthos_spark.operators.processors import (
    ERROR_COL,
    Filter,
    Mutation,
    ensure_error_col,
)
from benthos_spark.streaming.pipeline import Pipeline
from benthos_spark.streaming.tracing import (
    EVENT_CONSUME,
    EVENT_DELETE,
    EVENT_ERROR,
    EVENT_PRODUCE,
    FileCollector,
    NoneTracer,
    TraceParent,
    TracingSummary,
    traced,
)
from tests.conftest import spark  # noqa: F401


class ListSource:
    streaming = False

    def __init__(self, rows, schema="value string"):
        self.rows = rows
        self.schema = schema

    def read(self, spark):
        return spark.createDataFrame(self.rows, self.schema)


def _collecting_sink(into: list):
    def sink(df, batch_id):
        into.extend(r["value"] for r in df.collect())

    return sink


def _run_traced(spark, pipe, **kw):
    collected: list = []
    tpipe, tsink, summary = traced(pipe, spark, sink=_collecting_sink(collected), **kw)
    tsink(tpipe.run_batch(spark), 0)
    return collected, summary


# -- event capture (bundle_test.go TestBundle* scenarios) ---------------------


def test_totals_and_event_flow(spark):
    pipe = Pipeline(
        source=ListSource([("hello",), ("world",), ("bad",)]),
        processors=[
            Mutation({"value": F.upper("value")}),
            Filter(F.col("value") != "BAD"),
        ],
    )
    collected, summary = _run_traced(spark, pipe)
    assert sorted(collected) == ["HELLO", "WORLD"]
    assert summary.total_input() == 3
    assert summary.total_output() == 2
    assert summary.total_processor_errors() == 0

    ie = summary.input_events()
    assert set(ie) == {"input"}
    assert sorted((e.type, e.content) for e in ie["input"]) == [
        (EVENT_PRODUCE, "bad"),
        (EVENT_PRODUCE, "hello"),
        (EVENT_PRODUCE, "world"),
    ]
    pe = summary.processor_events()
    assert set(pe) == {"processor_0", "processor_1"}
    # the mapping stage: 3 consumed, 3 produced (uppercased)
    p0 = [(e.type, e.content) for e in pe["processor_0"]]
    assert sorted(c for t, c in p0 if t == EVENT_CONSUME) == ["bad", "hello", "world"]
    assert sorted(c for t, c in p0 if t == EVENT_PRODUCE) == ["BAD", "HELLO", "WORLD"]
    # the filter stage: 3 consumed, 2 produced
    p1 = [(e.type, e.content) for e in pe["processor_1"]]
    assert sorted(c for t, c in p1 if t == EVENT_CONSUME) == ["BAD", "HELLO", "WORLD"]
    assert sorted(c for t, c in p1 if t == EVENT_PRODUCE) == ["HELLO", "WORLD"]
    oe = summary.output_events()
    assert sorted((e.type, e.content) for e in oe["output"]) == [
        (EVENT_CONSUME, "HELLO"),
        (EVENT_CONSUME, "WORLD"),
    ]


def test_delete_event_when_processor_drops_everything(spark):
    # NOTE: a constant-false filter (F.lit(False)) would be pruned by
    # Catalyst together with the taps below it (PruneFilters → empty
    # relation) — observation is part of the plan, and a plan proven
    # empty never runs. A data-dependent drop is the realistic case.
    pipe = Pipeline(
        source=ListSource([("a",), ("b",)]),
        processors=[Filter(F.col("value").startswith("z"))],
    )
    _, summary = _run_traced(spark, pipe)
    assert summary.total_input() == 2
    assert summary.total_output() == 0
    types = [e.type for e in summary.processor_events()["processor_0"]]
    assert types.count(EVENT_DELETE) == 1  # batch-level delete, processor.go:59


class _FailShort(Mutation):
    """Marks short values as errored (the _error side channel)."""

    def __init__(self):
        super().__init__({})

    def __call__(self, df):
        df = ensure_error_col(df)
        return df.withColumn(
            ERROR_COL,
            F.when(F.length("value") < 4, F.lit("too short")).otherwise(F.col(ERROR_COL)),
        )


def test_error_events_and_counter(spark):
    pipe = Pipeline(
        source=ListSource([("hello",), ("ok",), ("no",)]),
        processors=[_FailShort()],
    )
    _, summary = _run_traced(spark, pipe)
    assert summary.total_processor_errors() == 2
    errs = [e for e in summary.processor_events()["processor_0"] if e.type == EVENT_ERROR]
    assert len(errs) == 2 and all(e.content == "too short" for e in errs)


def test_event_limit_and_flush(spark):
    pipe = Pipeline(
        source=ListSource([(f"m{i}",) for i in range(50)]),
        processors=[Mutation({"value": F.upper("value")})],
    )
    _, summary = _run_traced(spark, pipe, event_limit=5)
    assert len(summary.input_events()["input"]) == 5  # capped per component
    assert summary.total_input() == 50  # counters are NOT capped
    summary.flush()
    assert summary.input_events()["input"] == []
    assert summary.total_input() == 50  # flush clears events, keeps totals


def test_original_pipeline_untouched_and_labels(spark):
    procs = [Mutation({"value": F.upper("value")})]
    pipe = Pipeline(source=ListSource([("x",)]), processors=procs)
    tpipe, _, summary = traced(pipe, spark, labels=["upper"])
    assert pipe.processors[0] is procs[0]  # original untouched
    tpipe.run_batch(spark).collect()
    assert set(summary.processor_events()) == {"upper"}
    # no tracing → the plan has no Python stages at all
    plain = pipe.run_batch(spark)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plain and "MapInPandas" not in plain


# -- streaming ----------------------------------------------------------------


def test_streaming_traced_totals(spark, tmp_path):
    from benthos_spark.datagen.clips import CLIPS_SCHEMA, write_clips
    from benthos_spark.sources.readers import ParquetSource
    from benthos_spark.streaming.pipeline import run_to_completion

    src = str(tmp_path / "src")
    write_clips(spark, src, 60, files=3)
    pipe = Pipeline(
        source=ParquetSource(src, streaming=True, schema=CLIPS_SCHEMA),
        processors=[Mutation({"clip_id": F.col("clip_id")})],
    )
    seen: list = []

    def sink(df, batch_id):
        seen.append(df.count())

    tpipe, tsink, summary = traced(pipe, spark, sink=sink, event_limit=3)
    q = tpipe.start(spark, tsink, checkpoint=str(tmp_path / "ckpt"), trigger_once=True)
    run_to_completion(q)
    assert sum(seen) == 60
    assert summary.total_input() == 60
    assert summary.total_output() == 60
    assert len(summary.input_events()["input"]) == 3


# -- span layer ---------------------------------------------------------------


def test_traceparent_format_and_determinism(spark):
    df = spark.createDataFrame([("hello",), ("hello",), ("other",)], "value string")
    out = TraceParent("stage")(df).select(F.col("_meta")["traceparent"].alias("tp")).collect()
    tps = [r["tp"] for r in out]
    for tp in tps:
        assert re.fullmatch(r"00-[0-9a-f]{32}-[0-9a-f]{16}-01", tp)
    same = [tp for tp in tps if tps.count(tp) == 2]
    assert len(same) == 2  # identical content → identical trace (determinism)
    assert len(set(tps)) == 2


def test_span_chain_parent_child(spark, tmp_path):
    tracer = FileCollector(str(tmp_path / "spans"))
    pipe = Pipeline(
        source=ListSource([("msg",)]),
        processors=[Mutation({"value": F.upper("value")})],
    )
    collected, summary = _run_traced(spark, pipe, tracer=tracer)
    spans = tracer.spans()
    by_name = {s["name"]: s for s in spans}
    assert set(by_name) == {"input", "processor_0", "output"}
    # one trace; the chain is input → processor_0 (same trace id, linked)
    assert len({s["trace_id"] for s in spans}) == 1
    assert by_name["processor_0"]["parent_span_id"] == by_name["input"]["span_id"]
    # output observed the processor's span (the last advancement)
    assert by_name["output"]["span_id"] == by_name["processor_0"]["span_id"]


def test_spans_survive_exactly_once_redelivery(spark, tmp_path):
    # deterministic ids: re-running the same content produces the SAME
    # trace ids — a redelivered batch doesn't fork a second trace
    tracer = FileCollector(str(tmp_path / "spans"))
    pipe = Pipeline(source=ListSource([("stable",)]), processors=[])
    _run_traced(spark, pipe, tracer=tracer)
    first = {(s["trace_id"], s["span_id"], s["name"]) for s in tracer.spans()}
    _run_traced(spark, pipe, tracer=tracer)
    second = {(s["trace_id"], s["span_id"], s["name"]) for s in tracer.spans()}
    assert first == second  # dedupe by id works downstream


# -- config wiring ------------------------------------------------------------


def test_tracer_config_dispatch(tmp_path):
    assert isinstance(_tracer({"none": {}}), NoneTracer)
    fc = _tracer({"file_collector": {"path": str(tmp_path / "sp")}})
    assert isinstance(fc, FileCollector)
    from benthos_spark.functions.otlp import OtlpHttpExporter

    for name in ("jaeger", "open_telemetry_collector"):
        t = _tracer({name: {"collector_url": "http://localhost:4318"}})
        assert isinstance(t, OtlpHttpExporter)
        with pytest.raises(ConfigError, match="endpoint"):
            _tracer({name: {}})
    with pytest.raises(ConfigError, match="file_collector"):
        _tracer({"gcp_cloudtrace": {}})
    with pytest.raises(ConfigError, match="unknown tracer"):
        _tracer({"zipkin": {}})
    with pytest.raises(ConfigError, match="path"):
        _tracer({"file_collector": {}})


def test_lint_catches_bad_tracer():
    from benthos_spark.config import compile_config

    conf = """
input:
  generate: {count: 1, streaming: false, mapping: {v: value}}
output:
  drop: {}
tracer:
  gcp_cloudtrace: {}
"""
    with pytest.raises(ConfigError, match="file_collector"):
        compile_config(conf)


def test_run_config_with_tracer(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text('{"v": 1}\n{"v": 2}\n')
    out_dir = tmp_path / "out"
    spans_dir = tmp_path / "spans"
    conf = f"""
input:
  file:
    path: "{src}"
    codec: lines
pipeline:
  processors:
    - mutation:
        upper: upper(value)
output:
  file:
    path: "{out_dir}"
tracer:
  file_collector:
    path: "{spans_dir}"
"""
    run_config(spark, conf, checkpoint=str(tmp_path / "ckpt"))
    spans = FileCollector(str(spans_dir)).spans()
    assert {s["name"] for s in spans} == {"input", "processor_0", "output"}
    assert len({s["trace_id"] for s in spans}) == 2  # one trace per message
