"""Tracing: the reference's per-component event capture and OTel span
layer re-expressed for a distributed DataFrame engine.

Reference analogues:

- ``TracingSummary`` mirrors internal/bundle/tracing/events.go:100-165
  (Summary with Input/Output/ProcessorErrors counters and per-label
  CONSUME/PRODUCE/DELETE/ERROR event lists, an event limit, and
  flush-on-read) and the public surface public/service/tracing.go:54-137.
  The reference wraps every input/processor/output in a traced shim that
  records one event per message part (bundle/tracing/input.go:20,
  processor.go:17, output.go:16). Here the shim is a ``mapInPandas`` tap
  stage inserted at each component boundary WHEN TRACING IS ON — events
  and counters flow back through Spark accumulators, which work
  identically on a real cluster (updates ride task completion). When
  tracing is off the taps are never planned: the traced and untraced
  plans are bit-identical, so observation cost is strictly opt-in, like
  the reference's ``SetEnabled`` short-circuit (events.go:91).
- Span propagation mirrors internal/tracing/otel.go + span.go: each
  message carries a W3C ``traceparent`` in its metadata (TextMap inject,
  span.go:62-74); every component creates a child span. Trace ids here
  are DETERMINISTIC — sha256 of the message content — so redelivered
  messages rebuild the same trace (the engine-wide redelivery-safety
  rule). Span records are emitted executor-side as atomic JSONL spool
  files (the sidecar-agent model: a real cluster ships executor-local
  spans to a local OTLP agent; the ``file_collector`` tracer is that
  agent without the network).

Observation lives INSIDE the plan: a subtree Catalyst proves empty
(e.g. a constant-false filter) is pruned together with its taps and
records nothing — a declaratively optimized engine never runs work
whose output is provably unneeded. Data-dependent flows always observe.

Vectorization honesty: the reference tracks errors per part by comparing
``ErrorGet()`` before/after each processor (processor.go:36-58). A
vectorized engine has no per-row identity across an arbitrary stage, so
``TotalProcessorErrors`` is the per-label count difference of
``_error``-marked rows out vs in, and ERROR events sample the failed
rows on the out side — same information at batch granularity.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benthos_spark.operators.processors import (
    ERROR_COL,
    META_COL,
    Processor,
    ensure_error_col,
    ensure_meta_col,
)

EVENT_PRODUCE = "PRODUCE"
EVENT_CONSUME = "CONSUME"
EVENT_DELETE = "DELETE"
EVENT_ERROR = "ERROR"

_CONTENT = "__trace_content"


@dataclass
class TracingEvent:
    """One traced event (events.go:23-27 NodeEvent)."""

    type: str
    content: str = ""
    meta: dict = field(default_factory=dict)


class _ListParam(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


class _SumDictParam(AccumulatorParam):
    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = a.get(k, 0) + v
        return a


def _payload_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in (META_COL, ERROR_COL, _CONTENT)]


def _content_col(df: DataFrame):
    """The message content as ONE string column, built JVM-side so the
    tap only copies strings: the raw column itself for single-column
    string/binary payloads (part.AsBytes() parity), else the JSON
    serialization of the payload struct (what a JSON output would
    write for the row)."""
    payload = _payload_cols(df)
    if not payload:
        return F.lit("")
    if len(payload) == 1:
        dt = dict(df.dtypes)[payload[0]]
        if dt == "string":
            return F.col(payload[0])
        if dt == "binary":
            return F.col(payload[0]).cast("string")
    return F.to_json(F.struct(*[F.col(c) for c in payload]))


class TracingSummary:
    """Driver-side view of all traced events (events.go:100 Summary /
    public/service/tracing.go:54 TracingSummary). Counters and events
    arrive through accumulators as micro-batches complete; query while
    running or after completion. ``event_limit`` caps stored events PER
    COMPONENT (events.go:87 SetEventLimit); 0 = unlimited."""

    def __init__(self, spark: SparkSession, event_limit: int = 100):
        sc = spark.sparkContext
        self.event_limit = int(event_limit)
        # items: (label, kind, event_type, content, meta_json)
        self._events = sc.accumulator([], _ListParam())
        # keys: (label, "in"|"out"|"err_in"|"err_out"); plus kind marker
        self._counts = sc.accumulator({}, _SumDictParam())
        self._kinds: dict[str, str] = {}  # label -> input|processor|output

    # -- totals (tracing.go:61-77) ------------------------------------------
    def total_input(self) -> int:
        return sum(
            v for (label, key), v in self._counts.value.items()
            if key == "out" and self._kinds.get(label) == "input"
        )

    def total_output(self) -> int:
        return sum(
            v for (label, key), v in self._counts.value.items()
            if key == "in" and self._kinds.get(label) == "output"
        )

    def total_processor_errors(self) -> int:
        c = self._counts.value
        total = 0
        for label, kind in self._kinds.items():
            if kind != "processor":
                continue
            total += max(0, c.get((label, "err_out"), 0) - c.get((label, "err_in"), 0))
        return total

    # -- events (tracing.go:82-137) ------------------------------------------
    def _collect(self, kind: str, flush: bool) -> dict[str, list[TracingEvent]]:
        out: dict[str, list[TracingEvent]] = {
            label: [] for label, k in self._kinds.items() if k == kind
        }
        for label, k, etype, content, meta_json in self._events.value:
            if k != kind:
                continue
            evs = out.setdefault(label, [])
            if self.event_limit and len(evs) >= self.event_limit:
                continue
            evs.append(TracingEvent(etype, content, json.loads(meta_json) if meta_json else {}))
        # synthesized DELETE: a processor consumed messages and produced
        # none (processor.go:59-62 batch-level delete detection). Only
        # processors have both sides — inputs tap "out", outputs tap "in".
        if kind == "processor":
            c = self._counts.value
            for label, evs in out.items():
                if c.get((label, "in"), 0) > 0 and c.get((label, "out"), 0) == 0:
                    evs.append(TracingEvent(EVENT_DELETE))
        if flush:
            self.flush()
        return out

    def input_events(self, flush: bool = False) -> dict[str, list[TracingEvent]]:
        return self._collect("input", flush)

    def processor_events(self, flush: bool = False) -> dict[str, list[TracingEvent]]:
        return self._collect("processor", flush)

    def output_events(self, flush: bool = False) -> dict[str, list[TracingEvent]]:
        return self._collect("output", flush)

    def flush(self) -> None:
        """Clear stored events (events.go:225 Flush). Counters persist —
        they are totals, not samples."""
        self._events.value = []


# -----------------------------------------------------------------------------
# Span layer (internal/tracing/otel.go analog)
# -----------------------------------------------------------------------------


@dataclass
class FileCollector:
    """`tracer: file_collector` — the OTLP exporter without the network:
    every task appends finished spans as JSONL spool files under
    ``path`` (atomic tmp+rename, one file per task batch — the same
    contract sources/listeners.py uses). On a real cluster this is the
    executor-local agent model; in local mode all spans land in one
    directory. ``spans()`` reads them back driver-side."""

    path: str

    def emit(self, spans: list[dict]) -> None:
        if not spans:
            return
        os.makedirs(self.path, exist_ok=True)
        name = f"{time.time_ns():x}-{uuid.uuid4().hex[:8]}.jsonl"
        tmp = os.path.join(self.path, f".{name}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")
        os.replace(tmp, os.path.join(self.path, name))

    def spans(self) -> list[dict]:
        if not os.path.isdir(self.path):
            return []
        out: list[dict] = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith(".") or not name.endswith(".jsonl"):
                continue
            with open(os.path.join(self.path, name), encoding="utf-8") as f:
                out.extend(json.loads(line) for line in f if line.strip())
        return out


@dataclass
class NoneTracer:
    """`tracer: none` (internal/impl/pure/tracer_none.go) — spans are
    neither created nor propagated."""

    def emit(self, spans: list[dict]) -> None:  # pragma: no cover
        pass


TRACEPARENT_KEY = "traceparent"
PARENT_SPAN_KEY = "_parent_span_id"
ROOT_SPAN_HEX = "0000000000000001"


def traceparent_col(content, span_hex):
    """W3C traceparent `00-<32 hex trace id>-<16 hex span id>-01`,
    built entirely JVM-side. The trace id is sha256(content) — the
    deterministic analog of otel.go's random ids, so a redelivered
    message reconstructs the same trace."""
    trace_id = F.lower(F.substring(F.sha2(content.cast("string"), 256), 1, 32))
    return F.concat_ws("-", F.lit("00"), trace_id, span_hex, F.lit("01"))


def child_span_hex(parent_traceparent, label: str):
    """Deterministic child span id: sha256(parent traceparent + label)."""
    return F.lower(
        F.substring(F.sha2(F.concat(parent_traceparent, F.lit(label)), 256), 1, 16)
    )


class TraceParent(Processor):
    """Columnar traceparent injection/propagation: if the message has no
    ``traceparent`` meta, create one (root span, otel.go InitSpans);
    else derive this component's child span id and advance the header
    (otel.go:120 PartsWithChildSpans + span.go TextMap). Pure Column
    expressions — zero Python on the hot path."""

    def __init__(self, label: str):
        self.label = label

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_meta_col(df)
        existing = F.col(META_COL).getItem(TRACEPARENT_KEY)
        root = traceparent_col(_content_col(df), F.lit(ROOT_SPAN_HEX))
        parent = F.coalesce(existing, root)
        child = F.concat_ws(
            "-",
            F.lit("00"),
            F.substring(parent, 4, 32),
            child_span_hex(parent, self.label),
            F.lit("01"),
        )
        drop = (TRACEPARENT_KEY, PARENT_SPAN_KEY)
        return df.withColumn(
            META_COL,
            F.map_concat(
                F.map_filter(
                    F.col(META_COL),
                    lambda k, _: (k != F.lit(drop[0])) & (k != F.lit(drop[1])),
                ),
                F.create_map(
                    F.lit(TRACEPARENT_KEY), child,
                    F.lit(PARENT_SPAN_KEY), F.substring(parent, 37, 16),
                ),
            ),
        )


# -----------------------------------------------------------------------------
# The tap + traced pipeline assembly
# -----------------------------------------------------------------------------


def _tap(
    df: DataFrame,
    label: str,
    kind: str,
    summary: TracingSummary,
    side: str,
    tracer=None,
    events: bool = True,
) -> DataFrame:
    """Insert one observation stage after/before a component. ``side``
    is "in" (CONSUME at a processor, arrival at an output) or "out"
    (PRODUCE at an input or a processor). ``events=False`` emits spans
    only (the config-wired ``tracer:`` mode — the reference's tracer
    section sets the OTel provider without the RunObserved event
    capture)."""
    events_acc = summary._events
    counts_acc = summary._counts
    limit = summary.event_limit
    etype = EVENT_CONSUME if side == "in" else EVENT_PRODUCE
    has_meta = META_COL in df.columns
    has_err = ERROR_COL in df.columns
    emit_spans = tracer is not None and not isinstance(tracer, NoneTracer)

    tapped = df.withColumn(_CONTENT, _content_col(df))
    schema = df.schema

    def observe(it: Iterator) -> Iterator:
        import pandas as pd  # noqa: F401  (worker-side)

        for pdf in it:
            n = len(pdf)
            if events:
                counts: dict = {(label, side): n}
                if has_err:
                    n_err = int(pdf[ERROR_COL].notna().sum())
                    counts[(label, f"err_{side}")] = n_err
                counts_acc.add(counts)
                take = n if limit <= 0 else min(n, limit)
                evs = []
                metas = pdf[META_COL].tolist()[:take] if has_meta else [None] * take
                for content, meta in zip(pdf[_CONTENT].tolist()[:take], metas):
                    meta_json = json.dumps(dict(meta)) if meta else ""
                    evs.append((label, kind, etype, content or "", meta_json))
                if has_err and side == "out" and kind == "processor":
                    failed = pdf[pdf[ERROR_COL].notna()]
                    for content, err in zip(
                        failed[_CONTENT].tolist()[:take],
                        failed[ERROR_COL].tolist()[:take],
                    ):
                        evs.append((label, kind, EVENT_ERROR, str(err), ""))
                if evs:
                    events_acc.add(evs)
            if emit_spans and has_meta and n:
                now = time.time()
                spans, seen = [], set()
                for m in pdf[META_COL].tolist():
                    tp = (m or {}).get(TRACEPARENT_KEY)
                    if not tp or tp in seen:
                        continue
                    seen.add(tp)
                    parts = tp.split("-")
                    if len(parts) == 4:
                        spans.append(
                            {
                                "trace_id": parts[1],
                                "span_id": parts[2],
                                "parent_span_id": (m or {}).get(PARENT_SPAN_KEY),
                                "name": label,
                                "kind": kind,
                                "ts": now,
                            }
                        )
                tracer.emit(spans)
            yield pdf.drop(columns=[_CONTENT])

    summary._kinds[label] = kind
    return tapped.mapInPandas(observe, schema)


class _TracedProcessor(Processor):
    """CONSUME-tap → wrapped processor → PRODUCE-tap (bundle/tracing/
    processor.go:17 traceProcessor). With a tracer, the wrapped stage is
    preceded by columnar traceparent advancement so its PRODUCE events
    and spans carry this component's child span."""

    def __init__(self, label: str, wrapped: Processor, summary: TracingSummary, tracer=None,
                 events: bool = True):
        self.label = label
        self.wrapped = wrapped
        self.summary = summary
        self.tracer = tracer
        self.events = events

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(ensure_meta_col(df))
        if self.events:
            df = _tap(df, self.label, "processor", self.summary, "in")
        if self.tracer is not None and not isinstance(self.tracer, NoneTracer):
            df = TraceParent(self.label)(df)
        df = self.wrapped(df)
        df = ensure_error_col(ensure_meta_col(df))
        return _tap(df, self.label, "processor", self.summary, "out",
                    tracer=self.tracer, events=self.events)


class _TracedSource:
    """PRODUCE-tap after the wrapped source (bundle/tracing/input.go:20).
    Root spans start here when a tracer is configured."""

    def __init__(self, label: str, wrapped, summary: TracingSummary, tracer=None,
                 events: bool = True):
        self.label = label
        self.wrapped = wrapped
        self.summary = summary
        self.tracer = tracer
        self.events = events

    @property
    def streaming(self):
        return self.wrapped.streaming

    def __getattr__(self, name):
        return getattr(self.wrapped, name)

    def read(self, spark) -> DataFrame:
        df = self.wrapped.read(spark)
        df = ensure_error_col(ensure_meta_col(df))
        if self.tracer is not None and not isinstance(self.tracer, NoneTracer):
            df = TraceParent(self.label)(df)
        return _tap(df, self.label, "input", self.summary, "out",
                    tracer=self.tracer, events=self.events)


class _TracedSink:
    """CONSUME-tap before the wrapped sink (bundle/tracing/output.go:16).
    Wraps the ``sink(df, batch_id)`` callable our pipelines use; the tap
    is part of the batch's plan, so counts commit with the batch."""

    def __init__(self, label: str, wrapped, summary: TracingSummary, tracer=None,
                 events: bool = True):
        self.label = label
        self.wrapped = wrapped
        self.summary = summary
        self.tracer = tracer
        self.events = events

    def __call__(self, df: DataFrame, batch_id: int = 0):
        df = ensure_error_col(ensure_meta_col(df))
        df = _tap(df, self.label, "output", self.summary, "in",
                  tracer=self.tracer, events=self.events)
        return self.wrapped(df, batch_id)

    def __getattr__(self, name):
        return getattr(self.wrapped, name)


def traced(
    pipeline,
    spark: SparkSession,
    sink=None,
    event_limit: int = 100,
    tracer=None,
    labels: list[str] | None = None,
    input_label: str = "input",
    output_label: str = "output",
    events: bool = True,
):
    """Wrap a Pipeline (and optionally its sink) for observation —
    the RunObserved / TracingSummary entry point (public/service/
    tracing.go). Returns ``(traced_pipeline, traced_sink, summary)``;
    ``traced_sink`` is None when no sink was given.

    The original pipeline is untouched; run the traced one for an
    observed execution, the original for production. ``labels`` names
    the processors (defaults to ``processor_0..n``, or a processor's
    own ``label`` attribute when set)."""
    from benthos_spark.streaming.pipeline import Pipeline

    summary = TracingSummary(spark, event_limit=event_limit)
    procs = []
    for i, p in enumerate(pipeline.processors):
        if labels and i < len(labels):
            label = labels[i]
        else:
            label = getattr(p, "trace_label", None) or f"processor_{i}"
        procs.append(_TracedProcessor(label, p, summary, tracer=tracer, events=events))
    tpipe = Pipeline(
        source=_TracedSource(input_label, pipeline.source, summary, tracer=tracer,
                             events=events),
        processors=procs,
    )
    tsink = (_TracedSink(output_label, sink, summary, tracer=tracer, events=events)
             if sink is not None else None)
    return tpipe, tsink, summary
