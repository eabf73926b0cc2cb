"""Output-broker sinks (SURVEY.md §2.2): fan-out, switch, round-robin,
fallback, DLQ split — all inside one foreachBatch commit point, each
child independently idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benthos_spark.datagen.clips import CLIPS_SCHEMA, generate_clips
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
from benthos_spark.sinks.routing import (
    DlqSplit,
    DropOn,
    Fallback,
    FanOut,
    RoundRobinSink,
    SwitchSink,
)
from benthos_spark.sources.readers import ParquetSource
from benthos_spark.streaming.pipeline import Pipeline, run_to_completion

N = 120


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("routing_src"))
    generate_clips(spark, N, partitions=3).write.mode("overwrite").parquet(d)
    return d


def _run(spark, src_dir, sink, tmp_path, name):
    pipe = Pipeline(source=ParquetSource(src_dir, streaming=True, schema=CLIPS_SCHEMA))
    q = pipe.start(spark, sink, checkpoint=str(tmp_path / f"{name}_ckpt"), trigger_once=True)
    run_to_completion(q, timeout_s=300)


def test_fan_out_copies_to_all(spark, src_dir, tmp_path):
    a = ExactlyOnceParquetSink(str(tmp_path / "a"))
    b = ExactlyOnceParquetSink(str(tmp_path / "b"))
    _run(spark, src_dir, FanOut(a, b), tmp_path, "fanout")
    assert a.read_committed(spark).count() == N
    assert b.read_committed(spark).count() == N


def test_switch_routes_first_match(spark, src_dir, tmp_path):
    hot = ExactlyOnceParquetSink(str(tmp_path / "hot"))
    rest = ExactlyOnceParquetSink(str(tmp_path / "rest"))
    sink = SwitchSink(cases=[(F.col("codec") == "pcm_s16le", hot)], default=rest)
    _run(spark, src_dir, sink, tmp_path, "switch")
    n_hot = hot.read_committed(spark).count()
    n_rest = rest.read_committed(spark).count()
    assert n_hot + n_rest == N
    assert hot.read_committed(spark).filter(F.col("codec") != "pcm_s16le").count() == 0
    assert rest.read_committed(spark).filter(F.col("codec") == "pcm_s16le").count() == 0


def test_round_robin_partitions_all_rows(spark, src_dir, tmp_path):
    sinks = [ExactlyOnceParquetSink(str(tmp_path / f"rr{i}")) for i in range(3)]
    _run(spark, src_dir, RoundRobinSink(sinks, key="clip_id"), tmp_path, "rr")
    counts = [s.read_committed(spark).count() for s in sinks]
    assert sum(counts) == N
    assert all(c > 0 for c in counts)  # hash-mod spreads the keys
    ids = set()
    for s in sinks:
        ids |= {r["clip_id"] for r in s.read_committed(spark).select("clip_id").collect()}
    assert len(ids) == N  # disjoint, complete


def test_fallback_uses_second_on_failure(spark, src_dir, tmp_path):
    calls = []

    def failing(df, batch_id):
        calls.append("fail")
        raise RuntimeError("boom")

    ok = ExactlyOnceParquetSink(str(tmp_path / "fb_ok"))
    _run(spark, src_dir, Fallback(failing, ok), tmp_path, "fb")
    assert "fail" in calls
    assert ok.read_committed(spark).count() == N


def test_drop_on_swallows_errors(spark, src_dir, tmp_path):
    def failing(df, batch_id):
        raise RuntimeError("boom")

    # must not raise — the query completes with the batch dropped
    _run(spark, src_dir, DropOn(failing), tmp_path, "dropon")


def test_dlq_split(spark, src_dir, tmp_path):
    from benthos_spark.operators.processors import Tag

    main = ExactlyOnceParquetSink(str(tmp_path / "main"))
    dlq = ExactlyOnceParquetSink(str(tmp_path / "dlq"))
    pipe = Pipeline(
        source=ParquetSource(src_dir, streaming=True, schema=CLIPS_SCHEMA),
        processors=[Tag(cond=F.col("dur_ms") > 2000, message=F.lit("too long"))],
    )
    q = pipe.start(spark, DlqSplit(main, dlq), checkpoint=str(tmp_path / "dlq_ckpt"), trigger_once=True)
    run_to_completion(q, timeout_s=300)
    n_main, n_dlq = main.read_committed(spark).count(), dlq.read_committed(spark).count()
    assert n_main + n_dlq == N and n_dlq > 0
    assert "_error" not in main.read_committed(spark).columns
    assert dlq.read_committed(spark).filter(F.col("_error").isNull()).count() == 0


def test_iceberg_sink_gates_cleanly(spark):
    """No Iceberg runtime in this sandbox: the sink must fail loudly with
    guidance (the parquet ledger sink is the drop-in same-protocol
    fallback), not silently mis-commit."""
    import pytest as _pytest

    from benthos_spark.sinks.iceberg import ExactlyOnceIcebergSink, iceberg_available

    assert not iceberg_available(spark)
    sink = ExactlyOnceIcebergSink("cat.db.clips")
    df = spark.range(1)
    with _pytest.raises(NotImplementedError, match="Iceberg runtime"):
        sink(df, 0)


def test_sink_crash_between_write_and_ledger(spark, tmp_path):
    """F5 crash window: data written but ledger missing (crash before the
    atomic rename) — the replay overwrites the stage dir and commits
    exactly once; a half-written .tmp ledger is never visible."""
    import os

    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    df = spark.range(50).selectExpr("id", "id * 2 AS v")
    # simulate: the data write succeeded but the process died pre-commit
    df.write.parquet(os.path.join(sink.data_dir, "_batch_id=7"))
    open(os.path.join(sink.ledger_dir, "7.json.tmp.deadbeef"), "w").write("{partial")
    assert sink.committed_batches() == []  # neither stage nor tmp visible

    sink(df, batch_id=7)  # the replay
    assert sink.committed_batches() == [7]
    assert sink.read_committed(spark).count() == 50
    sink(df, batch_id=7)  # second replay: no-op
    assert sink.committed_rows() == 50


def test_retry_sink_absorbs_transient_failures(spark):
    from benthos_spark.sinks.routing import RetrySink

    df = spark.createDataFrame([(1,)], "v int")
    attempts = []

    def flaky(d, bid):
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")

    RetrySink(flaky, max_retries=3, backoff_s=0.01)(df, 0)
    assert len(attempts) == 3

    def always_fails(d, bid):
        attempts.append(1)
        raise RuntimeError("permanent")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="permanent"):
        RetrySink(always_fails, max_retries=2, backoff_s=0.01)(df, 1)


def test_reject_sink_raises_with_interpolated_error(spark):
    import pytest as _pytest

    from benthos_spark.sinks.routing import RejectSink

    df = spark.createDataFrame([("oops-42",)], "reason string")
    with _pytest.raises(RuntimeError, match="oops-42"):
        RejectSink("concat('err: ', reason)")(df, 7)


def test_inproc_exchange(spark):
    from benthos_spark.sinks.routing import InprocSink, inproc_clear, inproc_read

    inproc_clear()
    df1 = spark.createDataFrame([(1,)], "v int")
    df2 = spark.createDataFrame([(2,)], "v int")
    sink = InprocSink("chan")
    sink(df1, 0)
    sink(df2, 1)
    assert sorted(r["v"] for r in inproc_read("chan").collect()) == [1, 2]
    inproc_clear("chan")


def test_switch_sink_continue_case(spark):
    """output switch `continue: true`: rows passing a continue case are
    also tested against later cases (output_switch.go:160)."""
    from benthos_spark.sinks.routing import SwitchSink

    df = spark.createDataFrame([(1,), (5,), (11,)], "v int")
    got = {}

    def cap(name):
        def sink(d, bid):
            got[name] = sorted(r["v"] for r in d.collect())
        return sink

    SwitchSink(
        cases=[
            ("v > 0", cap("audit"), True),   # continue: everything logs
            ("v > 10", cap("big"), False),
            ("v > 2", cap("mid"), False),
        ],
        default=cap("rest"),
    )(df, 0)
    assert got["audit"] == [1, 5, 11]
    assert got["big"] == [11]
    assert got["mid"] == [5]
    assert got["rest"] == [1]


def test_inproc_batches_are_pinned(spark, tmp_path):
    """A micro-batch frame registered on the exchange must not be
    recomputed from the (moved-on) source when read after later batches."""
    from benthos_spark.sinks.routing import InprocSink, inproc_clear, inproc_read

    inproc_clear()
    src = str(tmp_path / "src")
    spark.createDataFrame([(1,), (2,)], "v int").write.parquet(src)
    sink = InprocSink("pinned")
    sink(spark.read.parquet(src), 0)
    # the source moves on between micro-batches
    spark.createDataFrame([(99,)], "v int").write.mode("overwrite").parquet(src)
    sink(spark.read.parquet(src), 1)
    assert sorted(r["v"] for r in inproc_read("pinned").collect()) == [1, 2, 99]
    inproc_clear("pinned")
