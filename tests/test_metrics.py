"""MetricsListener: per-batch metrics with the reference's metric names
(input_received/output_sent/processor_latency_ns/batch_created, SURVEY.md
§4 item 3) persisted as JSONL next to the checkpoint."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from benthos_spark.datagen.clips import CLIPS_SCHEMA, generate_clips
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
from benthos_spark.streaming.metrics import MetricsListener, attach, detach
from benthos_spark.streaming.pipeline import Pipeline, run_to_completion
from benthos_spark.sources.readers import ParquetSource


def test_metrics_listener_records_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    generate_clips(spark, 120, partitions=3).write.mode("overwrite").parquet(src)

    metrics_path = str(tmp_path / "metrics" / "metrics.jsonl")
    listener = attach(spark, metrics_path)
    try:
        sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
        pipe = Pipeline(
            source=ParquetSource(src, streaming=True, schema=CLIPS_SCHEMA, max_files_per_trigger=1),
            processors=[],
        )
        q = pipe.start(spark, sink, checkpoint=str(tmp_path / "ckpt"), trigger_once=True)
        run_to_completion(q, timeout_s=300)
        # listener callbacks are async — allow them to drain
        deadline = time.time() + 30
        while time.time() < deadline:
            recs = listener.records()
            progress = [r for r in recs if r["event"] == "progress"]
            if sum(r["input_received"] for r in progress) >= 120 and any(
                r["event"] == "terminated" for r in recs
            ):
                break
            time.sleep(0.5)
    finally:
        detach(spark, listener)

    recs = listener.records()
    progress = [r for r in recs if r["event"] == "progress"]
    assert sum(r["input_received"] for r in progress) == 120
    assert all(r["processor_latency_ns"] >= 0 for r in progress)
    assert any(r["event"] == "started" for r in recs)
    data_batches = [r for r in progress if r["input_received"] > 0]
    assert len(data_batches) >= 3  # one file per trigger
    assert listener.totals["batch_created"] == len(progress)
