"""Observe processor (`log`/`metric` parity via df.observe), read_until,
and rate-limit admission control."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Observation

from benthos_spark.operators.processors import Mutation, Observe, compose
from benthos_spark.sources.readers import GenerateSource, read_until


def test_observe_metrics_batch(spark):
    """`metric` processor (processor_metric.go:24): named aggregates
    observed during the normal pass — no extra job."""
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("v"))
    obs = Observation("m")
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"), F.sum("v").alias("v_sum"))
    out = compose(out, [Mutation({"w": F.col("v") * 2})])
    out.write.mode("overwrite").format("noop").save()
    assert obs.get["rows"] == 1000
    assert obs.get["v_sum"] == sum(i % 7 for i in range(1000))


def test_observe_processor_streaming(spark, tmp_path):
    """Observe inside a pipeline: metrics appear in the streaming
    progress (observedMetrics), readable by the metrics listener."""
    from benthos_spark.datagen.clips import CLIPS_SCHEMA, generate_clips

    src = str(tmp_path / "src")
    generate_clips(spark, 60, partitions=2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(CLIPS_SCHEMA).parquet(src)
    observed = Observe("counts", {"n": F.count(F.lit(1))})(stream)
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        p.observedMetrics["counts"]["n"]
        for p in q.recentProgress
        if "counts" in (p.observedMetrics or {})
    ]
    assert sum(rows) == 60


def test_read_until_stops_stream(spark, tmp_path):
    """`read_until` (input_read_until.go:27): consume the rate stream
    until the progress predicate fires."""
    src = GenerateSource(mapping={"x": "value * 2"}, rows_per_second=500)
    q = (
        src.read(spark)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    seen = {"rows": 0}

    def enough(progress):
        if progress is not None:
            seen["rows"] += progress["numInputRows"]
        return seen["rows"] >= 200

    read_until(q, enough, poll_s=0.2, timeout_s=120)
    assert not q.isActive
    assert seen["rows"] >= 200


def test_admission_control_limits_batch_size(spark, tmp_path):
    """Rate limiting as admission control: maxFilesPerTrigger bounds each
    micro-batch (≙ the reference's rate_limit + batching policy)."""
    from benthos_spark.datagen.clips import CLIPS_SCHEMA, generate_clips

    src = str(tmp_path / "src")
    generate_clips(spark, 90, partitions=6).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA).option("maxFilesPerTrigger", 2).parquet(src)
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sizes = [p.numInputRows for p in q.recentProgress if p.numInputRows > 0]
    assert sum(sizes) == 90
    assert len(sizes) >= 3  # metered into multiple admissions
    assert max(sizes) <= 2 * 90 // 6 + 15  # ~2 files' worth per batch


def test_format_wrappers_gate(spark):
    from benthos_spark.functions import formats

    assert not formats.avro_loaded()
    with pytest.raises(NotImplementedError, match="spark-avro"):
        formats.to_avro(F.struct(F.lit(1)))
