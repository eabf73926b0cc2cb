"""The Pipeline DSL: Source → [Processor] → Sink as ONE DataFrame lineage.

The reference assembles input → buffer → pipeline → output and chains
transaction channels (/root/reference/internal/stream/type.go:98-152);
its embedded `service.StreamBuilder` (public/service/stream_builder.go)
is the API surface we mirror. There is no interpreter here: ``build``
composes a logical plan and Catalyst owns the physical strategy; `start`
hands it to the micro-batch scheduler with a checkpoint (the offset/commit
log replaces the ack graph).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from benthos_spark.operators.processors import Processor, compose
from benthos_spark.sources.readers import Source


@dataclass
class Pipeline:
    source: Source
    processors: Sequence[Processor] = field(default_factory=list)

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """Compose the full logical plan (lazy — nothing runs)."""
        return compose(self.source.read(spark), self.processors)

    # -- batch -------------------------------------------------------------
    def run_batch(self, spark: SparkSession) -> DataFrame:
        return self.dataframe(spark)

    # -- streaming ---------------------------------------------------------
    def start(
        self,
        spark: SparkSession,
        sink: Callable[[DataFrame, int], None],
        checkpoint: str,
        output_mode: str = "append",
        trigger_once: bool = False,
        processing_time: str | None = None,
        query_name: str = "benthos_spark_pipeline",
        metrics_path: str | None = None,
    ) -> StreamingQuery:
        """Start the stream into a ``foreachBatch`` sink (our exactly-once
        commit point). ``trigger_once`` runs all available data then stops
        (used by the kill/resume tests and the bench). ``metrics_path``
        attaches a MetricsListener appending per-batch metrics JSONL there
        (≙ the reference metric names, see streaming/metrics.py)."""
        if metrics_path:
            from benthos_spark.streaming.metrics import attach

            attach(spark, metrics_path)
        df = self.dataframe(spark)
        writer = (
            df.writeStream.outputMode(output_mode)
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .queryName(query_name)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()


def run_to_completion(query: StreamingQuery, timeout_s: float = 600.0) -> None:
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError("streaming query did not finish in time")
    # surface any exception
    if query.exception() is not None:
        raise RuntimeError(str(query.exception()))
