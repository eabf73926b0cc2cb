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

    def run_once(
        self,
        spark: SparkSession,
        sink: Callable[[DataFrame, int], None],
        checkpoint: str,
        drain: bool = True,
        timeout_s: float = 600.0,
        idle_grace_s: float = 5.0,
        **start_kwargs,
    ) -> None:
        """Blocking run-all-available that also FLUSHES watermarked
        windows behind Python data sources — the one-call form of the
        workaround documented in iceberg/source.py.

        Spark skips the final no-data micro-batch for Python data
        sources under Trigger.AvailableNow (the engine warns "does not
        support Trigger.AvailableNow"), so a trigger-once run holds the
        last windows in state forever. Restarting doesn't help either:
        the advanced watermark is only persisted in the NEXT batch's
        offset entry, which a trigger-once run never writes — a restart
        restores the PRE-batch watermark and the no-data flush batch
        never fires. ``drain=True`` therefore runs the whole thing under
        one short processing-time trigger, inside which the watermark
        does advance between ticks, and auto-stops when either

        - an EMPTY micro-batch executed after the last data batch (that
          is the no-data flush batch — closed windows are out), or
        - the query has produced no new progress for ``idle_grace_s``
          (bounded source exhausted and nothing stateful to flush).

        Exactly-once sinks make any extra tick idempotent.
        ``drain=False`` is a plain blocking Trigger.AvailableNow run."""
        import time as _time

        if not drain:
            run_to_completion(
                self.start(spark, sink, checkpoint, trigger_once=True, **start_kwargs),
                timeout_s=timeout_s,
            )
            return
        q = self.start(
            spark, sink, checkpoint, processing_time="100 milliseconds", **start_kwargs
        )
        try:
            deadline = _time.time() + timeout_s
            n_seen = 0
            last_change = _time.time()
            flushed = False
            while _time.time() < deadline:
                if q.exception() is not None:
                    break
                ps = q.recentProgress
                data_ids = [p["batchId"] for p in ps if p["numInputRows"] > 0]
                if data_ids and any(
                    p["numInputRows"] == 0 and p["batchId"] > max(data_ids) for p in ps
                ):
                    flushed = True
                    break
                status = q.status
                busy = status.get("isTriggerActive") or status.get("isDataAvailable")
                if len(ps) != n_seen or busy:
                    n_seen = len(ps)
                    last_change = _time.time()
                elif _time.time() - last_change > idle_grace_s:
                    break  # exhausted + nothing stateful pending
                _time.sleep(0.2)
            else:
                raise TimeoutError("run_once drain saw neither a flush batch nor idleness")
        finally:
            q.stop()
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))


def run_to_completion(query: StreamingQuery, timeout_s: float = 600.0) -> None:
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError("streaming query did not finish in time")
    # surface any exception
    if query.exception() is not None:
        raise RuntimeError(str(query.exception()))
