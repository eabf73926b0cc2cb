"""Exactly-once table sink: idempotent ``foreachBatch`` commits.

The reference is at-least-once — acks flow back through the transaction
graph and a redelivered batch is simply written again
(/root/reference/README.md:34-36; internal/component/output/
async_writer.go:85-130). The north rule demands exactly-once, which in
Spark is: the Structured Streaming offset log replays a failed micro-batch
with the SAME ``batch_id``, so a sink that commits each ``batch_id`` at
most once — atomically — yields end-to-end exactly-once.

Design (Iceberg-shaped, portable to ``wap.id`` snapshot commits; this
sandbox has no Iceberg runtime jar so the transaction log is a minimal
file ledger with the same semantics):

- data files land under ``data/_batch_id=<id>/`` (overwrite ⇒ replays of
  the same batch are self-cleaning, like an Iceberg WAP re-stage),
- the commit point is an atomic rename of ``ledger/<id>.json.tmp`` →
  ``ledger/<id>.json`` recording the batch's lineage: per-partition row
  counts + min/max event time (the "per-partition lineage" the north rule
  asks to persist alongside the checkpoint),
- readers see ONLY ledgered batches (``read_committed``).

A batch that was written but not ledgered (crash between the two) is
rewritten by the replay — overwrite makes that idempotent, and the ledger
rename is the single atomic commit point.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(
        self,
        out_dir: str,
        lineage_cols: tuple[str, ...] = (),
        partition_by: tuple[str, ...] = (),
        max_records_per_file: int | None = None,
    ):
        """``partition_by`` adds hive-style table partitioning inside each
        batch dir (at 100 TB the output table is partitioned — readers
        prune on the partition columns); ``max_records_per_file`` bounds
        file sizes for wide binary rows."""
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.ledger_dir = os.path.join(out_dir, "ledger")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.ledger_dir, exist_ok=True)
        self.lineage_cols = lineage_cols
        self.partition_by = partition_by
        self.max_records_per_file = max_records_per_file

    # -- foreachBatch hook ------------------------------------------------
    def __call__(self, df: DataFrame, batch_id: int) -> None:
        ledger_path = os.path.join(self.ledger_dir, f"{batch_id}.json")
        if os.path.exists(ledger_path):
            return  # replayed batch already committed — exactly-once skip
        batch_dir = os.path.join(self.data_dir, f"_batch_id={batch_id}")
        stats_exprs = [F.count(F.lit(1)).alias("rows")]
        for c in self.lineage_cols:
            stats_exprs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        df = df.persist()
        try:
            writer = df.write.mode("overwrite")
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            if self.max_records_per_file:
                writer = writer.option("maxRecordsPerFile", self.max_records_per_file)
            writer.parquet(batch_dir)
            lineage = [
                {k: (v.isoformat() if hasattr(v, "isoformat") else v) for k, v in r.asDict().items()}
                for r in df.groupBy(F.spark_partition_id().alias("partition")).agg(*stats_exprs).collect()
            ]
        finally:
            df.unpersist()
        tmp = ledger_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "batch_id": batch_id,
                    "committed_at": time.time(),
                    "rows": int(sum(p["rows"] for p in lineage)),
                    "partitions": lineage,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, ledger_path)  # the atomic commit point

    # -- read side ---------------------------------------------------------
    def committed_batches(self) -> list[int]:
        return sorted(
            int(name[: -len(".json")])
            for name in os.listdir(self.ledger_dir)
            if name.endswith(".json")
        )

    def committed_rows(self) -> int:
        total = 0
        for b in self.committed_batches():
            with open(os.path.join(self.ledger_dir, f"{b}.json")) as f:
                total += json.load(f)["rows"]
        return total

    def read_committed(self, spark: SparkSession) -> DataFrame:
        batches = self.committed_batches()
        if not batches:
            raise ValueError("no committed batches")
        dirs = [os.path.join(self.data_dir, f"_batch_id={b}") for b in batches]
        # `_batch_id` is commit-protocol bookkeeping, not table schema
        return spark.read.option("basePath", self.data_dir).parquet(*dirs).drop("_batch_id")

    def lineage(self) -> list[dict]:
        out = []
        for b in self.committed_batches():
            with open(os.path.join(self.ledger_dir, f"{b}.json")) as f:
                out.append(json.load(f))
        return out


class ExactlyOnceBucketedTableSink:
    """Exactly-once append into a BUCKETED managed table.

    Same commit protocol as :class:`ExactlyOnceParquetSink` (ledger file
    = atomic commit point, replays self-clean), but the data lands in a
    table partitioned by ``_batch_id`` and bucketed by ``bucket_cols`` —
    so every downstream join on the bucket key is shuffle-free
    (operators/bucketing.py). Replays overwrite their own ``_batch_id``
    partition (dynamic partition overwrite), keeping the write
    idempotent. This is the in-sandbox analogue of the Iceberg
    exactly-once sink with a bucket-partitioned table spec.
    """

    def __init__(self, table: str, ledger_dir: str, bucket_cols: tuple[str, ...],
                 n_buckets: int = 16):
        self.table = table
        self.ledger_dir = ledger_dir
        os.makedirs(ledger_dir, exist_ok=True)
        self.bucket_cols = bucket_cols
        self.n_buckets = n_buckets

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        ledger_path = os.path.join(self.ledger_dir, f"{batch_id}.json")
        if os.path.exists(ledger_path):
            return  # exactly-once skip
        spark = df.sparkSession
        staged = df.withColumn("_batch_id", F.lit(batch_id))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            if not spark.catalog.tableExists(self.table):
                (
                    staged.write.mode("overwrite")
                    .partitionBy("_batch_id")
                    .bucketBy(self.n_buckets, *self.bucket_cols)
                    .sortBy(*self.bucket_cols)
                    .format("parquet")
                    .saveAsTable(self.table)
                )
            else:
                # dynamic overwrite of THIS batch's partition only —
                # replay-idempotent, other batches untouched
                staged.write.mode("overwrite").insertInto(self.table)
            rows = spark.table(self.table).filter(F.col("_batch_id") == batch_id).count()
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        tmp = ledger_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "committed_at": time.time(), "rows": rows}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, ledger_path)

    def committed_batches(self) -> list[int]:
        return sorted(
            int(name[: -len(".json")])
            for name in os.listdir(self.ledger_dir)
            if name.endswith(".json")
        )

    def read_committed(self, spark: SparkSession) -> DataFrame:
        batches = self.committed_batches()
        return (
            spark.table(self.table)
            .filter(F.col("_batch_id").isin(batches))
            .drop("_batch_id")
        )
