"""Iceberg exactly-once sink — the production shape of
:class:`~benthos_spark.sinks.exactly_once.ExactlyOnceParquetSink`,
now backed by our from-scratch Iceberg v2 tables
(:mod:`benthos_spark.iceberg`) so it runs WITHOUT the Iceberg jar.

Commit protocol, per micro-batch, keyed by ``batch_id``:

- idempotence: the batch_id is stamped into the Iceberg snapshot
  summary (``wap.id``-style); a replayed batch finds its id in the
  snapshot log and skips,
- lineage: per-partition row counts + min/max of the lineage columns go
  into the snapshot summary properties (Iceberg snapshots ARE the
  ledger the north rule asks for),
- atomicity: the Iceberg version-file commit (O_EXCL create) is the
  single commit point — a crash between data staging and commit leaves
  only unreachable files, which the replay re-stages.

Reference: the fork's at-least-once output writers
(/root/reference/internal/component/output/async_writer.go:85-130)
upgraded to exactly-once via Structured Streaming's stable batch ids.

When a real ``iceberg-spark-runtime`` IS on the classpath, pass a
catalog table name (``cat.db.tbl``) instead of a filesystem path and
the sink uses the native ``writeTo`` path with the same summary-keyed
idempotence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benthos_spark.iceberg import IcebergTable

BATCH_PROP = "benthos-spark.batch-id"
LINEAGE_PROP = "benthos-spark.lineage"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j attribute access is lazy (returns a JavaPackage even for
        # missing classes) — force an actual classload.
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


class ExactlyOnceIcebergSink:
    """``foreachBatch`` hook writing to an Iceberg table with
    batchId-keyed idempotence.

    ``table``: a filesystem path → from-scratch native tables (no jar
    needed); a dotted catalog name → the Spark/Iceberg runtime path
    (requires the jar).
    """

    def __init__(
        self,
        table: str,
        lineage_cols: tuple[str, ...] = (),
        partition_by: tuple[str, ...] = (),
    ):
        self.table = table
        self.lineage_cols = lineage_cols
        self.partition_by = partition_by

    # -- native (from-scratch) path ---------------------------------------

    def _load_or_create(self, df: DataFrame) -> IcebergTable:
        if IcebergTable.exists(self.table):
            return IcebergTable.load(self.table)
        return IcebergTable.create(self.table, df.schema, partition_by=self.partition_by)

    def _committed_native(self, t: IcebergTable) -> set[int]:
        out = set()
        for s in t.metadata["snapshots"]:
            v = s["summary"].get(BATCH_PROP)
            if v is not None:
                out.add(int(v))
        return out

    def _lineage_summary(self, df: DataFrame) -> str:
        import json

        stats_exprs = [F.count(F.lit(1)).alias("rows")]
        for c in self.lineage_cols:
            stats_exprs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        rows = (
            df.groupBy(F.spark_partition_id().alias("partition"))
            .agg(*stats_exprs)
            .collect()
        )
        return json.dumps(
            [
                {
                    k: (v.isoformat() if hasattr(v, "isoformat") else v)
                    for k, v in r.asDict().items()
                }
                for r in rows
            ]
        )

    # -- foreachBatch hook -------------------------------------------------

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        if os.sep in self.table:
            t = self._load_or_create(df)
            if batch_id in self._committed_native(t):
                return  # replay of a committed batch — exactly-once skip
            summary = {BATCH_PROP: str(batch_id)}
            if self.lineage_cols:
                df = df.persist()
            try:
                if self.lineage_cols:
                    summary[LINEAGE_PROP] = self._lineage_summary(df)
                t.append(df, summary)
            finally:
                if self.lineage_cols:
                    df.unpersist()
            return
        # catalog-name path: needs the runtime jar
        if not iceberg_available(spark):
            raise NotImplementedError(
                "Iceberg runtime not on the classpath — pass a filesystem "
                "path to use the built-in from-scratch Iceberg tables, or "
                "add iceberg-spark-runtime + a catalog config"
            )
        committed = {
            int(v)
            for (v,) in spark.sql(
                f"SELECT summary['{BATCH_PROP}'] FROM {self.table}.snapshots"
            ).collect()
            if v is not None
        }
        if batch_id in committed:
            return
        (
            df.writeTo(self.table)
            .option("snapshot-property." + BATCH_PROP, str(batch_id))
            .append()
        )

    # -- read side ---------------------------------------------------------

    def read_committed(self, spark: SparkSession) -> DataFrame:
        if os.sep in self.table:
            return IcebergTable.load(self.table).scan(spark)
        return spark.read.table(self.table)

    def lineage(self) -> list[dict]:
        """Per-batch lineage records from the snapshot summaries."""
        import json

        if os.sep not in self.table:
            raise NotImplementedError("lineage() is for native-path tables")
        t = IcebergTable.load(self.table)
        out = []
        for s in t.metadata["snapshots"]:
            if BATCH_PROP in s["summary"]:
                out.append(
                    {
                        "batch_id": int(s["summary"][BATCH_PROP]),
                        "snapshot_id": s["snapshot-id"],
                        "rows": int(s["summary"].get("added-records", 0)),
                        "partitions": json.loads(s["summary"].get(LINEAGE_PROP, "[]")),
                    }
                )
        return out
