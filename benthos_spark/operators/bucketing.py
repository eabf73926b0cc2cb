"""Bucketed (co-located) tables: the no-shuffle join strategy at 100 TB.

The reference has no storage layer (it streams byte messages), but this
engine's sinks land tables that downstream pipelines re-join — at scale
the dominant cost of a fact⨝fact join is the shuffle of both sides.
Writing both tables bucketed by the join key with the same bucket count
pre-co-locates them: Spark's bucket-aware scan then joins them with
ZERO Exchange on either side (SortMergeJoin over pre-bucketed scans).

This is the standing recommendation for repeatedly-joined 100 TB
tables (e.g. clips ⨝ transcripts by clip_id): pay one bucketed write,
then every subsequent join is shuffle-free and skew-bounded by the
bucket count.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) table. Sorting
    within buckets lets the join skip its Sort too."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the physical plan has no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange — the
    invariant a co-located join must satisfy."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"plan contains a shuffle: {line.strip()}")
