"""Skew handling: salted repartition + two-phase aggregation + key-skew
diagnostics.

The north rule requires explicit handling of codec- and duration-induced
skew (the synthetic clips table makes `pcm_s16le` a 55% hot key and
durations long-tailed by construction, datagen/clips.py). The reference
has no shuffle so no analogue — this is Spark-native work (SURVEY.md §4
"custom work" item 2):

- **AQE skew-join splitting** is on by default (session.py) and handles
  skewed JOINS at runtime.
- **Salting** here handles skewed AGGREGATIONS and hot-key repartitions
  that AQE cannot split (a single group-by key must land on one reducer
  unless the aggregation is algebraic and two-phased).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_repartition(
    df: DataFrame, keys: Sequence[str], buckets: int, num_partitions: int | None = None
) -> DataFrame:
    """Spread each hot key over ``buckets`` partitions: repartition by
    (keys..., salt). The salt is a deterministic hash of the full row
    spread into ``buckets`` — not rand(), so retried tasks land rows in
    the same partition (replay-stable, required under exactly-once).
    Pass ``num_partitions`` to pin the physical partition count (an
    explicit count also stops AQE from coalescing the spread away on
    small inputs)."""
    salt = F.pmod(F.hash(F.struct(*df.columns)), F.lit(buckets))
    cols = [F.col(k) for k in keys] + [F.col(SALT_COL)]
    salted = df.withColumn(SALT_COL, salt)
    out = salted.repartition(num_partitions, *cols) if num_partitions else salted.repartition(*cols)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for algebraic aggregates over skewed keys:
    phase 1 aggregates (keys, salt) — the hot key's rows split over
    ``buckets`` reducers — phase 2 merges the partials per key.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr), e.g.::

        {"n":   (F.count(F.lit(1)),  F.sum("n")),
         "total": (F.sum("value"),   F.sum("total")),
         "mx":  (F.max("value"),     F.max("mx"))}

    (Spark's hash aggregate already does map-side partials for built-in
    aggregates; explicit salting matters when the per-key state is large
    — collect_list/distinct-ish — or the reducer key count is tiny.)
    """
    salt = F.pmod(F.hash(F.struct(*df.columns)), F.lit(buckets))
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(*keys, SALT_COL)
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def key_histogram(df: DataFrame, keys: Sequence[str], top: int = 20) -> DataFrame:
    """Skew diagnostic: per-key row counts + share of total, descending —
    feed the hot keys into `salted_repartition` buckets sizing."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n")).collect()[0][0]
    return (
        counts.withColumn("share", F.round(F.col("n") / F.lit(total), 4))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def skew_factor(df: DataFrame, keys: Sequence[str]) -> float:
    """max-key-share × key-count: 1.0 = perfectly uniform, >>1 = skewed
    (a quick planning heuristic: salt when factor > ~4)."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    row = counts.agg(F.max("n").alias("mx"), F.sum("n").alias("total"), F.count(F.lit(1)).alias("k")).collect()[0]
    return float(row["mx"] / row["total"] * row["k"])
