"""Skew handling (north rule: codec/duration skew): salting must change
the physical distribution without changing the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from benthos_spark.datagen.clips import generate_clips
from benthos_spark.operators.skew import (
    key_histogram,
    salted_agg,
    salted_repartition,
    skew_factor,
)


def test_salted_agg_matches_plain(spark):
    ev = spark.range(10_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 7 % 100).alias("v")
    )
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in ev.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            ev,
            keys=["k"],
            aggs={
                "n": (F.count(F.lit(1)), F.sum("n")),
                "s": (F.sum("v"), F.sum("s")),
                "mx": (F.max("v"), F.max("mx")),
            },
            buckets=16,
        ).collect()
    }
    assert plain == salted


def test_salted_repartition_spreads_hot_key(spark):
    # one hot key: unsalted repartition puts everything in one partition
    df = spark.range(5_000).select(F.lit("hot").alias("k"), F.col("id"))
    unsalted = df.repartition(8, F.col("k"))
    salted = salted_repartition(df, ["k"], buckets=8, num_partitions=8)
    nonempty = lambda d: sum(1 for n in d.rdd.glom().map(len).collect() if n > 0)
    assert nonempty(unsalted) == 1
    assert nonempty(salted) >= 4  # spread across buckets


def test_skew_diagnostics_on_clips(spark):
    clips = generate_clips(spark, 3000, partitions=4).select("codec")
    hist = {r["codec"]: r["share"] for r in key_histogram(clips, ["codec"]).collect()}
    assert hist["pcm_s16le"] > 0.5  # the constructed hot key
    assert skew_factor(clips, ["codec"]) > 2.0  # flagged as skewed


def test_skew_factor_uniform(spark):
    df = spark.range(1000).select((F.col("id") % 10).alias("k"))
    assert abs(skew_factor(df, ["k"]) - 1.0) < 0.05
