"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog
(benthos_spark/plans/catalog.py) for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tumbling-window per-type aggregation over the events
    stream table (the batch analog of the streaming engine's headline
    window pipeline)."""
    return catalog.QUERIES["window_tumbling_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # gate_ordered: the driver's correctness gate samples the FIRST ~50
    # dict entries; this puts a representative of every operator family
    # inside that window (catalog.GATE_PRIORITY) without dropping any.
    return catalog.gate_ordered(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    # The audio/image/video oracles read materialized gate parquet; the
    # driver runs this gate at sf0.01 — make sure the files exist before
    # any oracle executes (pure numpy/pyarrow, no SparkSession needed).
    from benthos_spark.datagen.gate import ensure_gate_tables

    ensure_gate_tables("sf0.01")
    return catalog.gate_ordered(catalog.ORACLES)
