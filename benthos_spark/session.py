"""SparkSession factory tuned for this engine.

Replaces the reference's pipeline-parallelism knobs (``threads`` worker
pipelines, /root/reference/internal/pipeline/pool.go:31-48, and output
``max_in_flight``, internal/component/output/async_writer.go:42-56) with
Spark-native equivalents: task parallelism = cores × partitions, AQE for
runtime re-planning and skew-join handling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "benthos-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions default to ``max(cores, 32)`` — sized so an sf0.1 local
    run has partitions that fit in memory; on a real cluster this would
    be set from the data volume (AQE coalesces the excess).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else None
    master = f"local[{cores}]" if cores else "local[*]"

    # Make the engine importable on executor-side Python workers no matter
    # where the driver was launched from. Workers inherit PYTHONPATH from
    # the JVM (which inherits it from this process at gateway launch), NOT
    # the driver's sys.path — so a driver started outside the repo dir
    # would otherwise die with ModuleNotFoundError the moment a pickled
    # UDF references benthos_spark (and a worker dying mid-handshake can
    # take the local JVM down with it). On a real cluster the same job
    # ships the package via ``spark-submit --py-files`` (the zip built by
    # tools/package.py); this is the local-mode equivalent.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if repo_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + py_path if py_path else "")
        )
    n_shuffle = shuffle_partitions or max(cores or os.cpu_count() or 8, 32)

    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        # UTC everywhere: parquet timestamps must round-trip identically
        # between Spark and the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalescing, join re-planning, skew-join splitting —
        # the scale path for codec/duration skew (SURVEY.md §4 item 2).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # Arrow is the bytes↔structured boundary (the reference's lazy
        # JSON dual-representation, internal/message/data.go:30-65, maps
        # to columnar Arrow batches).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # A/B-measured on this host (tools/bench_scaling.py probes): 2048
        # beats 512 for ~100KB binary rows; forcing extra scan splits
        # (files.minPartitionNum) anti-scales once concurrent Arrow+numpy
        # decoders exceed the host's memory-bandwidth ceiling (~8-12
        # streams), so scan splits are left to Spark's bin-packing.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Vectorized parquet reader: the default 4096-row columnar batch
        # is sized for narrow rows; at ~100KB/row (audio payloads) it
        # reserves ~400MB ON-HEAP PER TASK, and 32 concurrent tasks OOM
        # any reasonable heap. 512 rows ≈ 50MB/task peak — the knob that
        # matters most for binary-column tables at high parallelism.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # Binary audio payloads are large; keep broadcast joins for dims.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_all() -> None:
    """Tear down the active session (used between scaling-bench runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
