"""benthos_spark — a PySpark-native streaming/analytics engine.

A from-scratch re-expression of the pipeline semantics of
usedatabrew/benthos (input → processor chain → output, windowing,
per-message mapping, transactional delivery) as idiomatic PySpark:
DataFrame lineage + Structured Streaming + vectorized pandas/Arrow UDFs.

Architecture (vs the reference's goroutine/channel engine,
/root/reference/internal/stream/type.go:22-34):

- A *message* is a typed Row; a *batch* is a micro-batch partition.
- Processors are ``DataFrame -> DataFrame`` functions; Catalyst replaces
  the reference's per-message interpreter with whole-stage codegen.
- Acks/transactions become the Structured Streaming offset+commit log;
  exactly-once delivery is an idempotent ``foreachBatch`` sink keyed by
  ``batchId`` (see :mod:`benthos_spark.sinks.exactly_once`).
"""

__version__ = "0.1.0"

from benthos_spark.session import get_spark  # noqa: F401


def __getattr__(name):
    """Lazy top-level API: keep `import benthos_spark` light (no Spark
    touch) while exposing the common surface at the package root."""
    surface = {
        "Pipeline": ("benthos_spark.streaming.pipeline", "Pipeline"),
        "run_to_completion": ("benthos_spark.streaming.pipeline", "run_to_completion"),
        "ExactlyOnceParquetSink": ("benthos_spark.sinks.exactly_once", "ExactlyOnceParquetSink"),
        "ParquetSource": ("benthos_spark.sources.readers", "ParquetSource"),
        "compile_config": ("benthos_spark.config", "compile_config"),
        "run_config": ("benthos_spark.config", "run_config"),
        "BloblangMapping": ("benthos_spark.bloblang", "BloblangMapping"),
        "BloblangMutation": ("benthos_spark.bloblang", "BloblangMutation"),
        "parse_mapping": ("benthos_spark.bloblang", "parse_mapping"),
        "JqProgram": ("benthos_spark.functions.jq_program", "JqProgram"),
        "JmesProgram": ("benthos_spark.functions.jmespath_program", "JmesProgram"),
        "SqlSelect": ("benthos_spark.operators.sql", "SqlSelect"),
        "write_bucketed": ("benthos_spark.operators.bucketing", "write_bucketed"),
        "bucketed_join": ("benthos_spark.operators.bucketing", "bucketed_join"),
        "ExactlyOnceBucketedTableSink": (
            "benthos_spark.sinks.exactly_once", "ExactlyOnceBucketedTableSink"
        ),
    }
    if name in surface:
        import importlib

        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'benthos_spark' has no attribute {name!r}")
