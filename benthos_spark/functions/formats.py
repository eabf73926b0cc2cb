"""Schema'd format conversions — the reference's `avro`/`protobuf`
processors (/root/reference/internal/impl/avro/processor.go:47,
internal/impl/protobuf/processor_protobuf.go:137) and
`schema_registry_encode/decode` (internal/impl/confluent/).

Spark ships native column functions for both (``from_avro``/``to_avro``,
``from_protobuf``/``to_protobuf``); they need their data-source jars on
the classpath, which this offline sandbox does not have. These wrappers
probe at call time and raise actionable errors — the engine-side mapping
is complete, only the jar is environment-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession


def _spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession")
    return s


def avro_loaded() -> bool:
    try:
        _spark()._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def from_avro(col, json_schema: str) -> Column:
    """`avro` processor from_json op — Avro binary → struct."""
    if not avro_loaded():
        raise NotImplementedError(
            "spark-avro jar not on the classpath (offline sandbox) — submit "
            "with --packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    from pyspark.sql.avro.functions import from_avro as _f

    return _f(col, json_schema)


def to_avro(col, json_schema: str | None = None) -> Column:
    """struct → Avro binary."""
    if not avro_loaded():
        raise NotImplementedError(
            "spark-avro jar not on the classpath (offline sandbox) — submit "
            "with --packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    from pyspark.sql.avro.functions import to_avro as _t

    return _t(col) if json_schema is None else _t(col, json_schema)


def protobuf_loaded() -> bool:
    try:
        _spark()._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.CatalystDataToProtobuf"
        )
        return True
    except Exception:
        return False


def from_protobuf(col, message_name: str, desc_file_path: str) -> Column:
    """`protobuf` processor to_json op — protobuf binary → struct."""
    if not protobuf_loaded():
        raise NotImplementedError(
            "spark-protobuf jar not on the classpath (offline sandbox) — "
            "submit with --packages org.apache.spark:spark-protobuf_2.13:<spark-version>"
        )
    from pyspark.sql.protobuf.functions import from_protobuf as _f

    return _f(col, message_name, descFilePath=desc_file_path)


def to_protobuf(col, message_name: str, desc_file_path: str) -> Column:
    if not protobuf_loaded():
        raise NotImplementedError(
            "spark-protobuf jar not on the classpath (offline sandbox) — "
            "submit with --packages org.apache.spark:spark-protobuf_2.13:<spark-version>"
        )
    from pyspark.sql.protobuf.functions import to_protobuf as _t

    return _t(col, message_name, descFilePath=desc_file_path)
