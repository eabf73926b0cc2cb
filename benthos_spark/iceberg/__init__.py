"""From-scratch Apache Iceberg v2 table format (pure Python + Spark).

The north star targets "an Iceberg table of audio clip + transcript
pairs"; this sandbox has no ``iceberg-spark-runtime`` jar, so the table
format itself is implemented here from the PUBLIC spec
(https://iceberg.apache.org/spec/ — format-version 2): table-metadata
JSON, Avro manifest lists + manifests (via our own pure-python OCF
codec, :mod:`benthos_spark.functions.avro_ocf`), and the
HadoopTableOperations commit protocol (``metadata/v<N>.metadata.json``
created with O_EXCL as the atomic commit point, ``version-hint.text``
as the pointer). Data files are ordinary Spark-written parquet.

Nothing here is a port of the Java implementation — it is the spec's
data structures expressed in Python, validated in tests against the
REAL Java Avro reader that ships with Spark (org.apache.avro via py4j)
so the manifests we write are bytes a standard Avro stack parses.

Reference pipeline semantics being reproduced: the usedatabrew fork's
exactly-once ambitions for its output connectors
(/root/reference/internal/component/output/async_writer.go:85-130) —
here upgraded to true exactly-once via batch-id-stamped snapshot
summaries (sinks/iceberg.py).
"""

from benthos_spark.iceberg.table import (  # noqa: F401
    CommitConflict,
    IcebergTable,
)
