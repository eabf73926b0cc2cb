"""Spark StructType <-> Iceberg schema JSON (spec "Schemas and Data Types").

Iceberg identifies every column by an integer field-id; names are
aliases. ``to_iceberg_schema`` assigns ids depth-first in field order
(the same order Iceberg's own schema assignment visitor uses) and
returns the schema JSON dict plus the highest id assigned
(``last-column-id`` in the table metadata).

Only the types our engine writes through Spark parquet are mapped;
anything else raises rather than mislabeling.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}


def _spark_to_iceberg_type(dt: T.DataType, next_id: list[int]) -> Any:
    if isinstance(dt, T.StructType):
        fields = []
        # ids for this struct's direct fields are assigned before
        # descending (Iceberg's fresh-id assignment order)
        ids = []
        for f in dt.fields:
            ids.append(next_id[0])
            next_id[0] += 1
        for f, fid in zip(dt.fields, ids):
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_to_iceberg_type(f.dataType, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    if isinstance(dt, T.ArrayType):
        eid = next_id[0]
        next_id[0] += 1
        return {
            "type": "list",
            "element-id": eid,
            "element": _spark_to_iceberg_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid = next_id[0]
        vid = next_id[0] + 1
        next_id[0] += 2
        return {
            "type": "map",
            "key-id": kid,
            "key": _spark_to_iceberg_type(dt.keyType, next_id),
            "value-id": vid,
            "value": _spark_to_iceberg_type(dt.valueType, next_id),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.TimestampType):
        return "timestamptz"  # Spark TimestampType is UTC-normalized
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ShortType) or isinstance(dt, T.ByteType):
        return "int"  # Iceberg has no 8/16-bit ints; parquet stores int32
    for name, t in _PRIMITIVES.items():
        if dt == t:
            return name
    raise ValueError(f"no Iceberg mapping for Spark type {dt!r}")


def to_iceberg_schema(spark_schema: T.StructType, schema_id: int = 0) -> tuple[dict, int]:
    """Returns (schema JSON dict, last-column-id)."""
    next_id = [1]
    struct = _spark_to_iceberg_type(spark_schema, next_id)
    return (
        {"type": "struct", "schema-id": schema_id, "fields": struct["fields"]},
        next_id[0] - 1,
    )


def _iceberg_to_spark_type(t: Any) -> T.DataType:
    if isinstance(t, dict):
        if t["type"] == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], _iceberg_to_spark_type(f["type"]), not f["required"]
                    )
                    for f in t["fields"]
                ]
            )
        if t["type"] == "list":
            return T.ArrayType(
                _iceberg_to_spark_type(t["element"]), not t["element-required"]
            )
        if t["type"] == "map":
            return T.MapType(
                _iceberg_to_spark_type(t["key"]),
                _iceberg_to_spark_type(t["value"]),
                not t["value-required"],
            )
        raise ValueError(f"unknown nested type {t!r}")
    if t == "timestamptz":
        return T.TimestampType()
    if t == "timestamp":
        return T.TimestampNTZType()
    if isinstance(t, str) and t.startswith("decimal("):
        p, s = t[8:-1].split(",")
        return T.DecimalType(int(p), int(s))
    if t in _PRIMITIVES:
        return _PRIMITIVES[t]
    raise ValueError(f"unknown Iceberg type {t!r}")


def to_spark_schema(schema_json: dict) -> T.StructType:
    return _iceberg_to_spark_type({"type": "struct", "fields": schema_json["fields"]})


def field_id_of(schema_json: dict, name: str) -> int:
    for f in schema_json["fields"]:
        if f["name"] == name:
            return f["id"]
    raise KeyError(name)
