"""`mongodb` input/output/processor (internal/impl/mongodb/input.go,
output.go, processor.go) over the from-scratch BSON + OP_MSG driver in
benthos_spark/functions/bson_proto.py.

Spark shape:

- **input**: a `find` snapshot. With ``splits`` (boundary values on an
  indexed ``split_key``) the read fans out — one Spark partition per
  key range, each executor issuing its own range find (the classic
  partitioned-JDBC pattern, operators/sql.py); without splits it is a
  single-partition read with a documented driver-size guard.
- **output**: per-partition connections; `insert` documents or `upsert`
  by a key column ($set replacement — replays idempotent by key).
- **processor**: per-message `find-one` enrichment in one Arrow stage
  (per-partition client). Like the `http`/`redis` processors this is a
  per-message network escape hatch by contract — bulk enrichment at
  scale should snapshot the collection through the INPUT and join.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.bson_proto import MongoClient
from benthos_spark.operators.processors import Processor
from benthos_spark.sources.readers import Source


@dataclass
class MongoSource(Source):
    url: str = ""
    database: str = "test"
    collection: str = ""
    filter: Optional[dict] = None
    split_key: Optional[str] = None
    splits: Sequence[Any] = ()
    max_driver_rows: int = 1_000_000
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        url, db, coll = self.url, self.database, self.collection
        base_filter = dict(self.filter or {})
        if self.split_key and self.splits:
            bounds = list(self.splits)
            ranges: list[dict] = []
            for i in range(len(bounds) + 1):
                cond: dict = {}
                if i > 0:
                    cond["$gte"] = bounds[i - 1]
                if i < len(bounds):
                    cond["$lt"] = bounds[i]
                ranges.append({**base_filter, self.split_key: cond})

            def fetch(rng: dict):
                client = MongoClient(url, db=db)
                try:
                    for d in client.find(coll, filter=rng):
                        yield (json.dumps(d, sort_keys=True),)
                finally:
                    client.close()

            rdd = spark.sparkContext.parallelize(ranges, len(ranges)).flatMap(fetch)
            return spark.createDataFrame(rdd, "value string")
        client = MongoClient(url, db=db)
        try:
            docs = client.find(coll, filter=base_filter, limit=self.max_driver_rows + 1)
            if len(docs) > self.max_driver_rows:
                raise ValueError(
                    f"mongodb input: unsplit find returned more than "
                    f"{self.max_driver_rows} rows — pass split_key+splits for a "
                    "distributed range read")
            return spark.createDataFrame(
                [(json.dumps(d, sort_keys=True),) for d in docs], "value string")
        finally:
            client.close()


class MongoSink:
    """`mongodb` output: `insert-one` per row, or `upsert` keyed by
    ``key_col`` (update with $set of the parsed document, upsert=True —
    replay-idempotent)."""

    def __init__(self, url: str, database: str, collection: str,
                 col: str = "value", operation: str = "insert",
                 key_col: Optional[str] = None):
        if operation not in ("insert", "upsert"):
            raise ValueError(f"mongodb operation {operation!r} (want insert|upsert)")
        if operation == "upsert" and not key_col:
            raise ValueError("mongodb upsert needs key_col")
        self.url, self.database, self.collection = url, database, collection
        self.col, self.operation, self.key_col = col, operation, key_col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, db, coll = self.url, self.database, self.collection
        col, op, key_col = self.col, self.operation, self.key_col
        cols = [col] + ([key_col] if key_col else [])

        def write_partition(rows):
            client = None
            try:
                pending = []
                for row in rows:
                    if client is None:
                        client = MongoClient(url, db=db)
                    v = row[col]
                    doc = json.loads(v if isinstance(v, str)
                                     else bytes(v).decode("utf-8", "replace"))
                    if op == "insert":
                        pending.append(doc)
                        if len(pending) >= 200:
                            client.insert_many(coll, pending)
                            pending = []
                    else:
                        client.update_many(coll, {key_col: row[key_col]},
                                           {"$set": doc}, upsert=True)
                if client is not None and pending:
                    client.insert_many(coll, pending)
            finally:
                if client is not None:
                    client.close()

        df.select(*cols).foreachPartition(write_partition)


@dataclass
class MongoFindOne(Processor):
    """`mongodb` processor operation find-one: look up one document per
    message by ``key_col`` and attach it as JSON in ``result_col``
    (null when missing)."""

    url: str = ""
    database: str = "test"
    collection: str = ""
    key_field: str = "_id"
    key_col: str = "key"
    result_col: str = "mongo_doc"

    def __call__(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.types import StringType, StructField, StructType

        url, db, coll = self.url, self.database, self.collection
        key_field, key_col, result_col = self.key_field, self.key_col, self.result_col
        out_schema = StructType(list(df.schema.fields) + [StructField(result_col, StringType())])
        names = [f.name for f in out_schema.fields]

        def run(batches):
            client = MongoClient(url, db=db)
            try:
                for pdf in batches:
                    results = []
                    for _, row in pdf.iterrows():
                        got = client.find(coll, filter={key_field: row[key_col]}, limit=1)
                        results.append(json.dumps(got[0], sort_keys=True) if got else None)
                    pdf[result_col] = results
                    yield pdf[names]
            finally:
                client.close()

        return df.mapInPandas(run, schema=out_schema)
