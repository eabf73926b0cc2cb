"""`couchbase` processor + cache (internal/impl/couchbase/processor.go,
cache.go) over the from-scratch KV binary-protocol client in
benthos_spark/functions/couchbase_proto.py.

- **processor**: per-message KV operation — get | insert | replace |
  upsert | remove — with the document id from ``id_col`` (the
  reference's interpolated `id` field) and content from ``content_col``
  for the store ops ("each must have the content property set",
  processor.go:29). `get` replaces the message content with the fetched
  document; misses set the ``_error`` column like the reference's
  errored-message path. One connection per Arrow batch partition.
- **cache**: get/set/add/delete straight onto the KV verbs; `add` is
  the protocol's atomic ADD (KEY_EEXISTS on conflict)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from benthos_spark.functions.couchbase_proto import (CouchbaseClient,
                                                     CouchbaseError)
from benthos_spark.operators.cache import Cache

_OPERATIONS = ("get", "insert", "replace", "upsert", "remove")


class CouchbaseProcessor:
    """KV operation per message (escape hatch by contract, like the
    reference's — not a hot-path operator)."""

    def __init__(self, url: str, bucket: str = "default",
                 username: str = "", password: str = "",
                 operation: str = "get", id_col: str = "key",
                 content_col: Optional[str] = None, col: str = "value"):
        if operation not in _OPERATIONS:
            raise ValueError(f"invalid operation {operation!r} "
                             f"(want one of {_OPERATIONS})")
        if operation in ("insert", "replace", "upsert") and not content_col:
            raise ValueError(
                "content must be set for insert, replace and upsert operations.")
        self.url, self.bucket = url, bucket
        self.username, self.password = username, password
        self.operation, self.id_col = operation, id_col
        self.content_col, self.col = content_col, col

    def __call__(self, df: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql import functions as F

        url, bucket = self.url, self.bucket
        user, pw = self.username, self.password
        op, id_col, content_col, col = (self.operation, self.id_col,
                                        self.content_col, self.col)
        base = df if "_error" in df.columns else df.withColumn(
            "_error", F.lit(None).cast("string"))
        out_schema = base.schema

        def run(batches):
            client = None
            for pdf in batches:
                if client is None:
                    client = CouchbaseClient(url, user, pw, bucket)
                results, errors = [], []
                for _, row in pdf.iterrows():
                    key = str(row[id_col])
                    try:
                        if op == "get":
                            doc = client.get(key)
                            if doc is None:
                                raise CouchbaseError(0x0001, f"{key} not found")
                            results.append(doc.decode("utf-8", "replace"))
                            errors.append(None)
                            continue
                        content = (str(row[content_col]).encode()
                                   if content_col else b"")
                        if op == "insert":
                            if not client.add(key, content):
                                raise CouchbaseError(0x0002, f"{key} exists")
                        elif op == "replace":
                            client.replace(key, content)
                        elif op == "upsert":
                            client.set(key, content)
                        elif op == "remove":
                            client.delete(key)
                        results.append(row[col])
                        errors.append(None)
                    except CouchbaseError as e:
                        results.append(row[col])
                        errors.append(str(e))
                pdf = pdf.copy()
                pdf[col] = pd.Series(results, index=pdf.index, dtype=object)
                pdf["_error"] = pd.Series(errors, index=pdf.index, dtype=object)
                yield pdf

        return base.mapInPandas(run, out_schema)


class CouchbaseCache(Cache):
    def __init__(self, url: str, bucket: str = "default",
                 username: str = "", password: str = "",
                 default_ttl_s: int = 0):
        self.client = CouchbaseClient(url, username, password, bucket)
        self.ttl = default_ttl_s

    def get(self, key: str):
        v = self.client.get(key)
        return None if v is None else v.decode("utf-8", "replace")

    def set(self, key: str, value) -> None:
        v = value if isinstance(value, bytes) else str(value).encode()
        self.client.set(key, v, self.ttl)

    def add(self, key: str, value) -> bool:
        v = value if isinstance(value, bytes) else str(value).encode()
        return self.client.add(key, v, self.ttl)

    def delete(self, key: str) -> None:
        self.client.delete(key)
