"""`schema_registry_encode` / `schema_registry_decode` processors.

Reference: internal/impl/confluent/processor_schema_registry_decode.go
and processor_schema_registry_encode.go. Differences forced by the
columnar model are documented on each class; the wire format, serde
semantics, caching discipline and error-routing match the reference:

- a message that fails to (de)serialize is left unchanged and the
  ``_error`` slot is set (the reference's error-handling contract),
- decoders cache per schema id, encoders per subject with a
  ``refresh_period`` re-poll of the latest version
  (decode.go:197-199 schemaStaleAfter, encode.go:251-296),
- the subject field supports ``${! ... }`` interpolation resolved per
  message (encode.go spec field `subject`).

The serde work runs inside Arrow-batched pandas UDFs — the designed
Python stage for payload codecs in this engine (like avro/protobuf/
compress) — with a per-worker serde cache so each executor process
fetches a schema once, exactly like the reference's in-process cache.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from benthos_spark.operators.processors import ERROR_COL, Processor, ensure_error_col

# per-worker caches: one registry fetch per executor process, like the
# reference's schemas map (decode.go:73, encode.go:100).
_DECODERS: dict = {}  # (url, id, raw) -> serde
_ENCODERS: dict = {}  # (url, subject, raw) -> (serde, id, fetched_at)


def _decoder(url: str, schema_id: int, raw: bool):
    key = (url, schema_id, raw)
    serde = _DECODERS.get(key)
    if serde is None:
        from benthos_spark.functions.schema_registry import RegistryClient

        serde = RegistryClient(url).serde_by_id(schema_id, raw)
        _DECODERS[key] = serde
    return serde


def _encoder(url: str, subject: str, raw: bool, refresh_s: float):
    key = (url, subject, raw)
    hit = _ENCODERS.get(key)
    now = time.time()
    if hit is not None and now - hit[2] < refresh_s:
        return hit[0], hit[1]
    from benthos_spark.functions.schema_registry import RegistryClient

    serde, sid = RegistryClient(url).serde_latest(subject, raw)
    _ENCODERS[key] = (serde, sid, now)
    return serde, sid


@dataclass
class SchemaRegistryDecode(Processor):
    """processor_schema_registry_decode.go:60 — strip the 5-byte header,
    fetch the schema for the embedded id, decode the payload to JSON.

    Columnar adaptation: the decoded document lands in ``out_col`` as a
    JSON string (the reference SetBytes's textual JSON onto the same
    message); on failure ``out_col`` is null and ``_error`` carries the
    reason while every other column — including the original binary —
    is untouched. Set ``out_col`` different from ``col`` to keep the
    raw bytes alongside."""

    url: str
    col: str = "value"
    out_col: Optional[str] = None
    avro_raw_json: bool = False

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        url, raw = self.url, self.avro_raw_json
        out_col = self.out_col or self.col

        @F.pandas_udf("struct<doc:string,err:string>")
        def decode(vals: pd.Series) -> pd.DataFrame:
            from benthos_spark.functions.schema_registry import extract_id

            docs, errs = [], []
            for v in vals:
                try:
                    sid, payload = extract_id(bytes(v))
                    docs.append(_decoder(url, sid, raw).decode(payload).decode())
                    errs.append(None)
                except Exception as e:
                    docs.append(None)
                    errs.append(str(e))
            return pd.DataFrame({"doc": docs, "err": errs})

        res = decode(F.col(self.col))
        return (
            df.withColumn("_sr", res)
            .withColumn(out_col, F.col("_sr.doc"))
            .withColumn(ERROR_COL, F.coalesce(F.col(ERROR_COL), F.col("_sr.err")))
            .drop("_sr")
        )


@dataclass
class SchemaRegistryEncode(Processor):
    """processor_schema_registry_encode.go:182 — fetch the latest schema
    for ``subject``, encode the JSON document against it, and prepend
    the magic + schema-id header (+ protobuf message indexes).

    ``subject`` may contain ``${! ... }`` Bloblang interpolation; it is
    rendered per message and encoders are cached per rendered subject.
    ``refresh_period`` (seconds) re-polls the latest version just like
    the reference's background refresh loop. On failure ``out_col`` is
    null and ``_error`` is set."""

    url: str
    subject: str
    col: str = "value"
    out_col: Optional[str] = None
    avro_raw_json: bool = False
    refresh_period: float = 600.0

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        url, raw, refresh = self.url, self.avro_raw_json, self.refresh_period
        out_col = self.out_col or self.col

        if "${!" in self.subject:
            from benthos_spark.functions.bloblang import interpolate

            subject_col = interpolate(self.subject)
        else:
            subject_col = F.lit(self.subject)

        @F.pandas_udf("struct<framed:binary,err:string>")
        def encode(vals: pd.Series, subjects: pd.Series) -> pd.DataFrame:
            from benthos_spark.functions.schema_registry import insert_id

            framed, errs = [], []
            for v, subj in zip(vals, subjects):
                try:
                    body = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    serde, sid = _encoder(url, str(subj), raw, refresh)
                    framed.append(insert_id(sid, serde.encode(bytes(body))))
                    errs.append(None)
                except Exception as e:
                    framed.append(None)
                    errs.append(str(e))
            return pd.DataFrame({"framed": framed, "err": errs})

        res = encode(F.col(self.col), subject_col)
        return (
            df.withColumn("_sr", res)
            .withColumn(out_col, F.col("_sr.framed"))
            .withColumn(ERROR_COL, F.coalesce(F.col(ERROR_COL), F.col("_sr.err")))
            .drop("_sr")
        )
