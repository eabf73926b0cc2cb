"""Iceberg v2 table: create / load / append / overwrite / scan / expire.

Commit protocol is the spec's file-system-tables flow (HadoopCatalog
semantics): the table's state is ``metadata/v<N>.metadata.json``; a
writer commits by creating ``v<N+1>`` with ``O_CREAT|O_EXCL`` — the
filesystem arbitrates concurrent writers, the loser refreshes and
retries (appends always merge cleanly: data files + the new manifest
are immutable, only the manifest-list + metadata are rebuilt).
``version-hint.text`` is a convenience pointer, updated by atomic
rename after the version file lands.

Data files are Spark-written parquet under ``data/``; per-file stats
(record counts, sizes, column bounds for partition summaries) come
from the parquet footers via pyarrow — no second Spark job.

At 100 TB this layout is exactly how Iceberg scales: planning reads
only manifest metadata (KBs per thousands of files), scans prune by
partition summary, and appends never rewrite existing data or
manifests.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Iterable
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from benthos_spark.iceberg import manifests as M
from benthos_spark.iceberg import schema as S


class CommitConflict(RuntimeError):
    """Another writer committed the version we raced for."""


def _new_snapshot_id() -> int:
    return int.from_bytes(os.urandom(8), "big") >> 1  # positive long


_PARTITION_SOURCE_TYPES = ("string", "int", "long", "date", "boolean")

_TIME_TRANSFORMS = ("year", "month", "day", "hour")


def _parse_partition_spec(spec: str) -> tuple[str, str]:
    """'col' → (identity, col); 'day(col)' → (day, col);
    'bucket(16, col)' → (bucket[16], col);
    'truncate(4, col)' → (truncate[4], col)."""
    spec = spec.strip()
    if "(" in spec:
        transform, _, rest = spec.partition("(")
        transform = transform.strip().lower()
        body = rest.rstrip(")").strip()
        if transform in ("bucket", "truncate"):
            n_str, _, col = body.partition(",")
            n = int(n_str.strip())
            if n <= 0 or not col.strip():
                raise ValueError(f"{transform}(N, col) needs N > 0 and a column")
            return f"{transform}[{n}]", col.strip()
        if transform not in _TIME_TRANSFORMS:
            raise ValueError(
                f"unsupported partition transform {transform!r}; "
                f"supported: identity, bucket, truncate, {', '.join(_TIME_TRANSFORMS)}"
            )
        return transform, body
    return "identity", spec


def _truncate_width(transform: str) -> int:
    return int(transform[len("truncate["):-1])


def _build_spec_fields(
    schema_json: dict,
    partition_by: tuple[str, ...],
    next_field_id: int,
    reuse: dict[tuple[int, str], dict] | None = None,
) -> list[dict]:
    """Build partition-spec fields from ``"col"`` / ``"day(col)"`` /
    ``"bucket(16, col)"`` / ``"truncate(4, col)"`` strings. ``reuse``
    maps (source-id, transform) → an existing field from an EARLIER
    spec — partition evolution must keep the same field-id for an
    identical transform so partition tuples stay comparable across
    specs (spec "Partition Evolution")."""
    reuse = reuse or {}
    fields: list[dict] = []
    for spec in partition_by:
        transform, col = _parse_partition_spec(spec)
        fid = S.field_id_of(schema_json, col)
        src_type = next(f["type"] for f in schema_json["fields"] if f["id"] == fid)
        if transform == "identity":
            if src_type not in _PARTITION_SOURCE_TYPES:
                raise ValueError(
                    f"identity partition on {col!r} ({src_type}) unsupported — "
                    f"partition sources: {_PARTITION_SOURCE_TYPES}"
                )
            name = col
        elif transform.startswith("bucket["):
            if src_type not in ("int", "long", "string", "binary", "timestamp", "timestamptz", "date"):
                raise ValueError(
                    f"bucket partition unsupported for {col!r} ({src_type})"
                )
            name = f"{col}_bucket"
        elif transform.startswith("truncate["):
            if src_type not in ("int", "long", "string"):
                raise ValueError(
                    f"truncate partition unsupported for {col!r} ({src_type}) — "
                    f"sources: int, long, string"
                )
            name = f"{col}_trunc"
        else:  # time transforms (spec "Partition Transforms")
            if src_type not in ("timestamp", "timestamptz", "date"):
                raise ValueError(
                    f"{transform}() partition needs a timestamp/date source, "
                    f"got {col!r} ({src_type})"
                )
            name = f"{col}_{transform}"
        prior = reuse.get((fid, transform))
        if prior is not None:
            fields.append(dict(prior))
            continue
        fields.append(
            {
                "name": name,
                "transform": transform,
                "source-id": fid,
                "field-id": next_field_id,
            }
        )
        next_field_id += 1
    return fields


def _transform_col(transform: str, col, source_type: str = "long"):
    """The spec's time-transform values: ordinals since 1970 (years /
    months / days / hours) as ints; bucket[N] is the Appendix-B Murmur3
    bucket (computed in an Arrow-vectorized pandas UDF — write path
    only)."""
    if transform == "year":
        return (F.year(col) - F.lit(1970)).cast("int")
    if transform == "month":
        return ((F.year(col) - 1970) * 12 + F.month(col) - 1).cast("int")
    if transform == "day":
        return F.datediff(F.to_date(col), F.lit("1970-01-01")).cast("int")
    if transform == "hour":
        return F.floor(F.unix_timestamp(col) / 3600).cast("int")
    if transform.startswith("bucket["):
        n = int(transform[len("bucket["): -1])
        return _bucket_udf(source_type, n)(col)
    if transform.startswith("truncate["):
        w = _truncate_width(transform)
        if source_type in ("int", "long"):
            # spec Truncate: v - (v mod W) with a POSITIVE remainder —
            # pure integer arithmetic (no float round-trip for big longs)
            return (col - F.pmod(col, F.lit(w))).cast(source_type)
        if source_type == "string":
            # spec: first W codepoints (F.substring is codepoint-based)
            return F.substring(col, 1, w)
        raise ValueError(f"truncate transform unsupported for {source_type}")
    raise ValueError(transform)


def _bucket_udf(source_type: str, n: int):
    from pyspark.sql.functions import pandas_udf

    from benthos_spark.iceberg import bucketing as B

    if source_type in ("int", "long"):

        @pandas_udf("int")
        def fn(s: pd.Series) -> pd.Series:
            import numpy as _np

            return pd.Series(B.bucket_longs(s.to_numpy(dtype=_np.int64), n))

        return fn
    if source_type in ("timestamp", "timestamptz"):

        @pandas_udf("int")
        def fn(s: pd.Series) -> pd.Series:
            import numpy as _np

            micros = s.astype("datetime64[us]").astype(_np.int64)
            return pd.Series(B.bucket_longs(micros, n))

        return fn
    if source_type in ("string", "binary"):

        @pandas_udf("int")
        def fn(s: pd.Series) -> pd.Series:
            return s.map(lambda v: B.bucket_value(v, source_type, n)).astype("int32")

        return fn
    raise ValueError(f"bucket transform unsupported for {source_type}")


import re as _re

_CONJUNCT = _re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|==|=|<|>)\s*(.+?)\s*$"
)


def _parse_conjuncts(where: str) -> list[tuple[str, str, Any]]:
    """`a >= 3 AND name = 'x'` → [(a, >=, 3), (name, =, x)]. Returns []
    (skip nothing) when any part is outside the simple shape — pruning
    must stay conservative."""
    out = []
    for part in _re.split(r"(?i)\s+and\s+", where.strip()):
        m = _CONJUNCT.match(part)
        if not m:
            return []
        col, op, lit = m.group(1), m.group(2), m.group(3)
        if lit.startswith("'") and lit.endswith("'") and len(lit) >= 2:
            val: Any = lit[1:-1]
        else:
            try:
                val = int(lit)
            except ValueError:
                try:
                    val = float(lit)
                except ValueError:
                    return []
        out.append((col, "=" if op == "==" else op, val))
    return out


def _range_may_match(lo, hi, op: str, lit) -> bool:
    """Can any value in [lo, hi] satisfy `value op lit`?"""
    try:
        if op == "=":
            return lo <= lit <= hi
        if op == "<":
            return lo < lit
        if op == "<=":
            return lo <= lit
        if op == ">":
            return hi > lit
        if op == ">=":
            return hi >= lit
    except TypeError:
        return True  # incomparable types: never skip
    return True


class IcebergTable:
    def __init__(self, location: str, metadata: dict, version: int):
        self.location = location
        self.metadata = metadata
        self.version = version

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        location: str,
        spark_schema: T.StructType,
        partition_by: tuple[str, ...] = (),
        properties: dict[str, str] | None = None,
        sort_by: tuple[str, ...] = (),
    ) -> "IcebergTable":
        """``sort_by`` entries are ``"col"`` / ``"col desc"`` — a table
        sort order (spec "Sort Orders"): every append sorts rows within
        write tasks so parquet footers carry TIGHT column bounds and
        ``plan_files``/scan predicates skip whole files at the manifest
        level. Set table property ``write.distribution-mode: range`` to
        also range-repartition before the sort (one extra shuffle per
        append, globally clustered files — Iceberg's distribution-mode
        semantics)."""
        os.makedirs(os.path.join(location, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        schema_json, last_col_id = S.to_iceberg_schema(spark_schema)
        spec_fields = _build_spec_fields(schema_json, partition_by, next_field_id=1000)
        sort_fields = []
        for spec in sort_by:
            parts = spec.split()
            col = parts[0]
            direction = parts[1].lower() if len(parts) > 1 else "asc"
            if direction not in ("asc", "desc"):
                raise ValueError(f"sort_by direction must be asc|desc, got {spec!r}")
            fid = S.field_id_of(schema_json, col)
            sort_fields.append(
                {
                    "transform": "identity",
                    "source-id": fid,
                    "direction": direction,
                    "null-order": "nulls-first" if direction == "asc" else "nulls-last",
                }
            )
        metadata = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": location,
            "last-sequence-number": 0,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": last_col_id,
            "current-schema-id": 0,
            "schemas": [schema_json],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": max([f["field-id"] for f in spec_fields], default=999),
            "default-sort-order-id": 1 if sort_fields else 0,
            "sort-orders": [{"order-id": 0, "fields": []}]
            + ([{"order-id": 1, "fields": sort_fields}] if sort_fields else []),
            "properties": dict(properties or {}),
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
            "refs": {},
        }
        table = cls(location, metadata, version=0)
        try:
            table._write_version(1, metadata)
        except CommitConflict:
            # a concurrent creator won the v1 race — adopt its table
            # (create is idempotent for same-schema callers, which is
            # the foreachBatch first-micro-batch pattern)
            return cls.load(location)
        table.version = 1
        return table

    @classmethod
    def load(cls, location: str) -> "IcebergTable":
        v = cls._latest_version(location)
        if v == 0:
            raise FileNotFoundError(f"no Iceberg metadata under {location}")
        with open(cls._version_path(location, v)) as f:
            return cls(location, json.load(f), version=v)

    @classmethod
    def exists(cls, location: str) -> bool:
        return cls._latest_version(location) > 0

    def refresh(self) -> "IcebergTable":
        latest = self._latest_version(self.location)
        if latest != self.version:
            with open(self._version_path(self.location, latest)) as f:
                self.metadata = json.load(f)
            self.version = latest
        return self

    # -- metadata helpers --------------------------------------------------

    @staticmethod
    def _version_path(location: str, v: int) -> str:
        return os.path.join(location, "metadata", f"v{v}.metadata.json")

    @staticmethod
    def _latest_version(location: str) -> int:
        mdir = os.path.join(location, "metadata")
        hint = os.path.join(mdir, "version-hint.text")
        best = 0
        if os.path.exists(hint):
            try:
                with open(hint) as f:
                    best = int(f.read().strip())
            except ValueError:
                best = 0
        # the hint lags if a writer crashed between version file and hint
        v = best + 1
        while os.path.exists(IcebergTable._version_path(location, v)):
            best = v
            v += 1
        if best == 0:
            return 0
        return best

    @property
    def schema_json(self) -> dict:
        sid = self.metadata["current-schema-id"]
        return next(s for s in self.metadata["schemas"] if s["schema-id"] == sid)

    @property
    def spark_schema(self) -> T.StructType:
        return S.to_spark_schema(self.schema_json)

    @property
    def partition_spec(self) -> list[dict]:
        sid = self.metadata["default-spec-id"]
        return self.partition_spec_by_id(sid)

    def partition_spec_by_id(self, spec_id: int) -> list[dict]:
        return next(
            s for s in self.metadata["partition-specs"] if s["spec-id"] == spec_id
        )["fields"]

    @property
    def sort_order_fields(self) -> list[dict]:
        oid = self.metadata.get("default-sort-order-id", 0)
        for o in self.metadata.get("sort-orders", []):
            if o["order-id"] == oid:
                return list(o["fields"])
        return []

    @property
    def partition_cols(self) -> list[str]:
        return [f["name"] for f in self.partition_spec]

    def _partition_value_type(self, pf: dict) -> str:
        """The Iceberg type of a partition FIELD's values (identity and
        truncate → source type; bucket and time transforms → int)."""
        if pf["transform"] == "identity" or pf["transform"].startswith("truncate["):
            return next(
                f["type"] for f in self.schema_json["fields"] if f["id"] == pf["source-id"]
            )
        return "int"

    def _source_col_name(self, source_id: int) -> str:
        return next(
            f["name"] for f in self.schema_json["fields"] if f["id"] == source_id
        )

    def current_snapshot(self) -> dict | None:
        sid = self.metadata.get("current-snapshot-id", -1)
        if sid in (-1, None):
            return None
        return next(s for s in self.metadata["snapshots"] if s["snapshot-id"] == sid)

    def snapshot(self, snapshot_id: int) -> dict:
        return next(
            s for s in self.metadata["snapshots"] if s["snapshot-id"] == snapshot_id
        )

    def history(self) -> list[dict]:
        return list(self.metadata["snapshot-log"])

    # -- write path --------------------------------------------------------

    def _partition_avro_fields(self, spec: list[dict] | None = None) -> list[dict]:
        fields = []
        for pf in self.partition_spec if spec is None else spec:
            vtype = self._partition_value_type(pf)
            if pf["transform"] == "day":
                avro_type: Any = {"type": "int", "logicalType": "date"}
            else:
                avro_type = {
                    "string": "string",
                    "int": "int",
                    "long": "long",
                    "date": {"type": "int", "logicalType": "date"},
                    "boolean": "boolean",
                }[vtype]
            fields.append(
                {
                    "name": pf["name"],
                    "type": ["null", avro_type],
                    "default": None,
                    "field-id": pf["field-id"],
                }
            )
        return fields

    def _stage_data_files(self, df: DataFrame) -> tuple[str, list[dict]]:
        """Write ``df`` as parquet under data/<uuid>/ and return
        (staging root, per-file info dicts). Stats come from the
        parquet footers (pyarrow) — local metadata reads, no Spark
        job."""
        import shutil

        import pyarrow.parquet as pq

        stage_id = uuid.uuid4().hex
        stage = os.path.join(self.location, "_staging", stage_id)
        # derived (time-transform) partition columns exist only as hive
        # dirs — Spark strips partitionBy columns from the files, so the
        # SOURCE timestamp column stays in the data as the spec requires
        for pf in self.partition_spec:
            if pf["transform"] != "identity":
                src_name = self._source_col_name(pf["source-id"])
                src_type = next(
                    f["type"]
                    for f in self.schema_json["fields"]
                    if f["id"] == pf["source-id"]
                )
                df = df.withColumn(
                    pf["name"],
                    _transform_col(pf["transform"], F.col(src_name), src_type),
                )
        order = self.sort_order_fields
        if order:
            sort_cols = []
            for f in order:
                c = F.col(self._source_col_name(f["source-id"]))
                sort_cols.append(c.asc() if f["direction"] == "asc" else c.desc())
            if self.metadata.get("properties", {}).get("write.distribution-mode") == "range":
                # global clustering: one range shuffle per append, files
                # carry DISJOINT value ranges (max pruning power)
                df = df.repartitionByRange(*sort_cols)
            df = df.sortWithinPartitions(*sort_cols)
        writer = df.write.mode("overwrite")
        pcols = self.partition_cols
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(stage)
        src_types = {
            pf["name"]: self._partition_value_type(pf) for pf in self.partition_spec
        }
        infos: list[dict] = []
        for root, _dirs, files in os.walk(stage):
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                staged = os.path.join(root, name)
                rel = os.path.relpath(root, stage)
                # final layout: data/<part=X>/<stageid>-<name> — hive
                # partition dirs sit directly under data/ so one
                # basePath read re-attaches partition columns across
                # every snapshot's files
                final_dir = (
                    os.path.join(self.location, "data", rel)
                    if rel != "."
                    else os.path.join(self.location, "data")
                )
                os.makedirs(final_dir, exist_ok=True)
                path = os.path.join(final_dir, f"{stage_id}-{name}")
                os.rename(staged, path)
                meta = pq.ParquetFile(path).metadata
                partition: dict[str, Any] = {}
                if rel != ".":
                    for seg in rel.split(os.sep):
                        col, _, raw = seg.partition("=")
                        raw = unquote(raw)
                        t = src_types.get(col, "string")
                        if raw == "__HIVE_DEFAULT_PARTITION__":
                            partition[col] = None
                        elif t in ("int", "long"):
                            partition[col] = int(raw)
                        elif t == "boolean":
                            partition[col] = raw == "true"
                        elif t == "date":
                            import datetime

                            partition[col] = (
                                datetime.date.fromisoformat(raw)
                                - datetime.date(1970, 1, 1)
                            ).days
                        else:
                            partition[col] = raw
                infos.append(
                    {
                        "path": path,
                        "rows": meta.num_rows,
                        "size": os.path.getsize(path),
                        "partition": partition,
                        **self._footer_stats(meta),
                    }
                )
        shutil.rmtree(stage, ignore_errors=True)
        return stage, infos

    def _footer_stats(self, meta) -> dict:
        """Per-column stats from the parquet footer (no Spark job):
        value/null counts and spec-encoded lower/upper bounds for the
        primitive columns — the metadata a planner (ours or any Iceberg
        reader) uses for file skipping at scale."""
        by_name = {
            f["name"]: f
            for f in self.schema_json["fields"]
            if isinstance(f["type"], str)
        }
        value_counts: dict[int, int] = {}
        null_counts: dict[int, int] = {}
        lowers: dict[int, bytes] = {}
        uppers: dict[int, bytes] = {}
        mins: dict[int, Any] = {}
        maxs: dict[int, Any] = {}
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                name = col.path_in_schema
                f = by_name.get(name)
                if f is None:
                    continue
                fid = f["id"]
                value_counts[fid] = value_counts.get(fid, 0) + col.num_values
                st = col.statistics
                if st is None:
                    continue
                if st.null_count is not None:
                    null_counts[fid] = null_counts.get(fid, 0) + st.null_count
                if not st.has_min_max or f["type"] == "binary":
                    continue
                try:
                    lo, hi = st.min, st.max
                except Exception:
                    continue
                if lo is None or hi is None:
                    continue
                if fid not in mins or lo < mins[fid]:
                    mins[fid] = lo
                if fid not in maxs or hi > maxs[fid]:
                    maxs[fid] = hi
        for fid, lo in mins.items():
            t = next(f["type"] for f in self.schema_json["fields"] if f["id"] == fid)
            try:
                if t in ("timestamp", "timestamptz"):
                    # pyarrow returns datetimes; spec encodes micros
                    lo_us = int(lo.timestamp() * 1_000_000)
                    hi_us = int(maxs[fid].timestamp() * 1_000_000)
                    lowers[fid] = M.encode_bound(lo_us, "long")
                    uppers[fid] = M.encode_bound(hi_us, "long")
                elif t == "date":
                    import datetime

                    epoch = datetime.date(1970, 1, 1)
                    lowers[fid] = M.encode_bound((lo - epoch).days, "date")
                    uppers[fid] = M.encode_bound((maxs[fid] - epoch).days, "date")
                else:
                    lowers[fid] = M.encode_bound(lo, t)
                    uppers[fid] = M.encode_bound(maxs[fid], t)
            except (ValueError, TypeError, AttributeError):
                continue
        as_kv = lambda d: [{"key": k, "value": v} for k, v in sorted(d.items())] or None  # noqa: E731
        return {
            "value_counts": as_kv(value_counts),
            "null_value_counts": as_kv(null_counts),
            "lower_bounds": as_kv(lowers),
            "upper_bounds": as_kv(uppers),
        }

    def _build_manifest(
        self,
        infos: list[dict],
        snapshot_id: int,
        sequence_number: int,
        content: int = M.CONTENT_DATA,
    ) -> dict:
        """Write one manifest for the added files; returns its
        manifest_file record for the manifest list. ``content``
        distinguishes data manifests from (position-)delete manifests
        (spec: manifest_file.content 0/1, data_file.content 0/1/2)."""
        pfields = self._partition_avro_fields()
        entries = []
        for info in infos:
            entries.append(
                {
                    "status": M.STATUS_ADDED,
                    "snapshot_id": snapshot_id,
                    "sequence_number": sequence_number,
                    "file_sequence_number": sequence_number,
                    "data_file": {
                        "content": content,
                        "file_path": info["path"],
                        "file_format": "PARQUET",
                        "partition": info["partition"],
                        "record_count": info["rows"],
                        "file_size_in_bytes": info["size"],
                        "column_sizes": None,
                        "value_counts": info.get("value_counts"),
                        "null_value_counts": info.get("null_value_counts"),
                        "nan_value_counts": None,
                        "lower_bounds": info.get("lower_bounds"),
                        "upper_bounds": info.get("upper_bounds"),
                        "key_metadata": None,
                        "split_offsets": None,
                        "equality_ids": info.get("equality_ids"),
                        "sort_order_id": (
                            self.metadata.get("default-sort-order-id", 0)
                            if content == M.CONTENT_DATA
                            and self.metadata.get("default-sort-order-id", 0)
                            else None
                        ),
                    },
                }
            )
        mpath = os.path.join(
            self.location, "metadata", f"{uuid.uuid4().hex}-m0.avro"
        )
        mlen = M.write_manifest(
            mpath,
            entries,
            pfields,
            schema_json=self.schema_json,
            partition_spec_json=self.partition_spec,
            partition_spec_id=self.metadata["default-spec-id"],
        )
        # partition field summaries for scan pruning
        summaries = None
        spec = self.partition_spec
        if spec and content == M.CONTENT_DATA:
            summaries = []
            for pf in spec:
                src_type = self._partition_value_type(pf)
                vals = [i["partition"].get(pf["name"]) for i in infos]
                non_null = [v for v in vals if v is not None]
                summaries.append(
                    {
                        "contains_null": any(v is None for v in vals),
                        "contains_nan": False,
                        "lower_bound": M.encode_bound(min(non_null), src_type)
                        if non_null
                        else None,
                        "upper_bound": M.encode_bound(max(non_null), src_type)
                        if non_null
                        else None,
                    }
                )
        return {
            "manifest_path": mpath,
            "manifest_length": mlen,
            "partition_spec_id": self.metadata["default-spec-id"],
            "content": 0 if content == M.CONTENT_DATA else 1,
            "sequence_number": sequence_number,
            "min_sequence_number": sequence_number,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(infos),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(i["rows"] for i in infos),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": summaries,
            "key_metadata": None,
        }

    def _commit_snapshot(
        self,
        infos: list[dict],
        *,
        operation: str,
        summary_extra: dict[str, str],
        carry_parent_manifests: bool,
        content: int = M.CONTENT_DATA,
        extra_parts: list[tuple[list[dict], int]] | None = None,
        branch: str = "main",
    ) -> int:
        """Builds manifest(s) + manifest list + snapshot + metadata,
        then races the version file. On conflict: refresh + rebuild
        (the data files are immutable and stay valid) and retry —
        snapshot id and sequence number are assigned per attempt so
        manifests are written with their FINAL ids. ``extra_parts``
        adds further manifests (e.g. a position-delete manifest next
        to a data manifest) inside the SAME atomic snapshot — the
        MERGE shape: upserts and tombstones commit or vanish together."""
        parts = [(infos, content)] + list(extra_parts or [])
        for _attempt in range(20):
            self.refresh()
            if branch == "main":
                parent = self.current_snapshot()
            else:
                r = self.metadata.get("refs", {}).get(branch)
                if r is None:
                    raise KeyError(f"unknown branch {branch!r} (create_branch first)")
                if r["type"] != "branch":
                    raise ValueError(f"ref {branch!r} is a tag — tags are immutable")
                parent = self.snapshot(r["snapshot-id"])
            snapshot_id = _new_snapshot_id()
            seq = self.metadata["last-sequence-number"] + 1
            new_manifests = [
                self._build_manifest(p_infos, snapshot_id, seq, p_content)
                for p_infos, p_content in parts
                if p_infos
            ]
            prior = []
            if carry_parent_manifests and parent is not None:
                prior = M.read_manifest_list(parent["manifest-list"])
            mlist_path = os.path.join(
                self.location,
                "metadata",
                f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro",
            )
            M.write_manifest_list(
                mlist_path,
                new_manifests + prior,
                snapshot_id=snapshot_id,
                parent_snapshot_id=parent["snapshot-id"] if parent else None,
                sequence_number=seq,
            )
            data_rows = sum(
                sum(i["rows"] for i in p_infos)
                for p_infos, p_content in parts
                if p_content == M.CONTENT_DATA
            )
            data_files = sum(
                len(p_infos) for p_infos, p_content in parts if p_content == M.CONTENT_DATA
            )
            del_rows = sum(
                sum(i["rows"] for i in p_infos)
                for p_infos, p_content in parts
                if p_content != M.CONTENT_DATA
            )
            del_files = sum(
                len(p_infos) for p_infos, p_content in parts if p_content != M.CONTENT_DATA
            )
            prior_data = [m for m in prior if m["content"] == 0]
            total_rows = data_rows + sum(
                m["added_rows_count"] + m["existing_rows_count"] - m["deleted_rows_count"]
                for m in prior_data
            )
            total_files = data_files + sum(
                m["added_files_count"] + m["existing_files_count"] - m["deleted_files_count"]
                for m in prior_data
            )
            summary = {"operation": operation}
            if data_files:
                summary["added-data-files"] = str(data_files)
                summary["added-records"] = str(data_rows)
            if del_files:
                summary["added-delete-files"] = str(del_files)
                summary["added-position-deletes"] = str(del_rows)
            summary["total-records"] = str(total_rows)
            summary["total-data-files"] = str(total_files)
            summary.update(summary_extra)
            snapshot = {
                "snapshot-id": snapshot_id,
                **({"parent-snapshot-id": parent["snapshot-id"]} if parent else {}),
                "sequence-number": seq,
                "timestamp-ms": int(time.time() * 1000),
                "manifest-list": mlist_path,
                "schema-id": self.metadata["current-schema-id"],
                "summary": summary,
            }
            meta = dict(self.metadata)
            meta["last-sequence-number"] = seq
            meta["last-updated-ms"] = snapshot["timestamp-ms"]
            meta["snapshots"] = list(meta["snapshots"]) + [snapshot]
            refs = dict(meta.get("refs", {}))
            refs[branch] = {"snapshot-id": snapshot_id, "type": "branch"}
            meta["refs"] = refs
            if branch == "main":
                # the main branch mirrors current-snapshot-id and the
                # snapshot-log (spec: writers maintain refs.main)
                meta["current-snapshot-id"] = snapshot_id
                meta["snapshot-log"] = list(meta["snapshot-log"]) + [
                    {"timestamp-ms": snapshot["timestamp-ms"], "snapshot-id": snapshot_id}
                ]
            meta["metadata-log"] = list(meta["metadata-log"]) + [
                {
                    "timestamp-ms": self.metadata["last-updated-ms"],
                    "metadata-file": self._version_path(self.location, self.version),
                }
            ]
            try:
                self._write_version(self.version + 1, meta)
            except CommitConflict:
                os.unlink(mlist_path)
                for m in new_manifests:
                    os.unlink(m["manifest_path"])
                continue
            self.metadata = meta
            self.version += 1
            return snapshot_id
        raise CommitConflict("lost the version race 20 times")

    def _write_version(self, v: int, metadata: dict) -> None:
        path = self._version_path(self.location, v)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError as e:
            raise CommitConflict(f"{path} already committed") from e
        with os.fdopen(fd, "w") as f:
            json.dump(metadata, f)
            f.flush()
            os.fsync(f.fileno())
        hint = os.path.join(self.location, "metadata", "version-hint.text")
        tmp = hint + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.rename(tmp, hint)

    def append(
        self,
        df: DataFrame,
        summary: dict[str, str] | None = None,
        branch: str = "main",
    ) -> int:
        """Commit ``df`` as a new append snapshot; returns snapshot id."""
        df = df.select([F.col(f.name) for f in self.spark_schema.fields])
        _stage, infos = self._stage_data_files(df)
        return self._commit_snapshot(
            infos,
            operation="append",
            summary_extra=dict(summary or {}),
            carry_parent_manifests=True,
            branch=branch,
        )

    def overwrite(
        self,
        df: DataFrame,
        summary: dict[str, str] | None = None,
        branch: str = "main",
    ) -> int:
        """Replace the table's (or branch's) contents with ``df``
        (full-table overwrite: the new manifest list simply stops
        referencing the prior manifests — their files become
        unreachable and are reclaimed by :meth:`expire_snapshots`)."""
        df = df.select([F.col(f.name) for f in self.spark_schema.fields])
        _stage, infos = self._stage_data_files(df)
        return self._commit_snapshot(
            infos,
            operation="overwrite",
            summary_extra=dict(summary or {}),
            carry_parent_manifests=False,
            branch=branch,
        )

    # -- read path ---------------------------------------------------------

    def _resolve_snapshot(
        self,
        snapshot_id: int | None,
        as_of_ms: int | None,
        ref: str | None = None,
    ) -> dict | None:
        if ref is not None:
            if ref == "main":
                return self.current_snapshot()
            r = self.metadata.get("refs", {}).get(ref)
            if r is None:
                raise KeyError(f"unknown ref {ref!r}")
            return self.snapshot(r["snapshot-id"])
        if snapshot_id is not None:
            return self.snapshot(snapshot_id)
        if as_of_ms is not None:
            eligible = [e for e in self.metadata["snapshot-log"] if e["timestamp-ms"] <= as_of_ms]
            if not eligible:
                return None
            return self.snapshot(eligible[-1]["snapshot-id"])
        return self.current_snapshot()

    # -- snapshot refs (spec "Snapshot References": tags & branches) --------

    @property
    def refs(self) -> dict:
        return dict(self.metadata.get("refs", {}))

    def _commit_metadata(self, mutate) -> None:
        """Metadata-only commit (no new snapshot): refresh → mutate →
        race the version file, retrying on conflict. ``mutate`` gets a
        SHALLOW copy of current metadata and returns the new dict."""
        for _attempt in range(20):
            self.refresh()
            meta = mutate(dict(self.metadata))
            try:
                self._write_version(self.version + 1, meta)
            except CommitConflict:
                continue
            self.metadata = meta
            self.version += 1
            return
        raise CommitConflict("lost the version race 20 times (metadata commit)")

    def create_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """Pin a snapshot under an immutable name (audit / reproducible
        reads): ``scan(ref=name)`` reads it forever; expire_snapshots
        never drops a ref-pinned snapshot."""
        self._set_ref(name, snapshot_id, "tag")

    def create_branch(self, name: str, snapshot_id: int | None = None) -> None:
        """Independent line of history starting at ``snapshot_id`` (or
        the current snapshot): ``append(..., branch=name)`` advances the
        ref without touching main's current-snapshot-id."""
        self._set_ref(name, snapshot_id, "branch")

    def _set_ref(self, name: str, snapshot_id: int | None, kind: str) -> None:
        if name == "main":
            raise ValueError("'main' is maintained implicitly by commits")

        def mutate(meta: dict) -> dict:
            sid = snapshot_id
            if sid is None:
                cur = self.current_snapshot()
                if cur is None:
                    raise ValueError("table has no snapshot to reference")
                sid = cur["snapshot-id"]
            else:
                self.snapshot(sid)  # must exist
            refs = dict(meta.get("refs", {}))
            existing = refs.get(name)
            if existing is not None and existing["type"] == "tag":
                raise ValueError(f"tag {name!r} already exists (tags are immutable)")
            refs[name] = {"snapshot-id": sid, "type": kind}
            meta["refs"] = refs
            return meta

        self._commit_metadata(mutate)

    # -- metadata tables (Iceberg's inspection tables: tbl$snapshots…) ------

    def metadata_table(self, spark: SparkSession, name: str) -> DataFrame:
        """Iceberg-style inspection tables as DataFrames — the core
        columns of `SELECT * FROM tbl.<name>`: ``snapshots``,
        ``history``, ``refs``, ``manifests``, ``files``,
        ``delete_files``, ``partitions``. Metadata-only (no data files
        are read), so each is a handful of driver rows even on a table
        with millions of files — planning stays O(manifests)."""
        import datetime as _dt

        self.refresh()

        def ts(ms: int):
            return _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc).replace(
                tzinfo=None
            )

        if name == "snapshots":
            rows = [
                (
                    ts(s["timestamp-ms"]),
                    s["snapshot-id"],
                    s.get("parent-snapshot-id"),
                    s["summary"].get("operation"),
                    s["manifest-list"],
                    {k: str(v) for k, v in s["summary"].items()},
                )
                for s in sorted(self.metadata["snapshots"], key=lambda x: x["sequence-number"])
            ]
            return spark.createDataFrame(
                rows,
                "committed_at timestamp, snapshot_id long, parent_id long, "
                "operation string, manifest_list string, summary map<string,string>",
            )
        if name == "history":
            ancestors: set[int] = set()
            cur = self.current_snapshot()
            while cur is not None:
                ancestors.add(cur["snapshot-id"])
                pid = cur.get("parent-snapshot-id")
                cur = None
                if pid is not None:
                    try:
                        cur = self.snapshot(pid)
                    except Exception:
                        cur = None
            rows = [
                (ts(e["timestamp-ms"]), e["snapshot-id"], e["snapshot-id"] in ancestors)
                for e in self.metadata["snapshot-log"]
            ]
            return spark.createDataFrame(
                rows,
                "made_current_at timestamp, snapshot_id long, is_current_ancestor boolean",
            )
        if name == "refs":
            rows = [
                (rname, r["type"], r["snapshot-id"])
                for rname, r in sorted(self.metadata.get("refs", {}).items())
            ]
            return spark.createDataFrame(rows, "name string, type string, snapshot_id long")
        if name == "manifests":
            snap = self.current_snapshot()
            mfs = M.read_manifest_list(snap["manifest-list"]) if snap else []
            rows = [
                (
                    m["content"],
                    m["manifest_path"],
                    m["manifest_length"],
                    m["partition_spec_id"],
                    m["added_snapshot_id"],
                    m["added_files_count"],
                    m["existing_files_count"],
                    m["deleted_files_count"],
                    m["added_rows_count"],
                    m["existing_rows_count"],
                    m["deleted_rows_count"],
                )
                for m in mfs
            ]
            return spark.createDataFrame(
                rows,
                "content int, path string, length long, partition_spec_id int, "
                "added_snapshot_id long, added_data_files_count int, "
                "existing_data_files_count int, deleted_data_files_count int, "
                "added_rows_count long, existing_rows_count long, deleted_rows_count long",
            )
        if name in ("files", "delete_files"):
            data, deletes = self._live_entries()
            files = data if name == "files" else deletes
            rows = [
                (
                    f["content"],
                    f["file_path"],
                    f["file_format"],
                    f["record_count"],
                    f["file_size_in_bytes"],
                    {
                        k: (None if v is None else str(v))
                        for k, v in (f.get("partition") or {}).items()
                    },
                )
                for f in files
            ]
            return spark.createDataFrame(
                rows,
                "content int, file_path string, file_format string, "
                "record_count long, file_size_in_bytes long, partition map<string,string>",
            )
        if name == "entries":
            snap = self.current_snapshot()
            rows = []
            if snap:
                for mf in M.read_manifest_list(snap["manifest-list"]):
                    for e in M.read_manifest(mf["manifest_path"]):
                        rows.append(
                            (
                                e["status"],
                                e["snapshot_id"],
                                e.get("sequence_number") or mf["sequence_number"],
                                e["data_file"]["content"],
                                e["data_file"]["file_path"],
                                e["data_file"]["record_count"],
                            )
                        )
            return spark.createDataFrame(
                rows,
                "status int, snapshot_id long, sequence_number long, "
                "content int, file_path string, record_count long",
            )
        if name == "partitions":
            data, _ = self._live_entries()
            agg: dict[tuple, list] = {}
            for f in data:
                part = tuple(
                    sorted(
                        (k, None if v is None else str(v))
                        for k, v in (f.get("partition") or {}).items()
                    )
                )
                a = agg.setdefault(part, [0, 0, 0])
                a[0] += f["record_count"]
                a[1] += 1
                a[2] += f["file_size_in_bytes"]
            rows = [
                (dict(part), cnt[0], cnt[1], cnt[2]) for part, cnt in sorted(agg.items())
            ]
            return spark.createDataFrame(
                rows,
                "partition map<string,string>, record_count long, "
                "file_count int, total_size_in_bytes long",
            )
        raise ValueError(
            f"unknown metadata table {name!r}: snapshots, history, refs, "
            "manifests, entries, files, delete_files, partitions"
        )

    def drop_ref(self, name: str) -> None:
        if name == "main":
            raise ValueError("cannot drop 'main'")

        def mutate(meta: dict) -> dict:
            refs = dict(meta.get("refs", {}))
            if name not in refs:
                raise KeyError(f"unknown ref {name!r}")
            del refs[name]
            meta["refs"] = refs
            return meta

        self._commit_metadata(mutate)

    def _live_entries(
        self,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        ref: str | None = None,
    ) -> tuple[list[dict], list[dict]]:
        """(data files, position-delete files) reachable from the
        chosen snapshot."""
        snap = self._resolve_snapshot(snapshot_id, as_of_ms, ref=ref)
        if snap is None:
            return [], []
        data, deletes = [], []
        for mf in M.read_manifest_list(snap["manifest-list"]):
            for entry in M.read_manifest(mf["manifest_path"]):
                if entry["status"] == M.STATUS_DELETED:
                    continue
                f = entry["data_file"]
                # data sequence number: needed to scope equality deletes
                # (spec: they apply to files with STRICTLY SMALLER seq)
                f["_seq"] = (
                    entry["sequence_number"]
                    if entry.get("sequence_number") is not None
                    else mf["sequence_number"]
                )
                # partition-spec evolution: scans resolve the partition
                # layout PER MANIFEST (each manifest records the spec its
                # files were written under)
                f["_spec_id"] = mf.get("partition_spec_id", self.metadata["default-spec-id"])
                (data if f["content"] == M.CONTENT_DATA else deletes).append(f)
        return data, deletes

    def live_files(
        self, snapshot_id: int | None = None, as_of_ms: int | None = None
    ) -> list[dict]:
        """Live DATA file records (position-delete files excluded)."""
        return self._live_entries(snapshot_id, as_of_ms)[0]

    def added_files(self, snapshot_id: int) -> list[dict]:
        """DATA file records ADDED by exactly this snapshot — the
        incremental-scan unit the streaming source consumes. Position
        deletes are not streamed (a retraction has no append-stream
        representation; consumers needing them read snapshots)."""
        snap = self.snapshot(snapshot_id)
        out = []
        for mf in M.read_manifest_list(snap["manifest-list"]):
            if mf["added_snapshot_id"] != snapshot_id or mf["content"] != 0:
                continue
            for entry in M.read_manifest(mf["manifest_path"]):
                if entry["status"] == M.STATUS_ADDED:
                    out.append(entry["data_file"])
        return out

    # file-URI scheme Spark's _metadata.file_path prepends on local fs
    @staticmethod
    def _norm_path_col(c):
        return F.regexp_replace(c, "^file:/+", "/")

    def _df_for_files(
        self,
        spark: SparkSession,
        files: list[dict],
        delete_files: list[dict] | None = None,
        with_meta: bool = False,
    ) -> DataFrame:
        schema = self.spark_schema
        if not files:
            empty = spark.createDataFrame([], schema)
            if with_meta:
                empty = empty.withColumns(
                    {
                        "_bs_file": F.lit(None).cast("string"),
                        "_bs_pos": F.lit(None).cast("long"),
                    }
                )
            return empty
        pos_deletes = [f for f in (delete_files or []) if f["content"] != M.CONTENT_EQUALITY_DELETES]
        eq_deletes = [f for f in (delete_files or []) if f["content"] == M.CONTENT_EQUALITY_DELETES]
        need_meta = with_meta or bool(delete_files)
        # partition-spec evolution: files written under different specs
        # have different hive layouts (identity columns live in the dir
        # names, not the data), so group by the spec the file's manifest
        # recorded and read each group with ITS layout, then union.
        default_sid = self.metadata["default-spec-id"]
        by_spec: dict[int, list[str]] = {}
        for f in files:
            by_spec.setdefault(f.get("_spec_id", default_sid), []).append(f["file_path"])
        parts: list[DataFrame] = []
        for sid, paths in sorted(by_spec.items()):
            # explicit schema: files written under EARLIER schemas
            # null-fill added columns and upcast widened ones
            # (int->long etc.) at scan — Iceberg's read-time contract
            reader = spark.read.schema(schema)
            try:
                spec_fields = self.partition_spec_by_id(sid)
            except StopIteration:
                spec_fields = self.partition_spec
            if spec_fields:
                # hive layout under data/ — basePath re-attaches the
                # partition columns Spark stripped on write
                base = os.path.join(self.location, "data")
                reader = reader.option("basePath", base)
            part = reader.parquet(*paths)
            if need_meta:
                # _metadata is per-scan — attach before the union
                part = part.withColumns(
                    {
                        "_bs_file": self._norm_path_col(F.col("_metadata.file_path")),
                        "_bs_pos": F.col("_metadata.row_index"),
                    }
                )
            # derived (bucket/time/truncate) partition-dir columns are
            # appended by partition discovery — project them away so
            # every spec group unions on the table schema alone
            keep_cols = [f.name for f in schema.fields] + (
                ["_bs_file", "_bs_pos"] if need_meta else []
            )
            parts.append(part.select(keep_cols))
        df = parts[0]
        for part in parts[1:]:
            df = df.unionByName(part)
        if pos_deletes:
            # merge-on-read: anti-join rows tombstoned by position-delete
            # files (file_path, pos) — path-keyed, so files appended
            # after the delete snapshot are untouched by construction
            dd = spark.read.parquet(*[f["file_path"] for f in pos_deletes]).select(
                self._norm_path_col(F.col("file_path")).alias("_del_file"),
                F.col("pos").alias("_del_pos"),
            )
            df = df.join(
                dd,
                (df["_bs_file"] == dd["_del_file"]) & (df["_bs_pos"] == dd["_del_pos"]),
                "left_anti",
            )
        if eq_deletes:
            df = self._apply_equality_deletes(spark, df, files, eq_deletes)
        cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        if with_meta:
            cols += [F.col("_bs_file"), F.col("_bs_pos")]
        return df.select(cols)

    def _apply_equality_deletes(
        self, spark: SparkSession, df: DataFrame, files: list[dict], eq_deletes: list[dict]
    ) -> DataFrame:
        """Merge-on-read application of v2 EQUALITY deletes (spec
        "Equality Delete Files"): a row is dead iff some delete file
        with a STRICTLY GREATER data sequence number carries its key
        tuple. Implementation: rows learn their file's sequence number
        through a broadcast (file_path → seq) map — manifest-sized, not
        data-sized — each delete-key multiset aggregates to (key → max
        delete seq), and one key-shuffled left join per distinct
        equality_ids set filters `max_del_seq <= row_seq` survivors.
        Nulls in key columns match nulls (spec equality semantics), so
        the join condition uses null-safe equality. At 100 TB the only
        data-sized cost is the key-column shuffle of the scanned rows —
        the same profile as Iceberg's own merge-on-read readers."""
        id2name = {f["id"]: f["name"] for f in self.schema_json["fields"]}
        seq_map = spark.createDataFrame(
            [(f["file_path"], f.get("_seq", 0)) for f in files],
            "_sm_file string, _bs_seq long",
        ).withColumn("_sm_file", self._norm_path_col(F.col("_sm_file")))
        df = df.join(F.broadcast(seq_map), df["_bs_file"] == seq_map["_sm_file"], "left").drop(
            "_sm_file"
        )
        groups: dict[tuple[int, ...], list[dict]] = {}
        for f in eq_deletes:
            groups.setdefault(tuple(f["equality_ids"] or ()), []).append(f)
        for eq_ids, dfiles in groups.items():
            if not eq_ids:
                continue
            key_cols = [id2name[i] for i in eq_ids]
            dseq = spark.createDataFrame(
                [(f["file_path"], f.get("_seq", 0)) for f in dfiles],
                "_dm_file string, _eq_seq long",
            ).withColumn("_dm_file", self._norm_path_col(F.col("_dm_file")))
            dd = (
                spark.read.parquet(*[f["file_path"] for f in dfiles])
                .withColumn("_dm_file", self._norm_path_col(F.col("_metadata.file_path")))
                .join(F.broadcast(dseq), "_dm_file")
                .groupBy(*[F.col(c).alias(f"_eqk_{c}") for c in key_cols])
                .agg(F.max("_eq_seq").alias("_eq_max_seq"))
            )
            cond = None
            for c in key_cols:
                clause = df[c].eqNullSafe(dd[f"_eqk_{c}"])
                cond = clause if cond is None else (cond & clause)
            df = (
                df.join(dd, cond, "left")
                .filter(F.col("_eq_max_seq").isNull() | (F.col("_eq_max_seq") <= F.col("_bs_seq")))
                .drop("_eq_max_seq", *[f"_eqk_{c}" for c in key_cols])
            )
        return df.drop("_bs_seq")

    def upsert(
        self,
        spark: SparkSession,
        df: DataFrame,
        on: list[str],
        summary: dict[str, str] | None = None,
    ) -> int:
        """CDC-style upsert via v2 EQUALITY deletes: commit ONE snapshot
        carrying (a) an equality-delete file of ``df``'s distinct key
        tuples and (b) ``df`` as new data files. The delete and the new
        data share a sequence number, and equality deletes only apply to
        files with strictly smaller sequence numbers — so prior versions
        of the keys die and the new rows survive, atomically.

        Unlike :meth:`merge_rows` (position deletes), this never reads
        the live table at write time — the write cost is O(batch), which
        is what makes it the streaming-upsert primitive (Flink's Iceberg
        CDC writer uses the same shape)."""
        self.refresh()
        df = df.select([F.col(f.name) for f in self.spark_schema.fields])
        eq_infos = self._stage_eq_delete_files(df.select(*on).distinct(), on)
        _stage, data_infos = self._stage_data_files(df)
        return self._commit_snapshot(
            data_infos,
            operation="overwrite",
            summary_extra=dict(summary or {}),
            carry_parent_manifests=True,
            extra_parts=[(eq_infos, M.CONTENT_EQUALITY_DELETES)],
        )

    def equality_delete(
        self,
        spark: SparkSession,
        keys_df: DataFrame,
        on: list[str],
        summary: dict[str, str] | None = None,
    ) -> int | None:
        """Pure key-tuple delete (no new data): one equality-delete
        snapshot. Returns the snapshot id, or None for an empty key set."""
        self.refresh()
        eq_infos = self._stage_eq_delete_files(keys_df.select(*on).distinct(), on)
        if not eq_infos:
            return None
        return self._commit_snapshot(
            [],
            operation="delete",
            summary_extra=dict(summary or {}),
            carry_parent_manifests=True,
            extra_parts=[(eq_infos, M.CONTENT_EQUALITY_DELETES)],
        )

    def _stage_eq_delete_files(self, keys_df: DataFrame, on: list[str]) -> list[dict]:
        """Write the key tuples as a parquet equality-delete file and
        return its info records (tagged with the key field-ids)."""
        import shutil as _shutil

        import pyarrow.parquet as pq

        name2id = {f["name"]: f["id"] for f in self.schema_json["fields"]}
        missing = [c for c in on if c not in name2id]
        if missing:
            raise ValueError(f"equality-delete keys not in schema: {missing}")
        eq_ids = [name2id[c] for c in on]
        stage_id = uuid.uuid4().hex
        stage = os.path.join(self.location, "_staging", stage_id)
        keys_df.orderBy(*on).coalesce(1).write.mode("overwrite").parquet(stage)
        infos: list[dict] = []
        for fname in sorted(os.listdir(stage)):
            if not fname.endswith(".parquet"):
                continue
            staged = os.path.join(stage, fname)
            meta = pq.ParquetFile(staged).metadata
            if meta.num_rows == 0:
                continue
            final = os.path.join(self.location, "data", f"{stage_id}-eq-delete-{fname}")
            os.rename(staged, final)
            infos.append(
                {
                    "path": final,
                    "rows": meta.num_rows,
                    "size": os.path.getsize(final),
                    "partition": {},
                    "equality_ids": eq_ids,
                }
            )
        _shutil.rmtree(stage, ignore_errors=True)
        return infos

    def scan(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        where: str | None = None,
        ref: str | None = None,
    ) -> DataFrame:
        """``where`` is applied BOTH as metadata-level file skipping
        (simple `col op literal` conjuncts tested against the
        manifests' column bounds and identity-partition values — files
        that cannot contain a match never reach Spark) and as the
        residual row filter. Unparseable predicates skip nothing and
        filter everything — never a correctness change."""
        data, deletes = self._live_entries(snapshot_id, as_of_ms, ref=ref)
        if where:
            data = self.plan_files(where, files=data)
        df = self._df_for_files(spark, data, delete_files=deletes)
        return df.filter(where) if where else df

    def plan_files(self, where: str, files: list[dict] | None = None) -> list[dict]:
        """The data files a scan with ``where`` must read (metadata-only
        pruning by column bounds + identity partition values)."""
        if files is None:
            files = self.live_files()
        conjuncts = _parse_conjuncts(where)
        if not conjuncts:
            return files
        fields = {f["name"]: f for f in self.schema_json["fields"] if isinstance(f["type"], str)}
        # pruning keys across ALL specs (partition evolution: a file's
        # partition dict is keyed by the spec IT was written under)
        identity_parts: set[str] = set()
        trunc_parts: dict[str, tuple[str, int]] = {}  # source col -> (part name, W)
        for spec in self.metadata["partition-specs"]:
            for pf in spec["fields"]:
                if pf["transform"] == "identity":
                    identity_parts.add(pf["name"])
                elif pf["transform"].startswith("truncate["):
                    src = self._source_col_name(pf["source-id"])
                    src_t = fields.get(src, {}).get("type")
                    if src_t in ("int", "long"):
                        trunc_parts[src] = (pf["name"], _truncate_width(pf["transform"]))
        out = []
        for df_rec in files:
            keep = True
            for col, op, lit in conjuncts:
                f = fields.get(col)
                if f is None:
                    continue
                lo = hi = None
                part_vals = df_rec.get("partition") or {}
                if col in identity_parts and part_vals.get(col) is not None:
                    lo = hi = df_rec["partition"][col]
                elif col in trunc_parts and part_vals.get(trunc_parts[col][0]) is not None:
                    # truncate[W] of an int source: value v covers rows
                    # in [v, v + W)
                    pname, w = trunc_parts[col]
                    lo = part_vals[pname]
                    hi = lo + w - 1
                else:
                    lob = {kv["key"]: kv["value"] for kv in (df_rec.get("lower_bounds") or [])}
                    hib = {kv["key"]: kv["value"] for kv in (df_rec.get("upper_bounds") or [])}
                    if f["id"] in lob:
                        t = "long" if f["type"] in ("timestamp", "timestamptz") else f["type"]
                        lo = M.decode_bound(lob[f["id"]], t)
                        hi = M.decode_bound(hib[f["id"]], t)
                if lo is None:
                    continue  # no stats: cannot skip
                if not _range_may_match(lo, hi, op, lit):
                    keep = False
                    break
            if keep:
                out.append(df_rec)
        return out

    def delete_where(self, spark: SparkSession, condition) -> int | None:
        """Row-level delete as a v2 POSITION-DELETE snapshot
        (merge-on-read): matching live rows are recorded as
        ``(file_path, pos)`` tombstones in a parquet delete file under a
        content=1 manifest — no data file is rewritten, the spec's
        "Position Delete Files" flow. Returns the snapshot id, or None
        when nothing matched. Deviation noted: the spec's reserved
        parquet field-ids (2147483546/2147483545) are not stamped into
        the footer (Spark's writer can't), but names and types match.

        Scans apply tombstones with a key-shuffled left-anti join on
        (file, pos) — at 100 TB that join shuffles only the delete set
        against the scanned partitions, which is exactly how Iceberg
        merge-on-read reads cost out."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        self.refresh()
        data, deletes = self._live_entries()
        live = self._df_for_files(spark, data, delete_files=deletes, with_meta=True)
        infos = self._stage_tombstones(live.filter(cond))
        if not infos:
            return None
        return self._commit_snapshot(
            infos,
            operation="delete",
            summary_extra={},
            carry_parent_manifests=True,
            content=M.CONTENT_POSITION_DELETES,
        )

    def _stage_tombstones(self, hit_rows: DataFrame) -> list[dict]:
        """Write (file_path, pos) position-delete parquet for the given
        with-meta rows; returns file infos (empty when nothing hit)."""
        import shutil as _shutil

        import pyarrow.parquet as pq

        hits = hit_rows.select(
            F.col("_bs_file").alias("file_path"), F.col("_bs_pos").alias("pos")
        ).orderBy("file_path", "pos")  # spec: sorted by file_path, pos
        stage_id = uuid.uuid4().hex
        stage = os.path.join(self.location, "_staging", stage_id)
        hits.coalesce(1).write.mode("overwrite").parquet(stage)
        infos: list[dict] = []
        for name in sorted(os.listdir(stage)):
            if not name.endswith(".parquet"):
                continue
            staged = os.path.join(stage, name)
            meta = pq.ParquetFile(staged).metadata
            if meta.num_rows == 0:
                continue
            final = os.path.join(self.location, "data", f"{stage_id}-delete-{name}")
            os.rename(staged, final)
            infos.append(
                {
                    "path": final,
                    "rows": meta.num_rows,
                    "size": os.path.getsize(final),
                    "partition": {},
                }
            )
        _shutil.rmtree(stage, ignore_errors=True)
        return infos

    def merge_rows(
        self,
        spark: SparkSession,
        append_df: DataFrame,
        delete_keys: DataFrame,
        on: list[str],
        summary: dict[str, str] | None = None,
    ) -> int:
        """Atomic MERGE: position-delete every live row whose ``on``
        columns match a row of ``delete_keys``, and append
        ``append_df`` — ONE snapshot carrying both the delete manifest
        and the data manifest, so upserts and their tombstones commit
        (or vanish on crash) together. This is the upsert primitive the
        CDC merge-apply sink builds on.

        At scale the semi-join shuffles only the key set against the
        scanned partitions; the appended files never rewrite existing
        data (merge-on-read)."""
        self.refresh()
        data, deletes = self._live_entries()
        live = self._df_for_files(spark, data, delete_files=deletes, with_meta=True)
        hits = live.join(delete_keys, on=on, how="left_semi")
        del_infos = self._stage_tombstones(hits)
        append_df = append_df.select([F.col(f.name) for f in self.spark_schema.fields])
        _stage, data_infos = self._stage_data_files(append_df)
        return self._commit_snapshot(
            data_infos,
            operation="overwrite",
            summary_extra=dict(summary or {}),
            carry_parent_manifests=True,
            extra_parts=[(del_infos, M.CONTENT_POSITION_DELETES)],
        )

    def incremental_scan(
        self, spark: SparkSession, after_snapshot_id: int | None, until_snapshot_id: int
    ) -> DataFrame:
        """Rows appended by snapshots in (after, until]."""
        files: list[dict] = []
        for sid in self.snapshots_between(after_snapshot_id, until_snapshot_id):
            files.extend(self.added_files(sid))
        return self._df_for_files(spark, files)

    def snapshots_between(
        self, after_snapshot_id: int | None, until_snapshot_id: int
    ) -> list[int]:
        """Snapshot ids in commit order, exclusive of ``after``."""
        ordered = [e["snapshot-id"] for e in self.metadata["snapshot-log"]]
        start = 0 if after_snapshot_id is None else ordered.index(after_snapshot_id) + 1
        end = ordered.index(until_snapshot_id) + 1
        return ordered[start:end]

    @staticmethod
    def _norm_path(p: str) -> str:
        import re as _re

        return _re.sub("^file:/+", "/", p)

    def _added_entries(self, snapshot_id: int, data: bool) -> list[dict]:
        """Manifest entries ADDED by exactly this snapshot — data files
        (``data=True``) or delete files, tagged with _seq/_spec_id the
        way _live_entries tags them."""
        snap = self.snapshot(snapshot_id)
        out = []
        for mf in M.read_manifest_list(snap["manifest-list"]):
            if mf["added_snapshot_id"] != snapshot_id:
                continue
            if data != (mf["content"] == 0):
                continue
            for entry in M.read_manifest(mf["manifest_path"]):
                if entry["status"] != M.STATUS_ADDED:
                    continue
                f = entry["data_file"]
                f["_seq"] = (
                    entry["sequence_number"]
                    if entry.get("sequence_number") is not None
                    else mf["sequence_number"]
                )
                f["_spec_id"] = mf.get("partition_spec_id", self.metadata["default-spec-id"])
                out.append(f)
        return out

    def changelog_scan(
        self,
        spark: SparkSession,
        after_snapshot_id: int | None = None,
        until_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Row-level change stream for snapshots in (after, until]: the
        table schema plus ``_change_type`` ('insert' | 'delete'),
        ``_snapshot_id`` and ``_commit_order`` (1-based position within
        the requested range) — the engine-native analog of Iceberg's
        ``create_changelog_view`` procedure, and the downstream half of
        the CDC story (operators/cdc.py writes changelogs in; this reads
        them back out for incremental consumers).

        Per-snapshot semantics, derived from the operation the writer
        stamped (7.x writers in this module):

        - ``append``      → inserts from the files the snapshot added.
        - ``delete``      → pre-images of rows killed by the snapshot's
          new position-delete files (exact (file, pos) lookup) or
          equality-delete files (null-safe key semi-join against the
          parent's live rows — the spec's strictly-smaller-sequence
          scope means exactly those rows die).
        - ``overwrite``   → both of the above plus pre-images of rows in
          data files the snapshot REMOVED (full-table overwrites); an
          upsert therefore reads as delete(old image) + insert(new).
        - ``replace`` and compaction-flagged overwrites (rewrite_data_
          files / rewrite_manifests / compact) change nothing logically
          and emit nothing — same caveat as Iceberg's own changelog.

        Updates are emitted as delete+insert pairs (no pre/post-image
        pairing column); consumers that need upsert semantics key on the
        natural key and take the last _commit_order. Scale: each
        snapshot touches only its own added files / delete files /
        removed files — never a full-history scan; the parent-side key
        semi-join for equality deletes is the same key-shuffle profile
        as the merge-on-read scan path."""
        self.refresh()
        cur = self.current_snapshot()
        if until_snapshot_id is None:
            if cur is None:
                return self._changelog_empty(spark)
            until_snapshot_id = cur["snapshot-id"]
        parts: list[DataFrame] = []
        base_cols = [f.name for f in self.spark_schema.fields]

        def tag(df: DataFrame, ct: str, sid: int, order: int) -> DataFrame:
            return df.select(base_cols).withColumns(
                {
                    "_change_type": F.lit(ct),
                    "_snapshot_id": F.lit(sid).cast("long"),
                    "_commit_order": F.lit(order).cast("int"),
                }
            )

        for order, sid in enumerate(
            self.snapshots_between(after_snapshot_id, until_snapshot_id), 1
        ):
            snap = self.snapshot(sid)
            summary = snap.get("summary", {})
            op = summary.get("operation")
            if op == "replace" or summary.get("benthos-spark.compaction") == "true":
                continue
            parent_id = snap.get("parent-snapshot-id")
            parent_data, parent_dels = (
                self._live_entries(parent_id) if parent_id is not None else ([], [])
            )
            added_data = self._added_entries(sid, data=True)
            if added_data:
                parts.append(tag(self._df_for_files(spark, added_data), "insert", sid, order))
            # pre-images of rows in data files this snapshot removed
            snap_paths = {
                self._norm_path(f["file_path"]) for f in self._live_entries(sid)[0]
            }
            removed = [
                f for f in parent_data if self._norm_path(f["file_path"]) not in snap_paths
            ]
            if removed:
                gone = self._df_for_files(spark, removed, delete_files=parent_dels)
                parts.append(tag(gone, "delete", sid, order))
            added_dels = self._added_entries(sid, data=False)
            pos_new = [f for f in added_dels if f["content"] == M.CONTENT_POSITION_DELETES]
            eq_new = [f for f in added_dels if f["content"] == M.CONTENT_EQUALITY_DELETES]
            if pos_new and parent_data:
                dd = spark.read.parquet(*[f["file_path"] for f in pos_new]).select(
                    self._norm_path_col(F.col("file_path")).alias("_del_file"),
                    F.col("pos").alias("_del_pos"),
                )
                ref_paths = {r["_del_file"] for r in dd.select("_del_file").distinct().collect()}
                refs = [
                    f for f in parent_data if self._norm_path(f["file_path"]) in ref_paths
                ]
                if refs:
                    rows = self._df_for_files(spark, refs, with_meta=True)
                    killed = rows.join(
                        dd,
                        (rows["_bs_file"] == dd["_del_file"])
                        & (rows["_bs_pos"] == dd["_del_pos"]),
                        "left_semi",
                    )
                    parts.append(tag(killed, "delete", sid, order))
            if eq_new and parent_data:
                id2name = {f["id"]: f["name"] for f in self.schema_json["fields"]}
                live_parent = self._df_for_files(
                    spark, parent_data, delete_files=parent_dels
                )
                groups: dict[tuple[int, ...], list[dict]] = {}
                for f in eq_new:
                    groups.setdefault(tuple(f["equality_ids"] or ()), []).append(f)
                for eq_ids, dfiles in groups.items():
                    if not eq_ids:
                        continue
                    key_cols = [id2name[i] for i in eq_ids]
                    keys = (
                        spark.read.parquet(*[f["file_path"] for f in dfiles])
                        .select([F.col(c).alias(f"_ck_{c}") for c in key_cols])
                        .distinct()
                    )
                    cond = None
                    for c in key_cols:
                        clause = live_parent[c].eqNullSafe(keys[f"_ck_{c}"])
                        cond = clause if cond is None else (cond & clause)
                    killed = live_parent.join(keys, cond, "left_semi")
                    parts.append(tag(killed, "delete", sid, order))
        if not parts:
            return self._changelog_empty(spark)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _changelog_empty(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame([], self.spark_schema).withColumns(
            {
                "_change_type": F.lit(None).cast("string"),
                "_snapshot_id": F.lit(None).cast("long"),
                "_commit_order": F.lit(None).cast("int"),
            }
        )

    def compact(self, spark: SparkSession, summary: dict[str, str] | None = None) -> int:
        """Major compaction: rewrite the table as one overwrite snapshot
        of its current live rows — folds accumulated position-delete
        files back into plain data files and coalesces small files.
        Time travel to pre-compaction snapshots keeps working until
        :meth:`expire_snapshots` reclaims them. Run in a maintenance
        window; concurrent appends race the version file as usual (the
        loser retries onto the compacted base)."""
        self.refresh()
        return self.overwrite(
            self.scan(spark), summary={"benthos-spark.compaction": "true", **(summary or {})}
        )

    def _existing_entries_manifest(
        self, entries: list[dict], sid: int, snapshot_id: int, seq: int, content: int
    ) -> dict:
        """Write one manifest of STATUS_EXISTING entries under partition
        spec ``sid`` (each spec has its own partition struct — stamping
        an evolved table's old-spec entries with the default spec id
        drops their identity-partition values on scan) and return its
        manifest-list record. Shared by :meth:`rewrite_manifests` and
        :meth:`rewrite_data_files`."""
        try:
            spec_fields = self.partition_spec_by_id(sid)
        except StopIteration:
            spec_fields = self.partition_spec
        mpath = os.path.join(self.location, "metadata", f"{uuid.uuid4().hex}-m0.avro")
        mlen = M.write_manifest(
            mpath,
            entries,
            self._partition_avro_fields(spec_fields),
            schema_json=self.schema_json,
            partition_spec_json=spec_fields,
            partition_spec_id=sid,
        )
        summaries = None
        if spec_fields and content == 0:
            summaries = []
            for pf in spec_fields:
                src_type = self._partition_value_type(pf)
                vals = [e["data_file"]["partition"].get(pf["name"]) for e in entries]
                non_null = [v for v in vals if v is not None]
                summaries.append(
                    {
                        "contains_null": any(v is None for v in vals),
                        "contains_nan": False,
                        "lower_bound": M.encode_bound(min(non_null), src_type)
                        if non_null
                        else None,
                        "upper_bound": M.encode_bound(max(non_null), src_type)
                        if non_null
                        else None,
                    }
                )
        return {
            "manifest_path": mpath,
            "manifest_length": mlen,
            "partition_spec_id": sid,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": min(e["sequence_number"] for e in entries),
            "added_snapshot_id": snapshot_id,
            "added_files_count": 0,
            "existing_files_count": len(entries),
            "deleted_files_count": 0,
            "added_rows_count": 0,
            "existing_rows_count": sum(e["data_file"]["record_count"] for e in entries),
            "deleted_rows_count": 0,
            "partitions": summaries,
            "key_metadata": None,
        }

    def rewrite_manifests(self) -> int:
        """Metadata compaction: fold the current snapshot's many small
        manifests (streaming appends leave one per micro-batch) into ONE
        data manifest PER PARTITION SPEC (+ delete manifests likewise) of
        EXISTING entries that KEEP each file's original data sequence
        number — position/equality delete scoping depends on it — and its
        original spec id (an evolved table's old-spec files have a
        different partition struct; re-stamping them under the default
        spec silently nulls their identity-partition columns on scan).
        Data files are untouched; scan planning drops from O(appends)
        manifest reads to O(specs). Commits an Iceberg ``replace``
        snapshot through the usual version race; pre-rewrite snapshots
        stay time-travelable until expire_snapshots reclaims them."""
        default_sid = self.metadata["default-spec-id"]
        for _attempt in range(20):
            self.refresh()
            parent = self.current_snapshot()
            if parent is None:
                raise ValueError("no snapshot to rewrite")
            old = M.read_manifest_list(parent["manifest-list"])
            if len(old) <= 1:
                return parent["snapshot-id"]
            snapshot_id = _new_snapshot_id()
            seq = self.metadata["last-sequence-number"] + 1
            groups: dict[tuple[int, int], list[dict]] = {}
            for mf in old:
                sid = mf.get("partition_spec_id", default_sid)
                for entry in M.read_manifest(mf["manifest_path"]):
                    if entry["status"] == M.STATUS_DELETED:
                        continue
                    e_seq = (
                        entry["sequence_number"]
                        if entry.get("sequence_number") is not None
                        else mf["sequence_number"]
                    )
                    groups.setdefault((mf["content"], sid), []).append(
                        {
                            "status": M.STATUS_EXISTING,
                            "snapshot_id": entry["snapshot_id"],
                            "sequence_number": e_seq,
                            "file_sequence_number": entry.get("file_sequence_number") or e_seq,
                            "data_file": entry["data_file"],
                        }
                    )
            new_manifests = [
                self._existing_entries_manifest(entries, sid, snapshot_id, seq, content)
                for (content, sid), entries in sorted(groups.items())
                if entries
            ]
            mlist_path = os.path.join(
                self.location,
                "metadata",
                f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro",
            )
            M.write_manifest_list(
                mlist_path,
                new_manifests,
                snapshot_id=snapshot_id,
                parent_snapshot_id=parent["snapshot-id"],
                sequence_number=seq,
            )
            total_rows = sum(
                m["existing_rows_count"] for m in new_manifests if m["content"] == 0
            )
            total_files = sum(
                m["existing_files_count"] for m in new_manifests if m["content"] == 0
            )
            snapshot = {
                "snapshot-id": snapshot_id,
                "parent-snapshot-id": parent["snapshot-id"],
                "sequence-number": seq,
                "timestamp-ms": int(time.time() * 1000),
                "manifest-list": mlist_path,
                "schema-id": self.metadata["current-schema-id"],
                "summary": {
                    "operation": "replace",
                    "manifests-replaced": str(len(old)),
                    "manifests-created": str(len(new_manifests)),
                    "total-records": str(total_rows),
                    "total-data-files": str(total_files),
                },
            }
            meta = dict(self.metadata)
            meta["last-sequence-number"] = seq
            meta["last-updated-ms"] = snapshot["timestamp-ms"]
            meta["current-snapshot-id"] = snapshot_id
            meta["snapshots"] = list(meta["snapshots"]) + [snapshot]
            meta["snapshot-log"] = list(meta["snapshot-log"]) + [
                {"timestamp-ms": snapshot["timestamp-ms"], "snapshot-id": snapshot_id}
            ]
            refs = dict(meta.get("refs", {}))
            refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
            meta["refs"] = refs
            try:
                self._write_version(self.version + 1, meta)
            except CommitConflict:
                os.unlink(mlist_path)
                for m in new_manifests:
                    os.unlink(m["manifest_path"])
                continue
            self.metadata = meta
            self.version += 1
            return snapshot_id
        raise CommitConflict("lost the version race 20 times (rewrite_manifests)")


    def rewrite_data_files(
        self,
        spark: SparkSession,
        target_file_size_bytes: int = 128 * 1024 * 1024,
        min_input_files: int = 2,
        small_ratio: float = 0.5,
        max_groups: int | None = None,
    ) -> dict:
        """Selective bin-packing compaction — the 100-TB alternative to
        :meth:`compact` (which rewrites the WHOLE table and is only
        viable in a maintenance window on a small table). Matches the
        shape of Iceberg's ``rewrite_data_files`` action (public spec /
        Spark procedure): live data files smaller than
        ``small_ratio * target_file_size_bytes`` are grouped by
        (partition-spec id, partition tuple); every group with at least
        ``min_input_files`` files is read back THROUGH THE NORMAL SCAN
        PATH (pending position/equality deletes are materialized into
        the replacement files — new files get a fresh, higher data
        sequence number, so older equality deletes no longer apply to
        them, exactly the spec's scoping rule), bin-packed to
        ``ceil(bytes/target)`` outputs, and committed as ONE ``replace``
        snapshot that swaps only the rewritten entries. Untouched files
        are carried as EXISTING entries with their original sequence
        numbers (per spec id, so evolved-spec layouts survive); delete
        manifests are carried verbatim (entries pointing at rewritten
        paths become harmless no-ops). Concurrent appends merge in via
        the usual version race; a concurrent commit that removes one of
        the rewrite inputs or changes the delete-file set aborts with
        :class:`CommitConflict` (the staged files are unlinked) — the
        same validation real RewriteFiles commits perform. Streaming
        exactly-once sinks leave one small file per micro-batch per
        partition; this is the op that keeps their scan cost flat."""
        threshold = int(target_file_size_bytes * small_ratio)
        self.refresh()
        parent = self.current_snapshot()
        empty = {"rewritten_files": 0, "added_files": 0, "groups": 0,
                 "snapshot_id": parent["snapshot-id"] if parent else None}
        if parent is None:
            return empty
        data, deletes = self._live_entries()
        groups: dict[tuple, list[dict]] = {}
        for f in data:
            if f["file_size_in_bytes"] >= threshold:
                continue
            key = (f["_spec_id"], tuple(sorted((f.get("partition") or {}).items())))
            groups.setdefault(key, []).append(f)
        todo = sorted(
            (g for g in groups.values() if len(g) >= min_input_files),
            key=len,
            reverse=True,
        )
        if max_groups is not None:
            todo = todo[:max_groups]
        if not todo:
            return empty
        rewrite = [f for g in todo for f in g]
        rewrite_paths = {f["file_path"] for f in rewrite}
        base_delete_sig = frozenset(d["file_path"] for d in deletes)
        # materialize: normal scan semantics over just the input files
        df = self._df_for_files(spark, rewrite, delete_files=deletes or None)
        total = sum(f["file_size_in_bytes"] for f in rewrite)
        n_out = max(1, -(-total // int(target_file_size_bytes)))
        pcols = self.partition_cols
        if pcols:
            # co-locate each hive dir's rows so partitionBy writes one
            # packed file per (task, dir) instead of n_out per dir
            df = df.repartition(n_out, *[F.col(c) for c in pcols])
        else:
            df = df.repartition(n_out)
        _stage, infos = self._stage_data_files(df)

        def _abort_staged():
            for i in infos:
                try:
                    os.unlink(i["path"])
                except OSError:
                    pass

        default_sid = self.metadata["default-spec-id"]
        for _attempt in range(20):
            self.refresh()
            parent = self.current_snapshot()
            snapshot_id = _new_snapshot_id()
            seq = self.metadata["last-sequence-number"] + 1
            kept_by_spec: dict[int, list[dict]] = {}
            carried_deletes: list[dict] = []
            live_delete_paths: set[str] = set()
            found = 0
            for mf in M.read_manifest_list(parent["manifest-list"]):
                if mf["content"] == 1:
                    carried_deletes.append(mf)
                    for entry in M.read_manifest(mf["manifest_path"]):
                        if entry["status"] != M.STATUS_DELETED:
                            live_delete_paths.add(entry["data_file"]["file_path"])
                    continue
                sid = mf.get("partition_spec_id", default_sid)
                for entry in M.read_manifest(mf["manifest_path"]):
                    if entry["status"] == M.STATUS_DELETED:
                        continue
                    fp = entry["data_file"]["file_path"]
                    e_seq = (
                        entry["sequence_number"]
                        if entry.get("sequence_number") is not None
                        else mf["sequence_number"]
                    )
                    if fp in rewrite_paths:
                        found += 1
                        continue
                    kept_by_spec.setdefault(sid, []).append(
                        {
                            "status": M.STATUS_EXISTING,
                            "snapshot_id": entry["snapshot_id"],
                            "sequence_number": e_seq,
                            "file_sequence_number": entry.get("file_sequence_number")
                            or e_seq,
                            "data_file": entry["data_file"],
                        }
                    )
            if found != len(rewrite_paths) or frozenset(live_delete_paths) != base_delete_sig:
                _abort_staged()
                raise CommitConflict(
                    "concurrent commit changed the rewrite inputs "
                    "(missing input file or new/removed delete files) — rerun"
                )
            new_manifests = [self._build_manifest(infos, snapshot_id, seq)]
            for sid, entries in sorted(kept_by_spec.items()):
                new_manifests.append(
                    self._existing_entries_manifest(entries, sid, snapshot_id, seq, 0)
                )
            mlist_path = os.path.join(
                self.location,
                "metadata",
                f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro",
            )
            M.write_manifest_list(
                mlist_path,
                new_manifests + carried_deletes,
                snapshot_id=snapshot_id,
                parent_snapshot_id=parent["snapshot-id"],
                sequence_number=seq,
            )
            total_rows = sum(i["rows"] for i in infos) + sum(
                e["data_file"]["record_count"]
                for es in kept_by_spec.values()
                for e in es
            )
            total_files = len(infos) + sum(len(es) for es in kept_by_spec.values())
            snapshot = {
                "snapshot-id": snapshot_id,
                "parent-snapshot-id": parent["snapshot-id"],
                "sequence-number": seq,
                "timestamp-ms": int(time.time() * 1000),
                "manifest-list": mlist_path,
                "schema-id": self.metadata["current-schema-id"],
                "summary": {
                    "operation": "replace",
                    "rewritten-data-files": str(len(rewrite_paths)),
                    "added-data-files": str(len(infos)),
                    "rewritten-bytes": str(total),
                    "total-records": str(total_rows),
                    "total-data-files": str(total_files),
                    "benthos-spark.rewrite-groups": str(len(todo)),
                },
            }
            meta = dict(self.metadata)
            meta["last-sequence-number"] = seq
            meta["last-updated-ms"] = snapshot["timestamp-ms"]
            meta["current-snapshot-id"] = snapshot_id
            meta["snapshots"] = list(meta["snapshots"]) + [snapshot]
            meta["snapshot-log"] = list(meta["snapshot-log"]) + [
                {"timestamp-ms": snapshot["timestamp-ms"], "snapshot-id": snapshot_id}
            ]
            refs = dict(meta.get("refs", {}))
            refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
            meta["refs"] = refs
            meta["metadata-log"] = list(meta["metadata-log"]) + [
                {
                    "timestamp-ms": self.metadata["last-updated-ms"],
                    "metadata-file": self._version_path(self.location, self.version),
                }
            ]
            try:
                self._write_version(self.version + 1, meta)
            except CommitConflict:
                os.unlink(mlist_path)
                for m in new_manifests:
                    os.unlink(m["manifest_path"])
                continue
            self.metadata = meta
            self.version += 1
            return {
                "rewritten_files": len(rewrite_paths),
                "added_files": len(infos),
                "groups": len(todo),
                "snapshot_id": snapshot_id,
            }
        _abort_staged()
        raise CommitConflict("lost the version race 20 times (rewrite_data_files)")

    # -- schema evolution --------------------------------------------------

    _WIDEN = {("int", "long"), ("float", "double")}  # spec type promotion

    def evolve_schema(self, new_spark_schema) -> int:
        """Evolve to ``new_spark_schema`` under Iceberg's rules: columns
        are tracked by FIELD-ID, so existing names keep their ids,
        added columns get fresh ids, and type changes are legal only
        along the spec's promotion lattice (int→long, float→double).
        Dropping columns is rejected here (use a view) — the engine's
        CDC layer has the same policy. Metadata-only commit (no
        snapshot); old data files null-fill added columns and promote
        widened ones at scan time. Returns the new schema-id."""
        old = self.schema_json
        by_name = {f["name"]: f for f in old["fields"]}
        next_id = self.metadata["last-column-id"] + 1
        fields = []
        new_json, _ = S.to_iceberg_schema(new_spark_schema)
        seen = set()
        for nf in new_json["fields"]:
            name = nf["name"]
            seen.add(name)
            if name in by_name:
                of = by_name[name]
                if nf["type"] != of["type"]:
                    if not isinstance(of["type"], str) or (
                        of["type"], nf["type"]
                    ) not in self._WIDEN:
                        raise ValueError(
                            f"illegal type change for {name!r}: "
                            f"{of['type']} -> {nf['type']} (promotions: int→long, float→double)"
                        )
                fields.append({**of, "type": nf["type"]})
            else:
                if not isinstance(nf["type"], str):
                    # nested additions would need a recursive re-id pass
                    raise ValueError(f"only primitive columns can be added ({name!r})")
                fields.append({**nf, "id": next_id})
                next_id += 1
        missing = [n for n in by_name if n not in seen]
        if missing:
            raise ValueError(f"schema evolution cannot drop columns: {missing}")
        new_sid = max(s["schema-id"] for s in self.metadata["schemas"]) + 1
        schema = {"type": "struct", "schema-id": new_sid, "fields": fields}
        for _ in range(20):
            self.refresh()
            meta = dict(self.metadata)
            meta["schemas"] = list(meta["schemas"]) + [schema]
            meta["current-schema-id"] = new_sid
            meta["last-column-id"] = max(meta["last-column-id"], next_id - 1)
            try:
                self._write_version(self.version + 1, meta)
            except CommitConflict:
                continue
            self.metadata = meta
            self.version += 1
            return new_sid
        raise CommitConflict("lost the version race 20 times")

    def update_spec(self, partition_by: tuple[str, ...]) -> int:
        """Partition-spec evolution (spec "Partition Evolution"): commit
        a NEW spec with a fresh spec-id and make it the default. Data
        files already written keep their original spec — each manifest
        records its partition-spec-id and its Avro schema is
        self-describing, so scans resolve partition tuples per-manifest
        and ``_df_for_files`` reads each spec's files with that spec's
        hive layout. A field that repeats an earlier spec's
        (source-id, transform) pair KEEPS that field-id, as the spec
        requires, so partition tuples stay comparable across specs.

        A 100-TB table repartitions at least once in its life (e.g.
        day(ts) → hour(ts) as volume grows); evolution is metadata-only
        here — no data rewrite, exactly like Iceberg's ALTER TABLE ...
        ADD/REPLACE PARTITION FIELD. Returns the new spec-id."""
        # validate against the CURRENT schema before racing the commit
        _build_spec_fields(self.schema_json, partition_by, next_field_id=0)

        def mutate(meta: dict) -> dict:
            schema_json = next(
                s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
            )
            specs = list(meta["partition-specs"])
            reuse: dict[tuple[int, str], dict] = {}
            for s in specs:
                for f in s["fields"]:
                    reuse.setdefault((f["source-id"], f["transform"]), f)
            next_fid = meta.get("last-partition-id", 999) + 1
            fields = _build_spec_fields(
                schema_json, partition_by, next_field_id=next_fid, reuse=reuse
            )
            new_sid = max(s["spec-id"] for s in specs) + 1
            meta["partition-specs"] = specs + [{"spec-id": new_sid, "fields": fields}]
            meta["default-spec-id"] = new_sid
            meta["last-partition-id"] = max(
                [meta.get("last-partition-id", 999)] + [f["field-id"] for f in fields]
            )
            return meta

        self._commit_metadata(mutate)
        return self.metadata["default-spec-id"]

    # -- maintenance -------------------------------------------------------

    def remove_orphans(self, older_than_s: float = 3600.0) -> list[str]:
        """Reclaim crash leftovers: files under ``data/`` and Avro
        manifests under ``metadata/`` that NO snapshot references, plus
        abandoned ``_staging/`` dirs — but only when older than the
        grace period, so an in-flight commit's freshly staged files are
        never swept. Version files and the hint are always kept.
        Returns deleted paths."""
        import shutil as _shutil

        self.refresh()
        referenced: set[str] = set()
        for s in self.metadata["snapshots"]:
            referenced.add(s["manifest-list"])
            for mf in M.read_manifest_list(s["manifest-list"]):
                referenced.add(mf["manifest_path"])
                for e in M.read_manifest(mf["manifest_path"]):
                    referenced.add(e["data_file"]["file_path"])
        cutoff = time.time() - older_than_s
        deleted: list[str] = []
        data_root = os.path.join(self.location, "data")
        for root, _dirs, files in os.walk(data_root):
            for name in files:
                p = os.path.join(root, name)
                if p not in referenced and os.path.getmtime(p) < cutoff:
                    os.unlink(p)
                    deleted.append(p)
        mdir = os.path.join(self.location, "metadata")
        for name in os.listdir(mdir):
            if not name.endswith(".avro"):
                continue  # version JSONs + hint are never orphans
            p = os.path.join(mdir, name)
            if p not in referenced and os.path.getmtime(p) < cutoff:
                os.unlink(p)
                deleted.append(p)
        staging = os.path.join(self.location, "_staging")
        if os.path.isdir(staging):
            for name in os.listdir(staging):
                p = os.path.join(staging, name)
                if os.path.getmtime(p) < cutoff:
                    _shutil.rmtree(p, ignore_errors=True)
                    deleted.append(p)
        return deleted

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Drop all but the last ``keep_last`` snapshots and delete
        files only they referenced. Returns deleted paths."""
        self.refresh()
        snaps = sorted(self.metadata["snapshots"], key=lambda s: s["sequence-number"])
        if len(snaps) <= keep_last:
            return []
        # ref-pinned snapshots (tags and branch heads) never expire
        pinned = {
            r["snapshot-id"] for r in self.metadata.get("refs", {}).values()
        }
        keep = snaps[-keep_last:] + [
            s for s in snaps[:-keep_last] if s["snapshot-id"] in pinned
        ]
        drop = [s for s in snaps[:-keep_last] if s["snapshot-id"] not in pinned]
        keep_data: set[str] = set()
        keep_manifests: set[str] = set()
        for s in keep:
            for mf in M.read_manifest_list(s["manifest-list"]):
                keep_manifests.add(mf["manifest_path"])
                for e in M.read_manifest(mf["manifest_path"]):
                    keep_data.add(e["data_file"]["file_path"])
        deleted: list[str] = []
        # appends carry parent manifests BY REFERENCE, so several dropped
        # snapshots usually share manifests — collect the union first,
        # process each manifest exactly once, delete afterwards
        drop_manifests: set[str] = set()
        for s in drop:
            for mf in M.read_manifest_list(s["manifest-list"]):
                drop_manifests.add(mf["manifest_path"])
        for mpath in sorted(drop_manifests - keep_manifests):
            for e in M.read_manifest(mpath):
                p = e["data_file"]["file_path"]
                if p not in keep_data and os.path.exists(p):
                    os.unlink(p)
                    deleted.append(p)
            os.unlink(mpath)
            deleted.append(mpath)
        for s in drop:
            os.unlink(s["manifest-list"])
            deleted.append(s["manifest-list"])
        keep_ids = {s["snapshot-id"] for s in keep}
        meta = dict(self.metadata)
        meta["snapshots"] = [s for s in self.metadata["snapshots"] if s["snapshot-id"] in keep_ids]
        meta["snapshot-log"] = [
            e for e in self.metadata["snapshot-log"] if e["snapshot-id"] in keep_ids
        ]
        self._write_version(self.version + 1, meta)
        self.metadata = meta
        self.version += 1
        return deleted
