"""CDC: changelog source + exactly-once MERGE-apply sink.

The usedatabrew fork's headline feature is ``pg_stream`` — logical-
replication CDC from Postgres into the pipeline
(/root/reference/internal/impl/postgres_cdc/input.go:184): snapshot +
WAL changes arrive as per-row change events (insert/update/delete)
ordered by LSN. This module re-expresses that Spark-first, with no
database dependency:

- :class:`ChangelogFileSource` reads Debezium-format JSON change events
  (the wire format CDC tools emit) from files, batch or streaming —
  columns ``(op, lsn, ts_ms, before, after)`` with typed row structs.
- :class:`MergeApplySink` is a ``foreachBatch`` MERGE: upsert/delete by
  primary key, ordered by LSN, onto a bucket-partitioned copy-on-write
  state table with an atomic snapshot-manifest commit per micro-batch.

Scale design (the part that must survive 100 TB):

- state is hash-bucketed by PK into ``n_buckets`` directories; a batch
  rewrites ONLY the buckets its changes touch (like Hudi copy-on-write
  upsert / an Iceberg MERGE with bucket partitioning), the manifest
  carries unaffected buckets forward by reference;
- each change batch collapses to ONE latest event per PK (window by
  LSN) before touching state, so the rewrite is bounded by live keys,
  not event volume;
- rows keep their applying LSN in ``_order``: a redelivered or
  out-of-order event with a lower LSN can never overwrite a newer row
  (idempotent under at-least-once redelivery, exactly-once under the
  ledger protocol shared with sinks/exactly_once.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ORDER_COL = "_order"
BUCKET_COL = "_bucket"
DELETED_COL = "_deleted"

# safe type-widening lattice for schema evolution (Iceberg's promotion
# rules: integrals widen up-chain, float→double; anything else is a
# breaking change and raises rather than corrupting state)
_INT_CHAIN = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
_FLOAT_CHAIN = {"float": 0, "double": 1}


def _widened(a, b):
    """The common type a/b safely widen to, or raise ValueError."""
    if a == b:
        return a
    an, bn = a.simpleString(), b.simpleString()
    for chain in (_INT_CHAIN, _FLOAT_CHAIN):
        if an in chain and bn in chain:
            return a if chain[an] >= chain[bn] else b
    raise ValueError(
        f"cdc: incompatible schema evolution {an} vs {bn} — only integral "
        "up-widening and float→double are supported"
    )


def _read_state_dirs(spark: SparkSession, dirs: Sequence[str]) -> DataFrame:
    """Read committed bucket directories whose schemas may differ after
    evolution. ``mergeSchema`` alone cannot WIDEN (int vs bigint footers
    fail to merge), so directories are grouped by footer schema, each
    group is cast to the widened union schema, and the groups union —
    one multi-path scan per distinct schema (normally exactly one)."""
    groups: dict[str, tuple] = {}
    for d in dirs:
        s = spark.read.parquet(d).schema  # footer-only, no data scan
        groups.setdefault(s.json(), (s, []))[1].append(d)
    if len(groups) == 1:
        return spark.read.option("mergeSchema", "true").parquet(*dirs)
    target: dict = {}
    order: list[str] = []
    for s, _ in groups.values():
        for f in s.fields:
            if f.name in target:
                target[f.name] = _widened(target[f.name], f.dataType)
            else:
                target[f.name] = f.dataType
                order.append(f.name)
    out = None
    for s, ds in groups.values():
        df = spark.read.parquet(*ds)
        have = set(df.columns)
        cols = [
            (F.col(n).cast(target[n]) if n in have else F.lit(None).cast(target[n])).alias(n)
            for n in order
        ]
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out


def _union_widened(a: DataFrame, b: DataFrame) -> DataFrame:
    """unionByName with missing columns nulled AND narrow columns cast
    up the widening lattice (plain unionByName throws on int vs bigint)."""
    target: dict = {}
    order: list[str] = []
    for s in (a.schema, b.schema):
        for f in s.fields:
            if f.name in target:
                target[f.name] = _widened(target[f.name], f.dataType)
            else:
                target[f.name] = f.dataType
                order.append(f.name)

    def proj(df):
        have = set(df.columns)
        return df.select(
            *[
                (F.col(n).cast(target[n]) if n in have else F.lit(None).cast(target[n])).alias(n)
                for n in order
            ]
        )

    return proj(a).unionByName(proj(b))


def _bucket_expr(pk_cols: Sequence[str], n_buckets: int):
    """Bucket id from the pks' STRING form: hash(int 5) != hash(bigint 5),
    so a type widening would re-home keys if the raw values were hashed —
    the canonical string form is stable across widenings."""
    return F.pmod(F.hash(*[F.col(c).cast("string") for c in pk_cols]), F.lit(n_buckets))


# ---------------------------------------------------------------------------
# changelog source
# ---------------------------------------------------------------------------


def debezium_schema(row_schema: str) -> str:
    """DDL for the Debezium envelope around a row schema (the JSON shape
    pg_stream/Debezium emit: payload.{before,after,op,ts_ms,source.lsn})."""
    return (
        "payload struct<"
        f"before struct<{row_schema}>, after struct<{row_schema}>, "
        "op string, ts_ms long, "
        "source struct<lsn long, table string>>"
    )


@dataclass
class ChangelogFileSource:
    """Debezium-format JSON changelog files → ``(op, lsn, ts_ms, before,
    after)``. ``envelope=False`` accepts the flattened shape (op/lsn/
    ts_ms/before/after at top level). Streaming reads replay files in
    order (pair with ``max_files_per_trigger`` for kill/resume tests)."""

    path: str
    row_schema: str  # DDL of the table row, e.g. "id int, name string"
    envelope: bool = True
    streaming: bool = False
    max_files_per_trigger: Optional[int] = None

    def read(self, spark: SparkSession) -> DataFrame:
        if self.envelope:
            schema = debezium_schema(self.row_schema)
        else:
            schema = (
                f"op string, lsn long, ts_ms long, "
                f"before struct<{self.row_schema}>, after struct<{self.row_schema}>"
            )
        reader = spark.readStream if self.streaming else spark.read
        reader = reader.schema(schema)
        if self.streaming and self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        df = reader.json(self.path)
        if self.envelope:
            p = F.col("payload")
            df = df.select(
                p["op"].alias("op"),
                p["source"]["lsn"].alias("lsn"),
                p["ts_ms"].alias("ts_ms"),
                p["before"].alias("before"),
                p["after"].alias("after"),
            )
        return df


# ---------------------------------------------------------------------------
# merge-apply sink
# ---------------------------------------------------------------------------


class MergeApplySink:
    """``foreachBatch`` MERGE of change events onto a copy-on-write state
    table (the apply side of ``pg_stream`` → a warehouse table).

    Input batch columns: ``op`` ('c'/'u'/'r' upsert, 'd' delete), an
    ordering column (default ``lsn``), and ``after``/``before`` row
    structs (delete events may carry only ``before``).

    Commit protocol: data for touched buckets lands under
    ``data/bucket=N/b<batch_id>/``; the atomic commit point is the
    rename of ``ledger/<batch_id>.json`` — a snapshot MANIFEST mapping
    every bucket to the batch directory that last rewrote it. Replays
    re-merge against the previous committed snapshot and overwrite their
    own directories: idempotent. Readers (:meth:`read_state`) load the
    latest manifest only."""

    def __init__(
        self,
        out_dir: str,
        pk_cols: Sequence[str],
        order_col: str = "lsn",
        n_buckets: int = 16,
        auto_compact_every: Optional[int] = None,
        tombstone_retention: Optional[int] = None,
    ):
        """``auto_compact_every=N`` runs :meth:`compact` from inside the
        ``foreachBatch`` hook after every Nth committed batch — the hook
        is serialized with the stream, and readers keep working because
        old bucket directories are left in place and the manifest swap
        is atomic. ``tombstone_retention`` is an ORDER-column horizon:
        auto-compaction expires tombstones with
        ``order < max_applied_order - retention`` (set it to at least
        the source's replay horizon; None keeps tombstones forever)."""
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.ledger_dir = os.path.join(out_dir, "ledger")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.ledger_dir, exist_ok=True)
        self.pk_cols = list(pk_cols)
        self.order_col = order_col
        self.n_buckets = n_buckets
        self.auto_compact_every = auto_compact_every
        self.tombstone_retention = tombstone_retention

    # -- manifest helpers ---------------------------------------------------
    def committed_batches(self) -> list[int]:
        return sorted(
            int(n[: -len(".json")])
            for n in os.listdir(self.ledger_dir)
            if n.endswith(".json")
        )

    def _manifest(self, batch_id: Optional[int] = None) -> dict:
        batches = self.committed_batches()
        if batch_id is not None:
            batches = [b for b in batches if b <= batch_id]
        if not batches:
            return {"buckets": {}, "batch_id": None}
        with open(os.path.join(self.ledger_dir, f"{batches[-1]}.json")) as f:
            return json.load(f)

    def _bucket_dir(self, bucket: int, batch_id: int) -> str:
        return os.path.join(self.data_dir, f"bucket={bucket}", f"b{batch_id}")

    # -- foreachBatch hook --------------------------------------------------
    def __call__(self, df: DataFrame, batch_id: int) -> None:
        ledger_path = os.path.join(self.ledger_dir, f"{batch_id}.json")
        if os.path.exists(ledger_path):
            return  # exactly-once skip
        spark = df.sparkSession
        # previous committed snapshot (replays see the same base state)
        prev = self._manifest()
        prev_buckets: dict[str, str] = dict(prev.get("buckets", {}))

        # 1. collapse to the LATEST event per PK (window by order col) —
        #    bounded by live keys, not event volume
        pk = [
            F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(f"__pk_{c}")
            for c in self.pk_cols
        ]
        ev = df.select(
            "op",
            F.col(self.order_col).alias(ORDER_COL),
            F.col("after"),
            *pk,
        )
        w = Window.partitionBy(*[f"__pk_{c}" for c in self.pk_cols]).orderBy(
            F.col(ORDER_COL).desc()
        )
        latest = (
            ev.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        latest = latest.withColumn(
            BUCKET_COL, _bucket_expr([f"__pk_{c}" for c in self.pk_cols], self.n_buckets)
        ).persist()
        batch_max_order = None
        try:
            batch_max_order = latest.agg(F.max(ORDER_COL)).collect()[0][0]
            touched = sorted(
                r[BUCKET_COL] for r in latest.select(BUCKET_COL).distinct().collect()
            )
            if touched:
                # 2. current state of ONLY the touched buckets
                dirs = [
                    prev_buckets[str(b)] for b in touched if str(b) in prev_buckets
                ]
                if dirs:
                    # bucket dirs written before a schema evolution may
                    # lack newer columns or carry narrower types —
                    # grouped, widened, unioned (see _read_state_dirs)
                    old = _read_state_dirs(spark, dirs)
                else:
                    old = None

                # 3. merge. Deletes become TOMBSTONE rows (pk + _deleted
                #    + LSN) rather than silently dropping the key: change
                #    streams are only ordered per key by LSN, so an
                #    insert can ARRIVE after the delete that kills it —
                #    the tombstone's LSN guard stops the resurrection.
                #    Tombstones live in state until a compaction policy
                #    removes them (kept forever here; at warehouse scale
                #    expire them past the source's max replay horizon).
                row_fields = [
                    f.name for f in df.schema["after"].dataType.fields
                ]
                non_pk = [c for c in row_fields if c not in self.pk_cols]
                rows = latest.select(
                    *[F.col(f"__pk_{c}").alias(c) for c in self.pk_cols],
                    *[F.col(f"after.{c}").alias(c) for c in non_pk],
                    (F.col("op") == "d").alias(DELETED_COL),
                    F.col(ORDER_COL),
                    F.col(BUCKET_COL),
                )
                if old is not None:
                    # stored row survives only while no change outranks it
                    ch_keys = rows.select(
                        *self.pk_cols, F.col(ORDER_COL).alias("__ch_order")
                    )
                    survivors = (
                        old.join(ch_keys, on=self.pk_cols, how="left")
                        .filter(
                            F.col("__ch_order").isNull()
                            | (F.col(ORDER_COL) >= F.col("__ch_order"))
                        )
                        .drop("__ch_order")
                        .withColumn(BUCKET_COL, _bucket_expr(self.pk_cols, self.n_buckets))
                    )
                    # a change applies only if it outranks the stored row
                    stored = old.select(
                        *self.pk_cols, F.col(ORDER_COL).alias("__st_order")
                    )
                    rows = (
                        rows.join(stored, on=self.pk_cols, how="left")
                        .filter(
                            F.col("__st_order").isNull()
                            | (F.col(ORDER_COL) > F.col("__st_order"))
                        )
                        .drop("__st_order")
                    )
                    # schema evolution — a changelog that grows a column
                    # merges over old state with the new column null on
                    # historical rows; widened columns cast up
                    merged = _union_widened(survivors, rows)
                else:
                    merged = rows

                # 4. rewrite touched buckets under this batch's directory
                merged = merged.repartition(max(len(touched), 1), F.col(BUCKET_COL))
                (
                    merged.write.mode("overwrite")
                    .partitionBy(BUCKET_COL)
                    .parquet(os.path.join(self.data_dir, f"_stage_b{batch_id}"))
                )
                # move per-bucket results into their committed location
                import shutil

                stage = os.path.join(self.data_dir, f"_stage_b{batch_id}")
                for b in touched:
                    part = os.path.join(stage, f"{BUCKET_COL}={b}")
                    dst = self._bucket_dir(b, batch_id)
                    if os.path.exists(dst):
                        shutil.rmtree(dst)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    if os.path.exists(part):
                        os.rename(part, dst)
                        prev_buckets[str(b)] = dst
                    else:
                        # bucket emptied by deletes: drop it from the
                        # snapshot entirely
                        prev_buckets.pop(str(b), None)
                shutil.rmtree(stage, ignore_errors=True)
        finally:
            latest.unpersist()

        # 5. atomic manifest commit (max_order: high-water mark of the
        #    applied ORDER column, the tombstone-expiry reference point)
        prev_max = prev.get("max_order")
        max_order = max(
            (o for o in (prev_max, batch_max_order) if o is not None), default=None
        )
        tmp = ledger_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "batch_id": batch_id,
                    "committed_at": time.time(),
                    "buckets": prev_buckets,
                    "max_order": max_order,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, ledger_path)

        # 6. scheduled maintenance: the hook is serialized with the
        #    stream, so compacting here needs no maintenance window
        if self.auto_compact_every and (batch_id + 1) % self.auto_compact_every == 0:
            horizon = None
            if self.tombstone_retention is not None and max_order is not None:
                horizon = max_order - self.tombstone_retention
            self.compact(spark, expire_tombstones_below=horizon)

    # -- read side ----------------------------------------------------------
    def read_state(self, spark: SparkSession) -> DataFrame:
        """Live rows only (tombstones filtered; protocol columns dropped)."""
        man = self._manifest()
        dirs = list(man.get("buckets", {}).values())
        if not dirs:
            raise ValueError("no committed state")
        return (
            _read_state_dirs(spark, dirs)
            .filter(~F.col(DELETED_COL))
            .drop(ORDER_COL, DELETED_COL)
        )

    # -- maintenance --------------------------------------------------------
    def compact(
        self,
        spark: SparkSession,
        expire_tombstones_below: Optional[int] = None,
        target_files_per_bucket: int = 1,
    ) -> dict:
        """Copy-on-write maintenance pass: rewrite every bucket coalesced
        to ``target_files_per_bucket`` files, dropping tombstones whose
        LSN is below ``expire_tombstones_below`` (set it to the source's
        minimum replay horizon — an event older than that can never be
        redelivered, so its tombstone is dead weight).

        Safe to run from the ``foreachBatch`` hook (``auto_compact_every``
        does exactly that — the hook is serialized with the stream) or
        while the stream is STOPPED: the pass rewrites the LATEST
        manifest in place (atomic tmp+rename) and leaves prior bucket
        directories untouched, so concurrent readers and a resumed
        stream — including a replay of the last batch, which skips via
        its ledger entry — see a consistent snapshot.
        Returns {bucket: rows_kept}."""
        ledger = self.committed_batches()
        if not ledger:
            return {}
        latest = ledger[-1]
        man = self._manifest()
        buckets: dict[str, str] = dict(man.get("buckets", {}))
        kept: dict[str, int] = {}
        for b, d in sorted(buckets.items()):
            df = spark.read.option("mergeSchema", "true").parquet(d)
            if expire_tombstones_below is not None:
                df = df.filter(
                    ~(F.col(DELETED_COL) & (F.col(ORDER_COL) < expire_tombstones_below))
                )
            n = df.count()
            if n == 0:
                buckets.pop(b, None)
                continue
            out_dir = os.path.join(self.data_dir, f"bucket={b}", f"c{latest}")
            if os.path.abspath(d) == os.path.abspath(out_dir):
                # already compacted at this batch — a rewrite would read
                # and overwrite the same path
                out_dir += f"-{uuid.uuid4().hex[:6]}"
            if os.path.exists(out_dir):
                import shutil

                shutil.rmtree(out_dir)
            df.coalesce(target_files_per_bucket).write.mode("overwrite").parquet(out_dir)
            buckets[b] = out_dir
            kept[b] = n
        man["buckets"] = buckets
        man["compacted_at"] = time.time()
        ledger_path = os.path.join(self.ledger_dir, f"{latest}.json")
        tmp = ledger_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(man, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, ledger_path)
        return kept
