"""Processors — batch→batch message transforms as DataFrame functions.

Each class mirrors one reference processor (cited per class from
/root/reference/). A processor is a callable ``DataFrame -> DataFrame``;
pipelines compose them left-to-right into ONE DataFrame lineage, so
Catalyst fuses the whole chain into as few stages as possible (the
reference interprets each processor per message — we compile instead).

Error-routing model: the reference attaches an error slot to each message
(internal/message/part.go:69-78); here it is a nullable ``_error`` string
column. ``Try``/``Catch`` gate work on it exactly like
internal/impl/pure/processor_try.go:22 / processor_catch.go:22.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_COL = "_error"

ColumnLike = "Column | str"


def _to_col(e) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def ensure_error_col(df: DataFrame) -> DataFrame:
    if ERROR_COL not in df.columns:
        df = df.withColumn(ERROR_COL, F.lit(None).cast("string"))
    return df


class Processor:
    """Base: callable DataFrame transform."""

    def __call__(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


@dataclass
class Mapping(Processor):
    """Construct a brand-new document per message (Bloblang ``root = {...}``,
    internal/impl/pure/processor_mapping.go:15). ``exprs`` maps output
    column name → Column/SQL string; the output payload contains ONLY
    these — but the metadata and error side-channels survive (they live
    on the Part, not in the payload: internal/message/part.go:8-11)."""

    exprs: dict[str, object]

    def __call__(self, df: DataFrame) -> DataFrame:
        side = [c for c in (META_COL, ERROR_COL) if c in df.columns]
        return df.select(*[_to_col(e).alias(name) for name, e in self.exprs.items()], *side)


@dataclass
class Mutation(Processor):
    """Assign onto the existing document (internal/impl/pure/
    processor_mutation.go:15) — add/overwrite columns, keep the rest."""

    exprs: dict[str, object]

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.withColumns({k: _to_col(v) for k, v in self.exprs.items()})


@dataclass
class Filter(Processor):
    """``root = deleted()`` gating (internal/bloblang/query/functions.go:315):
    keep rows where ``keep_if`` holds."""

    keep_if: object

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.filter(_to_col(self.keep_if))


@dataclass
class Switch(Processor):
    """Per-message case routing (internal/impl/pure/processor_switch.go:25).

    Each case is ``(check, processors)``; a message runs the FIRST matching
    case's processors. DataFrame form: split-filter-union — each branch
    filter excludes all earlier checks. Outputs must be union-compatible
    (the reference re-sorts to input order, internal/message/sort_group.go;
    row order is meaningless in the DataFrame model so we skip that).

    ``keep_unmatched`` defaults to True for reference parity: the
    processor switch passes non-matching messages through unchanged
    (processor_switch.go — messages failing every check continue)."""

    cases: Sequence[tuple[object, Sequence[Processor]]]
    keep_unmatched: bool = True

    def __call__(self, df: DataFrame) -> DataFrame:
        fused = self._fuse_mutation_only(df)
        if fused is not None:
            return fused
        out = None
        prior = F.lit(False)
        for check, procs in self.cases:
            cond = _to_col(check) if check is not None else F.lit(True)
            branch = df.filter(cond & ~prior)
            for p in procs:
                branch = p(branch)
            out = branch if out is None else out.unionByName(branch, allowMissingColumns=True)
            prior = prior | cond
        if self.keep_unmatched:
            rest = df.filter(~prior)
            out = rest if out is None else out.unionByName(rest, allowMissingColumns=True)
        return out if out is not None else df

    def _fuse_mutation_only(self, df: DataFrame) -> DataFrame | None:
        """Single-pass plan for the common case: every branch is exactly
        one pure column assignment (one Mutation). Split-filter-union
        re-reads the input once PER CASE — a full extra pass over the
        fact table each at 100 TB — whereas first-match routing over
        columns is one scan of when/otherwise chains (what Catalyst
        codegens best). Returns None (general path) otherwise."""
        chains: list[tuple[Column, dict[str, Column]]] = []
        for check, procs in self.cases:
            if len(procs) != 1 or not isinstance(procs[0], Mutation):
                return None
            cond = _to_col(check) if check is not None else F.lit(True)
            chains.append((cond, {k: _to_col(v) for k, v in procs[0].exprs.items()}))

        all_keys: list[str] = []
        for _, exprs in chains:
            for k in exprs:
                if k not in all_keys:
                    all_keys.append(k)

        out_cols: dict[str, Column] = {}
        for k in all_keys:
            keep = F.col(k) if k in df.columns else F.lit(None)
            expr = None
            for cond, exprs in chains:
                expr_val = exprs.get(k, keep)
                expr = F.when(cond, expr_val) if expr is None else expr.when(cond, expr_val)
            out_cols[k] = expr.otherwise(keep) if k in df.columns else expr
        out = df.withColumns(out_cols)
        if not self.keep_unmatched:
            matched = None
            for cond, _ in chains:
                matched = cond if matched is None else (matched | cond)
            out = out.filter(matched)
        return out


@dataclass
class Branch(Processor):
    """request_map → child processors → result_map merged back
    (internal/impl/pure/processor_branch.go:24-57). Spark is columnar, so
    the branch runs as a derived-column pipeline joined back by a row id
    only when the child chain repartitions; otherwise it's a fused
    select."""

    request_cols: Sequence[str]
    processors: Sequence[Processor]
    result_exprs: dict[str, object]
    row_id_col: str = "_branch_rid"

    def __call__(self, df: DataFrame) -> DataFrame:
        # Mutation-only child chains fuse without a join: run them on the
        # frame directly — request/result isolation holds because only
        # result_exprs project back, provided no child assignment shadows
        # an original column.
        assigned = {
            k for p in self.processors if isinstance(p, Mutation) for k in p.exprs
        }
        if all(isinstance(p, Mutation) for p in self.processors) and not (
            assigned & set(df.columns)
        ):
            child = df
            for p in self.processors:
                child = p(child)
            return child.select(
                *df.columns, *[_to_col(e).alias(n) for n, e in self.result_exprs.items()]
            )
        # General path: the child chain may repartition/aggregate, so the
        # result joins back by a row id. monotonically_increasing_id is
        # NOT stable across task retries — localCheckpoint(eager=True)
        # materializes one id assignment that both consumers reuse and
        # survives lineage recomputation (plain persist is best-effort:
        # eviction would re-run the id generator and silently mis-join);
        # ≙ the reference buffering the originating batch while the
        # branch runs, processor_branch.go.
        tagged = df.withColumn(self.row_id_col, F.monotonically_increasing_id()).localCheckpoint(
            eager=True
        )
        child = tagged.select(self.row_id_col, *self.request_cols)
        for p in self.processors:
            child = p(child)
        child = child.select(
            self.row_id_col, *[_to_col(e).alias(n) for n, e in self.result_exprs.items()]
        )
        return tagged.join(child, on=self.row_id_col, how="left").drop(self.row_id_col)


@dataclass
class GroupBy(Processor):
    """`group_by` with per-group processor chains
    (internal/impl/pure/processor_group_by.go:100-137): each message
    joins the FIRST group whose check passes; each group's sub-batch
    runs through that group's own processors; messages matching no
    group pass through unprocessed as their own batch.

    DataFrame form: split-filter per group (earlier checks excluded,
    exactly the first-match rule), run each chain on its sub-frame, and
    union the results (``allowMissingColumns`` — chains may diverge in
    shape). ``split`` exposes the per-group frames for sinks that need
    the batches separately."""

    groups: Sequence[tuple[object, Sequence[Processor]]]

    def split(self, df: DataFrame) -> list[DataFrame]:
        out: list[DataFrame] = []
        prior = F.lit(False)
        for check, procs in self.groups:
            cond = F.coalesce(_to_col(check), F.lit(False))
            branch = df.filter(cond & ~prior)
            for p in procs:
                branch = p(branch)
            out.append(branch)
            prior = prior | cond
        out.append(df.filter(~prior))  # groupless batch, unprocessed
        return out

    def __call__(self, df: DataFrame) -> DataFrame:
        # mutation-only group chains fuse to ONE scan of when/otherwise
        # chains (first-match + groupless pass-through ≡ Switch with
        # keep_unmatched) instead of re-reading the fact per group
        fused = Switch(cases=list(self.groups), keep_unmatched=True)._fuse_mutation_only(df)
        if fused is not None:
            return fused
        parts = self.split(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out


@dataclass
class GroupByValue(Processor):
    """Tag each message with its group key (internal/impl/pure/
    processor_group_by_value.go:23). Downstream aggregation/partitioning
    uses the tag; physical grouping is Spark's shuffle."""

    value: object
    out_col: str = "_group"

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.out_col, _to_col(self.value))


@dataclass
class Dedupe(Processor):
    """Drop messages whose key was already seen (internal/impl/pure/
    processor_dedupe.go:26). Batch: ``dropDuplicates``; streams should use
    :func:`benthos_spark.operators.state.dedupe_within_watermark`."""

    key_cols: Sequence[str]

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.dropDuplicates(list(self.key_cols))


@dataclass
class Split(Processor):
    """Re-batch into chunks (internal/impl/pure/processor_split.go:21).
    Batch boundaries are physical in Spark → repartition. The reference
    splits by message count or byte size (processor_split.go:56-60);
    here ``count`` = rows per partition and ``byte_size`` = payload
    bytes per partition, each sized from one lightweight agg."""

    partitions: int | None = None
    count: int | None = None
    byte_size: int | None = None
    size_col: str | None = None  # payload column measured for byte_size

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.partitions is not None:
            return df.repartition(self.partitions)
        if df.isStreaming and (self.count is not None or self.byte_size is not None):
            raise ValueError(
                "split: count/byte_size sizing runs a batch-only aggregation "
                "(count()/agg().collect()) and cannot execute on a streaming "
                "DataFrame; use partitions=N or a `period` trigger policy"
            )
        if self.count is not None:
            n_rows = df.count()
            return df.repartition(max(1, -(-n_rows // self.count)))
        if self.byte_size is not None:
            if not self.size_col:
                raise ValueError("byte_size split needs size_col")
            total = df.agg(F.sum(F.length(F.col(self.size_col)))).collect()[0][0] or 0
            return df.repartition(max(1, -(-int(total) // self.byte_size)))
        raise ValueError("split needs one of partitions/count/byte_size")


@dataclass
class Archive(Processor):
    """Batch → single message (internal/impl/pure/processor_archive.go:59).

    ``lines``/``concatenate`` → sorted ``collect_list`` + ``array_join``;
    ``json_array`` → ``to_json(collect_list(struct(...)))``. Sorting makes
    the result deterministic (the reference preserves arrival order; a
    distributed engine must impose an explicit order instead)."""

    group_cols: Sequence[str]
    payload: object
    fmt: str = "lines"
    out_col: str = "archived"
    order_by: object | None = None
    name_col: object | None = None  # per-entry filename for tar/zip

    def __call__(self, df: DataFrame) -> DataFrame:
        payload = _to_col(self.payload)
        if self.fmt in ("lines", "concatenate"):
            sep = "\n" if self.fmt == "lines" else ""
            agg = F.array_join(F.array_sort(F.collect_list(payload)), sep)
        elif self.fmt == "json_array":
            agg = F.to_json(F.array_sort(F.collect_list(payload)))
        elif self.fmt in ("tar", "zip", "binary"):
            return self._archive_files(df, payload)
        else:
            raise ValueError(f"unsupported archive format {self.fmt}")
        return df.groupBy(*self.group_cols).agg(agg.alias(self.out_col))

    def _archive_files(self, df: DataFrame, payload) -> DataFrame:
        """tar/zip pack entries named by ``name_col``
        (processor_archive.go:186-197 tar/zip cases) and the reference's
        length-prefixed `binary` batch blob (message.go:79-99). One agg
        (collect entries, sorted for determinism) + one Arrow UDF per
        group — no per-row Python."""
        fmt = self.fmt
        name = _to_col(self.name_col) if self.name_col is not None else F.lit(None)
        entries = F.array_sort(
            F.collect_list(F.struct(name.cast("string").alias("name"), payload.alias("data")))
        )

        def pack(s: pd.Series) -> pd.Series:
            import io
            import struct
            import tarfile
            import zipfile

            out = []
            for ents in s:
                if fmt == "binary":
                    parts = [bytes(e["data"]) for e in ents]
                    blob = struct.pack(">I", len(parts))
                    for p in parts:
                        blob += struct.pack(">I", len(p)) + p
                    out.append(blob)
                    continue
                buf = io.BytesIO()
                if fmt == "tar":
                    with tarfile.open(fileobj=buf, mode="w") as tf:
                        for i, e in enumerate(ents):
                            data = bytes(e["data"])
                            ti = tarfile.TarInfo(e["name"] or f"part_{i}")
                            ti.size = len(data)
                            ti.mtime = 0  # deterministic bytes
                            tf.addfile(ti, io.BytesIO(data))
                else:
                    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
                        for i, e in enumerate(ents):
                            zi = zipfile.ZipInfo(e["name"] or f"part_{i}", (1980, 1, 1, 0, 0, 0))
                            zf.writestr(zi, bytes(e["data"]))
                out.append(buf.getvalue())
            return pd.Series(out)

        grouped = df.groupBy(*self.group_cols).agg(entries.alias("_entries"))
        udf = F.pandas_udf(pack, "binary")
        return grouped.withColumn(self.out_col, udf(F.col("_entries"))).drop("_entries")


@dataclass
class Unarchive(Processor):
    """Single message → batch (internal/impl/pure/processor_unarchive.go:45):
    ``lines`` splits + explodes; ``json_array`` parses + explodes."""

    col: str
    fmt: str = "lines"
    out_col: str = "part"
    element_type: str = "string"

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.fmt == "lines":
            parts = F.split(F.col(self.col), "\n")
        elif self.fmt == "json_array":
            parts = F.from_json(F.col(self.col), f"array<{self.element_type}>")
        elif self.fmt == "words":
            parts = F.split(F.trim(F.col(self.col)), r"\s+")
        elif self.fmt == "json_map":
            # object → one message per key, key in metadata archive_key
            # (processor_unarchive.go:289-304 json_map case)
            kv = F.explode(F.from_json(F.col(self.col), f"map<string,{self.element_type}>"))
            return (
                df.select("*", kv.alias("archive_key", self.out_col)).drop(self.col)
            )
        elif self.fmt == "csv":
            # CSV doc → one message per record as a key→value map
            # (processor_unarchive.go csv case: header row names fields)
            return self._unarchive_csv(df)
        elif self.fmt in ("tar", "zip", "binary"):
            return self._unarchive_files(df)
        else:
            raise ValueError(f"unsupported unarchive format {self.fmt}")
        return df.withColumn(self.out_col, F.explode(parts)).drop(self.col)

    def _unarchive_csv(self, df: DataFrame) -> DataFrame:
        lines = F.split(F.col(self.col), "\r?\n")
        header = F.split(F.element_at(lines, 1), ",")
        body = F.filter(
            F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0))),
            lambda l: F.length(l) > 0,
        )
        rows = F.transform(body, lambda l: F.map_from_arrays(header, F.split(l, ",")))
        return df.withColumn(self.out_col, F.explode(rows)).drop(self.col)

    def _unarchive_files(self, df: DataFrame) -> DataFrame:
        """tar/zip/binary → one row per contained entry
        (processor_unarchive.go:289-304): Arrow UDF returns
        array<struct<name,data>>, then a JVM-side explode."""
        fmt = self.fmt

        def unpack(s: pd.Series) -> pd.Series:
            import io
            import struct
            import tarfile
            import zipfile

            out = []
            for blob in s:
                b = bytes(blob)
                ents = []
                if fmt == "binary":
                    (n,) = struct.unpack_from(">I", b, 0)
                    off = 4
                    for i in range(n):
                        (ln,) = struct.unpack_from(">I", b, off)
                        off += 4
                        ents.append({"name": str(i), "data": b[off : off + ln]})
                        off += ln
                elif fmt == "tar":
                    with tarfile.open(fileobj=io.BytesIO(b)) as tf:
                        for m in tf.getmembers():
                            if m.isfile():
                                ents.append({"name": m.name, "data": tf.extractfile(m).read()})
                else:
                    with zipfile.ZipFile(io.BytesIO(b)) as zf:
                        for zi in zf.infolist():
                            if not zi.is_dir():
                                ents.append({"name": zi.filename, "data": zf.read(zi)})
                out.append(ents)
            return pd.Series(out)

        udf = F.pandas_udf(unpack, "array<struct<name:string,data:binary>>")
        ent = F.explode(udf(F.col(self.col)))
        return (
            df.select("*", ent.alias("_e"))
            .drop(self.col)
            .withColumn("archive_name", F.col("_e.name"))
            .withColumn(self.out_col, F.col("_e.data"))
            .drop("_e")
        )


@dataclass
class BoundsCheck(Processor):
    """Drop messages violating size bounds (internal/impl/pure/
    processor_bounds_check.go:22)."""

    col: str
    min_len: int = 0
    max_len: int = 1 << 62

    def __call__(self, df: DataFrame) -> DataFrame:
        ln = F.length(F.col(self.col))
        return df.filter((ln >= self.min_len) & (ln <= self.max_len))


@dataclass
class Tag(Processor):
    """Set the error slot where ``cond`` holds (≙ ``throw()``/failed parts,
    internal/batch/error.go:13-45)."""

    cond: object
    message: object

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        return df.withColumn(
            ERROR_COL,
            F.when(F.col(ERROR_COL).isNotNull(), F.col(ERROR_COL))
            .when(_to_col(self.cond), _to_col(self.message))
            .otherwise(F.lit(None).cast("string")),
        )


@dataclass
class TryCastMutation(Processor):
    """Assignments whose *runtime* failures populate the error slot —
    the reference marks a part failed when any processor errors on it
    (internal/batch/error.go:13-45), e.g. a bad number parse. Spark's
    non-ANSI casts return NULL instead of erroring, which would silently
    lose the failure; this processor uses ``try_cast`` + a
    source-not-null ⇒ result-null check to tag ``_error`` exactly where
    the conversion failed, so `try`/`catch` routing sees real runtime
    failures, not just explicit ``Tag``s.

    ``casts`` maps output column → (source expr, target type)."""

    casts: dict
    error_fmt: str = "failed to cast {name}"

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        tmp = "__trycast_tmp"
        for name, (source, dtype) in self.casts.items():
            src = _to_col(source)
            # Stage the cast under a temp name so `src` still resolves to
            # the PRE-cast value when the output name equals the source
            # column — otherwise the failure check would compare the cast
            # result against itself and never fire.
            df = df.withColumn(tmp, src.try_cast(dtype))
            failed = src.isNotNull() & F.col(tmp).isNull()
            err = (
                F.when(F.col(ERROR_COL).isNotNull(), F.col(ERROR_COL))
                .when(failed, F.lit(self.error_fmt.format(name=name)))
                .otherwise(F.lit(None).cast("string"))
            )
            df = df.withColumn(ERROR_COL, err).withColumn(name, F.col(tmp)).drop(tmp)
        return df


@dataclass
class Try(Processor):
    """Apply children only to not-yet-errored messages
    (internal/impl/pure/processor_try.go:22; execute.go:38)."""

    processors: Sequence[Processor]

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        ok, bad = df.filter(F.col(ERROR_COL).isNull()), df.filter(F.col(ERROR_COL).isNotNull())
        for p in self.processors:
            ok = p(ok)
        return ok.unionByName(bad, allowMissingColumns=True)


@dataclass
class Catch(Processor):
    """Apply children only to errored messages, then clear the error
    (internal/impl/pure/processor_catch.go:22; execute.go:72)."""

    processors: Sequence[Processor]

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        ok, bad = df.filter(F.col(ERROR_COL).isNull()), df.filter(F.col(ERROR_COL).isNotNull())
        for p in self.processors:
            bad = p(bad)
        bad = bad.withColumn(ERROR_COL, F.lit(None).cast("string"))
        return ok.unionByName(bad, allowMissingColumns=True)


@dataclass
class SelectParts(Processor):
    """Keep only given indices within each group, by explicit order
    (internal/impl/pure/processor_select_parts.go:20). Distributed batches
    have no arrival order, so ordering is an explicit column."""

    order_by: object
    indices: Sequence[int]
    group_cols: Sequence[str] = field(default_factory=list)

    def __call__(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        part = Window.partitionBy(*self.group_cols) if self.group_cols else Window.partitionBy()
        w = part.orderBy(_to_col(self.order_by))
        return (
            df.withColumn("_ix", F.row_number().over(w) - 1)
            .filter(F.col("_ix").isin(list(self.indices)))
            .drop("_ix")
        )


@dataclass
class InsertPart(Processor):
    """Insert a literal message (internal/impl/pure/processor_insert_part.go:23):
    union with a one-row literal DataFrame."""

    values: dict[str, object]

    def __call__(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        row = spark.range(1).select(
            *[F.lit(v).cast(df.schema[k].dataType).alias(k) for k, v in self.values.items()]
        )
        return df.unionByName(row, allowMissingColumns=True)


@dataclass
class While(Processor):
    """`while` processor (internal/impl/pure/processor_while.go:27) —
    per-message loop semantics: each iteration applies the child chain to
    the rows still matching ``cond`` and leaves the rest untouched; stops
    when no row matches or ``max_loops`` is reached. Driver-side
    iteration (one count job per pass — the reference documents `while`
    as an escape hatch, and so do we); ``persist_every`` checkpoints the
    growing plan so deep loops don't blow up Catalyst analysis time."""

    cond: object  # Column predicate (or SQL string) per row
    processors: Sequence[Processor]
    max_loops: int = 10
    persist_every: int = 4

    def __call__(self, df: DataFrame) -> DataFrame:
        # NULL-condition rows must count as non-matching, not vanish:
        # df.filter(c) AND df.filter(~c) both exclude NULL rows (SQL
        # three-valued logic), so coalesce the predicate once.
        cond = F.coalesce(_to_col(self.cond), F.lit(False))
        for i in range(self.max_loops):
            matching = df.filter(cond)
            if matching.isEmpty():
                break
            stepped = matching
            for p in self.processors:
                stepped = p(stepped)
            df = df.filter(~cond).unionByName(stepped, allowMissingColumns=True)
            if self.persist_every and (i + 1) % self.persist_every == 0:
                df = df.persist()
        return df


@dataclass
class Cached(Processor):
    """`cached` processor (internal/impl/pure/processor_cached.go:90):
    memoise the child chain's result, with the reference's optional TTL
    (processor_cached.go ttl field). Spark-first: the memo is a
    persisted DataFrame keyed in a registry — repeated pipeline runs
    reuse the materialized result; an expired entry is unpersisted and
    recomputed."""

    processors: Sequence[Processor]
    key: str
    ttl_s: float | None = None
    _registry: dict = field(default_factory=dict)  # class-level override below

    REGISTRY: dict = None  # type: ignore[assignment]

    def __post_init__(self):
        if Cached.REGISTRY is None:
            Cached.REGISTRY = {}

    def __call__(self, df: DataFrame) -> DataFrame:
        import time

        hit = Cached.REGISTRY.get(self.key)
        if hit is not None:
            cached_df, stamp = hit
            if self.ttl_s is None or (time.monotonic() - stamp) < self.ttl_s:
                return cached_df
            cached_df.unpersist()
            del Cached.REGISTRY[self.key]
        out = df
        for p in self.processors:
            out = p(out)
        out = out.persist()
        Cached.REGISTRY[self.key] = (out, time.monotonic())
        return out


@dataclass
class Noop(Processor):
    """internal/impl/pure/processor_noop.go:16."""

    def __call__(self, df: DataFrame) -> DataFrame:
        return df


_GO_DUR_RE = None


def _go_duration_seconds(s: str) -> float:
    """Go time.ParseDuration subset: "300ms", "1.5s", "2m45s"."""
    global _GO_DUR_RE
    import re as _re

    if _GO_DUR_RE is None:
        _GO_DUR_RE = _re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")
    s = s.strip()
    if not s:
        raise ValueError("empty duration")
    neg = s.startswith("-")
    if s[0] in "+-":
        s = s[1:]
    unit_s = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
              "s": 1.0, "m": 60.0, "h": 3600.0}
    total = 0.0
    pos = 0
    for m in _GO_DUR_RE.finditer(s):
        if m.start() != pos:
            raise ValueError(f"invalid duration {s!r}")
        total += float(m.group(1)) * unit_s[m.group(2)]
        pos = m.end()
    if pos != len(s):
        raise ValueError(f"invalid duration {s!r}")
    return -total if neg else total


@dataclass
class Sleep(Processor):
    """`sleep` processor (internal/impl/pure/processor_sleep.go:26):
    sleep the interpolated Go-duration per message. A throttling /
    testing utility — the sleep happens inside the Arrow batch scan on
    the executor, so it rate-shapes each partition exactly like the
    reference shapes each pipeline lane. Interpolation failures follow
    the reference: log-and-skip, never fail the message."""

    duration: str = ""

    def __post_init__(self):
        if not self.duration:
            raise ValueError("sleep processor needs a `duration`")
        if "${!" not in self.duration:
            _go_duration_seconds(self.duration)  # fail fast on the driver

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.bloblang import interpolate

        dur_col = (
            interpolate(self.duration)
            if "${!" in self.duration
            else F.lit(self.duration)
        )
        out_schema = df.schema
        cols = df.columns
        tmp = df.withColumn("_sleep_dur", dur_col)

        def run(batches):
            import time as _time

            for pdf in batches:
                for d in pdf["_sleep_dur"]:
                    try:
                        secs = _go_duration_seconds(str(d))
                    except ValueError:
                        continue  # reference logs and moves on
                    if secs > 0:
                        _time.sleep(secs)
                yield pdf[cols]

        return tmp.mapInPandas(run, schema=out_schema)


@dataclass
class Observe(Processor):
    """`log`/`metric` processors (internal/impl/pure/processor_log.go:26,
    processor_metric.go:24) → ``df.observe`` named metrics, readable from a
    StreamingQueryListener or ``Observation``."""

    name: str
    metrics: dict[str, Column]

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.observe(self.name, *[m.alias(k) for k, m in self.metrics.items()])


def _codec_pair(algorithm: str, level: int = 6):
    """(compress_fn, decompress_fn) for the reference's algorithm set
    (processor_compress.go:21: gzip/pgzip/zlib/flate/snappy/lz4/zstd).
    gzip/zlib/flate are stdlib; snappy/lz4/zstd are import-gated (libs
    absent in the offline sandbox — the Spark plumbing is identical)."""
    if algorithm in ("gzip", "pgzip"):  # pgzip = parallel gzip, same format
        import gzip as _gz

        return (lambda b: _gz.compress(b, compresslevel=level)), _gz.decompress
    if algorithm == "zlib":
        return (lambda b: zlib.compress(b, level)), zlib.decompress
    if algorithm == "flate":  # raw DEFLATE stream (RFC 1951)
        def _c(b):
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            return co.compress(b) + co.flush()

        def _d(b):
            return zlib.decompressobj(-15).decompress(b)

        return _c, _d
    if algorithm == "bzip2":
        # the reference offers bzip2 on DECOMPRESS only (Go stdlib has no
        # writer, bloblang_encoding.go:303); python's bz2 does both —
        # compress is a superset convenience
        import bz2 as _bz2

        return (lambda b: _bz2.compress(b, min(max(level, 1), 9))), _bz2.decompress
    if algorithm == "snappy":
        try:
            import snappy  # type: ignore  # native lib when present (faster)

            return snappy.compress, snappy.decompress
        except ImportError:
            from benthos_spark.functions import snappy as _snappy

            return _snappy.compress, _snappy.decompress
    if algorithm == "lz4":
        try:
            import lz4.frame  # type: ignore  # native lib when present (faster)

            return lz4.frame.compress, lz4.frame.decompress
        except ImportError:
            from benthos_spark.functions import lz4frame as _lz4

            return _lz4.compress, _lz4.decompress
    if algorithm == "zstd":
        try:
            import zstandard  # type: ignore  # native lib when present (faster + real compression)

            return zstandard.ZstdCompressor(level=level).compress, (
                lambda b: zstandard.ZstdDecompressor().decompress(b)
            )
        except ImportError:
            # pure-python RFC 8878: decoder is format-complete and the
            # encoder is a real LZ77 + predefined-FSE compressor (both
            # cross-validated against zstd-jni)
            from benthos_spark.functions import zstd as _zstd

            return _zstd.compress_lz, _zstd.decompress
    raise ValueError(f"unknown compression algorithm {algorithm!r}")


def _codec_udf(algorithm: str, compress: bool, level: int = 6) -> Callable[[pd.Series], pd.Series]:
    c, d = _codec_pair(algorithm, level)
    fn = c if compress else d
    return lambda s: s.map(lambda b: fn(bytes(b)) if b is not None else None)


@dataclass
class Compress(Processor):
    """internal/impl/pure/processor_compress.go:21 — algorithm-selectable
    compression over a binary column via an Arrow-batched pandas UDF."""

    col: str
    level: int = 6
    algorithm: str = "zlib"

    def __call__(self, df: DataFrame) -> DataFrame:
        udf = F.pandas_udf(_codec_udf(self.algorithm, True, self.level), "binary")
        return df.withColumn(self.col, udf(F.col(self.col)))


@dataclass
class Decompress(Processor):
    """internal/impl/pure/processor_decompress.go:21."""

    col: str
    algorithm: str = "zlib"

    def __call__(self, df: DataFrame) -> DataFrame:
        udf = F.pandas_udf(_codec_udf(self.algorithm, False), "binary")
        return df.withColumn(self.col, udf(F.col(self.col)))


# Minimal grok pattern library (the reference vendors the full grok set;
# these cover its common log cases, internal/impl/pure/processor_grok.go:30).
GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "LOGLEVEL": r"DEBUG|INFO|WARN|ERROR|FATAL",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "GREEDYDATA": r".*",
    "DATA": r".*?",
}

_GROK_TOKEN = r"%\{(\w+):(\w+)\}"


def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile ``%{TYPE:name}`` grok templates into one regex + the capture
    names, escaping literal segments."""
    import re as _re

    regex, names, pos = [], [], 0
    for m in _re.finditer(_GROK_TOKEN, pattern):
        regex.append(_re.escape(pattern[pos : m.start()]))
        ptype, name = m.group(1), m.group(2)
        if ptype not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{ptype}}}")
        regex.append(f"({GROK_PATTERNS[ptype]})")
        names.append(name)
        pos = m.end()
    regex.append(_re.escape(pattern[pos:]))
    return "".join(regex), names


@dataclass
class Grok(Processor):
    """`grok` processor (internal/impl/pure/processor_grok.go:30): parse a
    string column into named fields with ``regexp_extract`` — one JVM-side
    regex per captured field, no UDF."""

    col: str
    pattern: str
    types: dict[str, str] = field(default_factory=dict)

    def __call__(self, df: DataFrame) -> DataFrame:
        regex, names = grok_to_regex(self.pattern)
        out = {}
        for ix, name in enumerate(names, start=1):
            c = F.regexp_extract(F.col(self.col), regex, ix)
            t = self.types.get(name)
            out[name] = c.cast(t) if t else c
        return df.withColumns(out)


@dataclass
class ParseLog(Processor):
    """`parse_log` (internal/impl/pure/processor_parse_log.go:28) — the
    reference's two formats (syslog_rfc5424, syslog_rfc3164) as pure
    JVM regex extraction (one codegen'd projection, no Python), plus an
    `app_log` grok template used by local fixtures. Field names match
    the go-syslog output keys (appname/hostname/message/msgid/procid/
    priority/facility/severity/timestamp/version/structureddata)."""

    col: str
    format: str = "syslog_rfc5424"
    default_year: int | None = None  # rfc3164 timestamps carry no year

    _FORMATS = {
        # e.g. "2024-03-01T00:00:05 INFO svc-7 order 42 total 18.5"
        "app_log": "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{NOTSPACE:service} %{GREEDYDATA:message}",
    }

    # RFC5424: <PRI>VERSION TS HOST APP PROCID MSGID [SD] MSG
    _RFC5424 = (
        r"^<(\d{1,3})>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+) "
        r"((?:\[.*?\])+|-)\s?(.*)$"
    )
    # RFC3164: <PRI>Mmm dd hh:mm:ss HOST TAG[PID]: MSG
    _RFC3164 = (
        r"^<(\d{1,3})>([A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) (\S+) "
        r"([^\[:\s]+)(?:\[(\d+)\])?:\s?(.*)$"
    )

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.format == "app_log":
            return Grok(self.col, self._FORMATS[self.format], types={"ts": "timestamp"})(df)
        line = F.col(self.col)

        def grp(pat: str, i: int) -> Column:
            g = F.regexp_extract(line, pat, i)
            return F.when(g == "", F.lit(None)).otherwise(g)

        if self.format == "syslog_rfc5424":
            pri = grp(self._RFC5424, 1).cast("int")
            dash_null = lambda c: F.when(c == "-", F.lit(None)).otherwise(c)
            return df.withColumns({
                "priority": pri,
                "facility": (pri / 8).cast("int"),
                "severity": pri % 8,
                "version": grp(self._RFC5424, 2).cast("int"),
                "timestamp": dash_null(grp(self._RFC5424, 3)).cast("timestamp"),
                "hostname": dash_null(grp(self._RFC5424, 4)),
                "appname": dash_null(grp(self._RFC5424, 5)),
                "procid": dash_null(grp(self._RFC5424, 6)),
                "msgid": dash_null(grp(self._RFC5424, 7)),
                "structureddata": dash_null(grp(self._RFC5424, 8)),
                "message": grp(self._RFC5424, 9),
            })
        if self.format == "syslog_rfc3164":
            import datetime

            year = self.default_year or datetime.date.today().year
            pri = grp(self._RFC3164, 1).cast("int")
            ts = F.to_timestamp(
                F.concat(F.lit(f"{year} "), grp(self._RFC3164, 2)), "yyyy MMM [ ]d HH:mm:ss"
            )
            return df.withColumns({
                "priority": pri,
                "facility": (pri / 8).cast("int"),
                "severity": pri % 8,
                "timestamp": ts,
                "hostname": grp(self._RFC3164, 3),
                "appname": grp(self._RFC3164, 4),
                "procid": grp(self._RFC3164, 5),
                "message": grp(self._RFC3164, 6),
            })
        raise ValueError(
            f"unknown parse_log format {self.format!r}; known: "
            "syslog_rfc5424, syslog_rfc3164, app_log"
        )


@dataclass
class JsonSchema(Processor):
    """`json_schema` (internal/impl/pure/processor_jsonschema.go:26):
    validate a JSON-string column against required keys + primitive types;
    failures set the ``_error`` slot (the reference errors the message)."""

    col: str
    required: dict[str, str]  # field name -> "int" | "double" | "string"

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        err = F.lit(None).cast("string")
        for name, typ in reversed(self.required.items()):
            raw = F.get_json_object(F.col(self.col), f"$.{name}")
            missing = raw.isNull()
            bad_type = (
                raw.try_cast(typ).isNull() & raw.isNotNull() if typ != "string" else F.lit(False)
            )
            err = (
                F.when(missing, F.lit(f"missing required field {name}"))
                .when(bad_type, F.lit(f"field {name} is not {typ}"))
                .otherwise(err)
            )
        return df.withColumn(
            ERROR_COL, F.when(F.col(ERROR_COL).isNotNull(), F.col(ERROR_COL)).otherwise(err)
        )


@dataclass
class Workflow(Processor):
    """`workflow` (internal/impl/pure/processor_workflow.go:27): a DAG of
    named stages auto-ordered from dependencies
    (processor_workflow_branch_map.go:58-71). Stages are DataFrame
    transforms; Catalyst fuses independent column subtrees into one pass,
    so "parallel tiers" is plan-level, not thread-level."""

    stages: dict[str, tuple[Sequence[str], Callable[[DataFrame], DataFrame]]]

    def order(self) -> list[str]:
        done: list[str] = []
        pending = dict(self.stages)
        while pending:
            ready = [n for n, (deps, _) in pending.items() if all(d in done for d in deps)]
            if not ready:
                raise ValueError(f"workflow cycle among {sorted(pending)}")
            for n in sorted(ready):  # deterministic tie-break
                done.append(n)
                del pending[n]
        return done

    def __call__(self, df: DataFrame) -> DataFrame:
        for name in self.order():
            df = self.stages[name][1](df)
        return df


@dataclass
class Apply(Processor):
    """Arbitrary ``DataFrame -> DataFrame`` plug-in (≙ the reference's Go
    plugin processors, /root/reference/public/service/; our single escape
    hatch for joins/custom logic inside a processor chain)."""

    fn: Callable[[DataFrame], DataFrame]

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass
class DedupeDeterministic(Processor):
    """Deterministic dedupe: one survivor per key, chosen by ``min(pick)``
    — unlike `dropDuplicates` (arbitrary survivor), this is reproducible
    across engines/runs, which the reference gets for free from ordered
    delivery (processor_dedupe.go keeps the FIRST arrival)."""

    key: object
    pick: str

    def __call__(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.partitionBy(_to_col(self.key)).orderBy(F.col(self.pick))
        return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


META_COL = "_meta"


def ensure_meta_col(df: DataFrame) -> DataFrame:
    if META_COL not in df.columns:
        df = df.withColumn(META_COL, F.create_map().cast("map<string,string>"))
    return df


@dataclass
class WithMeta(Processor):
    """Metadata assignment (`meta foo = ...`,
    internal/bloblang/parser/mapping_parser.go:363; accessors
    internal/message/part.go:121-164): the untyped per-message metadata
    side-channel is a ``_meta map<string,string>`` column; assignments
    merge in (later keys win, like repeated `meta` statements)."""

    entries: dict[str, object]

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_meta_col(df)
        pairs = []
        for k, v in self.entries.items():
            pairs += [F.lit(k), _to_col(v).cast("string")]
        update = F.create_map(*pairs)
        merged = F.map_concat(
            F.map_filter(F.col(META_COL), lambda k, v: ~F.map_contains_key(update, k)), update
        )
        return df.withColumn(META_COL, merged)


@dataclass
class MetaFilter(Processor):
    """Output metadata include-filter
    (internal/metadata/include_filter.go:33-34): keep only meta keys with
    one of the ``include_prefixes`` or matching ``include_patterns``."""

    include_prefixes: Sequence[str] = field(default_factory=list)
    include_patterns: Sequence[str] = field(default_factory=list)

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_meta_col(df)

        def keep(k, v):
            cond = F.lit(False)
            for p in self.include_prefixes:
                cond = cond | k.startswith(p)
            for pat in self.include_patterns:
                cond = cond | k.rlike(pat)
            return cond

        return df.withColumn(META_COL, F.map_filter(F.col(META_COL), keep))


def meta_get(key: str):
    """`metadata("key")` (internal/bloblang/query/functions.go:509)."""
    return F.col(META_COL).getItem(key)


def compose(df: DataFrame, processors: Iterable[Processor]) -> DataFrame:
    for p in processors:
        df = p(df)
    return df


@dataclass
class ParquetDecode(Processor):
    """`parquet_decode` (internal/impl/parquet/processor_decode.go):
    each message's binary payload is a parquet FILE; explode it into one
    message per contained row (JSON payloads). pyarrow-backed, one
    Arrow hop per file blob."""

    col: str
    out_col: str = "row"

    def __call__(self, df: DataFrame) -> DataFrame:
        import json as _json

        def unpack(s: pd.Series) -> pd.Series:
            import io

            import pyarrow.parquet as pq

            out = []
            for blob in s:
                table = pq.read_table(io.BytesIO(bytes(blob)))
                out.append([_json.dumps(r, default=str) for r in table.to_pylist()])
            return pd.Series(out)

        udf = F.pandas_udf(unpack, "array<string>")
        return (
            df.withColumn(self.out_col, F.explode(udf(F.col(self.col))))
            .drop(self.col)
        )


@dataclass
class ParquetEncode(Processor):
    """`parquet_encode` (internal/impl/parquet/processor_encode.go):
    pack each group's rows into ONE parquet-file payload. ``payload_cols``
    select the row fields; deterministic sort keeps replays byte-stable."""

    group_cols: Sequence[str]
    payload_cols: Sequence[str]
    out_col: str = "parquet"
    compression: str = "snappy"

    def __call__(self, df: DataFrame) -> DataFrame:
        rows = F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in self.payload_cols]))
        )
        comp = self.compression

        def pack(s: pd.Series) -> pd.Series:
            import io

            import pyarrow as pa
            import pyarrow.parquet as pq

            out = []
            for entries in s:
                table = pa.Table.from_pylist([dict(e) for e in entries])
                buf = io.BytesIO()
                pq.write_table(table, buf, compression=comp)
                out.append(buf.getvalue())
            return pd.Series(out)

        udf = F.pandas_udf(pack, "binary")
        grouped = df.groupBy(*self.group_cols).agg(rows.alias("_rows"))
        return grouped.withColumn(self.out_col, udf(F.col("_rows"))).drop("_rows")
