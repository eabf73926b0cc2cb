"""Bloblang processors: `mapping` and `mutation` taking real Bloblang
source (processor_mapping.go:96, processor_mutation.go:102).

Spark-first two-tier execution:

1. **Column tier** (default): the mapping compiles onto pyspark Columns
   (columns.py) — one fused projection, whole-stage codegen, zero
   Python per row. This covers typed-row mappings: field assignments,
   method chains, if/match, lambdas over typed arrays.
2. **Dynamic tier** (fallback, or ``force_dynamic=True``): the mapping
   runs through the interpreter (interp.py) inside ``mapInPandas`` —
   Arrow-batched, one Python process per task, the same execution shape
   as any engine must use for fully-dynamic JSON restructuring. Input
   rows become JSON documents (a single ``value`` string column is
   parsed as JSON; otherwise the row itself is the object). Output is
   a ``value`` JSON-string column plus ``_meta``, or typed columns when
   ``output_schema`` is given.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from benthos_spark.bloblang.ast import MappingAST
from benthos_spark.bloblang.columns import UnsupportedBloblang, compile_mapping
from benthos_spark.bloblang.interp import DELETED, Executor
from benthos_spark.bloblang.parser import parse_mapping
from benthos_spark.operators.processors import META_COL, Processor


def _rows_to_docs(pdf, value_json: bool):
    from benthos_spark.bloblang.interp import Raw

    metas = pdf[META_COL].tolist() if META_COL in pdf.columns else [{}] * len(pdf)
    if value_json:
        docs = []
        for v in pdf["value"].tolist():
            try:
                docs.append(json.loads(v))
            except (json.JSONDecodeError, TypeError):
                # unstructured content: `this` errors, content() works
                # (the reference's lazy bytes↔structured duality)
                docs.append(Raw(v))
    else:
        cols = [c for c in pdf.columns if c != META_COL]
        docs = pdf[cols].to_dict("records")
    return docs, [dict(m) if m is not None else {} for m in metas]


@dataclass
class BloblangMapping(Processor):
    """The `mapping` processor: a full Bloblang mapping constructs a NEW
    document per message (processor_mapping.go:96; executor.go:147
    mapPart semantics — root starts empty, deleted() filters)."""

    src: str
    mutate: bool = False
    force_dynamic: bool = False
    output_schema: Optional[str] = None
    _ast: MappingAST = field(init=False, repr=False)

    def __post_init__(self):
        self._ast = parse_mapping(self.src)

    def __call__(self, df: DataFrame) -> DataFrame:
        if not self.force_dynamic:
            try:
                compiled = compile_mapping(self._ast, df.schema)
                return compiled.apply(df, mutate=self.mutate)
            except UnsupportedBloblang:
                pass
        return self._dynamic(df)

    # -- Arrow-batched dynamic tier -----------------------------------------
    def _dynamic(self, df: DataFrame) -> DataFrame:
        ast = self._ast
        mutate = self.mutate
        value_json = df.columns == ["value"] or set(df.columns) == {"value", META_COL}
        out_schema = self.output_schema or f"value string, {META_COL} map<string,string>"
        typed_out = self.output_schema is not None

        def run(batches) -> Iterator:
            import pandas as pd

            ex = Executor(ast)
            for pdf in batches:
                docs, metas = _rows_to_docs(pdf, value_json)
                out_rows = []
                for doc, meta in zip(docs, metas):
                    new_doc, new_meta = ex.map_part(doc, meta, mutate=mutate)
                    if new_doc is DELETED:
                        continue
                    if typed_out:
                        row = dict(new_doc) if isinstance(new_doc, dict) else {"value": new_doc}
                        out_rows.append(row)
                    else:
                        # string/bytes roots become the raw message
                        # content (executor.go:229 SetBytes); anything
                        # else is structured → JSON
                        if isinstance(new_doc, str):
                            v = new_doc
                        elif isinstance(new_doc, (bytes, bytearray)):
                            v = bytes(new_doc).decode("utf-8", "replace")
                        else:
                            v = json.dumps(new_doc, ensure_ascii=False, default=str)
                        out_rows.append(
                            {
                                "value": v,
                                META_COL: {k: str(v2) for k, v2 in new_meta.items()},
                            }
                        )
                yield pd.DataFrame(out_rows) if out_rows else pd.DataFrame(
                    {c: [] for c in _schema_names(out_schema)}
                )

        return df.mapInPandas(run, schema=out_schema)


def _schema_names(ddl: str) -> list[str]:
    from pyspark.sql.types import StructType

    return StructType.fromDDL(ddl).fieldNames()


@dataclass
class BloblangMutation(BloblangMapping):
    """The `mutation` processor: same language, but root starts as the
    input document and assignments mutate it in place
    (processor_mutation.go:102; executor.go:143 MapOnto)."""

    mutate: bool = True
