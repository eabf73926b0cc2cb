"""Bloblang mapping-language frontend.

The reference's core UX is the Bloblang mapping language
(/root/reference/internal/bloblang/parser/mapping_parser.go:19 ParseMapping):
``root.x = this.y.uppercase()`` statements plus ``let``/``meta``/``map``/
``import``, an expression grammar with method chains, ``if``/``match``,
lambdas, and 4-tier operator precedence
(internal/bloblang/query/arithmetic.go:432 NewArithmeticExpression).

This package is a from-scratch Python implementation with TWO compilers
over one AST — the Spark-first split:

- :mod:`columns` — compiles the typed subset to pyspark ``Column``
  expressions over the existing helper layer
  (:mod:`benthos_spark.functions.bloblang`). Whole-stage codegen, zero
  Python in the hot path. Used whenever the mapping only touches typed
  row fields.
- :mod:`interp` — a dynamic-document evaluator over plain JSON values,
  used by the golden-test harness (``benthos test`` analogue) and by the
  Arrow-batched ``mapInPandas`` fallback for mappings that restructure
  fully dynamic documents (the reference's bytes-or-JSON model,
  internal/message/data.go:4-15).
"""

from benthos_spark.bloblang.parser import BloblangParseError, parse_mapping
from benthos_spark.bloblang.interp import BloblangError, Executor
from benthos_spark.bloblang.columns import UnsupportedBloblang, compile_mapping
from benthos_spark.bloblang.processor import BloblangMapping, BloblangMutation

__all__ = [
    "parse_mapping",
    "BloblangParseError",
    "Executor",
    "BloblangError",
    "compile_mapping",
    "UnsupportedBloblang",
    "BloblangMapping",
    "BloblangMutation",
]
