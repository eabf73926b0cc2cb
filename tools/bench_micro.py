"""Pipeline micro-benchmarks mirroring the reference's
``BenchmarkStreamPipelines`` shapes (/root/reference/public/service/
benchmark_test.go:17-451): generate → processor chain → drop, measured
in rows/sec and ns/row.

The reference interprets Bloblang per message (ns/op per message in Go);
here the same chains compile to whole-stage-codegen'd Column expressions,
so the per-row cost amortizes to the tens-of-ns range — the
"matches-or-beats single-node throughput" evidence at the operator level.

Usage: python tools/bench_micro.py [--rows 20000000] [--update-md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def pipelines():
    """The benchmark_test.go pipeline shapes, reproduced on a generated
    (timestamp, value)-style stream of synthetic order-ish rows."""
    from benthos_spark.operators.processors import (
        Branch,
        Mapping,
        Mutation,
        Switch,
        Workflow,
    )

    # 3-op json-ish chain (≙ the 3×jq benchmark): extract/compute/rename
    three_op = [
        Mutation({"a": F.get_json_object("props", "$.k").cast("int")}),
        Mutation({"b": F.col("a") * 2 + 1}),
        Mapping({"id": F.col("id"), "result": F.col("b").cast("string")}),
    ]
    return {
        "basic_passthrough": [],
        "mapping": [Mapping({"id": F.col("id"), "doubled": F.col("v") * 2})],
        "mutation": [Mutation({"doubled": F.col("v") * 2})],
        "three_op_chain": three_op,
        "branch": [
            Branch(
                request_cols=["v"],
                processors=[Mutation({"sq": F.col("v") * F.col("v")})],
                result_exprs={"squared": F.col("sq")},
            )
        ],
        "workflow": [
            Workflow(
                stages={
                    "a": ([], Mutation({"x": F.col("v") * 2})),
                    "b": (["a"], Mutation({"y": F.col("x") + 1})),
                    "c": ([], Mutation({"z": F.col("v") - 1})),
                }
            )
        ],
        "processor_switch": [
            Switch(
                cases=[
                    (F.col("v") % 3 == 0, [Mutation({"route": F.lit("a")})]),
                    (F.col("v") % 3 == 1, [Mutation({"route": F.lit("b")})]),
                    (None, [Mutation({"route": F.lit("c")})]),
                ]
            )
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--update-md", action="store_true")
    args = ap.parse_args()

    from benthos_spark.session import get_spark

    spark = get_spark(app="bench-micro")
    spark.sparkContext.setLogLevel("ERROR")

    # the `generate` input: synthesized rows, all JVM-side
    src = spark.range(args.rows).select(
        F.col("id"),
        (F.col("id") % 1000).alias("v"),
        F.concat(F.lit('{"k": '), (F.col("id") % 100).cast("string"), F.lit("}")).alias("props"),
    )

    results = {}
    for name, procs in pipelines().items():
        df = src
        for p in procs:
            df = p(df)
        df.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        sec = time.time() - t0
        results[name] = {
            "sec": round(sec, 3),
            "rows_per_sec": round(args.rows / sec),
            "ns_per_row": round(sec / args.rows * 1e9, 1),
        }
        print(f"# {name}: {results[name]['rows_per_sec']:,} rows/s "
              f"({results[name]['ns_per_row']} ns/row)", file=sys.stderr)

    print(json.dumps({"metric": "pipeline_micro", "rows": args.rows, "results": results}))
    if args.update_md:
        update_md(args.rows, results)
    spark.stop()


def update_md(rows: int, results: dict) -> None:
    path = os.path.join(REPO, "BENCH.md")
    tbl = "\n".join(
        f"| {k} | {v['rows_per_sec']:,} | {v['ns_per_row']} |" for k, v in results.items()
    )
    section = f"""## Pipeline micro-benchmarks (reference benchmark parity)

The reference's `BenchmarkStreamPipelines` shapes
(public/service/benchmark_test.go:17-451) reproduced as generate ->
chain -> drop over {rows:,} synthetic rows on local[32]
(`python tools/bench_micro.py --update-md`). The reference executes
these as a per-message Bloblang interpreter (ns/op per message per Go
benchmark); here the same chains are whole-stage-codegen'd:

| pipeline | rows/sec | ns/row |
|---|---|---|
{tbl}
"""
    marker = "## Pipeline micro-benchmarks"
    with open(path) as f:
        content = f.read()
    if marker in content:
        head = content[: content.index(marker)]
        rest = content[content.index(marker):]
        tail_ix = rest.find("\n## ", 1)
        content = head + section + (rest[tail_ix + 1:] if tail_ix != -1 else "")
    else:
        content = content.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(content)


if __name__ == "__main__":
    main()
