"""Shuffle-partition insensitivity sweep (cluster-readiness evidence).

The north rule's scaling claim is gated by the sandbox VM's ~8-core
ceiling (BENCH.md); what we CAN prove locally is that the engine's
plans do not depend on a hand-tuned `spark.sql.shuffle.partitions` —
i.e. the shuffle volume is what it is, AQE coalesces the partitioning,
and the same job lands within noise across a 16x sweep of the knob.
A plan that only performs at one magic partition count would fall over
when a cluster operator sizes the knob for 1000 executors.

    python tools/partition_sweep.py [--sf-dir DIR] [--cores 8]

Prints a markdown table; paste into BENCH.md (bench_scaling.py handles
the scaling section, this handles the sweep section).
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

QUERIES = [
    "q5_local_supplier_volume",  # multi-join + agg (shuffle-heavy)
    "q13_customer_distribution",  # outer join + two-level agg
    "minhash_lsh_neardup",  # widest shuffle DAG in the catalog
    "window_tumbling_events",  # windowed agg
]

SWEEP = [8, 16, 32, 64, 128]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from benthos_spark.plans import catalog
    from benthos_spark.session import get_spark

    rows = {}
    for parts in SWEEP:
        spark = get_spark(cores=args.cores, shuffle_partitions=parts)
        spark.sparkContext.setLogLevel("ERROR")
        for name in QUERIES:
            fn = catalog.QUERIES[name]
            fn(spark, args.sf_dir).count()  # warm (scan cache, codegen)
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                fn(spark, args.sf_dir).count()
                times.append(time.time() - t0)
            rows.setdefault(name, {})[parts] = statistics.median(times)
        spark.stop()

    print(f"\n| query (median of {args.reps}, warm, {args.cores} cores) | "
          + " | ".join(f"{p} parts" for p in SWEEP) + " | max/min |")
    print("|---|" + "---|" * (len(SWEEP) + 1))
    for name in QUERIES:
        vals = [rows[name][p] for p in SWEEP]
        spread = max(vals) / min(vals)
        print(f"| {name} | " + " | ".join(f"{v:.2f}s" for v in vals) + f" | {spread:.2f}x |")


if __name__ == "__main__":
    main()
