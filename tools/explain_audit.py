"""Plan audit: dump `.explain("formatted")` for the headline queries and
grep the properties that matter at 100 TB — filter pushdown, column
pruning (ReadSchema), broadcast joins, whole-stage codegen spans, AEQ
shuffle counts. Writes PLANS.md.

Usage: python tools/explain_audit.py [--sf-dir DIR] [--only a,b]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

AUDITED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_tumbling_events",
    "switch_route_orders",
    "branch_enrich_parts",
    "minhash_lsh_neardup",
    "embedding_cosine_topk",
    "embedding_ann_lsh_topk",
    "dedupe_documents",
    "text_quality_docs",
    "workflow_lineitem",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "levenshtein_neardup_prefix",
    "salted_agg_events",
    "window_canonical_traffic",
    "embedding_ann_ivf_topk",
    "embedding_neardup_lsh_pairs",
    "bloblang_mapping_orders",
    "sql_select_enrich_customers",
    "group_by_chains_orders",
    "jq_program_events",
    "audio_decode_features",
    # round-4 late wave: pitch/quality/segmentation — designed
    # mapInPandas decode stages, one scan each, agg-only shuffles
    "audio_pitch_rollup",
    "audio_quality_rollup",
    "audio_segmentation_rollup",
    "jmespath_orders_digest",
    "cep_funnel_events",
    "cep_absence_events",
    # round-4: the de-broadcast TPC-H extension picks (VERDICT item 2's
    # evidence: no forced BroadcastExchange on an SF-scaling input)
    "q7_volume_shipping",
    "q9_product_profit",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q20_promo_part_suppliers",
    "q22_dormant_customers",
    # round-4 continuation: augmentation chain (designed mapInPandas DSP
    # stage), CMVN distributed stats (int64 partials, one tiny keyed
    # shuffle), speaking-rate (must be a PURE JVM projection — 0 py)
    "audio_augment_rollup",
    "audio_cmvn_stats",
    "speaking_rate_clips",
    # round-4 fourth session: diarization + h264 frame sampling are
    # designed mapInPandas decode stages (one scan, linear, no state);
    # audio_embedding_topk must show the broadcast on the QUERY side
    # only (candidates stream)
    "audio_diarization_rollup",
    "video_h264_frame_sample",
    "audio_embedding_topk",
    "audio_align_rollup",
    "awk_orders_tiers",
    # round-4 fifth session: plugin-language processors (wasm / js) are
    # per-message interpreted escape hatches BY DESIGN — the audit rows
    # document the single Arrow-batched Python stage + agg-only shuffle
    "wasm_uppercase_docs",
    "javascript_orders_score",
    # round 5: entropy-coded H.264 — same designed shape as the I_PCM
    # twin (one scan, two chained mapInPandas decode stages, keyed agg)
    "video_h264_cavlc_frame_sample",
    # round 5: span propagation — must be a pure JVM projection chain
    # (one pushed scan, 0 shuffles, 0 py); observability stays on the
    # fast path
    "tracing_spans_orders",
    # round-5 late wave: the kafka roundtrip — the write side is
    # foreachPartition produce (no plan), the read side must show one
    # data-source scan (one Spark partition per Kafka partition) into a
    # single keyed agg; the localCheckpoint boundary appears as an
    # ExistingRDD root (the broker is stopped before return by design)
    "kafka_roundtrip_orders",
    # final session: same shape through the Kinesis SigV4 path — one
    # data-source scan (one Spark partition per shard) into one keyed agg
    "kinesis_roundtrip_orders",
    # iceberg_*/cdc_* gate entries materialize state and return collected
    # rows (their returned frame is a LocalTableScan); their plan story
    # is told by test_partition_pruning_reaches_scan + the scan audit
    # below instead
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> dict:
    # `explain("formatted")` lists each node once in the tree and once as
    # a numbered detail section "(N) NodeName"; count the detail headers.
    return {
        "scans": len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "broadcast_joins": len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)),
        "sortmerge_joins": len(re.findall(r"^\(\d+\) SortMergeJoin", plan, re.M)),
        "shuffles": len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "python_stages": len(
            re.findall(r"^\(\d+\) (?:MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas|AggregateInPandas)", plan, re.M)
        ),
    }


def _iceberg_scan_section(spark) -> list[str]:
    """Plan evidence for the from-scratch Iceberg read path: a
    partition-filtered scan must prune files (PartitionFilters) and a
    merge-on-read scan applies position deletes with an anti-join on
    the delete set only."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from benthos_spark.iceberg import IcebergTable

    tmp = tempfile.mkdtemp(prefix="bs_plan_ice_")
    try:
        df = spark.range(3000).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("int").alias("part"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
        )
        t = IcebergTable.create(tmp + "/t", df.schema, partition_by=("part",))
        t.append(df)
        pruned = plan_of(t.scan(spark).filter(F.col("part") == 2))
        t.delete_where(spark, "k % 100 = 7")
        mor = plan_of(t.scan(spark))
        return [
            "## iceberg scan: partition pruning", "",
            "```", pruned.strip()[:4000], "```", "",
            "## iceberg scan: merge-on-read (position deletes applied)", "",
            "```", mor.strip()[:4000], "```", "",
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from benthos_spark.plans import catalog
    from benthos_spark.session import get_spark

    spark = get_spark(app="plan-audit", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    names = args.only.split(",") if args.only else AUDITED
    out = ["# PLANS — physical-plan audit of headline queries", "",
           f"Generated by `python tools/explain_audit.py` at `{args.sf_dir}`.",
           "Summary columns: parquet scans / scans with pushed filters / "
           "broadcast joins / sort-merge joins / shuffles / codegen spans / "
           "Python (Arrow) stages.", "",
           "Broadcast policy (round 2, tightened round 4): NO `F.broadcast` "
           "hint in the catalog forces a fact-cardinality build side — "
           "forced hints exist only on inputs bounded regardless of SF (the "
           "25-row nation dim, 5-row region dim, one-row scalar aggregates, "
           "the 10-query ANN query set, candidate-id sets). Any "
           "BroadcastExchange over lineitem/orders/part/supplier/"
           "documents-derived inputs in these sf-scale plans is Catalyst's "
           "size-threshold choice (~MB at this sf) and flips to a shuffle "
           "join at 100 TB automatically. Removed hints: round 2 dropped q3 "
           "orders⨝customer, q5 per-order dims, _pair_jaccard doc_sizes, ANN "
           "full-table build sides; round 4 dropped the TPC-H extension "
           "pack's forced broadcasts of SF-scaling inputs — filtered `part` "
           "(SF×200k base: q8/q9/q14/q16/q17/q19/q20), `supplier⨝nation` "
           "(supplier is SF×10k: q7/q8/q9), q18's qualifying order-key set, "
           "and q20's heavy-supplier set. The q7/q9/q14/q18/q20/q22 rows "
           "below therefore show only AQE-chosen broadcasts at sf0.01 — "
           "zero `F.broadcast` calls remain on any of those inputs "
           "(plans/tpch_ext.py). Round 5 closed the last two stragglers in "
           "catalog.py itself: q3's BUILDING-filtered customer (SF×150k "
           "base) and q5's supplier (SF×10k) lost their hints — their rows' "
           "remaining BroadcastExchanges are AQE/threshold choices over "
           "sf0.01-sized inputs plus the SF-invariant nation⨝region dims, "
           "and both flip to shuffle joins as the runtime sizes grow.", ""]
    summary = ["| query | scans | pushed | bcast | smj | shuffles | codegen | py |",
               "|---|---|---|---|---|---|---|---|"]
    details = []
    for name in names:
        df = catalog.QUERIES[name](spark, args.sf_dir)
        plan = plan_of(df)
        a = audit(plan)
        summary.append(
            f"| {name} | {a['scans']} | {a['pushed_filters']} | {a['broadcast_joins']} | "
            f"{a['sortmerge_joins']} | {a['shuffles']} | {a['codegen_spans']} | {a['python_stages']} |"
        )
        details += [f"## {name}", "", "```", plan.strip()[:6000], "```", ""]
    details += _iceberg_scan_section(spark)
    out += summary + [""] + details
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("\n".join(summary))
    spark.stop()


if __name__ == "__main__":
    main()
