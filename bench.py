"""Round benchmark: headline queries + the flagship exactly-once streaming
pipeline at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Prints ONE JSON line:
    {"metric": "total_bench_seconds", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "clips_per_sec": <flagship exactly-once throughput>, ...}

Batch queries execute via the `noop` writer so every column is computed
(a bare ``count()`` would let Catalyst prune the projections).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CLIPS = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "4000"))

# The headline batch set: one per operator family (agg, broadcast-join
# chain, star join, windowing, routing, text analysis, near-dup LSH,
# similarity search, exact dedupe).
BATCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_tumbling_events",
    "window_session_events",
    "switch_route_orders",
    "text_quality_docs",
    "token_count_docs",
    "minhash_lsh_neardup",
    "simhash_docs",
    "embedding_cosine_topk",
    "embedding_ann_lsh_topk",
    "dedupe_documents",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "window_canonical_traffic",
    "jq_variant_events",
    "levenshtein_neardup_prefix",
    "salted_agg_events",
    "grok_parse_events",
    "bloblang_string_ops",
    "interpolate_orders",
    "bloblang_mapping_orders",
    "embedding_neardup_lsh_pairs",
    "sql_select_enrich_customers",
    "group_by_chains_orders",
    "jq_program_events",
    "cdc_merge_apply_orders",
    "audio_decode_features",
    "audio_mfcc_fingerprint_rollup",
    "audio_fingerprint_dedup",
    "jmespath_orders_digest",
    "content_dedupe_clips",
    "cep_funnel_events",
    "cep_absence_events",
    # round-4: TPC-H extension picks with the honest (AQE-decided) join
    # plans, and the Iceberg spec-evolution scan
    "q7_volume_shipping",
    "q9_product_profit",
    "q18_large_volume_customers",
    "iceberg_spec_evolution_orders",
    # round-4 fifth session: plugin-language processors — per-message
    # interpreted escape hatches; benched to keep their cost visible
    "javascript_orders_score",
    "wasm_uppercase_docs",
    # round-5: span propagation — pure sha2/concat projections, a canary
    # for observability overhead staying JVM-side
    "tracing_spans_orders",
    # round-5 late wave: the kafka wire roundtrip — produce + fetch of
    # the sampled orders through the loopback broker (lifecycle kind:
    # measures the connector data plane, not a query plan)
    "kafka_roundtrip_orders",
    # final session: the kinesis wire roundtrip — PutRecords + per-shard
    # drain through the SigV4 loopback (lifecycle kind, like kafka's)
    "kinesis_roundtrip_orders",
]

# Entry classification for cross-round diffing (BENCH_r{N}.json `kinds`):
#   query     — pure read-side plan over the sf parquet tables; the number
#               is comparable round-over-round as a query latency.
#   lifecycle — the callable BUILDS state first (writes an Iceberg table /
#               runs a MERGE / boots Derby) and then scans it; the number
#               measures table lifecycle (build + scan), NOT query latency.
#   stream    — end-to-end streaming run (datagen + micro-batches + commit);
#               read alongside clips_per_sec*, not as a query time.
#   dsp       — batch DSP throughput over generated clips (decode-bound).
_LIFECYCLE = {
    "iceberg_spec_evolution_orders",  # creates a two-spec table per run
    "cdc_merge_apply_orders",         # synthesizes changelog + COW MERGE
    "sql_select_enrich_customers",    # boots an embedded Derby database
    "kafka_roundtrip_orders",         # boots a broker, produce + fetch
    "kinesis_roundtrip_orders",       # boots the AWS mini server
}
_STREAM = {"flagship_streaming_e2e", "flagship_iceberg_e2e"}
_DSP = {"augment_chain_batch", "diarize_batch"}


def kind_of(name: str) -> str:
    if name in _LIFECYCLE:
        return "lifecycle"
    if name in _STREAM:
        return "stream"
    if name in _DSP:
        return "dsp"
    return "query"


def run_flagship_streaming(spark, workdir: str) -> tuple[float, float, int]:
    """Clips parquet → vectorized decode → windowed agg → exactly-once sink.
    Returns (datagen_sec, stream_sec, n_clips)."""
    from benthos_spark.datagen.clips import write_clips, write_sentinel
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
    from benthos_spark.streaming.pipeline import run_to_completion
    from tests.test_flagship_streaming import _flagship_pipeline

    src = os.path.join(workdir, "clips_src")
    t0 = time.time()
    write_clips(spark, src, N_CLIPS, files=max(8, spark.sparkContext.defaultParallelism))
    write_sentinel(spark, src)
    datagen_sec = time.time() - t0

    sink = ExactlyOnceParquetSink(os.path.join(workdir, "out"), lineage_cols=("window_start",))
    t0 = time.time()
    q = _flagship_pipeline(src).start(
        spark, sink, checkpoint=os.path.join(workdir, "ckpt"), trigger_once=True
    )
    run_to_completion(q, timeout_s=1800)
    stream_sec = time.time() - t0
    # steady-state: execution time of the data-carrying micro-batches only
    exec_ms = sum(
        p.durationMs["triggerExecution"] for p in q.recentProgress if p.numInputRows > 0
    )
    exec_sec = max(exec_ms / 1000.0, 1e-6)
    assert sink.committed_rows() > 0
    return datagen_sec, stream_sec, exec_sec, N_CLIPS


def run_flagship_iceberg(spark, workdir: str) -> tuple[float, float, float, int]:
    """The BASELINE metric's literal shape: clips streamed FROM an
    Iceberg table (sequence-number offsets, Arrow-native python data
    source) → vectorized decode → windowed agg → exactly-once Iceberg
    sink. Returns (datagen_sec, stream_sec, exec_sec, n_clips)."""
    import pyspark.sql.functions as F

    from benthos_spark.datagen.clips import SENTINEL_CODEC, write_clips, write_sentinel
    from benthos_spark.iceberg import IcebergTable
    from benthos_spark.iceberg.source import IcebergSource
    from benthos_spark.sinks.iceberg import ExactlyOnceIcebergSink
    from benthos_spark.streaming.pipeline import Pipeline
    from tests.test_flagship_streaming import AudioFeatures, _flagship_pipeline

    from benthos_spark.datagen.clips import generate_clips

    t0 = time.time()
    # append the generated frame DIRECTLY — one write, no parquet
    # staging copy (the Iceberg staging write IS the materialization)
    clips_df = generate_clips(
        spark, N_CLIPS, partitions=max(8, spark.sparkContext.defaultParallelism)
    )
    src_tbl = IcebergTable.create(os.path.join(workdir, "src_tbl"), clips_df.schema)
    src_tbl.append(clips_df)
    # sentinel row as its own snapshot (pushes the watermark on bounded
    # input, exactly like write_sentinel for the parquet flagship)
    sent_dir = os.path.join(workdir, "sentinel")
    write_sentinel(spark, sent_dir)
    src_tbl.append(spark.read.schema(clips_df.schema).parquet(sent_dir))
    datagen_sec = time.time() - t0

    # same processor chain as the parquet flagship, different ends
    pipe = Pipeline(
        source=IcebergSource(os.path.join(workdir, "src_tbl"), streaming=True),
        processors=_flagship_pipeline(sent_dir).processors,
    )
    sink = ExactlyOnceIcebergSink(
        os.path.join(workdir, "dst_tbl"), lineage_cols=("window_start",)
    )
    t0 = time.time()
    q = pipe.start(
        spark,
        sink,
        checkpoint=os.path.join(workdir, "ckpt"),
        processing_time="100 milliseconds",  # availableNow skips the
        # python-source no-data flush batch; poll totals instead
    )
    expected = N_CLIPS
    total = 0
    seen_version = -1
    dst = os.path.join(workdir, "dst_tbl")
    deadline = time.time() + 1800
    while total < expected and time.time() < deadline:
        time.sleep(0.25)
        if not IcebergTable.exists(dst):
            continue
        # only run the (Spark) totals job when a NEW snapshot landed —
        # the version probe is a pure-python metadata read, so the poll
        # loop never competes with the stream for executors
        t = IcebergTable.load(dst)
        if t.version == seen_version:
            continue
        seen_version = t.version
        got = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
        total = got.agg(F.sum("n_clips")).collect()[0][0] or 0
    stream_sec = time.time() - t0
    q.stop()
    exec_ms = sum(
        p.durationMs["triggerExecution"] for p in q.recentProgress if p.numInputRows > 0
    )
    exec_sec = max(exec_ms / 1000.0, 1e-6)
    assert total == expected, (total, expected)
    return datagen_sec, stream_sec, exec_sec, N_CLIPS


def host_canary_sec() -> float:
    """Fixed single-thread numpy workload timing the HOST, not the
    engine. Quiet-host reference on this VM: ~0.27 s (BENCH.md). When a
    round's numbers look slow, divide by (canary / 0.27) before reading
    anything into per-query deltas — round-3's apparent 2x regression
    was entirely this (clips_datagen_sec 10.5 s vs 2.6 s quiet)."""
    import numpy as np

    def work():
        a = np.arange(8_000_000, dtype=np.float64)
        for _ in range(6):
            a = np.sqrt(a * 1.0001 + 1.0)
        return float(a.sum())

    work()  # warmup: numpy import costs / page faults land here
    t0 = time.time()
    work()
    return round(time.time() - t0, 3)


def main() -> None:
    from benthos_spark.plans import catalog
    from benthos_spark.session import get_spark

    canary = host_canary_sec()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # default to 8 pinned cores: the measured cold-run sweet spot of this
    # VM. Root-caused in round 5 (BENCH.md "first-touch paging wall"):
    # the host services first-touch of fresh pages at ~0.3 GB/s aggregate
    # regardless of core count, so cold 32-way runs queue behind host
    # page-in while warm steady state scales to 32 cores. A single-JVM
    # bench run is mostly cold. $SPARK_GRAFT_CPUS still overrides for
    # scaling sweeps.
    cores_env = os.environ.get("SPARK_GRAFT_CPUS")
    spark = get_spark(app="benthos-spark-bench", cores=int(cores_env) if cores_env else 8)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path so the first measured query isn't charged
    # session startup (the reference's Go benchmarks likewise exclude
    # setup via b.ResetTimer).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    total0 = time.time()
    for name in BATCH_QUERIES:
        # best-of-2: the shared sandbox VM has heavy run-to-run noise and
        # the first run additionally pays codegen compilation for the
        # query's expressions; min approximates the machine's capability
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            catalog.QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # best-of-2 like the batch queries: the first streaming run pays
    # Python-worker startup + codegen for the Arrow decode stage (7-18s
    # of pure session warmup on this host, wildly variable); the metric
    # is steady-state clips/sec, so measure the warm run
    best = None
    for _ in range(2):
        workdir = tempfile.mkdtemp(prefix="benthos_bench_")
        try:
            datagen_sec, stream_sec, exec_sec, n_clips = run_flagship_streaming(spark, workdir)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        if best is None or stream_sec < best[1]:
            best = (datagen_sec, stream_sec, exec_sec, n_clips)
    datagen_sec, stream_sec, exec_sec, n_clips = best
    timings["flagship_streaming_e2e"] = round(stream_sec, 3)

    # iceberg-ends flagship (single run; exec_sec already excludes the
    # poll-loop and no-data batches)
    workdir = tempfile.mkdtemp(prefix="benthos_bench_ice_")
    try:
        ice_datagen, ice_stream, ice_exec, ice_clips = run_flagship_iceberg(spark, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    timings["flagship_iceberg_e2e"] = round(ice_stream, 3)

    # augmentation throughput: the fused speed→noise chain (operators/
    # audio.py AugmentChain — one decode, one re-encode) over datagen
    # clips, batch mode, noop sink. Best-of-2 like the other entries;
    # the separate clips/sec figure tracks the corpus-expansion stage's
    # steady-state DSP throughput across rounds.
    from benthos_spark.datagen.clips import generate_clips
    from benthos_spark.operators.audio import AugmentChain

    aug_chain = AugmentChain(
        stages=({"speed": {"factors": [0.9, 1.0, 1.1]}}, {"noise": {"snr_db": 20.0}})
    )
    aug_clips = generate_clips(spark, N_CLIPS).persist()
    aug_clips.count()  # materialize so the chain run times DSP, not datagen
    aug_best = float("inf")
    for _ in range(2):
        t0 = time.time()
        aug_chain(aug_clips).write.mode("overwrite").format("noop").save()
        aug_best = min(aug_best, time.time() - t0)
    timings["augment_chain_batch"] = round(aug_best, 3)

    # diarization throughput: decode → VAD → mel embeddings → clustering
    # per clip (operators/audio.Diarize) over the same persisted corpus
    from benthos_spark.operators.audio import Diarize

    diar = Diarize()
    diar_best = float("inf")
    for _ in range(2):
        t0 = time.time()
        diar(aug_clips).write.mode("overwrite").format("noop").save()
        diar_best = min(diar_best, time.time() - t0)
    aug_clips.unpersist()
    timings["diarize_batch"] = round(diar_best, 3)

    total = time.time() - total0
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "kinds": {name: kind_of(name) for name in timings},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "clips_per_sec": round(n_clips / exec_sec, 2),
                "clips_per_sec_wall": round(n_clips / stream_sec, 2),
                "clips_per_sec_iceberg": round(ice_clips / ice_exec, 2),
                "flagship_exec_sec": round(exec_sec, 3),
                "flagship_iceberg_exec_sec": round(ice_exec, 3),
                "n_clips": n_clips,
                "augment_clips_per_sec": round(N_CLIPS / aug_best, 2),
                "diarize_clips_per_sec": round(N_CLIPS / diar_best, 2),
                "clips_datagen_sec": round(datagen_sec, 3),
                # host-load context: single-thread numpy canary, quiet-
                # host reference ~0.27s — scale per-query readings by
                # (host_canary_sec / 0.27) before comparing across rounds
                "host_canary_sec": canary,
                "host_canary_quiet_ref_sec": 0.27,
                "loadavg_1m": round(os.getloadavg()[0], 2),
                "cores": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
