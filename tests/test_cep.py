"""CEP pattern matching (operators/cep.py): strict sequences, relaxed
funnels, and the streaming NFA — streaming output must equal the batch
FunnelMatch on the same input (the engine-wide batch/stream parity bar).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.cep import FunnelMatch, SequenceMatch, funnel_with_state
from benthos_spark.streaming.pipeline import run_to_completion

EV_SCHEMA = "user_id long, event_id long, ts timestamp, event_type string"


def _mk(spark, rows):
    data = [
        (uid, eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec), sym)
        for uid, eid, sec, sym in rows
    ]
    return spark.createDataFrame(data, EV_SCHEMA)


def test_funnel_greedy_binding(spark):
    """Each step binds the EARLIEST qualifying event; intervening
    non-matching events are skipped."""
    df = _mk(
        spark,
        [
            (1, 1, 0, "A"),
            (1, 2, 10, "X"),   # ignored
            (1, 3, 20, "B"),   # earliest B → bound
            (1, 4, 30, "B"),   # later B → not bound
            (1, 5, 40, "C"),
        ],
    )
    m = FunnelMatch(
        key_cols=["user_id"], ts_col="ts", id_col="event_id",
        steps=[("a", F.col("event_type") == "A"),
               ("b", F.col("event_type") == "B"),
               ("c", F.col("event_type") == "C")],
        within="1 hour",
    )
    rows = m(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a_id, r.b_id, r.c_id) == (1, 3, 5)
    assert r.duration_ms == 40_000


def test_funnel_within_is_greedy_not_backtracking(spark):
    """If the greedy chain busts the budget, the anchor does NOT retry a
    later (faster-finishing) candidate — funnel semantics."""
    df = _mk(
        spark,
        [
            (1, 1, 0, "A"),
            (1, 2, 10, "B"),      # greedy binds here…
            (1, 3, 5000, "C"),    # …but C is 5000s later: busts 1h? no — 5000s > 3600s busts
        ],
    )
    m = FunnelMatch(
        key_cols=["user_id"], ts_col="ts", id_col="event_id",
        steps=[("a", F.col("event_type") == "A"), ("b", F.col("event_type") == "B"),
               ("c", F.col("event_type") == "C")],
        within="1 hour",
    )
    assert m(df).count() == 0


def test_funnel_every_anchor_emits(spark):
    """Two anchors sharing later steps both complete (overlap allowed)."""
    df = _mk(spark, [(1, 1, 0, "A"), (1, 2, 5, "A"), (1, 3, 10, "B")])
    m = FunnelMatch(
        key_cols=["user_id"], ts_col="ts", id_col="event_id",
        steps=[("a", F.col("event_type") == "A"), ("b", F.col("event_type") == "B")],
        within="1 hour",
    )
    got = sorted((r.a_id, r.b_id) for r in m(df).collect())
    assert got == [(1, 3), (2, 3)]


def test_funnel_keys_isolated(spark):
    """Steps never cross key boundaries."""
    df = _mk(spark, [(1, 1, 0, "A"), (2, 2, 10, "B")])
    m = FunnelMatch(
        key_cols=["user_id"], ts_col="ts", id_col="event_id",
        steps=[("a", F.col("event_type") == "A"), ("b", F.col("event_type") == "B")],
        within="1 hour",
    )
    assert m(df).count() == 0


def test_strict_requires_contiguity(spark):
    """An intervening event breaks a strict match (but not a funnel)."""
    rows = [(1, 1, 0, "A"), (1, 2, 10, "X"), (1, 3, 20, "B"),
            (1, 10, 100, "A"), (1, 11, 110, "B")]
    df = _mk(spark, rows)
    m = SequenceMatch(
        key_cols=["user_id"], ts_col="ts", id_col="event_id",
        symbol_col="event_type", symbols=["A", "B"], within="1 hour",
    )
    got = [(r.step1_id, r.step2_id) for r in m(df).collect()]
    assert got == [(10, 11)]


def test_strict_within_budget(spark):
    df = _mk(spark, [(1, 1, 0, "A"), (1, 2, 7200, "B")])
    m = SequenceMatch(
        key_cols=["user_id"], ts_col="ts", id_col="event_id",
        symbol_col="event_type", symbols=["A", "B"], within="1 hour",
    )
    assert m(df).count() == 0


def test_single_window_plan(spark):
    """Both matchers plan exactly ONE Exchange (the keyed shuffle) — the
    100-TB cost profile claimed in the module docstring."""
    df = _mk(spark, [(1, 1, 0, "A"), (1, 2, 10, "B")])
    for m in (
        FunnelMatch(key_cols=["user_id"], ts_col="ts", id_col="event_id",
                    steps=[("a", F.col("event_type") == "A"),
                           ("b", F.col("event_type") == "B")], within="1 hour"),
        SequenceMatch(key_cols=["user_id"], ts_col="ts", id_col="event_id",
                      symbol_col="event_type", symbols=["A", "B"], within="1 hour"),
    ):
        plan = m(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2  # hashpartitioning (+AQE read)
        assert "Python" not in plan


@pytest.mark.usefixtures("spark")
class TestStreamingFunnel:
    SYMS = ["signup", "click", "purchase"]

    def _batch_reference(self, spark, df):
        m = FunnelMatch(
            key_cols=["user_id"], ts_col="ts", id_col="event_id",
            steps=[(s, F.col("event_type") == s) for s in self.SYMS],
            within="1 hour",
        )
        return sorted(
            (r.user_id, r.signup_id, r.click_id, r.purchase_id) for r in m(df).collect()
        )

    def test_stream_matches_batch(self, spark, tmp_path):
        """Multi-micro-batch streaming run (files arrive out of event-time
        order) emits exactly the batch matches once the sentinel advances
        the watermark past every buffered event."""
        import random

        rng = random.Random(7)
        rows = []
        eid = 0
        for uid in range(6):
            t = 0
            for _ in range(40):
                t += rng.randint(10, 600)
                eid += 1
                rows.append((uid, eid, t, rng.choice(self.SYMS + ["noise"])))
        df = _mk(spark, rows)
        want = self._batch_reference(spark, df)

        src = str(tmp_path / "src")
        # Four FLAT single files (FileStreamSource does not recurse into
        # per-write parquet dirs), deliberately NOT time-ordered within
        # the stream; the sentinel must arrive LAST (batches are ordered
        # by modification time) so stamp strictly increasing mtimes.
        import glob
        import os
        import shutil

        os.makedirs(src)
        # Chronological thirds (so nothing falls behind the watermark
        # between batches) with row order scrambled WITHIN each chunk —
        # the intra-batch disorder the NFA's (ts, id) sort must absorb.
        ordered = sorted(rows, key=lambda r: r[2])
        cut = len(ordered) // 3
        chunks = [ordered[:cut], ordered[cut : 2 * cut], ordered[2 * cut :]]
        for chunk in chunks:
            rng.shuffle(chunk)
        chunks.append([(99, 10**6, 10**7, "_sentinel")])  # NFA flush sentinel
        t0 = 1_700_000_000
        for i, chunk in enumerate(chunks):
            tmp_dir = str(tmp_path / f"w{i}")
            _mk(spark, chunk).coalesce(1).write.parquet(tmp_dir)
            part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
            dst = f"{src}/f{i}.parquet"
            shutil.move(part, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))

        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "10 seconds")
        )
        out = funnel_with_state(stream, self.SYMS, within="1 hour")
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q, timeout_s=300)
        got_df = spark.read.parquet(str(tmp_path / "out"))
        got = sorted(
            (r.user_id, r.step_ids[0], r.step_ids[1], r.step_ids[2])
            for r in got_df.collect()
        )
        assert got == want
        assert want, "reference produced no matches — test data too thin"


# -- absence / timeout pattern ------------------------------------------------


class TestAbsence:
    def _matcher(self, within="1 minute"):
        from benthos_spark.operators.cep import AbsenceMatch

        return AbsenceMatch(
            key_cols=["user_id"], ts_col="ts", id_col="event_id",
            anchor=F.col("event_type") == "click",
            follower=F.col("event_type") == "purchase",
            within=within,
        )

    def test_batch_semantics(self, spark):
        rows = [
            # u1: click satisfied in time -> no match
            (1, 1, 0, "click"), (1, 2, 30, "purchase"),
            # u1: click with purchase too late -> match
            (1, 3, 100, "click"), (1, 4, 200, "purchase"),
            # u2: click never followed -> match; noise ignored
            (2, 5, 0, "click"), (2, 6, 10, "noise"),
            # u3: purchase BEFORE the click does not satisfy it -> match
            (3, 7, 50, "purchase"), (3, 8, 60, "click"),
        ]
        out = self._matcher()(_mk(spark, rows)).collect()
        got = sorted((r.user_id, r.anchor_id) for r in out)
        assert got == [(1, 3), (2, 5), (3, 8)]
        r = next(x for x in out if x.anchor_id == 5)
        assert (r.deadline_ts - r.anchor_ts).total_seconds() == 60.0

    def test_same_ts_id_order_breaks_ties(self, spark):
        # purchase at the SAME ts with a higher id counts as "after"
        rows = [(1, 1, 0, "click"), (1, 2, 0, "purchase"),
                (1, 4, 5, "click"), (1, 3, 5, "purchase")]
        out = self._matcher()(_mk(spark, rows)).collect()
        # anchor 1 satisfied by id 2 (same ts, higher id); anchor 4 is
        # NOT satisfied by id 3 (same ts, lower id = before)
        assert sorted(r.anchor_id for r in out) == [4]

    def test_single_window_no_python(self, spark):
        df = _mk(spark, [(1, 1, 0, "click")])
        plan = self._matcher()(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2
        assert "Python" not in plan

    def test_stream_matches_batch(self, spark, tmp_path):
        import glob
        import os
        import random
        import shutil

        from benthos_spark.operators.cep import absence_with_state

        rng = random.Random(13)
        rows, eid = [], 0
        for uid in range(5):
            t = 0
            for _ in range(30):
                t += rng.randint(5, 90)
                eid += 1
                rows.append((uid, eid, t, rng.choice(["click", "purchase", "noise"])))
        df = _mk(spark, rows)
        want = sorted(
            (r.user_id, r.anchor_id) for r in self._matcher()(df).collect()
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        ordered = sorted(rows, key=lambda r: r[2])
        cut = len(ordered) // 3
        chunks = [ordered[:cut], ordered[cut: 2 * cut], ordered[2 * cut:]]
        for chunk in chunks:
            rng.shuffle(chunk)
        chunks.append([(99, 10**6, 10**7, "_sentinel")])
        t0 = 1_700_000_000
        for i, chunk in enumerate(chunks):
            tmp_dir = str(tmp_path / f"w{i}")
            _mk(spark, chunk).coalesce(1).write.parquet(tmp_dir)
            part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
            dst = f"{src}/f{i}.parquet"
            shutil.move(part, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))

        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "10 seconds")
        )
        out = absence_with_state(stream, "click", "purchase", within="1 minute")
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q, timeout_s=300)
        got_df = spark.read.parquet(str(tmp_path / "out"))
        got = sorted(
            (r.user_id, r.anchor_id)
            for r in got_df.collect()
            if r.user_id != 99
        )
        assert got == want


def test_cep_config_wiring(spark, tmp_path):
    from benthos_spark.config import compile_config

    src = str(tmp_path / "src")
    rows = [
        (1, 1, 0, "click"), (1, 2, 30, "purchase"),
        (1, 3, 100, "click"),
        (2, 4, 0, "signup"), (2, 5, 10, "click"), (2, 6, 20, "purchase"),
    ]
    _mk(spark, rows).write.parquet(src)
    cfg = f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - absence_match:
        key_cols: [user_id]
        ts_col: ts
        id_col: event_id
        anchor: "event_type = 'click'"
        follower: "event_type = 'purchase'"
        within: 1 minute
output:
  drop: {{}}
"""
    pipe, _sink = compile_config(cfg)
    out = pipe.dataframe(spark)
    assert sorted(r.anchor_id for r in out.collect()) == [3]

    cfg2 = f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - funnel_match:
        key_cols: [user_id]
        ts_col: ts
        id_col: event_id
        steps:
          - {{name: signup, check: "event_type = 'signup'"}}
          - {{name: click, check: "event_type = 'click'"}}
          - {{name: purchase, check: "event_type = 'purchase'"}}
        within: 1 hour
output:
  drop: {{}}
"""
    pipe2, _ = compile_config(cfg2)
    got = pipe2.dataframe(spark).collect()
    assert [r.user_id for r in got] == [2]

    cfg3 = f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - sequence_match:
        key_cols: [user_id]
        ts_col: ts
        id_col: event_id
        symbol_col: event_type
        symbols: [click, purchase]
        within: 1 minute
output:
  drop: {{}}
"""
    pipe3, _ = compile_config(cfg3)
    got3 = pipe3.dataframe(spark).collect()
    assert sorted((r.user_id, r.step1_id) for r in got3) == [(1, 1), (2, 5)]


class TestStreamingSequence:
    SYMS = ["signup", "click", "purchase"]

    def _batch_reference(self, spark, df):
        m = SequenceMatch(
            key_cols=["user_id"], ts_col="ts", id_col="event_id",
            symbol_col="event_type", symbols=self.SYMS, within="1 hour",
        )
        return sorted(
            (r.user_id, r.step1_id, r.step2_id, r.step3_id) for r in m(df).collect()
        )

    def test_stream_matches_batch(self, spark, tmp_path):
        """Strict contiguity across micro-batch boundaries: the state
        tail (last k-1 replayed events) must stitch a match whose events
        arrive in different batches, and intervening events must break
        matches exactly like the batch matcher."""
        import glob
        import os
        import random
        import shutil

        from benthos_spark.operators.cep import sequence_with_state

        rng = random.Random(13)
        rows = []
        eid = 0
        for uid in range(6):
            t = 0
            for _ in range(60):
                t += rng.randint(10, 600)
                eid += 1
                # bias towards the pattern symbols so strict runs happen
                rows.append((uid, eid, t, rng.choice(self.SYMS * 3 + ["noise"])))
        df = _mk(spark, rows)
        want = self._batch_reference(spark, df)

        src = str(tmp_path / "src")
        os.makedirs(src)
        ordered = sorted(rows, key=lambda r: r[2])
        cut = len(ordered) // 3
        chunks = [ordered[:cut], ordered[cut : 2 * cut], ordered[2 * cut :]]
        for chunk in chunks:
            rng.shuffle(chunk)
        chunks.append([(99, 10**6, 10**7, "_sentinel")])
        t0 = 1_700_000_000
        for i, chunk in enumerate(chunks):
            tmp_dir = str(tmp_path / f"w{i}")
            _mk(spark, chunk).coalesce(1).write.parquet(tmp_dir)
            part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
            dst = f"{src}/f{i}.parquet"
            shutil.move(part, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))

        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "10 seconds")
        )
        out = sequence_with_state(stream, self.SYMS, within="1 hour")
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q, timeout_s=300)
        got_df = spark.read.parquet(str(tmp_path / "out"))
        got = sorted(
            (r.user_id, r.step_ids[0], r.step_ids[1], r.step_ids[2])
            for r in got_df.collect()
        )
        assert got == want
        assert want, "reference produced no matches — test data too thin"

    def test_cross_batch_stitching_exact(self, spark, tmp_path):
        """A hand-placed match whose three events arrive in THREE
        different micro-batches (the tail must carry 2 events across two
        horizons), plus a decoy broken by an intervening event."""
        import glob
        import os
        import shutil

        from benthos_spark.operators.cep import sequence_with_state

        batches = [
            [(1, 1, 1000, "signup"), (2, 10, 1001, "signup")],
            [(1, 2, 2000, "click"), (2, 11, 2000, "noise")],
            [(1, 3, 3000, "purchase"), (2, 12, 3000, "click"), (2, 13, 3001, "purchase")],
            [(99, 10**6, 10**7, "_sentinel")],
        ]
        src = str(tmp_path / "src")
        os.makedirs(src)
        t0 = 1_700_000_000
        for i, chunk in enumerate(batches):
            tmp_dir = str(tmp_path / f"w{i}")
            _mk(spark, chunk).coalesce(1).write.parquet(tmp_dir)
            part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
            dst = f"{src}/f{i}.parquet"
            shutil.move(part, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "1 second")
        )
        out = sequence_with_state(stream, self.SYMS, within="1 hour")
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q, timeout_s=300)
        got = sorted(
            tuple(r.step_ids)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )
        # user 1 stitches across three batches; user 2's run is broken
        # by the intervening noise event
        assert got == [(1, 2, 3)]
