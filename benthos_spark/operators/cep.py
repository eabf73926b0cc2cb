"""CEP — complex-event-processing pattern matching over keyed event streams.

The reference routes event streams through per-message processor chains
and leaves sequence detection to user Bloblang + caches; a PySpark CEP
engine can do far better: pattern matching compiles onto window
functions (one shuffle on the key, all-JVM) for batch frames, and onto
an ``applyInPandasWithState`` NFA for unbounded streams. Semantics
follow the funnel/MATCH_RECOGNIZE conventions:

- ``SequenceMatch`` — STRICT contiguity: the next event per key must be
  the next step (MATCH_RECOGNIZE ``A B C`` with no exclusions). Lead
  windows; overlapping matches are all emitted (``ALL ROWS PER MATCH``).
- ``FunnelMatch`` — RELAXED contiguity (skip-till-next-match): each step
  binds to the EARLIEST qualifying event after the previous step's
  binding, non-matching events in between are ignored (the funnel
  semantics of every product-analytics engine). Greedy: if the earliest
  chain busts the ``within`` budget, the anchor does NOT backtrack to a
  later candidate — it simply doesn't match.
- ``funnel_with_state`` — the streaming version of ``FunnelMatch`` for
  unbounded input: watermark-ordered NFA in ``applyInPandasWithState``
  (RocksDB-backed state), anchors expire ``within`` past the watermark.

Scale notes: both batch matchers are a single hash-partition on the key
plus one sort — the same cost profile as any keyed window; no cartesian,
no per-row Python. The streaming matcher's state per key is bounded by
(events inside the watermark lag) + (live anchors inside ``within``).

Determinism: event order is (ts, id) lexicographic everywhere, so ties
at the same timestamp resolve identically in Spark, DuckDB, and the
streaming NFA.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from benthos_spark.operators.processors import Processor


def _to_col(e) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def _millis(col: Column) -> Column:
    """Epoch millis for TIMESTAMP *or* TIMESTAMP_NTZ columns — the
    engine runs with session timeZone=UTC (session.py:41) so the NTZ→LTZ
    cast is an identity, and unix_millis only accepts LTZ."""
    return F.unix_millis(col.cast("timestamp"))


def _within_ms(within: str | int) -> int:
    """'7 days' / '30 minutes' / raw ms → milliseconds."""
    if isinstance(within, int):
        return within
    n, unit = within.split()
    mult = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(n) * mult


@dataclass
class SequenceMatch(Processor):
    """Strict-contiguity sequence detection on a symbol column.

    ``symbols`` is the ordered list of values the ``symbol_col`` must
    take on CONSECUTIVE events (per key, ordered by ``ts_col, id_col``),
    with the whole match inside ``within``. Emits one row per match
    (overlaps allowed): key cols, ``step<i>_id``/``step<i>_ts`` per
    step, and ``duration_ms``.

    Plan: lead() over one keyed sort — a single Exchange + Sort, then a
    codegen'd filter; nothing leaves the JVM.
    """

    key_cols: Sequence[str]
    ts_col: str
    id_col: str
    symbol_col: str
    symbols: Sequence[str]
    within: str | int = "1 hour"

    def __call__(self, df: DataFrame) -> DataFrame:
        k = len(self.symbols)
        if k < 2:
            raise ValueError("SequenceMatch needs at least 2 steps")
        w = Window.partitionBy(*self.key_cols).orderBy(self.ts_col, self.id_col)
        # Window expressions can't sit in a WHERE — project the leads
        # first, then filter (Catalyst still plans ONE Window node).
        proj = df
        cond = _to_col(self.symbol_col) == self.symbols[0]
        sel: list[Column] = [F.col(c) for c in self.key_cols] + [
            F.col(self.id_col).alias("step1_id"),
            F.col(self.ts_col).alias("step1_ts"),
        ]
        for i in range(1, k):
            proj = (
                proj.withColumn(f"_sym{i}", F.lead(self.symbol_col, i).over(w))
                .withColumn(f"_ts{i}", F.lead(self.ts_col, i).over(w))
                .withColumn(f"_id{i}", F.lead(self.id_col, i).over(w))
            )
            cond = cond & (F.col(f"_sym{i}") == self.symbols[i])
            sel += [
                F.col(f"_id{i}").alias(f"step{i + 1}_id"),
                F.col(f"_ts{i}").alias(f"step{i + 1}_ts"),
            ]
        budget = _within_ms(self.within)
        dur = _millis(F.col(f"_ts{k - 1}")) - _millis(F.col(self.ts_col))
        return proj.filter(cond & (dur <= F.lit(budget))).select(
            *sel, dur.alias("duration_ms")
        )


@dataclass
class FunnelMatch(Processor):
    """Relaxed (skip-till-next-match) funnel detection.

    ``steps`` is an ordered list of ``(name, predicate)`` where the
    predicate is a Column or SQL string over the event row. Each anchor
    (step-1 event) binds step j+1 to the EARLIEST event strictly after
    step j's binding (order = ``ts_col, id_col``) that satisfies the
    predicate; the match must complete within ``within`` of the anchor.
    Emits one row per completed anchor: key cols, ``<name>_id`` /
    ``<name>_ts`` per step, ``duration_ms``.

    Plan: the chain compiles to k-1 reverse-unbounded window mins over
    ONE keyed sort. Each min carries a nested struct ``(ts, id, nxt)``
    so step j's binding transports the (already-resolved) bindings of
    steps j+1..k — struct ordering is lexicographic on (ts, id), which
    is exactly the event order. One Exchange, one Sort, zero Python.
    """

    key_cols: Sequence[str]
    ts_col: str
    id_col: str
    steps: Sequence[Tuple[str, Any]]
    within: str | int = "1 hour"

    def __call__(self, df: DataFrame) -> DataFrame:
        k = len(self.steps)
        if k < 2:
            raise ValueError("FunnelMatch needs at least 2 steps")
        w_after = (
            Window.partitionBy(*self.key_cols)
            .orderBy(self.ts_col, self.id_col)
            .rowsBetween(1, Window.unboundedFollowing)
        )
        ts, ev_id = F.col(self.ts_col), F.col(self.id_col)
        out = df
        # Build chain columns backwards: _m<j> = earliest step-j event
        # strictly after the current row whose own chain completes.
        prev_m: str | None = None
        for j in range(k - 1, 0, -1):
            pred = _to_col(self.steps[j][1])
            fields = [ts.alias("ts"), ev_id.alias("id")]
            if prev_m is not None:
                pred = pred & F.col(prev_m).isNotNull()
                fields.append(F.col(prev_m).alias("nxt"))
            name = f"_m{j}"
            out = out.withColumn(name, F.min(F.when(pred, F.struct(*fields))).over(w_after))
            prev_m = name
        anchor_pred = _to_col(self.steps[0][1]) & F.col("_m1").isNotNull()
        # Extract each step's (ts, id) from the nested chain.
        sel: list[Column] = [F.col(c) for c in self.key_cols]
        sel += [ev_id.alias(f"{self.steps[0][0]}_id"), ts.alias(f"{self.steps[0][0]}_ts")]
        path = "_m1"
        last_ts_expr = None
        for j in range(1, k):
            sel += [
                F.col(f"{path}.id").alias(f"{self.steps[j][0]}_id"),
                F.col(f"{path}.ts").alias(f"{self.steps[j][0]}_ts"),
            ]
            last_ts_expr = F.col(f"{path}.ts")
            path += ".nxt"
        budget = _within_ms(self.within)
        dur = _millis(last_ts_expr) - _millis(ts)
        return (
            out.filter(anchor_pred)
            .filter(dur <= F.lit(budget))
            .select(*sel, dur.alias("duration_ms"))
        )


# ---------------------------------------------------------------------
# Streaming funnel: watermark-ordered NFA in applyInPandasWithState
# ---------------------------------------------------------------------

FUNNEL_STATE_SCHEMA = "buf string, chains string"


@dataclass
class AbsenceMatch(Processor):
    """Absence / timeout pattern: anchor NOT followed by a follower
    within ``within`` — "checkout with no payment in 30 minutes",
    "alert never acknowledged". Emits one row per anchor event with no
    follower-matching event strictly after it in (ts, id) order inside
    the budget (MATCH_RECOGNIZE would spell this ``A {- B -}`` negation
    plus a timeout; neither Spark nor the reference ships it).

    Plan: one keyed Window (Exchange + Sort) computing the NEXT
    follower timestamp as min(CASE WHEN follower THEN ts END) over the
    following rows, then a codegen'd filter — no self-join, no Python,
    same cost profile as the other matchers.
    """

    key_cols: Sequence[str]
    ts_col: str
    id_col: str
    anchor: Any
    follower: Any
    within: str | int = "1 hour"

    def __call__(self, df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*self.key_cols)
            .orderBy(self.ts_col, self.id_col)
            .rowsBetween(1, Window.unboundedFollowing)
        )
        ts_ms = _millis(F.col(self.ts_col))
        budget = _within_ms(self.within)
        proj = df.withColumn(
            "_next_b_ms", F.min(F.when(_to_col(self.follower), ts_ms)).over(w)
        )
        keep = _to_col(self.anchor) & (
            F.col("_next_b_ms").isNull()
            | (F.col("_next_b_ms") - ts_ms > F.lit(budget))
        )
        return proj.filter(keep).select(
            *[F.col(c) for c in self.key_cols],
            F.col(self.id_col).alias("anchor_id"),
            F.col(self.ts_col).alias("anchor_ts"),
            # interval addition keeps μs precision AND the input's
            # TIMESTAMP/TIMESTAMP_NTZ flavor (timestamp_millis would
            # truncate the anchor's microsecond tail)
            (
                F.col(self.ts_col) + F.expr(f"INTERVAL {budget} MILLISECONDS")
            ).alias("deadline_ts"),
        )


ABSENCE_STATE_SCHEMA = "buf string, pending string"


def _absence_out_schema(key_field: str) -> str:
    return f"{key_field}, anchor_id long, anchor_ts timestamp, deadline_ts timestamp"


def make_absence_state_fn(anchor_sym: str, follower_sym: str, within_ms: int, key_name: str):
    """Streaming absence detector. Buffers events newer than the
    watermark, replays the ordered prefix: a follower cancels every
    pending anchor still inside its budget; an anchor whose deadline
    falls BEHIND the watermark fires (no follower ≤ deadline can arrive
    — any such event would already have been replayed). EventTimeTimeout
    flushes quiet keys like the funnel NFA."""

    def _replay(events, pending):
        for t, i, sym in events:
            if sym == follower_sym:
                # anchors whose budget already lapsed keep their firing
                # right; in-budget ones are satisfied and cancelled
                pending = [p for p in pending if t - p[0] > within_ms]
            if sym == anchor_sym:
                pending.append([t, i])
        return pending

    def _emit(key, fired):
        import datetime as dt

        return pd.DataFrame(
            {
                key_name: [key[0]] * len(fired),
                "anchor_id": [p[1] for p in fired],
                "anchor_ts": [dt.datetime.utcfromtimestamp(p[0] / 1000.0) for p in fired],
                "deadline_ts": [
                    dt.datetime.utcfromtimestamp((p[0] + within_ms) / 1000.0)
                    for p in fired
                ],
            }
        )

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf: list = []
        pending: list = []
        if state.exists:
            raw_buf, raw_pending = state.get
            buf = json.loads(raw_buf)
            pending = json.loads(raw_pending)
        if state.hasTimedOut:
            # quiet key: flush the buffer, every surviving anchor fires
            pending = _replay(sorted(buf, key=lambda e: (e[0], e[1])), pending)
            state.remove()
            if pending:
                yield _emit(key, pending)
            return
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            ids = pdf["event_id"].astype("int64").tolist()
            syms = pdf["event_type"].astype(str).tolist()
            buf.extend([t, i, s] for t, i, s in zip(ts_ms, ids, syms))
        wm = state.getCurrentWatermarkMs()
        bounded = wm <= 0
        horizon = 2**62 if bounded else wm
        ready = sorted((e for e in buf if e[0] <= horizon), key=lambda e: (e[0], e[1]))
        buf = [e for e in buf if e[0] > horizon]
        pending = _replay(ready, pending)
        fired = [p for p in pending if p[0] + within_ms < horizon]
        pending = [p for p in pending if p[0] + within_ms >= horizon]
        state.update((json.dumps(buf), json.dumps(pending)))
        try:
            state.setTimeoutTimestamp(max(wm, 0) + within_ms + 1)
        except Exception:
            pass  # NoTimeout conf (bounded runs)
        if fired:
            yield _emit(key, fired)

    return fn


def absence_with_state(
    events: DataFrame,
    anchor: str,
    follower: str,
    within: str | int = "1 hour",
    key_col: str = "user_id",
    timeout: bool = True,
) -> DataFrame:
    """Streaming absence pattern over a (``key_col``, ts, event_id,
    event_type) stream — symbol-valued like ``funnel_with_state``; the
    input should carry ``withWatermark('ts', …)``."""
    conf = GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
    key_field = f"{key_col} long"
    return events.groupBy(key_col).applyInPandasWithState(
        make_absence_state_fn(anchor, follower, _within_ms(within), key_col),
        outputStructType=_absence_out_schema(key_field),
        stateStructType=ABSENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


def _funnel_out_schema(key_field: str) -> str:
    return (
        f"{key_field}, step_ids array<long>, start_ts timestamp, "
        "end_ts timestamp, duration_ms long"
    )


def make_funnel_state_fn(symbols: Sequence[str], within_ms: int, key_name: str):
    """NFA over watermark-ordered events. Buffers events newer than the
    watermark (micro-batches are not time-ordered); replays the ordered
    prefix ≤ watermark through live anchor chains; expires anchors
    ``within_ms`` past the watermark. Greedy binding = batch FunnelMatch.

    With EventTimeTimeout, a key whose buffer has gone quiet past
    ``within_ms`` beyond the watermark times out: the remaining buffer
    is flushed through the NFA (no more events can precede it) and the
    state is dropped — so a bounded run's final no-data micro-batch
    (watermark advanced by a sentinel) emits the tail matches.
    """
    k = len(symbols)

    def _replay(events, chains, done):
        for t, i, sym in events:
            nxt_chains = []
            for ch in chains:  # ch = [anchor_ts, step_idx, ids, tss]
                a_ts, idx = ch[0], ch[1]
                if t - a_ts > within_ms:
                    continue  # expired: can never complete
                if sym == symbols[idx]:
                    ids2 = ch[2] + [i]
                    tss2 = ch[3] + [t]
                    if idx + 1 == k:
                        done.append([ids2, tss2])
                        continue  # completed; greedy = anchor consumed
                    nxt_chains.append([a_ts, idx + 1, ids2, tss2])
                else:
                    nxt_chains.append(ch)
            chains = nxt_chains
            if sym == symbols[0]:
                if k == 1:
                    done.append([[i], [t]])
                else:
                    chains.append([t, 1, [i], [t]])
        return chains

    def _emit(key, done):
        import datetime as dt

        return pd.DataFrame(
            {
                key_name: [key[0]] * len(done),
                "step_ids": [d[0] for d in done],
                "start_ts": [dt.datetime.utcfromtimestamp(d[1][0] / 1000.0) for d in done],
                "end_ts": [dt.datetime.utcfromtimestamp(d[1][-1] / 1000.0) for d in done],
                "duration_ms": [d[1][-1] - d[1][0] for d in done],
            }
        )

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf: list = []
        chains: list = []
        if state.exists:
            raw_buf, raw_chains = state.get
            buf = json.loads(raw_buf)
            chains = json.loads(raw_chains)
        if state.hasTimedOut:
            # Quiet past the horizon: flush the whole buffer in order.
            done: list[list] = []
            _replay(sorted(buf, key=lambda e: (e[0], e[1])), chains, done)
            state.remove()
            if done:
                yield _emit(key, done)
            return
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            ids = pdf["event_id"].astype("int64").tolist()
            syms = pdf["event_type"].astype(str).tolist()
            buf.extend([t, i, s] for t, i, s in zip(ts_ms, ids, syms))
        wm = state.getCurrentWatermarkMs()
        bounded = wm <= 0  # no watermark: bounded smoke run, process all
        horizon = 2**62 if bounded else wm
        ready = sorted((e for e in buf if e[0] <= horizon), key=lambda e: (e[0], e[1]))
        buf = [e for e in buf if e[0] > horizon]
        done = []
        chains = _replay(ready, chains, done)
        if not bounded:
            # Anchors older than the watermark minus the budget are dead.
            chains = [ch for ch in chains if wm - ch[0] <= within_ms]
        state.update((json.dumps(buf), json.dumps(chains)))
        try:
            state.setTimeoutTimestamp(max(wm, 0) + within_ms + 1)
        except Exception:
            pass  # NoTimeout conf (bounded runs)
        if done:
            yield _emit(key, done)

    return fn


def funnel_with_state(
    events: DataFrame,
    symbols: Sequence[str],
    within: str | int = "1 hour",
    key_col: str = "user_id",
    timeout: bool = True,
) -> DataFrame:
    """Streaming funnel over an (``key_col``, ts, event_id, event_type)
    stream. Input should carry ``withWatermark('ts', …)`` so the NFA can
    establish event order (pass ``timeout=True`` for the event-time
    flush); without one (bounded smoke runs) pass ``timeout=False`` and
    every batch is processed as-is in (ts, id) order."""
    conf = GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
    key_field = f"{key_col} long"
    return events.groupBy(key_col).applyInPandasWithState(
        make_funnel_state_fn(list(symbols), _within_ms(within), key_col),
        outputStructType=_funnel_out_schema(key_field),
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
