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


def _ingest(pdfs, buf: list, horizon: int):
    """Merge a state-carried buffer (list of ``[ts_ms, id, sym]``) with
    the micro-batch's Arrow frames WITHOUT per-event Python: returns
    (ts, ids, syms) int64/object arrays of the events at or below the
    ``horizon``, lexsorted by (ts, id), plus the leftover buffer list
    (events above the horizon, to re-serialize into state). The leftover
    loop is proportional to the watermark lag, never to batch size."""
    import numpy as np

    ts_parts, id_parts, sym_parts = [], [], []
    if buf:
        nb = len(buf)
        ts_parts.append(np.fromiter((e[0] for e in buf), np.int64, count=nb))
        id_parts.append(np.fromiter((e[1] for e in buf), np.int64, count=nb))
        sym_parts.append(np.array([e[2] for e in buf], dtype=object))
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts_parts.append((pdf["ts"].astype("int64") // 1_000_000).to_numpy())
        id_parts.append(pdf["event_id"].to_numpy(np.int64))
        sym_parts.append(pdf["event_type"].astype(str).to_numpy(dtype=object))
    if not ts_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=object), []
    ts = np.concatenate(ts_parts)
    ids = np.concatenate(id_parts)
    syms = np.concatenate(sym_parts)
    mask = ts <= horizon
    order = np.lexsort((ids[mask], ts[mask]))
    rest = ~mask
    leftover = [
        [int(t), int(i), s] for t, i, s in zip(ts[rest], ids[rest], syms[rest])
    ]
    return ts[mask][order], ids[mask][order], syms[mask][order], leftover


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

    def _replay(ts, ids, syms, pending):
        """Vectorized over (ts, id)-sorted event arrays. A pending
        anchor is cancelled iff SOME follower arrives with
        t - anchor_ts ≤ within; since followers are processed in
        ascending ts, the most-cancelling follower for a carried-over
        anchor is the EARLIEST one, and for an in-batch anchor it's the
        NEXT follower after it (later followers are only farther away).
        Both collapse to one suffix-min pass — no per-event Python walk.
        Anchors whose budget already lapsed keep their firing right,
        exactly as before."""
        import numpy as np

        n = len(ts)
        if n == 0:
            return pending
        fmask = syms == follower_sym
        amask = syms == anchor_sym
        miss = np.int64(2**62)
        if fmask.any():
            earliest_f = int(ts[fmask].min())
            pending = [p for p in pending if earliest_f - p[0] > within_ms]
            f_ts = np.where(fmask, ts, miss)
            # next follower ts STRICTLY after each position
            nxt = np.minimum.accumulate(f_ts[::-1])[::-1]
            nxt_after = np.empty_like(nxt)
            nxt_after[:-1] = nxt[1:]
            nxt_after[-1] = miss
        else:
            nxt_after = np.full(n, miss, dtype=np.int64)
        keep = amask & ((nxt_after - ts) > within_ms)
        pending = pending + [
            [int(t), int(i)] for t, i in zip(ts[keep], ids[keep])
        ]
        return pending

    def _emit(key, fired):
        import numpy as np

        arr = np.asarray(fired, dtype=np.int64).reshape(-1, 2)
        return pd.DataFrame(
            {
                key_name: np.repeat(key[0], len(arr)),
                "anchor_id": arr[:, 1],
                "anchor_ts": pd.to_datetime(arr[:, 0], unit="ms"),
                "deadline_ts": pd.to_datetime(arr[:, 0] + within_ms, unit="ms"),
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
            rts, rids, rsyms, _ = _ingest([], buf, 2**62)
            pending = _replay(rts, rids, rsyms, pending)
            state.remove()
            if pending:
                yield _emit(key, pending)
            return
        wm = state.getCurrentWatermarkMs()
        bounded = wm <= 0
        horizon = 2**62 if bounded else wm
        rts, rids, rsyms, buf = _ingest(pdfs, buf, horizon)
        pending = _replay(rts, rids, rsyms, pending)
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

    The replay is VECTORIZED: greedy skip-till-next-match means each
    step binds to the first later event of the step's symbol, so the
    whole batch resolves with one ``np.searchsorted`` per step over the
    per-symbol position arrays — no per-event Python walk. Python-level
    work is proportional to (completed matches + live chains), never to
    events × chains (a 100k-event key costs k binary-search passes).

    With EventTimeTimeout, a key whose buffer has gone quiet past
    ``within_ms`` beyond the watermark times out: the remaining buffer
    is flushed through the NFA (no more events can precede it) and the
    state is dropped — so a bounded run's final no-data micro-batch
    (watermark advanced by a sentinel) emits the tail matches.
    """
    import numpy as np

    k = len(symbols)

    def _replay(ts, ids, syms, chains, done):
        """ts/ids/syms: (ts, id)-sorted event arrays;
        chains: [anchor_ts, step_idx, ids, tss] live partial matches.
        Appends completed-match blocks — (ids_matrix, tss_matrix) int64
        pairs, one row per match — to ``done``; returns live chains."""
        n = len(ts)
        if n == 0:
            return chains
        step_pos = [np.nonzero(syms == s)[0].astype(np.int64) for s in symbols]
        last_ts = int(ts[-1])

        if k == 1:
            A0 = step_pos[0]
            if len(A0):
                done.append((ids[A0].reshape(-1, 1), ts[A0].reshape(-1, 1)))
            return []

        def bind_steps(m: np.ndarray, first_step: int) -> np.ndarray:
            """Greedy-bind steps first_step..k-1 from inclusive-minimum
            positions ``m``; returns a (k, len(m)) position matrix with
            -1 for misses (a miss cascades to every later step)."""
            bind = np.full((k, len(m)), -1, dtype=np.int64)
            cur = m.astype(np.int64, copy=True)
            for s in range(first_step, k):
                sp = step_pos[s]
                if len(sp) == 0:
                    break  # nothing to bind this step; all later miss too
                q = np.searchsorted(sp, cur)
                hit = q < len(sp)
                b = np.where(hit, sp[np.minimum(q, len(sp) - 1)], -1)
                bind[s] = b
                cur = np.where(hit, b + 1, n + 1)
            return bind

        def ins_point(t: int, i: int) -> int:
            """Events strictly after (t, i) start at this position."""
            lo = int(np.searchsorted(ts, t, "left"))
            hi = int(np.searchsorted(ts, t, "right"))
            return lo + int(np.searchsorted(ids[lo:hi], i, "right"))

        out_chains: list = []

        def resolve(bind, first_step, a_tss, pid_mat, pts_mat):
            """Split bound chains into done / surviving-partial. The
            scalar NFA's expiry rule (any processed event with
            t - anchor_ts > within kills a live chain) collapses to two
            checks because ts is sorted: a completion is valid iff its
            FINAL binding is in budget, and a partial survives iff the
            batch's LAST event didn't bust its budget. ``pid_mat`` /
            ``pts_mat`` carry the already-bound prefix per chain — all
            chains in a call sit at the same step, so the prefixes are a
            rectangular matrix and completions assemble with ONE fancy-
            index + concat (no per-match Python)."""
            complete = bind[k - 1] >= 0
            final_ts = ts[np.maximum(bind[k - 1], 0)]
            ok = complete & (final_ts - a_tss <= within_ms)
            if ok.any():
                sel = bind[first_step:k][:, ok]  # (k - first_step, n_ok)
                done.append(
                    (
                        np.concatenate([pid_mat[ok], ids[sel].T], axis=1),
                        np.concatenate([pts_mat[ok], ts[sel].T], axis=1),
                    )
                )
            partial = ~complete & (last_ts - a_tss <= within_ms)
            for c in np.nonzero(partial)[0]:  # survivors only, never events
                pids = [int(x) for x in pid_mat[c]]
                ptss = [int(x) for x in pts_mat[c]]
                idx2 = first_step
                for s in range(first_step, k):
                    b = int(bind[s, c])
                    if b < 0:
                        break
                    pids.append(int(ids[b]))
                    ptss.append(int(ts[b]))
                    idx2 = s + 1
                out_chains.append([int(a_tss[c]), idx2, pids, ptss])

        # carried-over partial chains, grouped by their current step (a
        # chain at step idx has exactly idx bound entries, so each group
        # has rectangular prefixes)
        by_step: dict[int, list] = {}
        for ch in chains:
            by_step.setdefault(ch[1], []).append(ch)
        for step_idx, chs in by_step.items():
            m = np.fromiter(
                (ins_point(ch[3][-1], ch[2][-1]) for ch in chs),
                dtype=np.int64,
                count=len(chs),
            )
            a_tss = np.fromiter((ch[0] for ch in chs), dtype=np.int64, count=len(chs))
            resolve(
                bind_steps(m, step_idx),
                step_idx,
                a_tss,
                np.array([ch[2] for ch in chs], dtype=np.int64).reshape(len(chs), -1),
                np.array([ch[3] for ch in chs], dtype=np.int64).reshape(len(chs), -1),
            )

        # fresh anchors: every symbols[0] event starts a chain
        A = step_pos[0]
        if len(A):
            resolve(
                bind_steps(A + 1, 1),
                1,
                ts[A],
                ids[A].reshape(-1, 1),
                ts[A].reshape(-1, 1),
            )
        return out_chains

    def _emit(key, done):
        ids_mat = done[0][0] if len(done) == 1 else np.concatenate([d[0] for d in done])
        tss_mat = done[0][1] if len(done) == 1 else np.concatenate([d[1] for d in done])
        return pd.DataFrame(
            {
                key_name: np.repeat(key[0], len(ids_mat)),
                "step_ids": ids_mat.tolist(),
                "start_ts": pd.to_datetime(tss_mat[:, 0], unit="ms"),
                "end_ts": pd.to_datetime(tss_mat[:, -1], unit="ms"),
                "duration_ms": tss_mat[:, -1] - tss_mat[:, 0],
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
            rts, rids, rsyms, _ = _ingest([], buf, 2**62)
            _replay(rts, rids, rsyms, chains, done)
            state.remove()
            if done:
                yield _emit(key, done)
            return
        wm = state.getCurrentWatermarkMs()
        bounded = wm <= 0  # no watermark: bounded smoke run, process all
        horizon = 2**62 if bounded else wm
        rts, rids, rsyms, buf = _ingest(pdfs, buf, horizon)
        done = []
        chains = _replay(rts, rids, rsyms, chains, done)
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


SEQUENCE_STATE_SCHEMA = "buf string, tail string"


def make_sequence_state_fn(symbols: Sequence[str], within_ms: int, key_name: str):
    """Streaming STRICT-contiguity sequence matcher (the stream twin of
    batch ``SequenceMatch``): per key, k CONSECUTIVE events must carry
    the symbols in order, the whole run inside ``within``.

    Fully vectorized: a match at position p is one boolean AND across k
    shifted symbol comparisons plus a window-span check — no per-event
    Python. State carries (a) the out-of-order buffer above the
    watermark and (b) the last k-1 REPLAYED events as the contiguity
    tail: the watermark guarantees nothing can ever arrive between them
    and the next replay's prefix, so cross-batch matches assemble
    exactly. A match needs k events and the tail holds at most k-1, so
    tail-only matches (double counting) are impossible by construction.
    Tail entries whose budget already lapsed against the watermark are
    dropped (any match through them would need an even older start)."""
    import numpy as np

    k = len(symbols)
    if k < 2:
        raise ValueError("sequence matching needs at least 2 steps")
    sym_arr = np.array(list(symbols), dtype=object)

    def _scan(ts, ids, syms, tail, done):
        """Returns the new tail (last k-1 events of the replayed run)."""
        if tail:
            nt = len(tail)
            ts = np.concatenate(
                [np.fromiter((e[0] for e in tail), np.int64, nt), ts]
            )
            ids = np.concatenate(
                [np.fromiter((e[1] for e in tail), np.int64, nt), ids]
            )
            syms = np.concatenate([np.array([e[2] for e in tail], object), syms])
        n = len(ts)
        if n >= k:
            m = n - k + 1
            match = np.ones(m, dtype=bool)
            for j in range(k):
                match &= syms[j : m + j] == sym_arr[j]
            match &= (ts[k - 1 :] - ts[:m]) <= within_ms
            P = np.nonzero(match)[0]
            if len(P):
                gather = P[:, None] + np.arange(k)[None, :]
                done.append((ids[gather], ts[gather]))
        start = max(0, n - (k - 1))
        return [[int(ts[i]), int(ids[i]), syms[i]] for i in range(start, n)]

    def _emit(key, done):
        ids_mat = done[0][0] if len(done) == 1 else np.concatenate([d[0] for d in done])
        tss_mat = done[0][1] if len(done) == 1 else np.concatenate([d[1] for d in done])
        return pd.DataFrame(
            {
                key_name: np.repeat(key[0], len(ids_mat)),
                "step_ids": ids_mat.tolist(),
                "start_ts": pd.to_datetime(tss_mat[:, 0], unit="ms"),
                "end_ts": pd.to_datetime(tss_mat[:, -1], unit="ms"),
                "duration_ms": tss_mat[:, -1] - tss_mat[:, 0],
            }
        )

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf: list = []
        tail: list = []
        if state.exists:
            raw_buf, raw_tail = state.get
            buf = json.loads(raw_buf)
            tail = json.loads(raw_tail)
        if state.hasTimedOut:
            done: list = []
            rts, rids, rsyms, _ = _ingest([], buf, 2**62)
            _scan(rts, rids, rsyms, tail, done)
            state.remove()
            if done:
                yield _emit(key, done)
            return
        wm = state.getCurrentWatermarkMs()
        bounded = wm <= 0
        horizon = 2**62 if bounded else wm
        rts, rids, rsyms, buf = _ingest(pdfs, buf, horizon)
        done = []
        tail = _scan(rts, rids, rsyms, tail, done)
        if not bounded:
            # a lapsed-budget tail prefix can never complete a match
            tail = [e for e in tail if wm - e[0] <= within_ms]
        state.update((json.dumps(buf), json.dumps(tail)))
        try:
            state.setTimeoutTimestamp(max(wm, 0) + within_ms + 1)
        except Exception:
            pass  # NoTimeout conf (bounded runs)
        if done:
            yield _emit(key, done)

    return fn


def sequence_with_state(
    events: DataFrame,
    symbols: Sequence[str],
    within: str | int = "1 hour",
    key_col: str = "user_id",
    timeout: bool = True,
) -> DataFrame:
    """Streaming strict-contiguity sequence over a (``key_col``, ts,
    event_id, event_type) stream — same contract as
    ``funnel_with_state`` (carry ``withWatermark('ts', …)``)."""
    conf = GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
    key_field = f"{key_col} long"
    return events.groupBy(key_col).applyInPandasWithState(
        make_sequence_state_fn(list(symbols), _within_ms(within), key_col),
        outputStructType=_funnel_out_schema(key_field),
        stateStructType=SEQUENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


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
