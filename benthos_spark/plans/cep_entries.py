"""CEP gate entries: pattern matching over the events stream table.

The funnel oracle replicates skip-till-next-match greedy binding with
LATERAL earliest-next lookups; the strict-sequence oracle uses lead()
windows identical to the Spark plan. Both order events by (ts,
event_id) so timestamp ties resolve identically across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from benthos_spark.operators.cep import FunnelMatch, SequenceMatch
from benthos_spark.plans.catalog import _t, register

_FUNNEL_ORACLE = """
WITH e AS (SELECT user_id, event_id, ts, event_type FROM events),
a AS (SELECT user_id, event_id AS signup_id, ts AS signup_ts FROM e
      WHERE event_type = 'signup'),
b AS (
  SELECT a.user_id, a.signup_id, a.signup_ts,
         m.event_id AS click_id, m.ts AS click_ts
  FROM a JOIN LATERAL (
    SELECT x.event_id, x.ts FROM e x
    WHERE x.user_id = a.user_id AND x.event_type = 'click'
      AND (x.ts > a.signup_ts OR (x.ts = a.signup_ts AND x.event_id > a.signup_id))
    ORDER BY x.ts, x.event_id LIMIT 1) m ON true),
c AS (
  SELECT b.*, m.event_id AS purchase_id, m.ts AS purchase_ts
  FROM b JOIN LATERAL (
    SELECT x.event_id, x.ts FROM e x
    WHERE x.user_id = b.user_id AND x.event_type = 'purchase'
      AND (x.ts > b.click_ts OR (x.ts = b.click_ts AND x.event_id > b.click_id))
    ORDER BY x.ts, x.event_id LIMIT 1) m ON true)
SELECT user_id, signup_id, signup_ts, click_id, click_ts,
       purchase_id, purchase_ts,
       CAST(epoch_ms(purchase_ts) - epoch_ms(signup_ts) AS BIGINT) AS duration_ms
FROM c
WHERE epoch_ms(purchase_ts) - epoch_ms(signup_ts) <= 604800000
"""


@register("cep_funnel_events", _FUNNEL_ORACLE)
def cep_funnel_events(spark, sf_dir):
    """Relaxed funnel signup→click→purchase per user within 7 days
    (operators/cep.py FunnelMatch). Greedy earliest-next binding; the
    whole match compiles to two reverse-window struct-mins over one
    keyed sort — one Exchange, zero Python.

    Note the oracle picks the earliest click after the anchor with no
    completion lookahead, while the Spark chain requires the click's own
    chain to complete — these are EQUIVALENT: events after a later click
    are a subset of events after an earlier one, so if the earliest
    click has no following purchase, no later click does either."""
    ev = _t(spark, sf_dir, "events")
    m = FunnelMatch(
        key_cols=["user_id"],
        ts_col="ts",
        id_col="event_id",
        steps=[
            ("signup", F.col("event_type") == "signup"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        within="7 days",
    )
    return m(ev)


_STRICT_ORACLE = """
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type, 1) OVER w AS sym1, lead(ts, 1) OVER w AS ts1,
         lead(event_id, 1) OVER w AS id1,
         lead(event_type, 2) OVER w AS sym2, lead(ts, 2) OVER w AS ts2,
         lead(event_id, 2) OVER w AS id2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id AS step1_id, ts AS step1_ts,
       id1 AS step2_id, ts1 AS step2_ts, id2 AS step3_id, ts2 AS step3_ts,
       CAST(epoch_ms(ts2) - epoch_ms(ts) AS BIGINT) AS duration_ms
FROM s
WHERE event_type = 'click' AND sym1 = 'view' AND sym2 = 'purchase'
  AND epoch_ms(ts2) - epoch_ms(ts) <= 259200000
"""


@register("cep_strict_sequence_events", _STRICT_ORACLE)
def cep_strict_sequence_events(spark, sf_dir):
    """Strict-contiguity click,view,purchase (consecutive events per
    user) within 3 days — MATCH_RECOGNIZE 'A B C' with ALL ROWS PER
    MATCH (operators/cep.py SequenceMatch; lead windows, one sort)."""
    ev = _t(spark, sf_dir, "events")
    m = SequenceMatch(
        key_cols=["user_id"],
        ts_col="ts",
        id_col="event_id",
        symbol_col="event_type",
        symbols=["click", "view", "purchase"],
        within="3 days",
    )
    return m(ev)


_ABSENCE_ORACLE = """
WITH e AS (SELECT user_id, event_id, ts, event_type FROM events),
a AS (SELECT user_id, event_id AS anchor_id, ts AS anchor_ts FROM e
      WHERE event_type = 'click')
SELECT a.user_id, a.anchor_id, a.anchor_ts,
       a.anchor_ts + INTERVAL 30 MINUTE AS deadline_ts
FROM a
WHERE NOT EXISTS (
  SELECT 1 FROM e x
  WHERE x.user_id = a.user_id AND x.event_type = 'purchase'
    AND (x.ts > a.anchor_ts OR (x.ts = a.anchor_ts AND x.event_id > a.anchor_id))
    AND epoch_ms(x.ts) - epoch_ms(a.anchor_ts) <= 1800000)
"""


@register("cep_absence_events", _ABSENCE_ORACLE)
def cep_absence_events(spark, sf_dir):
    """Absence / timeout pattern (operators/cep.py AbsenceMatch): every
    click with NO purchase by the same user within 30 minutes — the
    abandoned-checkout query. Spark plans one keyed Window computing the
    next purchase timestamp over following rows; the DuckDB oracle is
    the literal NOT EXISTS anti-join, so the window rewrite is
    hash-gated against the declarative spec."""
    from benthos_spark.operators.cep import AbsenceMatch

    ev = _t(spark, sf_dir, "events")
    m = AbsenceMatch(
        key_cols=["user_id"],
        ts_col="ts",
        id_col="event_id",
        anchor=F.col("event_type") == "click",
        follower=F.col("event_type") == "purchase",
        within="30 minutes",
    )
    return m(ev)
