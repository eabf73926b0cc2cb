"""TPC-H-style analytic extension pack over the driver's star schema.

The base catalog carries q1/q3/q4/q5/q6/q13; this module adds the rest
of the TPC-H shapes expressible on the trimmed schema (no ``partsupp``,
no commit/receipt dates, no phone/mfgr columns — those queries are
adapted, and say so in their docstrings). Together they demonstrate the
full relational surface a Benthos user routes through ``sql_select`` /
``sql_raw`` (internal/impl/sql/processor_sql_select.go,
processor_sql_raw.go) re-expressed as Catalyst plans: multi-way joins,
semi/anti joins, scalar subqueries, HAVING, CASE aggregation, OR-pushed
predicates, and deterministic top-k.

Determinism rules follow plans/catalog.py: round after aggregation on
BOTH sides, explicit tie-break keys on every top-k, and any value used
in a cross-engine *comparison* (q17's per-part limit, q22's average
balance) is rounded to 6dp first so a last-ulp difference between
Spark's and DuckDB's summation order cannot flip a row across the
predicate boundary.

Scale notes (100 TB): every query here keeps facts shuffle-joined.
Forced ``F.broadcast`` hints exist ONLY on inputs whose cardinality is
bounded regardless of SF: the 25-row nation dim, the 5-row region dim,
and one-row scalar aggregates (q15's max, q22's avg). Everything whose
row count scales with SF — filtered ``part`` (SF*200k base),
``supplier⨝nation`` (supplier is SF*10k), q18's qualifying order-key
set, q20's heavy-supplier set — carries NO hint; AQE picks broadcast vs
shuffle from observed runtime sizes, so the same plan that broadcasts at
sf0.01 flips to a shuffle join at 100 TB instead of OOMing the build
side. Aggregates are partial-agg friendly (no distinct-heavy shapes
except q16's count(distinct), which Spark expands to a two-phase agg).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from benthos_spark.plans.catalog import _t, register


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations, by ship year).

    Only the 25-row nation dim carries a broadcast hint. supplier is
    SF*10,000 rows (and customer SF*150,000) — both scale with the data,
    so supplier⨝nation and customer⨝nation are left unhinted and AQE
    picks broadcast vs shuffle from runtime sizes; all fact joins shuffle
    on their keys."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = s.join(F.broadcast(n1), s.s_nationkey == n1.sn_key).select("s_suppkey", "supp_nation")
    cn = c.join(F.broadcast(n2), c.c_nationkey == n2.cn_key).select("c_custkey", "cust_nation")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
        )
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 adapted (no p_mfgr — filters p_type instead): NATION_3
    suppliers' market share of PROMO parts sold into ASIA, by order year.

    Only nation/region (bounded) broadcast-hinted; the PROMO part list
    and supplier⨝nation both scale with SF (part = SF*200k, supplier =
    SF*10k) so their join strategy is left to AQE."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sn = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    asia_nk = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    cn = c.join(F.broadcast(asia_nk), c.c_nationkey == F.col("n_nationkey")).select("c_custkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cn, F.col("o_custkey") == F.col("c_custkey"), "leftsemi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS amount
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 adapted (no ps_supplycost — profit is gross revenue):
    revenue on '%widget%' parts by supplier nation and order year.

    The per-line amount is cast to DECIMAL(18,6) before summing on BOTH
    engines: this sum lands exactly on a .xx5 rounding boundary at
    sf0.01, and decimal addition is associative so Spark's and DuckDB's
    different summation orders cannot produce a half-ulp disagreement
    the final round(…, 2) would amplify."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sn = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter.
    Customer keys a GROUP BY, so the fact side stays shuffled on
    c_custkey; only nation is broadcast. Deterministic tie-break on
    c_custkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_lines",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_lines(spark, sf_dir):
    """TPC-H Q12 adapted (no shipmode/commit/receipt dates — classifies
    by order priority over a ship-year window): CASE aggregation."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promotion revenue share for one ship month. part is
    SF*200k rows so no broadcast hint — AQE decides; a single global
    aggregate (partial-agg friendly)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the max quarterly revenue. The scalar
    max is computed over the *rounded* per-supplier revenue so the
    equality join is exact on both engines; the revenue frame is tiny
    (one row per supplier) so the self-max join broadcasts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 50
    """,
)
def q16_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16 adapted (no partsupp — supplier variety observed through
    lineitem): count(distinct) expands to Spark's two-phase aggregate,
    which scales (no driver-side distinct)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN (SELECT l_partkey AS agg_pk, round(0.2 * avg(l_quantity), 6) AS qty_lim
            FROM lineitem GROUP BY l_partkey) a ON a.agg_pk = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < a.qty_lim
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders. The correlated
    avg subquery becomes a self-agg + join; the per-part limit is rounded
    to 6dp on BOTH sides so the `<` comparison can't flip on a last-ulp
    summation difference between engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    lim = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.round(F.lit(0.2) * F.avg("l_quantity"), 6).alias("qty_lim")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(lim, li.l_partkey == lim.agg_pk)
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: customers with orders above a quantity threshold. The
    HAVING subquery becomes an agg + semi-join. The qualifying order-key
    set grows linearly with SF, so it carries no broadcast hint — AQE
    sizes the semi-join build side at runtime."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        li.join(big, li.l_orderkey == F.col("big_ok"), "leftsemi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 adapted (no container/shipmode — brand×size×quantity
    disjuncts): the OR of join-side predicates. Catalyst pushes the
    part-only disjunction (brand ∈ {12,23,34}) below the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q20_promo_part_suppliers",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 550
    )
    """,
)
def q20_promo_part_suppliers(spark, sf_dir):
    """TPC-H Q20 adapted (no partsupp availqty — volume threshold over
    shipped PROMO quantity instead): agg + left-semi join."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey, "leftsemi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 550)
        .select("l_suppkey")
    )
    return s.join(heavy, s.s_suppkey == heavy.l_suppkey, "leftsemi").select(
        "s_suppkey", "s_name"
    )


@register(
    "q22_dormant_customers",
    """
    SELECT n.n_name, count(*) AS numcust, round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT round(avg(c_acctbal), 6) FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n.n_name
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 adapted (no c_phone — nation replaces country code, and
    "no orders at all" becomes "no orders since 2000" because the
    synthetic corpus gives every customer at least one order): rich
    customers gone dormant, per nation. Scalar avg subquery (rounded to
    6dp on both sides) + left-anti join, the canonical NOT EXISTS plan."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("ab")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
