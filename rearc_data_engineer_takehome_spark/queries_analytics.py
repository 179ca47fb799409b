"""Advanced-analytics parity queries: cohort retention, sequence
transitions, regression aggregates, multidimensional cubes, skew
profiling, a contingency-table independence statistic, and the
remaining classic TPC-H decision-support shapes (Q18/Q21/Q22) adapted
to this star schema.

All nine carry full DuckDB oracles. Float aggregates follow the
repo-wide contract: round identically on both sides, rank only on
rounded values, integer-valued double sums (quantities, counts) are
exact in any order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .queries import _t, query
from .queries_llm import _events


# ---------------------------------------------------------------------------
# Behavioral analytics on the events stream
# ---------------------------------------------------------------------------


@query(
    "events_cohort_retention",
    """
    WITH wk AS (
        SELECT user_id, floor(epoch(ts) / 604800)::BIGINT AS wk
        FROM events
    ), first AS (
        SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT w.user_id, f.cohort_week,
               w.wk - f.cohort_week AS weeks_since
        FROM wk w JOIN first f ON w.user_id = f.user_id
    )
    SELECT cohort_week, weeks_since, count(*) AS n_users
    FROM activity GROUP BY cohort_week, weeks_since
    """,
    doc="Cohort retention matrix: users bucketed by the epoch-week of "
    "their first event, then distinct (user, weeks-since-cohort) "
    "activity counted per cell. Epoch-week integer arithmetic is "
    "tz-independent in both engines (floor(floor(s)/n) == floor(s/n)). "
    "Plan: one partial-combined groupBy for cohorts, one shuffle join "
    "on user_id, then the distinct and the cell count share the "
    "(cohort_week, weeks_since, user) shuffle.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.floor(F.col("ts").cast("long") / 604800).cast("long").alias("wk"),
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "event_type_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="First-order Markov transition counts over per-user event "
    "sequences: lead() over (user, time) then a bigram groupBy. Ordering "
    "uses RAW nanosecond longs + event_id tie-break — converting to "
    "microseconds first could merge two distinct nano instants and flip "
    "a bigram vs the oracle's full-precision order.",
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Regression / association statistics
# ---------------------------------------------------------------------------


@query(
    "order_trend_by_priority",
    """
    WITH pts AS (
        SELECT o_orderpriority, o_totalprice,
               datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS xday
        FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n,
           round(regr_slope(o_totalprice, xday), 6) AS slope,
           round(regr_intercept(o_totalprice, xday), 4) AS intercept,
           round(corr(o_totalprice, xday), 6) AS r
    FROM pts GROUP BY o_orderpriority
    """,
    doc="Per-group least-squares trend: regr_slope / regr_intercept / "
    "corr of order value over epoch-day, one partial-combined aggregate "
    "(the co-moment sums combine map-side like any algebraic aggregate). "
    "x is integer days (NTZ-safe date arithmetic, no epoch cast); "
    "outputs rounded before comparison because the two engines fold "
    "co-moments in different orders.",
)
def order_trend_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_totalprice",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("xday"),
    )
    return pts.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("regr_slope(o_totalprice, xday)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(o_totalprice, xday)"), 4).alias("intercept"),
        F.round(F.corr("o_totalprice", "xday"), 6).alias("r"),
    )


@query(
    "priority_status_chi2",
    """
    WITH o AS (
        SELECT o_orderpriority AS p, o_orderstatus AS s,
               count(*)::DOUBLE AS n
        FROM orders GROUP BY 1, 2
    ), tot AS (SELECT sum(n) AS t FROM o),
    rm AS (SELECT p, sum(n) AS rp FROM o GROUP BY p),
    cm AS (SELECT s, sum(n) AS cs FROM o GROUP BY s)
    SELECT count(*) AS n_cells,
           round(sum(pow(o.n - rm.rp * cm.cs / tot.t, 2)
                     / (rm.rp * cm.cs / tot.t)), 6) AS chi2
    FROM o JOIN rm USING (p) JOIN cm USING (s) CROSS JOIN tot
    """,
    doc="Chi-square independence statistic for two categoricals "
    "(priority × status): observed cell counts vs the "
    "row-margin×col-margin/total expectation. The contingency table is "
    "tiny (|p|×|s| cells) so margins and total are broadcast joins over "
    "a single small aggregate — the only full-table work is the first "
    "groupBy. Counts are integer-exact; only the final statistic is "
    "rounded.",
)
def priority_status_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    tot = o.agg(F.sum("n").alias("t"))
    rm = o.groupBy("p").agg(F.sum("n").alias("rp"))
    cm = o.groupBy("s").agg(F.sum("n").alias("cs"))
    exp = F.col("rp") * F.col("cs") / F.col("t")
    return (
        o.join(F.broadcast(rm), "p")
        .join(F.broadcast(cm), "s")
        .join(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 6).alias("chi2"),
        )
    )


# ---------------------------------------------------------------------------
# Multidimensional aggregation + skew profiling
# ---------------------------------------------------------------------------


@query(
    "revenue_cube",
    """
    SELECT l_returnflag, l_linestatus,
           grouping_id(l_returnflag, l_linestatus) AS gid,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus) with grouping_id "
    "disambiguating aggregated-away NULLs from data NULLs — the "
    "multidimensional sibling of revenue_rollup. Spark expands the cube "
    "in a single Expand+HashAggregate (one shuffle for all 2^k "
    "groupings), not k separate scans.",
)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "revenue")
    )


@query(
    "heavy_hitter_parts",
    """
    WITH c AS (
        SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
    ), t AS (SELECT sum(n)::DOUBLE AS total FROM c)
    SELECT c.l_partkey, c.n, round(c.n / t.total, 8) AS share
    FROM c CROSS JOIN t
    ORDER BY c.n DESC, c.l_partkey ASC LIMIT 20
    """,
    doc="Heavy-hitter profiling (the exact diagnostic behind salting "
    "decisions): per-key frequencies, each key's share of total rows, "
    "top 20 by frequency. Compiles to partial-combined groupBy + "
    "broadcast scalar total + TakeOrderedAndProject — the full key "
    "distribution is never globally sorted.",
)
def heavy_hitter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").cast("double").alias("total"))
    return (
        c.join(F.broadcast(t))
        .select(
            "l_partkey", "n", F.round(F.col("n") / F.col("total"), 8).alias("share")
        )
        .orderBy(F.col("n").desc(), F.col("l_partkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Classic decision-support shapes (TPC-H Q18 / Q21 / Q22 adapted)
# ---------------------------------------------------------------------------


@query(
    "large_order_customers",
    """
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(big.sum_qty, 2) AS sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape (large-volume orders): HAVING over a grouped "
    "fact aggregate, then enrichment joins. The aggregate runs FIRST so "
    "the joins only move qualifying orders; quantities are "
    "integer-valued doubles, so the HAVING threshold is exact in any "
    "summation order. Reference parity: SURVEY §2.4 A2 + §2.3 J1 "
    "composed.",
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@query(
    "sole_return_suppliers",
    """
    SELECT s.s_name, count(*) AS n_flagged
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (the sole party at fault): lines returned by a "
    "supplier on multi-supplier orders where NO other supplier had a "
    "return — EXISTS and NOT EXISTS with correlated non-equi conditions, "
    "compiled as left-semi and left-anti joins on the order key with the "
    "supplier inequality in the join condition. The 'R' filters cut both "
    "join inputs before any shuffle.",
)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    sup = _t(spark, sf_dir, "supplier")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    flagged = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        flagged.join(F.broadcast(sup), flagged.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_flagged"))
    )


@query(
    "idle_capital_customers",
    """
    WITH ab AS (
        SELECT round(avg(c_acctbal), 4) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment, count(*) AS n_cust,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c CROSS JOIN ab
    WHERE c.c_acctbal > ab.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape (idle capital): customers with above-average "
    "balance (scalar subquery, broadcast; rounded to 4dp so both "
    "engines threshold the identical constant) and no orders (anti "
    "join), summarized per segment. The anti join's build side is just "
    "the order custkeys — column-pruned before the shuffle.",
)
def idle_capital_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    ab = cust.where(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
