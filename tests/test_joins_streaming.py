"""As-of join semantics, salted-join equivalence, bucketed co-located
joins (no exchange in the plan), and stateful streaming."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.operators import joins
from rearc_data_engineer_takehome_spark.plans import explain


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0),
            ("B", 3, 100.0),
        ],
        ["sym", "qt", "px"],
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", 0, 7.0),   # before any quote → null match
            ("A", 1, 8.0),   # exactly at quote t=1 → px 10.0 (>= semantics)
            ("A", 6, 9.0),   # latest quote ≤ 6 is t=5 → 11.0
            ("A", 99, 1.0),  # → t=9 quote 12.0
            ("B", 2, 2.0),   # before B's only quote → null
            ("B", 4, 3.0),   # → 100.0
            ("C", 4, 4.0),   # key with no quotes at all → null
        ],
        ["sym", "tt", "qty"],
    )


def test_asof_backward_semantics(spark, trades, quotes):
    out = joins.asof_join(trades, quotes, on="sym", left_ts="tt", right_ts="qt")
    got = {(r.sym, r.tt): r.px_right for r in out.collect()}
    assert got == {
        ("A", 0): None,
        ("A", 1): 10.0,
        ("A", 6): 11.0,
        ("A", 99): 12.0,
        ("B", 2): None,
        ("B", 4): 100.0,
        ("C", 4): None,
    }
    assert out.count() == trades.count()  # left-outer: every trade kept


def test_asof_matches_duckdb_asof_join(spark, trades, quotes):
    """Cross-engine check against DuckDB's native ASOF JOIN."""
    import duckdb

    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    expected = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            """
            SELECT t.sym, t.tt, q.px
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.sym = q.sym AND t.tt >= q.qt
            """
        ).fetchall()
    }
    out = joins.asof_join(trades, quotes, on="sym", left_ts="tt", right_ts="qt")
    got = {(r.sym, r.tt): r.px_right for r in out.collect()}
    assert got == expected


def test_asof_forward(spark, trades, quotes):
    out = joins.asof_join(
        trades, quotes, on="sym", left_ts="tt", right_ts="qt", direction="forward"
    )
    got = {(r.sym, r.tt): r.px_right for r in out.collect()}
    assert got[("A", 0)] == 10.0   # earliest quote ≥ 0 is t=1
    assert got[("A", 6)] == 12.0   # ≥6 → t=9
    assert got[("A", 99)] is None  # nothing after 99


def test_salted_join_equals_plain_join(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_smoke}/part.parquet").withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    plain = (
        li.join(part, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        joins.salted_join(li, part, on="l_partkey", n_salts=4)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted((r.p_brand, r.n) for r in plain.collect()) == sorted(
        (r.p_brand, r.n) for r in salted.collect()
    )


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    spark.sql("USE bucketdb")
    try:
        li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
        joins.write_bucketed(li, "li_b", "l_orderkey", n_buckets=8)
        joins.write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            "ord_b",
            "l_orderkey",
            n_buckets=8,
        )
        a, b = spark.table("li_b"), spark.table("ord_b")
        # disable broadcast so the co-location is what avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "l_orderkey").groupBy("o_orderstatus").count()
        n_ex = explain.count_exchanges(
            a.join(b, "l_orderkey").select("l_orderkey", "o_orderstatus")
        )
        assert n_ex == 0, "bucketed-bucketed equi-join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
        spark.sql("USE default")


def test_stateful_running_stats(spark, tmp_path):
    from rearc_data_engineer_takehome_spark.streaming.stateful import (
        running_user_stats,
    )

    src = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (1, 30.0), (2, 15.0)],
        ["user_id", "value"],
    )
    data_dir = str(tmp_path / "state_src")
    src.write.parquet(data_dir)
    stream = spark.readStream.schema(src.schema).parquet(data_dir)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: r for r in spark.table("running_stats").collect()}
    assert rows[1].n_events == 3 and rows[1].total_value == 60.0
    assert rows[1].peak_value == 30.0
    assert rows[2].n_events == 2 and rows[2].total_value == 20.0


def test_range_join_matches_naive(spark):
    """Bucketed range join must equal the naive inequality join."""
    import random

    random.seed(7)
    rows_l = [(i, i % 3, random.randint(0, 10_000)) for i in range(200)]
    rows_r = [(1000 + i, i % 3, random.randint(0, 10_000)) for i in range(200)]
    left = spark.createDataFrame(rows_l, ["lid", "k", "lt"])
    right = spark.createDataFrame(rows_r, ["rid", "k", "rt"])

    bucketed = joins.range_join(left, right, on="k", left_ts="lt",
                                right_ts="rt", max_gap=500)
    got = {(r.lid, r.rid_right) for r in bucketed.collect()}
    naive = {
        (l[0], r[0])
        for l in rows_l for r in rows_r
        if l[1] == r[1] and abs(l[2] - r[2]) <= 500
    }
    assert got == naive


def test_hypertable_rollup_consistency(spark, sf_smoke):
    """Coarser granularities must be exact re-aggregations of finer ones."""
    import pyspark.sql.functions as FF

    from rearc_data_engineer_takehome_spark.streaming.windows import (
        hypertable_rollup,
    )

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    roll = hypertable_rollup(ev, "ts").cache()
    by_gran = {
        g: {r.bucket_start: r.n_events
            for r in roll.where(FF.col("granularity") == g).collect()}
        for g in ("hour", "day", "week")
    }
    assert sum(by_gran["hour"].values()) == sum(by_gran["day"].values())
    assert sum(by_gran["day"].values()) == sum(by_gran["week"].values())
    assert sum(by_gran["hour"].values()) == ev.count()
    # each day bucket equals the sum of its hour buckets
    for day_start, n in list(by_gran["day"].items())[:5]:
        hours = [v for k, v in by_gran["hour"].items()
                 if day_start <= k < day_start + 86400]
        assert sum(hours) == n
    roll.unpersist()


def test_tws_plan_resolves_and_matches_legacy_schema(spark):
    """The transformWithStateInPandas twin must build a resolved plan
    with the same output schema as the applyInPandasWithState operator
    even where the protobuf channel is unavailable (plan construction
    is JVM-side; only query START needs the Python runner)."""
    from rearc_data_engineer_takehome_spark.streaming.stateful import (
        running_user_stats,
        running_user_stats_tws,
    )

    src = spark.createDataFrame([(1, 10.0)], ["user_id", "value"])
    legacy = running_user_stats(src)
    tws = running_user_stats_tws(src)
    assert tws.schema == legacy.schema


def test_tws_running_stats_matches_legacy_api(spark, tmp_path):
    """Execution parity between the two stateful APIs (skipped where
    google.protobuf is broken — transformWithStateInPandas streams
    state over protobuf and crashes the streaming runner without it)."""
    import pytest as _pytest

    from rearc_data_engineer_takehome_spark.streaming.stateful import (
        has_transform_with_state,
        running_user_stats_tws,
    )

    if not has_transform_with_state():
        _pytest.skip("google.protobuf unavailable: tws runner cannot start")

    src = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (1, 30.0), (2, 15.0)],
        ["user_id", "value"],
    )
    data_dir = str(tmp_path / "tws_src")
    src.write.parquet(data_dir)
    stream = spark.readStream.schema(src.schema).parquet(data_dir)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = (
        running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: r for r in spark.table("tws_stats").collect()}
    assert rows[1].n_events == 3 and rows[1].total_value == 60.0
    assert rows[2].n_events == 2 and rows[2].peak_value == 15.0
