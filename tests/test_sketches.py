"""Probabilistic-sketch invariants (operators/sketch.py): Count-Min
never under-counts, Bloom filters never produce false negatives, and
false-positive rates stay within their design bounds. The value-level
cross-engine agreement is covered by the DuckDB oracles of
``cms_partkey_frequencies`` / ``bloom_prefilter_urgent_orders``
(tests/test_oracle_parity.py); these tests assert the semantic
guarantees the oracle comparison alone can't express."""

from __future__ import annotations

import pyspark.sql.functions as F

from rearc_data_engineer_takehome_spark.operators import sketch
from rearc_data_engineer_takehome_spark.queries import REGISTRY


def test_cms_estimates_never_undercount(spark, sf_smoke):
    rows = REGISTRY["cms_partkey_frequencies"].spark(spark, sf_smoke).collect()
    assert rows, "probe set empty"
    for r in rows:
        assert r.est >= r.true_cnt, f"CMS under-counted {r.l_partkey}: {r}"


def test_cms_exact_when_no_collisions(spark):
    """With width >> distinct keys the min-over-depth estimate must be
    exact — collisions are the ONLY source of error."""
    df = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(70)], ["k"]
    )
    cms = sketch.count_min_build(df, "k", width=4096, depth=4)
    probes = df.distinct()
    est = {
        r.k: r.est
        for r in sketch.count_min_estimate(
            cms, probes, "k", width=4096, depth=4
        ).collect()
    }
    assert est == {f"k{i}": 10 for i in range(7)}


def test_cms_absent_key_estimates_small(spark):
    """A key never inserted can only collide — its estimate is bounded
    by the heaviest bucket, and with a sparse sketch it should be 0."""
    df = spark.createDataFrame([(f"k{i}",) for i in range(10)], ["k"])
    cms = sketch.count_min_build(df, "k", width=4096, depth=4)
    probe = spark.createDataFrame([("never-seen",)], ["k"])
    [r] = sketch.count_min_estimate(cms, probe, "k", width=4096, depth=4).collect()
    assert r.est == 0


def test_bloom_no_false_negatives(spark, sf_smoke):
    """Every build-side key probed against its own filter must test
    positive — the Bloom guarantee that makes it safe as a pre-filter."""
    orders = (
        spark.read.parquet(f"{sf_smoke}/orders.parquet")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").cast("string").alias("k"))
        .distinct()
    )
    bits = sketch.bloom_bits(orders, "k", n_bits=1 << 16, n_hashes=3)
    tagged = sketch.bloom_probe(orders, bits, "k", n_bits=1 << 16, n_hashes=3)
    n_missed = tagged.where(~F.col("maybe_member")).count()
    assert n_missed == 0


def test_bloom_summary_query_consistency(spark, sf_smoke):
    [r] = REGISTRY["bloom_prefilter_urgent_orders"].spark(spark, sf_smoke).collect()
    # no false negatives: every true match is tagged maybe
    assert r.n_maybe >= r.n_true_match
    assert r.n_false_positives == r.n_maybe - r.n_true_match
    # design bound: 64 Ki bits / 3 hashes at these key counts keeps the
    # false-positive rate on NON-members far under 5 %
    non_members = r.n_probe_keys - r.n_true_match
    if non_members:
        assert r.n_false_positives / non_members < 0.05


def test_hll_accuracy_within_bound(spark):
    """1024 registers give ~3.25% standard error; 5,000 distinct keys
    must estimate within 4 standard errors (13%)."""
    df = spark.createDataFrame([(f"user-{i}",) for i in range(5000)], ["k"])
    regs = sketch.hll_registers(df, "k")
    [r] = sketch.hll_estimate(regs).collect()
    assert abs(r.hll_est - 5000) / 5000 < 0.13, r.hll_est


def test_hll_merge_equals_rebuild(spark):
    """THE mergeability property: max-merging per-group register tables
    must yield the identical estimate to building one register table
    over the union — the rollup never needs the fact table again."""
    rows = [(f"user-{i}", i % 3) for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "g"])
    per_group = sketch.hll_registers(df, "k", ("g",))
    merged = sketch.hll_merge(per_group)
    direct = sketch.hll_registers(df, "k")
    [em] = sketch.hll_estimate(merged).collect()
    [ed] = sketch.hll_estimate(direct).collect()
    assert em.hll_est == ed.hll_est


def test_hll_duplicates_do_not_move_estimate(spark):
    """Distinct counting: replicating every key 10x must not change the
    registers (same hashes -> same max rho)."""
    base = spark.createDataFrame([(f"u{i}",) for i in range(500)], ["k"])
    dup = base.crossJoin(spark.range(10)).select("k")
    [e1] = sketch.hll_estimate(sketch.hll_registers(base, "k")).collect()
    [e2] = sketch.hll_estimate(sketch.hll_registers(dup, "k")).collect()
    assert e1.hll_est == e2.hll_est


def test_hll_query_total_matches_merged_days(spark, sf_smoke):
    """The registered query's 'total' row must estimate from MERGED
    per-day registers: its value equals an independent build over all
    events, and every per-day error rides under the design bound."""
    rows = REGISTRY["events_hll_daily_users"].spark(spark, sf_smoke).collect()
    total = [r for r in rows if r.granularity == "total"]
    assert len(total) == 1
    for r in rows:
        assert abs(r.err_pct) < 15.0, (r.granularity, r.bucket_day, r.err_pct)
