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
