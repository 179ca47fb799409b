"""Sampling operators: stratified fractions, hash-split disjointness/
completeness/determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet")


def test_uniform_sample_fraction_and_determinism(docs):
    s1 = sampling.sample(docs, 0.3, seed=7)
    s2 = sampling.sample(docs, 0.3, seed=7)
    n, total = s1.count(), docs.count()
    assert abs(n / total - 0.3) < 0.1
    assert {r.doc_id for r in s1.collect()} == {r.doc_id for r in s2.collect()}


def test_stratified_sample_rebalances(docs):
    fracs = {"en": 1.0, "es": 0.2, "fr": 0.2, "de": 0.2, "zh": 0.2}
    out = sampling.stratified_sample(docs, "lang", fracs, seed=7)
    by_lang = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    orig = {r.lang: r.n for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang["en"] == orig["en"]  # fraction 1.0 keeps everything
    for lang in ("es", "fr", "de", "zh"):
        assert by_lang.get(lang, 0) < orig[lang] * 0.5  # heavily downsampled


def test_hash_split_disjoint_complete_deterministic(docs):
    train, val, test = sampling.hash_split(docs, "doc_id", [0.8, 0.1, 0.1])
    ids = [
        {r.doc_id for r in part.select("doc_id").collect()}
        for part in (train, val, test)
    ]
    total = docs.count()
    assert sum(len(s) for s in ids) == total          # complete
    assert not (ids[0] & ids[1] or ids[0] & ids[2] or ids[1] & ids[2])  # disjoint
    assert abs(len(ids[0]) / total - 0.8) < 0.08      # roughly weighted
    # content-determinism: same assignment on a repartitioned frame
    train2 = sampling.hash_split(docs.repartition(13), "doc_id", [0.8, 0.1, 0.1])[0]
    assert {r.doc_id for r in train2.select("doc_id").collect()} == ids[0]


def test_weighted_sample_matches_formula_and_is_deterministic(spark):
    import hashlib, math

    rows = [(i, float(10 + (i * 37) % 200)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    from rearc_data_engineer_takehome_spark.operators.sampling import weighted_sample

    got = weighted_sample(df, "w", m=30, key_col="doc_id").collect()
    assert len(got) == 30

    # per-row key matches the A-ES formula computed independently
    def py_key(doc_id, w):
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        return round(math.log(u) / w, 8)

    for r in got:
        assert abs(r.wkey - py_key(r.doc_id, r.w)) < 1e-9

    # selection = global top-30 of the keys (verified on the full frame)
    all_keys = sorted(
        ((py_key(i, w), -i) for i, w in rows), reverse=True
    )[:30]
    assert {(-k[1]) for k in all_keys} == {r.doc_id for r in got}

    # reruns identical (pure function of content, no RNG state)
    again = weighted_sample(df, "w", m=30, key_col="doc_id").collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in got)

    # zero/negative weights never selected
    df2 = spark.createDataFrame([(900, 0.0), (901, -3.0)], "doc_id long, w double")
    assert weighted_sample(df.union(df2), "w", m=300, key_col="doc_id").where(
        "doc_id >= 900"
    ).count() == 0


def test_reservoir_per_group_exact_k_and_deterministic(spark, sf_smoke):
    from rearc_data_engineer_takehome_spark.operators.sampling import (
        reservoir_per_group,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang"
    )
    out1 = sorted(
        (r.lang, r.doc_id)
        for r in reservoir_per_group(docs, "lang", 5, "doc_id").collect()
    )
    out2 = sorted(
        (r.lang, r.doc_id)
        for r in reservoir_per_group(
            docs.repartition(7), "lang", 5, "doc_id"
        ).collect()
    )
    assert out1 == out2  # partitioning-independent
    from collections import Counter

    per_group = Counter(lang for lang, _ in out1)
    sizes = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, n in sizes.items():
        assert per_group[lang] == min(5, n)


def test_wau_approx_within_envelope(spark, sf_smoke):
    """Round 10: the query itself now emits the exact count plus the
    hash-certified within_bounds boolean — the local gate checks the
    exact counts agree with the exact twin and every bound holds."""
    from rearc_data_engineer_takehome_spark.queries import REGISTRY

    exact = {
        r.window_start: r.wau
        for r in REGISTRY["events_wau"].spark(spark, sf_smoke).collect()
    }
    rows = REGISTRY["events_wau_approx"].spark(spark, sf_smoke).collect()
    got = {r.window_start: (r.wau_exact, r.within_bounds) for r in rows}
    assert exact.keys() == got.keys()
    for ws, n in exact.items():
        assert got[ws] == (n, True), (ws, n, got[ws])
