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
