"""Behavioral tests for the evaluation tier (operators/evaluation.py)
and the DP release mechanism (operators/privacy.py) — known-answer
cases the oracle parity suite can't express (guards, determinism,
textbook values)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.operators.evaluation import (
    cohens_kappa,
    roc_auc,
    woe_iv,
)
from rearc_data_engineer_takehome_spark.operators.privacy import (
    dp_noisy_counts,
)


def test_roc_auc_known_values(spark):
    # perfect separation: every positive scores above every negative
    perfect = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "score double, y int"
    )
    assert roc_auc(perfect, "score", "y").collect()[0]["auc"] == 1.0

    # perfectly inverted ranking
    inverted = spark.createDataFrame(
        [(4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)], "score double, y int"
    )
    assert roc_auc(inverted, "score", "y").collect()[0]["auc"] == 0.0

    # constant score: all ties -> tie-corrected AUC is exactly 0.5
    const = spark.createDataFrame(
        [(7.0, 1), (7.0, 0), (7.0, 1), (7.0, 0)], "score double, y int"
    )
    assert roc_auc(const, "score", "y").collect()[0]["auc"] == 0.5

    # hand-computed mixed case: scores 1..4 with labels 0,1,0,1
    # pairs: (s2>s1)+(s2<s3 fails)+(s4>s1)+(s4>s3) -> 3 of 4 -> 0.75
    mixed = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)], "score double, y int"
    )
    row = roc_auc(mixed, "score", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (2, 2, 0.75)


def test_roc_auc_distinct_score_guard(spark):
    df = spark.range(500).select(
        (F.col("id") * 1.0).alias("score"), (F.col("id") % 2).alias("y")
    )
    with pytest.raises(ValueError, match="max_distinct_scores"):
        roc_auc(df, "score", "y", max_distinct_scores=100).collect()
    # disabled guard computes fine on the same input
    out = roc_auc(df, "score", "y", max_distinct_scores=None).collect()[0]
    assert 0.0 <= out["auc"] <= 1.0


def test_roc_auc_null_scores_dropped_and_single_class_raises(spark):
    # NULL scores are unrankable — dropped on both engines identically
    withnull = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1), (None, 1), (None, 0)],
        "score double, y int",
    )
    row = roc_auc(withnull, "score", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (2, 2, 1.0)

    # a single label class cannot be graded: loud error, not NULL auc
    one_class = spark.createDataFrame(
        [(1.0, 1), (2.0, 1)], "score double, y int"
    )
    with pytest.raises(ValueError, match="single label class"):
        roc_auc(one_class, "score", "y")

    # ADVICE r05: with the guard (and thus the eager single-class
    # check) disabled, the division must yield a deterministic NULL
    # auc — never an ANSI DIVIDE_BY_ZERO at collect time
    row = roc_auc(
        one_class, "score", "y", max_distinct_scores=None
    ).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (2, 0, None)


def test_cohens_kappa_known_values(spark):
    # perfect agreement -> kappa = 1
    same = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("a", "a"), ("c", "c")], "x string, y string"
    )
    r = cohens_kappa(same, "x", "y").collect()[0]
    assert r["po"] == 1.0 and r["kappa"] == 1.0

    # the standard 2x2 textbook case: po=0.7, pe=0.5 -> kappa=0.4
    # counts: yes/yes 20, yes/no 5, no/yes 10, no/no 15 (N=50)
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10
        + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = cohens_kappa(df, "x", "y").collect()[0]
    assert r["n_items"] == 50
    assert r["po"] == 0.7
    assert r["pe"] == 0.5  # (25*30 + 25*20) / 2500
    assert abs(r["kappa"] - 0.4) < 1e-9

    # labels drawn independently of each other -> kappa ~ 0: annotator
    # x alternates, y is constant -> pe == po -> kappa 0
    indep = spark.createDataFrame(
        [("a", "z"), ("b", "z")] * 10, "x string, y string"
    )
    assert cohens_kappa(indep, "x", "y").collect()[0]["kappa"] == 0.0


def test_woe_iv_hand_computed(spark):
    # feature A: 30 good / 10 bad; feature B: 10 good / 30 bad
    rows = (
        [("A", 0)] * 30 + [("A", 1)] * 10 + [("B", 0)] * 10 + [("B", 1)] * 30
    )
    df = spark.createDataFrame(rows, "f string, y int")
    out = {r["feature"]: r.asDict() for r in woe_iv(df, "f", "y").collect()}
    # dist_good(A)=0.75, dist_bad(A)=0.25 -> woe = ln(3)
    assert abs(out["A"]["woe"] - round(math.log(3), 8)) < 1e-9
    assert abs(out["B"]["woe"] - round(math.log(1 / 3), 8)) < 1e-9
    # iv = (0.75-0.25)*ln3 + (0.25-0.75)*ln(1/3) = ln3 ~ 1.0986
    assert abs(out["A"]["iv_total"] - 1.098612) < 1e-5
    assert out["A"]["iv_total"] == out["B"]["iv_total"]
    assert out["A"]["n_good"] == 30 and out["A"]["n_bad"] == 10


def test_dp_noisy_counts_determinism_bounds_and_clamp(spark):
    df = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 50 + [("c",)] * 1, "k string"
    )
    out1 = {r["k"]: r["noisy_count"] for r in
            dp_noisy_counts(df, "k", epsilon=1.0).collect()}
    out2 = {r["k"]: r["noisy_count"] for r in
            dp_noisy_counts(df, "k", epsilon=1.0).collect()}
    assert out1 == out2  # seeded noise: reruns reproduce exactly
    # Laplace(1) noise from a uniform clamped at 1e-9 is bounded by
    # ln(1e9) ~ 20.7; released counts stay in a sane envelope
    for key, true in (("a", 100), ("b", 50), ("c", 1)):
        assert abs(out1[key] - true) <= 21.0
        assert out1[key] >= 0.0  # clamp holds even when noise < -count
    # a different seed yields different noise for at least one key
    out3 = {r["k"]: r["noisy_count"] for r in
            dp_noisy_counts(df, "k", epsilon=1.0, seed="dp-v2").collect()}
    assert out3 != out1
    # smaller epsilon -> strictly larger noise magnitude on some key
    out_eps = {r["k"]: r["noisy_count"] for r in
               dp_noisy_counts(df, "k", epsilon=0.1).collect()}
    assert any(
        abs(out_eps[k] - t) > abs(out1[k] - t)
        for k, t in (("a", 100), ("b", 50))
    )


def test_ols_matches_numpy_lstsq(spark, sf_smoke):
    """The closed-form Cramer solution must match numpy's least-squares
    on the same quantized inputs."""
    import numpy as np

    from rearc_data_engineer_takehome_spark.queries import REGISTRY

    got = REGISTRY["ols_price_on_qty_discount"].spark(
        spark, sf_smoke
    ).collect()[0]

    pdf = (
        spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    x1 = pdf["l_quantity"].astype("int64").to_numpy()
    x2 = np.round(pdf["l_discount"] * 100).astype("int64").to_numpy()
    y = np.round(pdf["l_extendedprice"] * 100).astype("int64").to_numpy()
    a = np.column_stack([np.ones_like(x1), x1, x2]).astype("float64")
    coef, *_ = np.linalg.lstsq(a, y.astype("float64"), rcond=None)
    assert got["n_rows"] == len(pdf)
    assert abs(got["intercept"] - coef[0] / 100) < 1e-3
    assert abs(got["beta_qty"] - coef[1] / 100) < 1e-4
    assert abs(got["beta_discount"] - coef[2]) < 1e-3
