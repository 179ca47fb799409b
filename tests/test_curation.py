"""Semantic tests for the corpus-curation tier (operators/curation.py).

Oracle parity (tests/test_oracle_parity.py) already hash-gates the six
registered queries; these tests pin the operator-level INVARIANTS that
a hash can't express: the union-MinHash identity, DSIR's separation of
the target slice, cap accounting, and bucket-boundary exactness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.operators import curation
from rearc_data_engineer_takehome_spark.operators import text as text_ops


@pytest.fixture(scope="module")
def docs(spark, sf_correctness):
    return spark.read.parquet(f"{sf_correctness}/documents.parquet")


def test_classifier_scores_bounded_and_deterministic(docs):
    out = curation.classifier_scores(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.clf_score <= 1.0
        assert -0.5 <= r.mean_weight <= 0.5
    # dyadic weights ⇒ the fold is exact ⇒ re-running is bit-identical
    again = {r.doc_id: r.mean_weight for r in curation.classifier_scores(docs).collect()}
    assert all(again[r.doc_id] == r.mean_weight for r in rows)


def test_dsir_separates_target_slice(docs):
    """Mean importance weight of target-language docs must exceed the
    non-target mean — DSIR's whole point is upweighting the target
    distribution."""
    w = curation.dsir_weights(docs, F.col("lang") == "en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.is_en: r.m
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_dsir_degenerate_target_is_flat(docs):
    """When the target IS the whole corpus, p_target == p_raw exactly
    (same counts, same smoothing), so every document's log-ratio is 0."""
    w = curation.dsir_weights(docs, F.lit(True))
    assert w.where(F.col("dsir_logweight") != 0.0).count() == 0


def test_length_buckets_exact_boundaries(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([1, 8, 9, 16, 17, 500])],
        "doc_id int, text string",
    )
    out = {
        r.bucket: r for r in curation.length_buckets(df).collect()
    }
    # n=8 lands IN the 8-bucket (boundary inclusive), n=9 spills to 16,
    # n=500 overflows into the catch-all last bucket
    assert out[8].n_docs == 2  # n=1, n=8
    assert out[16].n_docs == 2  # n=9, n=16
    assert out[32].n_docs == 1  # n=17
    assert out[1024].n_docs == 1  # n=500 overflow
    for r in out.values():
        assert r.padded_tokens >= r.real_tokens


def test_source_caps_accounting(docs):
    feat = text_ops.quality_features(docs)
    out = curation.source_caps(feat, cap=10).collect()
    per_source = docs.groupBy("source").count().collect()
    totals = {r.source: r["count"] for r in per_source}
    assert {r.source for r in out} == set(totals)
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_total == totals[r.source]
        assert r.n_kept <= 10
        assert r.admit_threshold is not None


def test_union_minhash_identity(spark):
    """Grouped min-of-mins must equal the MinHash of the union: a group
    holding two docs has the same signature as one doc holding their
    concatenated text's shingle multiset union."""
    two = spark.createDataFrame(
        [("g", 1, "alpha beta gamma delta epsilon"),
         ("g", 2, "zeta eta theta iota kappa")],
        "source string, doc_id int, text string",
    )
    merged = spark.createDataFrame(
        [("g", 1, "alpha beta gamma delta epsilon"),
         ("g", 2, "zeta eta theta iota kappa"),
         ("h", 3, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "source string, doc_id int, text string",
    )
    sig_two = curation.source_signatures(two, n_perm=8).collect()[0]
    sigs = {r.source: r for r in curation.source_signatures(merged, n_perm=8).collect()}
    # g's union signature from two docs
    assert [sig_two[f"m{j}"] for j in range(8)] == [
        sigs["g"][f"m{j}"] for j in range(8)
    ]
    # h is the concatenation BUT 3-shingles cross the doc boundary, so
    # h ⊇ g's shingles — every permutation min can only stay or shrink
    for j in range(8):
        assert sigs["h"][f"m{j}"] <= sigs["g"][f"m{j}"]


def test_source_similarity_identical_sources(spark):
    df = spark.createDataFrame(
        [("a", 1, "the quick brown fox jumps over the lazy dog"),
         ("b", 2, "the quick brown fox jumps over the lazy dog"),
         ("c", 3, "completely different vocabulary in this source here")],
        "source string, doc_id int, text string",
    )
    out = {(r.source_a, r.source_b): r.est_jaccard
           for r in curation.source_similarity(df).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] < 1.0


def test_mixture_manifest_budget_semantics(spark, sf_correctness):
    """Greedy fill invariants: every language stops at the first doc
    that crosses its budget — so sampled_tokens < target + the largest
    single doc, and removing the last admitted doc would leave the
    budget unfilled (sampled_tokens - any admitted doc < target ⇒
    sampled_tokens >= target unless the language ran out of docs)."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    q = entry.queries()["mixture_sample_manifest"]
    rows = q(spark, sf_correctness).collect()
    assert rows, "empty manifest"
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    import pyspark.sql.functions as F

    from rearc_data_engineer_takehome_spark.operators.text import token_count_ws

    max_doc = {
        r.lang: r.mx
        for r in docs.where(F.col("text").isNotNull())
        .groupBy("lang")
        .agg(F.max(token_count_ws("text")).alias("mx"))
        .collect()
    }
    avail = {
        r.lang: r.s
        for r in docs.where(F.col("text").isNotNull())
        .groupBy("lang")
        .agg(F.sum(token_count_ws("text")).alias("s"))
        .collect()
    }
    for r in rows:
        assert r.sampled_tokens < r.target_tokens + max_doc[r.lang]
        if avail[r.lang] >= r.target_tokens:
            assert r.sampled_tokens >= r.target_tokens


def test_quality_bootstrap_ci_brackets_mean(spark, sf_correctness):
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    r = entry.queries()["quality_bootstrap_ci"](spark, sf_correctness).collect()[0]
    assert r.ci_lo <= r.mean_score <= r.ci_hi
    assert r.ci_hi > r.ci_lo  # nonzero width
    # Poisson bootstrap of a mean over n docs: width ~ O(1/sqrt(n)),
    # far tighter than the score range
    assert (r.ci_hi - r.ci_lo) < 0.2


def test_source_score_calibration_shifts_misscaled_source(spark, sf_correctness):
    """The calibrated average of every source should land nearer the
    global mean than spread-out raw averages do — quantile mapping onto
    one shared distribution compresses cross-source scale differences.
    (On near-identically distributed fixture sources the shift is tiny,
    so assert structural invariants: outputs exist per source, max_shift
    is finite and calibrated values stay inside the global score range.)"""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    rows = entry.queries()["source_score_calibration"](
        spark, sf_correctness
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.avg_calibrated <= 1.0
        assert r.max_shift >= 0.0
        assert r.n_docs > 0


import pytest


@pytest.mark.parametrize(
    "vals",
    [
        # first increment negative (10 - 50): running min goes below 0
        [10.0, 80.0, 90.0, 5.0, 200.0, 300.0, 1.0],
        # every increment positive: prefix sum never dips below the
        # P_0 = 0 baseline, so the running min must be floored at 0 —
        # the Page (1954) identity is S_i = P_i - min(0, min_j P_j).
        # Without the floor, S is understated by min_j P_j and S_1
        # is misreported as 0.
        [60.0, 120.0, 90.0, 210.0, 55.0, 400.0, 70.0],
    ],
)
def test_cusum_identity_matches_reset_recurrence(spark, vals):
    """The cumsum-minus-floored-running-min identity must equal the
    textbook reset-at-zero recurrence S_i = max(0, S_{i-1} + x_i - k)."""
    import sys

    sys.path.insert(0, ".")
    k, h = 50.0, 200.0
    s, mx, n_over, first = 0.0, 0.0, 0, None
    for i, x in enumerate(vals):
        s = max(0.0, s + x - k)
        mx = max(mx, s)
        if s > h:
            n_over += 1
            if first is None:
                first = i
    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, "click", v, None)
        for i, v in enumerate(vals)
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value", "props"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        import __spark_entry__ as entry

        out = entry.queries()["events_cusum_drift"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r.max_cusum - round(mx, 4)) < 1e-9
    assert r.n_over == n_over


def test_last_touch_attribution_edges(spark, tmp_path):
    """Behavioral edges of events_last_touch_attribution: a purchase
    with no prior touch and one whose only touch is older than the
    7-day lookback both credit 'none'; an in-window touch credits its
    channel; a later touch never credits an earlier purchase."""
    import datetime as dt

    from rearc_data_engineer_takehome_spark.queries import REGISTRY

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: click 2 days before purchase -> 'click'
        (1, t0, 1, "click", 0.0, None),
        (2, t0 + 2 * day, 1, "purchase", 10.0, None),
        # user 2: view 8 days before purchase -> outside window, 'none'
        (3, t0, 2, "view", 0.0, None),
        (4, t0 + 8 * day, 2, "purchase", 20.0, None),
        # user 3: purchase first, click after -> 'none'
        (5, t0, 3, "purchase", 40.0, None),
        (6, t0 + day, 3, "click", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r.channel: (r.n_purchases, r.attributed_revenue)
        for r in REGISTRY["events_last_touch_attribution"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {"click": (1, 10.0), "none": (2, 60.0)}


def test_pmi_collocations_floor_and_known_value(spark):
    """min_count floors out hapax pairs (the classic PMI pathology);
    a bigram that always co-occurs scores ln(nb_inv * nu^2 /(ca*cb))
    computed from the exact counts."""
    import math

    # "san francisco" 6 times (always together), "the the" filler 5
    # times, one hapax pair "rare pair"
    rows = (
        [("san francisco",)] * 6 + [("the the",)] * 5 + [("rare pair",)]
    )
    df = spark.createDataFrame(rows, "text string").select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )
    out = {
        r["bg"]: r.asDict()
        for r in text_ops.pmi_collocations(
            df, "text", min_count=5, k=10
        ).collect()
    }
    assert "rare pair" not in out  # hapax floored
    assert set(out) == {"san francisco", "the the"}
    got = out["san francisco"]
    assert (got["c_ab"], got["c_a"], got["c_b"]) == (6, 6, 6)
    # nu = 24 tokens, nb = 11 surviving bigrams
    expect = round(math.log((6 / 11) / ((6 / 24) * (6 / 24))), 8)
    assert abs(got["pmi"] - expect) < 1e-9
    # "the the": c_ab=5, c_a=c_b=10 -> lower pmi than a perfect pair
    assert out["the the"]["pmi"] < got["pmi"]
