"""Parity tests for the reference's own workload: BLS text parsing,
population JSON normalization, the three analytics requirements, and the
A ∥ B → C orchestration contract. Fixture shapes replicate the real
inputs (header row, blank lines, footnote column, missing year in
population) per SURVEY.md §5."""

from __future__ import annotations

import json

import pytest

from rearc_data_engineer_takehome_spark import pipeline
from rearc_data_engineer_takehome_spark.operators import parse

BLS_FILE = """series_id\tyear\tperiod\tvalue\tfootnote_codes
PRS30006011 1995 Q01 2.6
PRS30006011 1995 Q02 2.1 r
PRS30006011 1996 Q01 5.0

PRS30006032 1995 Q01 0.5
PRS30006032 1995 Q05 1.5
PRS30006032 1996 Q01 6.0 p
garbage line without numbers
"""

POP_JSON = {
    "annotations": {"source_name": "test"},
    "columns": [{"name": "Year"}, {"name": "Nation"}, {"name": "Population"}],
    "data": [
        {"Year": 1995, "Nation": "X", "Population": 100.0},
        {"Year": 1996, "Nation": "X", "Population": 110.0},
        # 1997 deliberately absent (reference: 2020 missing year)
    ],
}


@pytest.fixture()
def bls_path(tmp_path):
    p = tmp_path / "pr.data.0.Current"
    p.write_text(BLS_FILE)
    return str(p)


@pytest.fixture()
def pop_path(tmp_path):
    p = tmp_path / "population.json"
    p.write_text(json.dumps(POP_JSON, indent=2))
    return str(p)


def test_parse_drops_header_blank_garbage_and_footnotes(spark, bls_path):
    df = parse.read_and_parse_bls(spark, bls_path)
    rows = {(r.series_id, r.year, r.period): r.value for r in df.collect()}
    # 6 data rows survive; header, blank, garbage dropped; footnotes ignored
    assert len(rows) == 6
    assert rows[("PRS30006011", 1995, "Q02")] == 2.1
    assert rows[("PRS30006032", 1996, "Q01")] == 6.0
    assert df.schema.simpleString() == (
        "struct<series_id:string,year:int,period:string,value:double>"
    )


def test_population_normalize(spark, pop_path):
    df = parse.read_and_normalize_population(spark, pop_path)
    rows = {r.Year: r.Population for r in df.collect()}
    assert rows == {1995: 100.0, 1996: 110.0}


def test_analytics_job_three_requirements(spark, bls_path, pop_path):
    out = pipeline.analytics_job(
        spark,
        bls_path,
        pop_path,
        focus_series="PRS30006032",
        focus_period="Q01",
        pop_year_range=(1995, 1996),
    )
    stats = out["population_stats"].collect()[0]
    assert stats.mean_population == pytest.approx(105.0)
    assert stats.stddev_population == pytest.approx(7.0710678, rel=1e-6)

    best = {r.series_id: (r.best_year, r.summed_value) for r in
            out["bls_best_year_by_series"].collect()}
    # PRS30006011: 1995 sums 4.7 vs 1996 5.0 → 1996
    assert best["PRS30006011"] == (1996, pytest.approx(5.0))
    # PRS30006032: 1996 (6.0) beats 1995 (0.5+1.5=2.0)
    assert best["PRS30006032"] == (1996, pytest.approx(6.0))

    report = out["report_prs30006032_q01"].collect()
    assert [(r.year, r.value, r.population) for r in report] == [
        (1995, 0.5, 100.0),
        (1996, 6.0, 110.0),
    ]


def test_best_year_tiebreak_earliest(spark, tmp_path):
    # two years with identical sums → earliest year must win
    # (reference tie-break: notebooks/20_analytics.ipynb:2177)
    p = tmp_path / "tie.txt"
    p.write_text("S1 2001 Q01 5.0\nS1 2000 Q01 5.0\n")
    from rearc_data_engineer_takehome_spark.operators.relational import top1_per_group

    df = top1_per_group(parse.read_and_parse_bls(spark, str(p)),
                        "series_id", "year", "value")
    row = df.collect()[0]
    assert (row.series_id, row.best_year, row.sum_value) == ("S1", 2000, 5.0)


def test_left_join_keeps_unmatched_years(spark, bls_path, tmp_path):
    # population missing 1996 → report row must survive with NULL population
    pop = {"data": [{"Year": 1995, "Nation": "X", "Population": 100.0}]}
    p = tmp_path / "pop1.json"
    p.write_text(json.dumps(pop))
    out = pipeline.analytics_job(
        spark, bls_path, str(p), focus_series="PRS30006032", focus_period="Q01"
    )
    report = out["report_prs30006032_q01"].collect()
    assert [(r.year, r.population) for r in report] == [(1995, 100.0), (1996, None)]


def test_pipeline_gating_and_status():
    ok = lambda: {"n": 1}
    bad = lambda: (_ for _ in ()).throw(RuntimeError("boom"))
    res = pipeline.run_pipeline(ok, ok, ok, retries=0)
    assert res["status"] == "success"
    res = pipeline.run_pipeline(ok, bad, ok, retries=0)
    assert res["status"] == "failed"
    assert res["tasks"]["analytics"]["status"] == "skipped"


def test_partial_success_propagates():
    partial = lambda: {"_status": "partial_success", "n": 1}
    ok = lambda: {}
    res = pipeline.run_pipeline(partial, ok, ok, retries=0)
    assert res["status"] == "partial_success"
    assert res["tasks"]["analytics"]["status"] == "success"
