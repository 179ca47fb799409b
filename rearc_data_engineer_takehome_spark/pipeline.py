"""Orchestration: Task A (BLS mirror) ∥ Task B (population snapshot) →
Task C (analytics) — reference operators C1-C4 (README.md:111-129).

A thin deterministic runner: A and B run concurrently; C runs only if
both succeed (run-only-on-success semantics, README.md:183). Each task
gets bounded retries and contributes to a run-status taxonomy
(success / partial_success / failed). The reference rejected
file-arrival triggering in favor of explicit task dependencies
(README.md:92-109); this runner keeps that choice.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators import parse, relational
from .operators.quality import assert_no_nulls, assert_non_empty


@dataclass
class TaskResult:
    name: str
    status: str  # success | partial_success | failed
    attempts: int
    detail: dict = field(default_factory=dict)
    error: str | None = None


def run_task(
    name: str, fn: Callable[[], dict], retries: int = 1, backoff: float = 0.5
) -> TaskResult:
    """C2: bounded retry + failure isolation for one task."""
    last_exc: str | None = None
    for attempt in range(1, retries + 2):
        try:
            detail = fn() or {}
            status = detail.pop("_status", "success")
            return TaskResult(name=name, status=status, attempts=attempt, detail=detail)
        except Exception as exc:  # noqa: BLE001
            last_exc = repr(exc)
            if attempt <= retries:
                time.sleep(backoff * attempt)
    return TaskResult(name=name, status="failed", attempts=retries + 1, error=last_exc)


def run_pipeline(
    ingest_a: Callable[[], dict],
    ingest_b: Callable[[], dict],
    analytics: Callable[[], dict],
    retries: int = 1,
) -> dict:
    """C1: A ∥ B → C with run-only-on-success gating."""
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_a = pool.submit(run_task, "ingest_a", ingest_a, retries)
        fut_b = pool.submit(run_task, "ingest_b", ingest_b, retries)
        res_a, res_b = fut_a.result(), fut_b.result()

    results = [res_a, res_b]
    if all(r.status in ("success", "partial_success") for r in results):
        results.append(run_task("analytics", analytics, retries))
    else:
        results.append(
            TaskResult(name="analytics", status="skipped", attempts=0,
                       error="upstream ingest failed")
        )

    overall = "success"
    if any(r.status == "failed" for r in results) or results[-1].status == "skipped":
        overall = "failed"
    elif any(r.status == "partial_success" for r in results):
        overall = "partial_success"
    return {
        "status": overall,
        "tasks": {r.name: r.__dict__ for r in results},
    }


# ---------------------------------------------------------------------------
# The reference's three analytics requirements as one composable job
# (notebooks/20_analytics.ipynb cells 4-14), generalized over input paths.
# ---------------------------------------------------------------------------


def analytics_job(
    spark: SparkSession,
    bls_path: str,
    population_path: str,
    focus_series: str = "PRS30006032",
    focus_period: str = "Q01",
    pop_year_range: tuple[int, int] = (2013, 2018),
) -> dict[str, DataFrame]:
    """Requirement A: mean+stddev of population over a year range.
    Requirement B: best (max summed value) year per series, ties → earliest.
    Requirement C: focus-series report left-joined to population by year.

    Returns the three curated DataFrames keyed by output-table name.
    Validation (V1-V5) runs inline exactly as the reference's validation
    cell does (20_analytics.ipynb:3103-3172).
    """
    bls = parse.read_and_parse_bls(spark, bls_path)
    population = parse.read_and_normalize_population(spark, population_path)

    assert_non_empty(bls, "bls parse")
    assert_non_empty(population, "population normalize")
    assert_no_nulls(bls, ["series_id", "year", "period", "value"], "bls critical fields")

    lo, hi = pop_year_range
    population_stats = (
        population.where((F.col("Year") >= lo) & (F.col("Year") <= hi))
        .agg(
            F.mean("Population").alias("mean_population"),
            F.stddev("Population").alias("stddev_population"),
        )
    )

    best_year = relational.top1_per_group(
        bls, "series_id", "year", "value", agg="sum"
    ).select(
        "series_id",
        F.col("best_year"),
        F.col("sum_value").alias("summed_value"),
    )

    report = relational.left_enrich(
        bls.where(
            (F.col("series_id") == focus_series) & (F.col("period") == focus_period)
        ),
        population.select(
            F.col("Year").alias("year"), F.col("Population").alias("population")
        ),
        on="year",
    ).select("year", "series_id", "period", "value", "population").orderBy("year")

    return {
        "population_stats": population_stats,
        "bls_best_year_by_series": best_year,
        f"report_{focus_series.lower()}_{focus_period.lower()}": report,
    }
