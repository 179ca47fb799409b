"""Advanced join strategies Spark lacks as primitives: as-of joins,
salted skew joins, and bucketed co-located joins.

The reference has exactly one join (left broadcast equi-join,
20_analytics.ipynb:2541-2556); these are the extension-tier strategies a
100 TB pipeline needs when the dim side ISN'T small or the key IS
skewed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    latest ``right_ts`` ≤ ``left_ts`` (direction='backward'; 'forward'
    takes the earliest ≥) within the same ``on`` key.

    Spark has no ASOF JOIN primitive, so this uses the union-and-carry
    formulation: tag both sides, union them, sort by (key, time) within
    key partitions, and carry the most recent right row forward with
    ``last(..., ignorenulls=True)`` over an unbounded-preceding window.
    ONE shuffle on the key — same cost as a regular sort-merge join,
    never a range cross-join. Ties (equal timestamps) resolve to the
    right row, matching DuckDB's ASOF JOIN (>= semantics), with the
    LAST right row winning among equal right timestamps.

    Returns every left row (left-outer semantics) plus the matched right
    payload columns suffixed with ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c not in (on, right_ts)]

    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in rcols],
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    merged = lt.unionByName(rt)

    if direction == "backward":
        # right rows sort before left rows at equal time → a right row at
        # exactly left_ts is visible to that left row (>= match)
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    carried = merged.select(
        on,
        "__t",
        "__is_left",
        *lcols,
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )
    return carried.where(F.col("__is_left") == 1).drop("__is_left").withColumnRenamed(
        "__t", left_ts
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap: int,
    suffix: str = "_right",
) -> DataFrame:
    """Interval/range join: pairs (l, r) with the same key whose
    timestamps satisfy ``|left_ts - right_ts| <= max_gap`` (seconds-scale
    integers or whatever unit the columns carry).

    Spark plans a naive ``ON key AND abs(l-r) <= g`` as an equi-join on
    the key with a post-filter — fine — but when the KEY is coarse (or
    absent) that degenerates to per-key cartesian. This implementation
    adds time-bucket blocking: each right row lands in bucket
    floor(rt/max_gap); each left row probes its own bucket ±1 (every
    within-gap pair must share or neighbor a bucket). The join becomes
    equi on (key, bucket) — 3× right-side duplication buys bounded
    per-task pair counts regardless of key skew.
    """
    lb = F.floor(F.col(left_ts) / max_gap)
    rb = F.floor(F.col(right_ts) / max_gap)
    lt = left.withColumn(
        "__bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    rcols = [c for c in right.columns if c != on]
    rt = right.select(
        F.col(on),
        rb.alias("__bucket"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    joined = lt.join(rt, on=[on, "__bucket"]).drop("__bucket")
    gap_ok = (
        F.abs(F.col(left_ts) - F.col(f"{right_ts}{suffix}")) <= max_gap
    )
    return joined.where(gap_ok)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: fact keys get a deterministic salt in
    [0, n_salts), the dim side is replicated n_salts times, and the join
    runs on (key, salt) — a hot key's rows spread across ``n_salts``
    tasks instead of one straggler.

    Use when AQE's skew-join splitting isn't available or the skew is in
    a broadcast-ineligible dim. Deterministic salt (pmod of the key's
    hash) keeps re-runs stable. Cost: dim side × n_salts — only viable
    when dim ≪ fact.
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_dim = dim.withColumn("__salt", salts)
    out = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Publish a table bucketed (and optionally sorted) by the join key.
    Two tables bucketed the same way join WITHOUT a shuffle — the
    pre-partitioning is amortized across every downstream join, the
    core trick for repeated 100 TB fact-fact joins."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)
