"""Data-quality / validation operators (reference checks V1-V10).

The reference's correctness assurance is runtime validation embedded in
the pipeline (SURVEY.md §5): path/table existence asserts, null-critical
checks, duplicate detection, domain checks, completeness histograms, IQR
outliers, and an append-only DQ run log. Reference:
notebooks/20_analytics.ipynb:3103-3172 (validation cell) and
notebooks/21_EDA.ipynb cells 9-25 (profiling harness).

Every check returns a DataFrame (composable, lazy); ``assert_*`` wrappers
raise like the reference's RuntimeError-on-failure contract. At scale:
one-pass aggregations only — the null profile is a single agg over all
columns, not a per-column scan; quantiles use percentile_approx in-plan
rather than the reference's driver-side approxQuantile collect.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class ValidationError(RuntimeError):
    """Raised when a hard data-quality assertion fails (the reference
    raises RuntimeError to halt the workflow — README.md:214-215)."""


def null_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """V4/A8: per-column null count + percentage, ONE pass.

    Returns one row per profiled column: (column, n_nulls, pct_nulls).
    Reference: notebooks/21_EDA.ipynb:1073-1085.
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(F.col(c).isNull().cast("int")).alias(c) for c in cols
    ]
    wide = df.agg(*aggs)
    # unpivot the single wide row → long (column, n_nulls) form
    stacked = wide.select(
        F.col("__total"),
        F.expr(
            "stack({n}, {args}) as (column, n_nulls)".format(
                n=len(cols),
                args=", ".join(f"'{c}', `{c}`" for c in cols),
            )
        ),
    ).select(
        "column",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.round(F.col("n_nulls") * 100.0 / F.col("__total"), 4).alias("pct_nulls"),
    )
    return stacked


def duplicate_rows(df: DataFrame) -> DataFrame:
    """V6 (full-row): rows appearing more than once, with multiplicity.
    Equivalent to count() - dropDuplicates().count() in the reference
    (21_EDA.ipynb:657-658) but returns the offending rows."""
    return (
        df.groupBy(*df.columns)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """V6 (business-key): key groups with >1 row.
    Reference: notebooks/21_EDA.ipynb:666-668."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def domain_check(
    df: DataFrame, col: str, allowed: Sequence[str] | None = None
) -> DataFrame:
    """V7: distinct values of a column (optionally flagging values outside
    an allowed vocabulary). Reference: notebooks/21_EDA.ipynb:1366-1370."""
    out = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    if allowed is not None:
        out = out.withColumn("in_domain", F.col(col).isin(list(allowed)))
    return out


def completeness(
    df: DataFrame,
    group_keys: Sequence[str],
    coverage_col: str,
    expected: int,
) -> DataFrame:
    """V8: per-group coverage — distinct ``coverage_col`` values vs the
    expected count, with a boolean completeness flag. The reference checks
    quarters-present-per-(series, year) against 4
    (notebooks/21_EDA.ipynb:1875-1890)."""
    return (
        df.groupBy(*group_keys)
        .agg(F.countDistinct(coverage_col).alias("n_present"))
        .withColumn("is_complete", F.col("n_present") >= F.lit(expected))
    )


def exact_quantiles_bracketed(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    accuracy: int = 1000,
) -> DataFrame:
    """EXACT interpolated quantiles (DuckDB ``quantile_cont`` semantics,
    bit-identical) without building a full value-count map.

    The classic exact ``percentile`` aggregate hashes every distinct
    value into per-partition maps and merge-sorts them — on a
    near-continuous column that is O(n) state (measured ~1.8 s at sf0.1
    for 583k distinct prices). This uses the distributed-selection
    shape instead:

      pass 1: one GK sketch (``percentile_approx``) brackets each
              target rank within ±3n/accuracy rows;
      pass 2: ONE codegen scan counts rows below each bracket and
              collects only the in-bracket values (~6n/accuracy
              doubles) into a sorted array — exact rank arithmetic +
              linear interpolation then read the answer out of the
              array. In-plan ``assert_true`` guards fail LOUDLY if a
              sketch bracket ever misses its rank (cannot silently
              return a wrong quantile).

    Scale knob: bracket width is ~6n/accuracy ROWS, so ``accuracy``
    should grow with n to keep the collected array bounded (n=1e12 →
    accuracy ~1e7 keeps brackets under ~1e6 values). State is two 1-row
    broadcasts and one bounded array — never an O(distinct) map.

    Returns a 1-row DataFrame with columns ``q0..q{len(qs)-1}``
    (doubles), interpolated with Spark ``percentile``'s two-sided
    weighted form (ceil-pos)·v[floor(p)] + (pos-floor)·v[ceil(p)],
    p = (n-1)·q — bit-identical to ``percentile`` (property-tested)
    and within-ulp of DuckDB ``quantile_cont``.

    Sibling: :func:`exact_quantiles_scalable` trades ~1.7× speed for a
    distinct-count walk that never materializes a value array — the
    safer choice on duplicate-heavy columns where a single value could
    straddle the whole bracket. Both carry ±1-rank adjacent-value
    fallbacks for the small-n case where the fractional pad is narrower
    than one rank; this one is the fast path for near-continuous
    columns.
    """
    pad = 3.0 / accuracy
    plist = [max(0.0, q - pad) for q in qs] + [min(1.0, q + pad) for q in qs]
    b = (
        df.agg(
            F.count(col).alias("n"),
            F.percentile_approx(
                col, F.array(*[F.lit(p) for p in plist]), accuracy
            ).alias("br"),
        )
        .select(
            "n",
            *[F.col("br").getItem(i).alias(f"lo{i}") for i in range(len(qs))],
            *[
                F.col("br").getItem(i + len(qs)).alias(f"hi{i}")
                for i in range(len(qs))
            ],
        )
    )
    j = df.join(F.broadcast(b))
    aggs = [F.first("n").alias("n")]
    for i in range(len(qs)):
        aggs.append(
            F.sum((F.col(col) < F.col(f"lo{i}")).cast("long")).alias(f"c{i}")
        )
        aggs.append(
            F.sort_array(
                F.collect_list(
                    F.when(
                        (F.col(col) >= F.col(f"lo{i}"))
                        & (F.col(col) <= F.col(f"hi{i}")),
                        F.col(col),
                    )
                )
            ).alias(f"a{i}")
        )
        # ±1-rank fallbacks (same trick as exact_quantiles_scalable):
        # when n is small the fractional pad can be narrower than one
        # rank, so a bracket may miss the floor/ceil order statistic by
        # at most ONE rank — the adjacent values just outside the
        # bracket are exactly those fallbacks.
        aggs.append(
            F.max(F.when(F.col(col) < F.col(f"lo{i}"), F.col(col))).alias(
                f"mb{i}"
            )
        )
        aggs.append(
            F.min(F.when(F.col(col) > F.col(f"hi{i}"), F.col(col))).alias(
                f"ma{i}"
            )
        )
    st = j.agg(*aggs)
    exprs = []
    for i, q in enumerate(qs):
        p = (F.col("n") - 1) * F.lit(float(q))
        fk, ck = F.floor(p), F.ceil(p)
        frac = p - fk
        ilo = (fk - F.col(f"c{i}") + 1).cast("int")
        ihi = (ck - F.col(f"c{i}") + 1).cast("int")
        sz = F.size(f"a{i}")
        err = F.raise_error(
            F.lit(
                "exact_quantiles_bracketed: sketch bracket missed rank "
                f"for q={q} by more than one rank; raise accuracy"
            )
        ).cast("double")
        # CaseWhen branches are lazy, so the ±1 fallbacks / the error
        # only evaluate on their branch; the guard lives INSIDE the
        # output expression (a dropped side column would be pruned away,
        # never evaluated) — a bracket off by >1 rank raises instead of
        # silently interpolating junk.
        lo = (
            F.when(ilo >= F.lit(1), F.element_at(F.col(f"a{i}"), ilo))
            .when(ilo == F.lit(0), F.col(f"mb{i}"))
            .otherwise(err)
        )
        hi = (
            F.when(ihi <= sz, F.element_at(F.col(f"a{i}"), ihi))
            .when(ihi == sz + F.lit(1), F.col(f"ma{i}"))
            .otherwise(err)
        )
        # Spark's percentile aggregates a counts map of DISTINCT values
        # and RETURNS THE KEY EXACTLY when both bracketing ranks fall on
        # the same distinct value; only across two distinct values does
        # it interpolate, with the two-sided weighted form
        # (ceil-pos)*lo + (pos-floor)*hi. Reproduce BOTH branches
        # operand-for-operand: the two-sided form alone drifts an ulp
        # when lo == hi (hypothesis counterexample [0 x6, -25, -25]
        # @ p=0.05 -> -24.999999999999996), and the one-sided form
        # lo + frac*(hi-lo) drifts the other way when lo != hi
        # (counterexample [1, -1] @ p=0.05).
        fkd = fk.cast("double")
        exprs.append(
            F.when(frac == F.lit(0.0), lo)
            .when(lo == hi, lo)
            .otherwise((fkd + F.lit(1.0) - p) * lo + (p - fkd) * hi)
            .alias(f"q{i}")
        )
    return st.select(*exprs)


def iqr_outliers(
    df: DataFrame, col: str, factor: float = 1.5, relative_error: float = 0.01
) -> DataFrame:
    """V9/A10: rows outside [q1 - f*iqr, q3 + f*iqr].

    Unlike the reference's driver-side ``df.approxQuantile`` + Python
    arithmetic (21_EDA.ipynb:2309-2319), the quantiles are computed
    IN-PLAN with percentile_approx and broadcast-joined back — one job,
    no driver round-trip, valid at 100 TB.
    """
    bounds = df.agg(
        F.percentile_approx(col, 0.25, int(1 / relative_error)).alias("q1"),
        F.percentile_approx(col, 0.75, int(1 / relative_error)).alias("q3"),
    ).select(
        (F.col("q1") - factor * (F.col("q3") - F.col("q1"))).alias("lower"),
        (F.col("q3") + factor * (F.col("q3") - F.col("q1"))).alias("upper"),
    )
    return df.join(F.broadcast(bounds)).where(
        (F.col(col) < F.col("lower")) | (F.col(col) > F.col("upper"))
    )


def describe_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """V-/A9: count/mean/stddev/min/max per numeric column.
    Reference: notebooks/21_EDA.ipynb:2121-2124 (describe())."""
    return df.select(*cols).describe()


def dq_summary(df: DataFrame, keys: Sequence[str], run_utc: str) -> DataFrame:
    """V10: one summary row per run (row counts, dup counts, null counts)
    suitable for append-only accumulation into a run-log table.
    Reference: notebooks/21_EDA.ipynb:33297-33367."""
    total = df.count()
    full_dups = total - df.dropDuplicates().count()
    key_dups = duplicate_keys(df, keys).count()
    null_counts = df.agg(
        *[F.sum(F.col(c).isNull().cast("int")).alias(c) for c in df.columns]
    ).collect()[0]
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            {
                "run_utc": run_utc,
                "n_rows": total,
                "n_full_row_dups": full_dups,
                "n_key_dups": key_dups,
                "n_null_cells": int(sum(null_counts[c] or 0 for c in df.columns)),
            }
        ]
    )


def observed(df: DataFrame, name: str, *cols: Sequence[str]):
    """Attach in-flight DQ metrics via Spark's Observation API: row count
    + per-column null counts computed DURING the job that consumes the
    DataFrame — no second pass, unlike the reference's separate count()
    validations (20_analytics.ipynb:3146-3156). Returns (df, observation);
    read ``observation.get`` after an action completes."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("int")).alias(f"{c}_nulls") for c in cols
    ]
    return df.observe(obs, *metrics), obs


# --- hard assertions (reference validation cell, 20_analytics.ipynb:3103-3172) ---


def assert_non_empty(df: DataFrame, what: str) -> int:
    """V2/V3: parsed row count must be positive."""
    n = df.count()
    if n <= 0:
        raise ValidationError(f"{what}: expected >0 rows, got {n}")
    return n


def assert_no_nulls(df: DataFrame, cols: Sequence[str], what: str) -> None:
    """V4: zero rows may have NULL in any critical column."""
    pred = None
    for c in cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    bad = df.where(pred).count()
    if bad:
        raise ValidationError(f"{what}: {bad} rows with NULL critical fields {cols}")


def assert_unique_keys(df: DataFrame, keys: Sequence[str], what: str) -> None:
    """V6 as a hard gate."""
    n = duplicate_keys(df, keys).count()
    if n:
        raise ValidationError(f"{what}: {n} duplicate key groups on {keys}")


# Small-input endgame bound for the two-pass quantile operators
# (optimization r12, the cluster_pairs _ONE_TASK_EDGES pattern): below
# this many non-null rows the exact single-pass percentile() — whose
# counts-map working set is bounded by the row count — beats the
# two-pass plan's serial job barriers outright, and its results are
# what the two-pass is tested bit-identical against. Beyond the bound
# the scalable two-pass engages unchanged.
_ONE_PASS_ROWS = 1_000_000


def exact_quantiles_scalable(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    accuracy: int = 10_000,
    small_n_bound: int | None = _ONE_PASS_ROWS,
) -> DataFrame:
    """EXACT interpolated quantiles (quantile_cont semantics) in two
    bounded passes — the 100 TB replacement for ``percentile()``'s
    single-pass counts map, whose per-partition OpenHashMap and
    single-reducer merge scale with DISTINCT-VALUE cardinality.

    Pass 1: one aggregate computes n plus approximate value brackets
    around each target rank (percentile_approx at rank-fraction margin
    2/accuracy — twice the GK sketch's guaranteed rank error, so the
    true order statistics provably lie inside the brackets).
    Pass 2: one scan counts rows below each bracket (the global rank
    offset) while the in-bracket DISTINCT values are counted per value
    — duplicate-heavy columns collapse to their distinct set, so no
    task ever materializes an O(bracket) array — then a cumulative walk
    over that tiny table locates the floor/ceil order statistics and
    interpolates exactly like quantile_cont / Spark ``percentile``.

    Everything stays in-plan (the result is a 1-row DataFrame with one
    ``q_{i}`` column per prob, broadcastable as bounds); only plan
    literals, never data, cross the driver. Interpolation operands are
    exact order statistics, so results are bit-identical to the
    single-pass exact percentile (asserted in tests).
    """
    from pyspark.sql import Window

    probs = list(probs)
    margin = 2.0 / accuracy
    lows = [max(p - margin, 0.0) for p in probs]
    highs = [min(p + margin, 1.0) for p in probs]
    src = df.select(F.col(col).alias("x")).where(F.col("x").isNotNull())
    # ONE percentile_approx over the concatenated prob list: the GK
    # sketch is built from the data alone (probabilities only read it
    # out at the end), so one sketch serves lows and highs with values
    # identical to two separate aggregates — at half the per-row
    # sketch-insert cost, which dominates pass 1 (optimization r12,
    # guide §1.2 step 2).
    b = (
        src.agg(
            F.count("x").alias("n"),
            F.percentile_approx("x", lows + highs, accuracy).alias("vb"),
        )
        .select(
            "n",
            F.slice("vb", 1, len(probs)).alias("vlo"),
            F.slice("vb", len(probs) + 1, len(probs)).alias("vhi"),
        )
        .localCheckpoint()
    )  # tiny; feeds the filter AND the final assembly

    if small_n_bound:
        # small-input endgame: pass 1 already computed n, so reading it
        # back is a bounded driver fetch of the 1-row checkpoint (the
        # materialize_small pattern). Below the bound, ONE exact
        # percentile() aggregate replaces the whole pass-2 plan (below
        # counts + bracket walk + assembly — a chain of serial stage
        # barriers that dominates wall time when the data is small);
        # its counts-map working set is bounded by n, and its results
        # are the very reference the two-pass is tested bit-identical
        # against. Large inputs pay one ~ms first() and proceed
        # unchanged.
        n_total = b.first()["n"]
        if (n_total or 0) <= small_n_bound:
            return src.agg(
                *[
                    F.percentile("x", F.lit(float(p))).alias(f"q_{i}")
                    for i, p in enumerate(probs)
                ]
            )

    cand = src.join(F.broadcast(b))
    # one scan: per prob, the below-bracket count plus the adjacent
    # distinct values just OUTSIDE the bracket — the GK rank-error bound
    # means a bracket can miss the floor/ceil order statistic by at most
    # ONE rank (when the margin is narrower than a rank, i.e. tiny n or
    # extreme p), and the max-below / min-above values are exactly those
    # ±1-rank fallbacks. In-bracket rows explode to (prob index, value)
    # for the distinct-count walk.
    side_aggs = []
    for i in range(len(probs)):
        vlo_i, vhi_i = F.get(F.col("vlo"), i), F.get(F.col("vhi"), i)
        side_aggs.append(
            F.sum((F.col("x") < vlo_i).cast("long")).alias(f"below_{i}")
        )
        side_aggs.append(
            F.max(F.when(F.col("x") < vlo_i, F.col("x"))).alias(f"maxbelow_{i}")
        )
        side_aggs.append(
            F.min(F.when(F.col("x") > vhi_i, F.col("x"))).alias(f"minabove_{i}")
        )
    below = cand.groupBy().agg(*side_aggs)
    # NOTE (r12 A/B, kept for the record): filtering the index array
    # in-row and exploding only matches (explode(filter(sequence...)))
    # measured ~40% SLOWER than this posexplode+where — the lambda HOF
    # is interpreted per row while Generate+Filter is codegen'd.
    in_bracket = (
        cand.select(
            "x",
            F.posexplode(
                F.array(*[F.lit(i) for i in range(len(probs))])
            ).alias("pos", "i"),
        )
        .where(
            (F.col("x") >= F.get(F.col("vlo"), F.col("i")))
            & (F.col("x") <= F.get(F.col("vhi"), F.col("i")))
        )
        .groupBy("i", "x")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("i").orderBy("x")
    walked = in_bracket.select(
        "i",
        "x",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
        F.sum("cnt").over(w).alias("cum_incl"),
    )
    # global rank range of value x for prob i: [below_i + cum_before,
    # below_i + cum_incl - 1]; pick the values covering floor(h), ceil(h)
    joined = walked.join(F.broadcast(below)).join(F.broadcast(b.select("n")))
    aggs = []
    for i, p in enumerate(probs):
        h = (F.col("n") - 1).cast("double") * F.lit(float(p))
        lo_rank = F.floor(h)
        hi_rank = -F.floor(-h)
        start = F.col(f"below_{i}") + F.col("cum_before")
        end = F.col(f"below_{i}") + F.col("cum_incl") - 1
        aggs.append(
            F.max(
                F.when(
                    (F.col("i") == i) & (start <= lo_rank) & (lo_rank <= end),
                    F.col("x"),
                )
            ).alias(f"xf_{i}")
        )
        aggs.append(
            F.max(
                F.when(
                    (F.col("i") == i) & (start <= hi_rank) & (hi_rank <= end),
                    F.col("x"),
                )
            ).alias(f"xc_{i}")
        )
        aggs.append(F.max(h - lo_rank.cast("double")).alias(f"frac_{i}"))
        aggs.append(F.max(h).alias(f"h_{i}"))
        aggs.append(F.max(F.col(f"maxbelow_{i}")).alias(f"mb_{i}"))
        aggs.append(F.max(F.col(f"minabove_{i}")).alias(f"ma_{i}"))
    folded = joined.agg(*aggs)
    final_cols = []
    for i, p in enumerate(probs):
        # ±1-rank fallbacks: a floor rank just below the bracket is the
        # adjacent value below; a ceil rank just above is the one above
        xf = F.coalesce(F.col(f"xf_{i}"), F.col(f"mb_{i}"))
        xc = F.coalesce(F.col(f"xc_{i}"), F.col(f"ma_{i}"))
        frac = F.col(f"frac_{i}")
        # percentile()'s exact branch structure: same-distinct-value
        # ranks return the value exactly; otherwise two-sided weighted
        # interpolation (see exact_quantiles_bracketed for the ulp
        # analysis of why BOTH branches are needed)
        h = F.col(f"h_{i}")
        lo = F.floor(h).cast("double")
        final_cols.append(
            F.when(frac == 0.0, xf)
            .when(xf == xc, xf)
            .otherwise((lo + 1.0 - h) * xf + (h - lo) * xc)
            .alias(f"q_{i}")
        )
    return folded.select(*final_cols)


def grouped_exact_quantiles_scalable(
    df: DataFrame,
    group_col: str,
    col: str,
    probs: Sequence[float],
    accuracy: int = 10_000,
    small_n_bound: int | None = _ONE_PASS_ROWS,
) -> DataFrame:
    """Per-group :func:`exact_quantiles_scalable`: one row per group
    with exact interpolated quantiles, without per-group counts maps.

    Same two-pass structure with the group key threaded through every
    stage: pass 1 is a grouped aggregate (n + approx brackets per
    group), pass 2 joins brackets back on the group key (a plain
    shuffle equi-join — works for unbounded group counts) and walks
    each group's in-bracket distinct values. Per-group state is
    O(distinct values inside the brackets), not O(group distinct
    cardinality) — the property ``percentile() GROUP BY`` lacks.
    Returns (group_col, q_0..q_{k-1}), bit-identical to grouped
    ``percentile`` (tested).
    """
    from pyspark.sql import Window

    probs = list(probs)
    margin = 2.0 / accuracy
    lows = [max(p - margin, 0.0) for p in probs]
    highs = [min(p + margin, 1.0) for p in probs]
    g = group_col
    src = df.select(F.col(g), F.col(col).alias("x")).where(
        F.col("x").isNotNull()
    )
    # O(|groups|) bracket relation with a full-scan lineage, consumed
    # by the candidate join AND the final assembly — reliable scratch
    # keeps an executor loss a parquet re-scan instead of an
    # unrecoverable localCheckpoint lineage error; group count is
    # caller-controlled and unbounded (r09 ADVICE long tail)
    from .relational import checkpoint_reliable

    b = checkpoint_reliable(
        # one GK sketch per group serves lows AND highs (values
        # identical to two separate aggregates; the sketch never sees
        # the probabilities) — see exact_quantiles_scalable
        src.groupBy(g)
        .agg(
            F.count("x").alias("n"),
            F.percentile_approx("x", lows + highs, accuracy).alias("vb"),
        )
        .select(
            g,
            "n",
            F.slice("vb", 1, len(probs)).alias("vlo"),
            F.slice("vb", len(probs) + 1, len(probs)).alias("vhi"),
        ),
        "grouped_quantile_brackets",
    )

    if small_n_bound:
        # small-input endgame (see exact_quantiles_scalable): the TOTAL
        # row count across groups bounds every per-group counts map, so
        # below the bound one grouped percentile() aggregate replaces
        # the pass-2 join/walk/assembly chain with bit-identical
        # results. The total is a bounded aggregate over the already-
        # written O(|groups|) bracket scratch, not a data rescan.
        tot = b.agg(F.sum("n").alias("t")).first()["t"]
        if (tot or 0) <= small_n_bound:
            return src.groupBy(g).agg(
                *[
                    F.percentile("x", F.lit(float(p))).alias(f"q_{i}")
                    for i, p in enumerate(probs)
                ]
            )

    cand = src.join(b, g)
    side_aggs = []
    for i in range(len(probs)):
        vlo_i, vhi_i = F.get(F.col("vlo"), i), F.get(F.col("vhi"), i)
        side_aggs.append(
            F.sum((F.col("x") < vlo_i).cast("long")).alias(f"below_{i}")
        )
        side_aggs.append(
            F.max(F.when(F.col("x") < vlo_i, F.col("x"))).alias(f"maxbelow_{i}")
        )
        side_aggs.append(
            F.min(F.when(F.col("x") > vhi_i, F.col("x"))).alias(f"minabove_{i}")
        )
    below = cand.groupBy(g).agg(*side_aggs)
    in_bracket = (
        cand.select(
            g,
            "x",
            F.posexplode(
                F.array(*[F.lit(i) for i in range(len(probs))])
            ).alias("pos", "i"),
        )
        .where(
            (F.col("x") >= F.get(F.col("vlo"), F.col("i")))
            & (F.col("x") <= F.get(F.col("vhi"), F.col("i")))
        )
        .groupBy(g, "i", "x")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(g, "i").orderBy("x")
    walked = in_bracket.select(
        g,
        "i",
        "x",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
        F.sum("cnt").over(w).alias("cum_incl"),
    )
    joined = walked.join(below, g).join(b.select(g, "n"), g)
    aggs = []
    for i, p in enumerate(probs):
        h = (F.col("n") - 1).cast("double") * F.lit(float(p))
        lo_rank = F.floor(h)
        hi_rank = -F.floor(-h)
        start = F.col(f"below_{i}") + F.col("cum_before")
        end = F.col(f"below_{i}") + F.col("cum_incl") - 1
        aggs.append(
            F.max(
                F.when(
                    (F.col("i") == i) & (start <= lo_rank) & (lo_rank <= end),
                    F.col("x"),
                )
            ).alias(f"xf_{i}")
        )
        aggs.append(
            F.max(
                F.when(
                    (F.col("i") == i) & (start <= hi_rank) & (hi_rank <= end),
                    F.col("x"),
                )
            ).alias(f"xc_{i}")
        )
        aggs.append(F.max(h - lo_rank.cast("double")).alias(f"frac_{i}"))
        aggs.append(F.max(h).alias(f"h_{i}"))
        aggs.append(F.max(F.col(f"maxbelow_{i}")).alias(f"mb_{i}"))
        aggs.append(F.max(F.col(f"minabove_{i}")).alias(f"ma_{i}"))
    folded = joined.groupBy(g).agg(*aggs)
    final_cols = [F.col(g)]
    for i in range(len(probs)):
        xf = F.coalesce(F.col(f"xf_{i}"), F.col(f"mb_{i}"))
        xc = F.coalesce(F.col(f"xc_{i}"), F.col(f"ma_{i}"))
        frac = F.col(f"frac_{i}")
        h = F.col(f"h_{i}")
        lo = F.floor(h).cast("double")
        final_cols.append(
            F.when(frac == 0.0, xf)
            .when(xf == xc, xf)
            .otherwise((lo + 1.0 - h) * xf + (h - lo) * xc)
            .alias(f"q_{i}")
        )
    return folded.select(*final_cols)


def winsorize(
    df: DataFrame, col: str, lo_p: float = 0.01, hi_p: float = 0.99
) -> DataFrame:
    """Winsorization: clamp a column to its [lo_p, hi_p] quantiles —
    outlier MITIGATION where iqr_outliers does outlier DETECTION.
    Quantiles are computed in-plan and broadcast back (no driver
    round-trip); the clamp itself is a codegen'd least/greatest
    projection. Adds ``{col}_wins`` plus a ``was_clamped`` flag so
    downstream can count affected rows without re-deriving bounds."""
    # one percentile aggregate with an array of probs: a single counts
    # map serves both quantiles (two separate aggregates would each
    # build and merge their own full map — measured 2× slower).
    bounds = df.agg(
        F.expr(f"percentile({col}, array({lo_p}, {hi_p}))").alias("__b")
    ).select(
        F.col("__b").getItem(0).alias("__lo"), F.col("__b").getItem(1).alias("__hi")
    )
    return (
        df.join(F.broadcast(bounds))
        .withColumn(
            f"{col}_wins",
            F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")),
        )
        .withColumn("was_clamped", F.col(col) != F.col(f"{col}_wins"))
        .drop("__lo", "__hi")
    )


def entropy_from_long(long_df: DataFrame) -> DataFrame:
    """Shannon entropy + distinct count for MANY columns in one
    pipeline, from an unpivoted (col_name, v) frame: one groupBy on
    (col_name, v), per-column totals via a window over the tiny counts
    table (partitioned by col_name, which the final per-column fold
    then reuses — no extra exchange), and the same -Σ(c/t)·ln(c/t)
    arithmetic as :func:`column_entropy` so oracles are unchanged.
    Profiling N columns this way is 2-3 exchanges total instead of ~4N
    (one counts+total+cross-join pipeline per column)."""
    from pyspark.sql import Window

    counts = long_df.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    t = F.sum("c").over(Window.partitionBy("col_name"))
    witht = counts.select("col_name", "c", t.alias("t"))
    p = F.col("c") / F.col("t")
    return witht.groupBy("col_name").agg(
        F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").cast("long").alias("n_rows"),
    )


def columns_entropy(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Entropy profile of several columns of one DataFrame in a single
    pass: stack-unpivot (codegen, no shuffle) then entropy_from_long."""
    pairs = ", ".join(f"'{c}', {c}" for c in cols)
    long_df = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) AS (col_name, v)")
    )
    return entropy_from_long(long_df)


def column_entropy(df: DataFrame, col: str) -> DataFrame:
    """Shannon entropy + distinct ratio of a (categorical) column — the
    profiling pair that catches both constant columns (H≈0) and
    key-like columns (distinct ratio≈1). One groupBy on the column then
    a 1-row fold; ln() is rounded at the end only (single aggregate, no
    cross-engine rank sensitivity)."""
    counts = df.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    total = counts.agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    return (
        counts.join(F.broadcast(total))
        .agg(
            F.lit(col).alias("col_name"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("c").alias("n_rows"),
        )
    )


def fk_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relationship: str,
) -> DataFrame:
    """Referential-integrity audit for one FK relationship: how many
    child rows reference a parent key that does not exist (orphans),
    and how many parent keys have no children (childless) — the
    reconciliation every warehouse load runs after ingesting related
    tables independently.

    Scale shape: two left-anti joins on the key. The parent side of
    the orphan check is key-distinct (dimension-sized → broadcast for
    catalog tables); the childless check aggregates the child side to
    distinct keys FIRST so the anti-join compares key sets, never fact
    rows. Output: one row (relationship, n_child, n_orphans,
    n_parents, n_childless).
    """
    ck = child.select(F.col(child_key).alias("k"))
    pk = parent.select(F.col(parent_key).alias("k")).distinct()
    orphans = ck.join(pk, "k", "left_anti")
    childless = pk.join(ck.distinct(), "k", "left_anti")
    counts = ck.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
    return (
        counts.join(F.broadcast(orphans.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans"))))
        .join(F.broadcast(pk.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parents"))))
        .join(F.broadcast(childless.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_childless"))))
        .select(
            F.lit(relationship).alias("relationship"),
            "n_child",
            "n_orphans",
            "n_parents",
            "n_childless",
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation: classify every key as added / removed /
    changed / unchanged between two table versions — the audit behind
    CDC validation, backfill verification, and mirror-sync drift
    checks (the reference's hash-skip mirror is the file-level cousin).

    Rows compare by md5 over the concatenated compare columns (null-
    tagged so NULL != ''), so the join carries (key, 32-byte digest)
    regardless of row width — the same never-shuffle-the-payload
    discipline as exact dedup. One full-outer join on the key.

    Output: (change_type, n_rows), one row per change class present.
    """
    def digest(df: DataFrame) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in compare_cols
        ]
        return df.select(
            F.col(key_col).alias("k"),
            F.md5(F.concat_ws("\x1f", *parts)).alias("d"),
        )

    o = digest(old).alias("o")
    n = digest(new).alias("n")
    joined = o.join(n, F.col("o.k") == F.col("n.k"), "full_outer")
    change = (
        F.when(F.col("o.k").isNull(), "added")
        .when(F.col("n.k").isNull(), "removed")
        .when(F.col("o.d") != F.col("n.d"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


def kaplan_meier(
    per_subject: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    duration_bucket: int | None = None,
    max_distinct_durations: int | None = 100_000,
) -> DataFrame:
    """Kaplan-Meier survival estimator over per-subject rows.

    ``per_subject`` carries one row per subject with an integer
    ``duration_col`` (time observed) and ``event_col`` = 1 if the
    terminal event was observed at that time, 0 if right-censored.
    Returns one row per distinct duration: ``duration``, ``d``
    (events), ``c`` (censored), ``n_risk`` (at risk just before t),
    and ``survival`` = prod_{t_i<=t}(1 - d_i/n_i) rounded 6dp.

    Scale shape: the input is already aggregated per subject (the
    caller's one fact shuffle); this operator only groups it by
    duration, so every window here runs over the distinct-duration
    domain. That domain is bounded by TIME RESOLUTION, not corpus
    size (days → a few thousand rows) — and round-5 makes the bound
    ENFORCED, not assumed: ``max_distinct_durations`` (default 100k,
    one cheap parallel count over the already-aggregated relation,
    which the windows then reuse via the checkpoint) raises with a
    remediation message when a caller passes e.g. sub-second
    durations whose distinct domain would drag millions of rows
    through the single-partition cumulative windows. The remediation
    is ``duration_bucket``: floor durations to that width (86_400 for
    seconds→days) before grouping — standard KM discretization, at
    the cost of time resolution. Pass ``max_distinct_durations=None``
    to skip the guard (and its eager count) when the domain is known
    bounded. Cross-engine determinism: d/n is an exact integer-ratio
    division, ln rounds 8dp before the ordered cumulative sum (the
    BM25-idf convention), and the 1 - d/n factor clamps at 1e-12
    because an all-event final group hits ln(0), which DuckDB
    evaluates to -inf but Spark to NULL.
    """
    from pyspark.sql import Window

    dur = F.col(duration_col)
    if duration_bucket is not None:
        if duration_bucket <= 0:
            raise ValueError("duration_bucket must be positive")
        dur = F.floor(dur / F.lit(duration_bucket)) * F.lit(duration_bucket)
    t = per_subject.groupBy(dur.alias("duration")).agg(
        F.sum(F.col(event_col)).cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col(event_col)).cast("bigint").alias("c"),
    )
    if max_distinct_durations is not None:
        # materialize the distinct-duration relation once: the guard
        # count and both cumulative windows below read the same blocks
        t = t.localCheckpoint(eager=False)
        n_distinct = t.count()
        if n_distinct > max_distinct_durations:
            raise ValueError(
                f"kaplan_meier: {n_distinct} distinct durations exceed "
                f"max_distinct_durations={max_distinct_durations}; the "
                "cumulative-survival windows run single-partition over "
                "this domain. Pass duration_bucket (e.g. 86_400 to "
                "floor seconds to days) to discretize, or raise/disable "
                "the guard if the domain is known bounded."
            )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wprev = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcum = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, 0
    )
    k = t.select(
        "duration",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(wall)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    lnfac = F.round(
        F.log(
            F.greatest(
                F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"),
                F.lit(1e-12),
            )
        ),
        8,
    )
    return k.select(
        "duration",
        "d",
        "c",
        "n_risk",
        F.round(F.exp(F.sum(lnfac).over(wcum)), 6).alias("survival"),
    )
