"""Sampling operators for training-data pipelines: uniform sampling,
stratified sampling, deterministic hash-based splits.

Sampling at 100 TB is a scan-side operation — every operator here
filters during the scan (no shuffle, no collect). Two determinism
models:

  * ``sample``/``stratified_sample`` are seed-deterministic WITHIN Spark
    (Bernoulli per-row draws) but not reproducible across engines or
    partitionings — fine for throughput sampling;
  * ``hash_split`` is CONTENT-deterministic: a row's bucket depends only
    on its key's md5, so the same row lands in the same split across
    engines, runs, partitionings, and even cluster sizes — the property
    a train/val/test split must have to avoid leakage when data is
    re-ingested.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import stable_hash64


def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Uniform Bernoulli sample (seed-deterministic within Spark)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum sampling (e.g. rebalance languages in a corpus):
    ``fractions`` maps stratum value → keep probability. Strata missing
    from the map are dropped — make the default explicit."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float],
    salt: str = "split",
) -> list[DataFrame]:
    """Content-deterministic disjoint splits (train/val/test).

    Bucket = md5(salt:key) mod 10_000 mapped to cumulative weight
    ranges. Every row appears in EXACTLY one split, and the assignment
    is a pure function of the key — stable under re-ingestion,
    repartitioning, and engine changes (the md5 hash is the same
    portable hash the dedup operators use). Keys that must stay
    together (e.g. all chunks of one document) should share ``key_col``.
    """
    total = float(sum(weights))
    bucket = F.pmod(
        stable_hash64(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
        F.lit(10_000),
    )
    splits = []
    lo = 0.0
    for w in weights:
        hi = lo + (w / total) * 10_000
        cond = (bucket >= F.lit(int(lo))) & (bucket < F.lit(int(hi)))
        splits.append(df.where(cond))
        lo = hi
    # guard against float-edge truncation: last split takes the remainder
    splits[-1] = df.where(bucket >= F.lit(int(lo - (weights[-1] / total) * 10_000)))
    return splits


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    m: int,
    key_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each row draws u ∈ (0,1) and ranks by ln(u)/w — the top ``m`` keys
    are a weighted sample, P(selected) ∝ weight, in ONE distributed
    pass with no sequential reservoir. Rows with weight ≤ 0 are excluded.

    u derives from the portable md5 hash of (salt, key), so the sample
    is a pure function of content — reproducible across runs, engines,
    and partitionings (no RNG state). The ranking key is rounded to 8 dp
    with a key tie-break so cross-engine libm ln() differences cannot
    reorder the selection. Top-m compiles to TakeOrderedAndProject
    (per-partition heaps), not a global sort.
    """
    h = stable_hash64(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    u = (h.cast("double") + 0.5) / float(1 << 60)
    wkey = F.round(F.log(u) / F.col(weight_col), 8)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("wkey", wkey)
        .orderBy(F.col("wkey").desc(), F.col(key_col).asc())
        .limit(m)
    )


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    salt: str = "reservoir",
) -> DataFrame:
    """Content-deterministic exact-k sample per group (the bounded
    cousin of fraction-based ``stratified_sample``): rank rows within
    each group by the portable md5 hash of their key and keep the first
    ``k``. Equivalent to a uniform k-reservoir given hash uniformity,
    but reproducible across engines, runs, and partitionings like
    ``hash_split``. One shuffle on the group key; the ranking window
    sorts only within groups and short-circuits at k via the rn
    filter."""
    h = stable_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
