"""Distributed probabilistic sketches: Count-Min and Bloom filter.

The reference's only approximate operators are Spark built-ins
(``approxQuantile``, reference notebooks/21_EDA.ipynb:2309;
``approx_count_distinct`` is the engine's own extension). At 100 TB two
more sketches earn their keep and are implemented here as pure
DataFrame transformations:

* **Count-Min** — frequency estimates for heavy-hitter monitoring over
  a keyed fact column without holding per-key state: the sketch is
  ``depth × width`` counters (a few KB) no matter how many distinct
  keys flow through. Build is one pass + one shuffle on (depth,
  bucket); estimates are a broadcast join against the tiny sketch.
* **Bloom filter** — the build side's join keys as a bit set, used to
  pre-filter a fact table BEFORE its shuffle: at 100 TB dropping
  non-matching rows map-side is the difference between shuffling the
  full fact and shuffling the ~matching fraction. (Spark's AQE injects
  the same thing automatically for some plans — the explicit operator
  covers the cases it won't, e.g. pre-filtering ahead of an
  aggregation or a Python stage.)

Both use the portable md5 hash family (functions/hashing.py) — one md5
per key, then cheap affine permutations per row — so every bucket and
bit index is bit-identical in DuckDB and the whole pipeline carries a
full value-hash oracle, unlike engine-private sketch internals
(SURVEY.md §2.4 A10 note).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import (
    MERSENNE_31,
    _affine_params,
    minhash_perm,
    minhash_perm_sql,
    stable_hash64,
    stable_hash64_sql,
)

#: Seed for the sketch hash family (distinct from the MinHash default
#: so sketches and signatures never share permutations).
SKETCH_SEED = 101


def _bucket(col, a: int, b: int, width: int):
    """Row-level bucket index: affine permutation of the stable 60-bit
    hash, reduced modulo the sketch width. Non-negative in both engines
    (all operands are non-negative)."""
    return F.pmod(minhash_perm(stable_hash64(col), a, b), F.lit(width))


def _bucket_sql(expr: str, a: int, b: int, width: int) -> str:
    return f"({minhash_perm_sql(stable_hash64_sql(expr), a, b)} % {width})"


def count_min_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a Count-Min sketch over ``key_col``: one (row, bucket)
    counter per hash row. One pass over the data (the depth-way fanout
    is a generated column array, not a self-union), one shuffle keyed on
    (depth, bucket) — at most ``depth × width`` result rows."""
    params = _affine_params(depth, seed=SKETCH_SEED)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("d"),
                _bucket(F.col(key_col), a, b, width).alias("bucket"),
            )
            for i, (a, b) in enumerate(params)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate each probe key: min over the sketch's depth rows
    of its counter. The sketch is tiny (depth×width) → broadcast join;
    estimates only ever OVER-count (collisions add, never subtract)."""
    params = _affine_params(depth, seed=SKETCH_SEED)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("d"),
                _bucket(F.col(key_col), a, b, width).alias("bucket"),
            )
            for i, (a, b) in enumerate(params)
        ]
    )
    probe_cells = probes.select(
        F.col(key_col), F.explode(cells).alias("c")
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        probe_cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def count_min_sql(
    table: str, key_expr: str, width: int = 1024, depth: int = 4
) -> str:
    """DuckDB CTE replaying :func:`count_min_build` bit-for-bit.

    Produces a relation ``(d, bucket, cnt)`` named ``cms``."""
    params = _affine_params(depth, seed=SKETCH_SEED)
    arms = " UNION ALL ".join(
        f"SELECT {i} AS d, {_bucket_sql(key_expr, a, b, width)} AS bucket"
        f" FROM {table}"
        for i, (a, b) in enumerate(params)
    )
    return f"SELECT d, bucket, count(*) AS cnt FROM ({arms}) GROUP BY d, bucket"


def bloom_bits(
    df: DataFrame, key_col: str, n_bits: int = 1 << 16, n_hashes: int = 3
) -> DataFrame:
    """Build-side bit set: the DISTINCT bit positions of every key under
    ``n_hashes`` hash functions — one column of longs, at most
    min(n_bits, keys × n_hashes) rows, safely broadcastable."""
    params = _affine_params(n_hashes, seed=SKETCH_SEED + 1)
    positions = F.array(
        *[_bucket(F.col(key_col), a, b, n_bits) for (a, b) in params]
    )
    return (
        df.select(F.explode(positions).alias("bit")).distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Tag each probe row ``maybe_member`` — true iff ALL of its hash
    bits are set. No false negatives; false-positive rate ~
    (1 - e^(-kn/m))^k. The bit set is broadcast; the probe side never
    shuffles — the whole point of the pre-filter at scale."""
    params = _affine_params(n_hashes, seed=SKETCH_SEED + 1)
    positions = F.array(
        *[_bucket(F.col(key_col), a, b, n_bits) for (a, b) in params]
    )
    exploded = probes.select(F.col(key_col)).distinct().select(
        key_col, F.explode(positions).alias("bit")
    )
    hits = (
        exploded.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == n_hashes)
        .select(key_col, F.lit(True).alias("maybe_member"))
    )
    return probes.join(F.broadcast(hits), key_col, "left").fillna(
        {"maybe_member": False}
    )


def bloom_bits_sql(
    table: str, key_expr: str, n_bits: int = 1 << 16, n_hashes: int = 3
) -> str:
    """DuckDB CTE replaying :func:`bloom_bits` (relation: ``(bit)``)."""
    params = _affine_params(n_hashes, seed=SKETCH_SEED + 1)
    arms = " UNION ALL ".join(
        f"SELECT {_bucket_sql(key_expr, a, b, n_bits)} AS bit FROM {table}"
        for (a, b) in params
    )
    return f"SELECT DISTINCT bit FROM ({arms})"


def bloom_positions_sql(
    key_expr: str, n_bits: int = 1 << 16, n_hashes: int = 3
) -> list[str]:
    """The per-key bit-position expressions, for probe-side oracle SQL."""
    params = _affine_params(n_hashes, seed=SKETCH_SEED + 1)
    return [_bucket_sql(key_expr, a, b, n_bits) for (a, b) in params]
