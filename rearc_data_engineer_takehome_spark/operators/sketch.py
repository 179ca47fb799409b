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
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over ``key_col``: one (row, bucket)
    counter per hash row. One pass over the data (the depth-way fanout
    is a generated column array, not a self-union), one shuffle keyed on
    (depth, bucket) — at most ``depth × width`` result rows.

    ``weight_col``: each row adds that weight instead of 1 — building
    from a pre-aggregated ``(key, count)`` relation this way yields the
    IDENTICAL sketch as folding the raw fact (counter sums associate),
    while hashing O(distinct keys) instead of O(rows)."""
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
    w = F.lit(1) if weight_col is None else F.col(weight_col)
    return (
        df.select(w.alias("w"), F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("w").cast("bigint").alias("cnt"))
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
    table: str,
    key_expr: str,
    width: int = 1024,
    depth: int = 4,
    weight_expr: str | None = None,
) -> str:
    """DuckDB CTE replaying :func:`count_min_build` bit-for-bit.

    Produces a relation ``(d, bucket, cnt)`` named ``cms``."""
    params = _affine_params(depth, seed=SKETCH_SEED)
    w = "1" if weight_expr is None else weight_expr
    arms = " UNION ALL ".join(
        f"SELECT {i} AS d, {_bucket_sql(key_expr, a, b, width)} AS bucket,"
        f" {w} AS w FROM {table}"
        for i, (a, b) in enumerate(params)
    )
    return (
        f"SELECT d, bucket, sum(w)::BIGINT AS cnt FROM ({arms})"
        " GROUP BY d, bucket"
    )


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


# ---------------------------------------------------------------------------
# HyperLogLog over the portable hash — registers AS DATA
# ---------------------------------------------------------------------------
# Spark's approx_count_distinct is HLL++ but its sketch lives inside the
# aggregation buffer — it cannot be stored, rolled up, or merged across
# batch boundaries. This variant materializes the registers as a tiny
# relation (<= 2^p rows) keyed by any grouping, so per-day register
# tables MAX-merge into weekly/monthly/total estimates without ever
# rescanning the fact — the property that matters at 100 TB, where the
# sketch table is the only thing the rollup reads. Flajolet et al. 2007
# arithmetic; every intermediate is integer- or dyadic-exact, so the
# DuckDB oracle replays it bit-for-bit (the ln() in the small-range
# correction is the only libm call, shared by both engines'
# correctly-rounded-for-powers inputs and folded through a 4dp round).

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
HLL_W_BITS = 32  # rho is measured on a 32-bit window above the bucket
#: alpha_m for m >= 128 (Flajolet et al. 2007) — computed ONCE in Python
#: and embedded as the same literal in both engines so the division
#: order cannot differ.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_rho(w):
    """Leading-zero rank of the 32-bit word ``w``: position of the first
    set bit from the MSB (1-based), 33 when w == 0. Rendered as an
    integer-threshold CASE chain — exact in any engine, no float log2."""
    chain = F.when(w >= F.lit(1 << (HLL_W_BITS - 1)), F.lit(1))
    for i in range(1, HLL_W_BITS):
        chain = chain.when(w >= F.lit(1 << (HLL_W_BITS - 1 - i)), F.lit(i + 1))
    return chain.otherwise(F.lit(HLL_W_BITS + 1))


def _hll_rho_sql(w: str) -> str:
    arms = " ".join(
        f"WHEN {w} >= {1 << (HLL_W_BITS - 1 - i)} THEN {i + 1}"
        for i in range(HLL_W_BITS)
    )
    return f"(CASE {arms} ELSE {HLL_W_BITS + 1} END)"


def hll_registers(
    df: DataFrame, key_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Build HLL registers over ``key_col``, one register table per
    ``group_cols`` combination: relation ``(*group_cols, bucket, mx)``
    with at most 2^p rows per group. One pass, one shuffle keyed on
    (group, bucket) with map-side max partials — the sketch, not the
    data, crosses the wire."""
    h = stable_hash64(F.col(key_col))
    # h is non-negative (< 2^60), so bucket/window extraction is pure
    # bit arithmetic — no double division anywhere near the 2^53 edge
    w = F.shiftright(h, HLL_P).bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
    base = df.select(
        *group_cols,
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        _hll_rho(w).alias("rho"),
    )
    return base.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("mx"))


def hll_merge(registers: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """MAX-merge register tables across the dropped grouping levels —
    the rollup that never touches the fact table."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("mx").alias("mx")
    )


def hll_estimate(
    registers: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Fold a register relation to the HLL cardinality estimate (4dp).

    Z sums dyadic rationals 2^-mx (exact in double — every term is a
    power of two and the significand span stays under 53 bits), absent
    registers contribute 2^0 = 1 each; small-range correction
    E* = m·ln(m/V) applies when E <= 2.5m and V > 0 zero registers
    remain. The 2^60 large-range branch is unreachable at the hash
    width and omitted."""
    # shiftleft with a COLUMN bit count needs the SQL form (the Python
    # wrapper only takes a literal int)
    term = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), mx)").cast(
        "double"
    )
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_nz"), F.sum(term).alias("z_nz")
    )
    z = F.col("z_nz") + (F.lit(HLL_M) - F.col("n_nz")).cast("double")
    v = F.lit(HLL_M) - F.col("n_nz")  # zero registers
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / z
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_est"))


def hll_registers_sql(
    table: str, key_expr: str, group_exprs: tuple[str, ...] = ()
) -> str:
    """DuckDB CTE replaying :func:`hll_registers` bit-for-bit
    (relation: ``(*groups, bucket, mx)``)."""
    h = stable_hash64_sql(key_expr)
    w = f"(({h} // {HLL_M}) % {1 << HLL_W_BITS})"
    groups = "".join(f"{g}, " for g in group_exprs)
    gby = ", ".join([*group_exprs, "bucket"])
    return (
        f"SELECT {groups}bucket, max(rho) AS mx FROM ("
        f"SELECT {groups}({h} % {HLL_M}) AS bucket, "
        f"{_hll_rho_sql(w)} AS rho FROM {table}"
        f") GROUP BY {gby}"
    )


def hll_estimate_sql(
    registers: str, group_exprs: tuple[str, ...] = ()
) -> str:
    """DuckDB CTE replaying :func:`hll_estimate` over a register
    relation (column ``hll_est``, 4dp)."""
    groups = "".join(f"{g}, " for g in group_exprs)
    gby = f" GROUP BY {', '.join(group_exprs)}" if group_exprs else ""
    return (
        f"SELECT {groups}round(CASE WHEN "
        f"{HLL_ALPHA * HLL_M * HLL_M!r} / (sum(1.0 / (1::BIGINT << mx)) "
        f"+ ({HLL_M} - count(*))) <= {2.5 * HLL_M!r} "
        f"AND ({HLL_M} - count(*)) > 0 "
        f"THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / "
        f"({HLL_M} - count(*))::DOUBLE) "
        f"ELSE {HLL_ALPHA * HLL_M * HLL_M!r} / (sum(1.0 / (1::BIGINT << mx)) "
        f"+ ({HLL_M} - count(*))) END, 4) AS hll_est "
        f"FROM {registers}{gby}"
    )
