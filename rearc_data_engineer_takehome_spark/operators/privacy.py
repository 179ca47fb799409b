"""Differential-privacy-shaped release mechanisms.

`queries_analytics.customer_k_anonymity` audits whether a
quasi-identifier release is safe; this module adds the other standard
tool — NOISE: the Laplace mechanism for count releases
(Dwork et al. 2006), the shape behind every DP aggregate API.

Determinism stance (read before using for a real release): the noise
here is drawn from a SEEDED, hash-derived uniform — the same
(key, seed) always yields the same noise, in Spark AND in the DuckDB
oracle (functions/hashing.py md5 convention). That is exactly what a
verifiable data pipeline wants (reruns reproduce, oracles check the
mechanism arithmetic end-to-end) and exactly what a production DP
release must NOT do with a public seed: publishing many releases of
the same counts under one seed spends no additional privacy budget
only because it reveals nothing new, but an adversary who knows the
seed can subtract the noise. For a real release, draw the seed fresh
per release and keep it secret, or swap the uniform for ``F.rand()``;
the mechanism arithmetic is unchanged. (Float-representation attacks
a la Mironov 2012 apply to any naive float Laplace, including this
one — snapping/discrete mechanisms are the hardened variant.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import stable_hash64, stable_hash64_sql

#: Uniform resolution: 2^20 buckets from the 60-bit stable hash.
_RES = 1 << 20


def _laplace_noise(key, epsilon: float, seed: str):
    """Deterministic Laplace(1/epsilon) noise for a key: inverse-CDF
    transform of a hash-derived uniform. ln rounds 8dp before the
    scale multiply (repo convention), |u| clamps away from 0.5 so the
    ln argument never hits 0."""
    h = stable_hash64(F.concat(F.lit(f"{seed}|"), key.cast("string")))
    u = (h % F.lit(_RES)).cast("double") / F.lit(float(_RES)) - F.lit(0.5)
    mag = F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(u), F.lit(1e-9))
    return (
        F.lit(-1.0 / epsilon) * F.signum(u) * F.round(F.log(mag), 8)
    )


def _laplace_noise_sql(key_expr: str, epsilon: float, seed: str) -> str:
    """DuckDB rendering of :func:`_laplace_noise` (oracle side)."""
    h = stable_hash64_sql(f"('{seed}|' || ({key_expr})::VARCHAR)")
    u = f"(({h} % {_RES})::DOUBLE / {float(_RES)} - 0.5)"
    mag = f"greatest(1.0 - 2.0 * abs({u}), 1e-9)"
    return f"((-1.0 / {epsilon}) * sign({u}) * round(ln({mag}), 8))"


def dp_noisy_counts(
    df: DataFrame,
    key_col: str,
    epsilon: float = 1.0,
    seed: str = "dp-v1",
) -> DataFrame:
    """epsilon-DP histogram release of ``df`` grouped by ``key_col``:
    per key, count + Laplace(1/epsilon) noise (the count query has L1
    sensitivity 1 when each underlying individual contributes one
    row), clamped at 0 (post-processing, privacy-free). Returns
    (``key_col``, ``noisy_count``) — deliberately NOT the true count,
    which a release must not carry. The noisy value is left unrounded:
    every operand is cross-engine exact (integer count, 8dp-rounded
    ln, scalar multiplies), so the raw double is bit-identical in the
    oracle, and rounding near a half-boundary would be the only thing
    that could diverge.

    Scale shape: one grouped count (map-side combinable), then
    per-row arithmetic on the key domain. The noise hash is one md5
    per KEY, not per row.
    """
    counts = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    noise = _laplace_noise(F.col(key_col), epsilon, seed)
    return counts.select(
        key_col,
        F.greatest(
            F.col("__n").cast("double") + noise, F.lit(0.0)
        ).alias("noisy_count"),
    )
