"""Slowly-changing-dimension (SCD type 2) interval building.

The reference publishes point-in-time curated snapshots only
(notebooks/20_analytics.ipynb:653, 2200 — overwrite-mode tables with a
``run_utc`` stamp); history is implicit in the append-only run log. This
operator makes history first-class: an event/change log becomes
versioned rows with ``valid_from`` / ``valid_to`` half-open intervals
and an ``is_current`` flag — the standard warehouse pattern for
dimension history.

Scale notes: one window shuffle partitioned by the business key — the
same partitioning a downstream as-of join (joins.asof_join) would use,
so at 100 TB the two stages can reuse one exchange. No driver
round-trips, no per-key collect; skewed keys (one entity with millions
of versions) are bounded by the window's per-partition sort, which
spills to disk rather than OOM-ing.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_from_events(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Turn a change log into SCD2 versions: per business key, each event
    is valid from its own timestamp until the NEXT event's timestamp
    (half-open ``[valid_from, valid_to)``); the latest version has
    ``valid_to`` null and ``is_current`` true.

    ``tiebreak`` columns make version order deterministic when multiple
    events share one timestamp (required for cross-engine parity).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
