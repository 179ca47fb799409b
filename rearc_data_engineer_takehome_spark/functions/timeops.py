"""Naive-epoch arithmetic for event-time columns.

The driver fixtures store event time as parquet TIMESTAMP (microsecond),
which Spark reads as ``TIMESTAMP_NTZ`` under its default inference and
DuckDB reads as its (naive) ``TIMESTAMP`` — the two engines see identical
wall-clock values with no timezone attached. NTZ cannot be cast to a
numeric type in Spark, so epoch math is expressed as ``timestamp_diff``
from the naive epoch origin instead: pure field arithmetic on the
timestamp's own clock, independent of the session timezone on both the
Spark and the DuckDB (``epoch(ts)`` / ``epoch_us(ts)``) side.

``timestamp_diff`` truncates toward zero; for post-1970 data that is
``floor``, matching DuckDB's ``floor(epoch(ts))`` exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _ntz(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ntz")


def _origin() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_seconds(col: Column | str) -> Column:
    """Seconds since the naive epoch (bigint, truncated toward zero)."""
    return F.timestamp_diff("SECOND", _origin(), _ntz(col))


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since the naive epoch (bigint, exact — µs is the
    parquet storage precision, so nothing is lost)."""
    return F.timestamp_diff("MICROSECOND", _origin(), _ntz(col))
