"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extension tier) for the driver's
DuckDB value-hash comparison at sf0.01. All real logic lives in the
``rearc_data_engineer_takehome_spark`` package; this module is a thin
adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rearc_data_engineer_takehome_spark.queries import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "best_part_by_supplier"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's signature shape — top-1-per-group via
    pre-aggregated ranking window ("best year per series",
    reference notebooks/20_analytics.ipynb cell-10).
    """
    return REGISTRY[FLAGSHIP].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. As of round 10 EVERY
    registry query carries an oracle — approx-sketch queries emit
    exact aggregates plus deterministic within-bounds booleans so the
    accuracy claim itself is hash-certified. (A query omitted here
    would get an ``err: no_oracle`` row: nothing externally checked —
    avoid.)"""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
