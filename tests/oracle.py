"""Local replica of the driver's DuckDB-oracle comparison — STRICT.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count, schema, and an order-insensitive value hash with
columns sorted by name.

Driver semantics this module replicates exactly (VERDICT.md round 1):

* DuckDB HUGEINT (the result type of ``sum()`` over integers) is
  materialized as **float** on the driver's hash path, while Spark
  BIGINT stays int — so ``4383`` vs ``4383.0`` is a HASH MISMATCH even
  though the values are equal.  Round 1 shipped 7 such failures because
  this module used to normalize ``3.0 == 3``; the local comparator must
  be at least as strict as the driver, never looser.  Oracle SQL must
  therefore cast integer sums with ``::BIGINT``.
* DECIMAL results are likewise materialized as float.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from rearc_data_engineer_takehome_spark.sources.readers import TESTDATA_TABLES

# DuckDB logical types the driver's pandas/numpy hash path degrades to
# float64 (no int128 / decimal dtype there).  fetchall() hands us exact
# Python ints/Decimals for these, so we coerce per-column to match.
_FLOATY_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata is a single file per table; Spark-written
        # probe dirs (tools/scale_probe.py) are directories of part
        # files — glob those so the 30x parity spot-sweep can reuse
        # this fixture unchanged
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def _norm_cell(v):
    """Strict normalization: int and float are DIFFERENT (driver hashes
    them differently); floats rounded to 9 dp to absorb last-ulp noise."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    return str(v)


def _sort_key(row):
    # None is not comparable with str/tuple — sort on (is_null, type, value)
    return tuple(
        (v is None, type(v).__name__, "" if v is None else v) for v in row
    )


def _canonical(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=_sort_key
    )


def _fetch_duck(con: duckdb.DuckDBPyConnection, sql: str):
    """Fetch rows with per-column driver coercion: HUGEINT/DECIMAL → float."""
    rel = con.sql(sql)
    cols = list(rel.columns)
    type_names = [str(t) for t in rel.types]
    floaty = [
        any(tn.startswith(p) for p in _FLOATY_DUCK_TYPES) for tn in type_names
    ]
    rows = [
        tuple(
            float(v) if (floaty[i] and v is not None) else v
            for i, v in enumerate(r)
        )
        for r in rel.fetchall()
    ]
    return rows, cols


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a dict with match booleans + diagnostics."""
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    duck_rows, duck_cols = _fetch_duck(con, sql)

    result = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "rowcount_match": len(spark_rows) == len(duck_rows),
        "schema_match": sorted(spark_cols) == sorted(duck_cols),
    }
    if result["rowcount_match"] and result["schema_match"]:
        a = _canonical(spark_rows, spark_cols)
        b = _canonical(duck_rows, duck_cols)
        result["values_match"] = a == b
        if not result["values_match"]:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            result["first_diffs"] = diff
    else:
        result["values_match"] = False
    return result
