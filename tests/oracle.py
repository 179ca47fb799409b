"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count, schema, and an order-insensitive value hash with
columns sorted by name. This module reproduces that check so parity
failures surface in pytest before the driver ever sees them.
"""

from __future__ import annotations

import math

import duckdb

from rearc_data_engineer_takehome_spark.sources.readers import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**52:
            return int(v)  # 3.0 and 3 hash alike across engines
        return round(v, 9)
    if isinstance(v, int):
        return v
    return str(v)


def _sort_key(row):
    # None is not comparable with str/int — sort on (is_null, type, value)
    return tuple(
        (v is None, type(v).__name__, "" if v is None else v) for v in row
    )


def _canonical(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=_sort_key
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a dict with match booleans + diagnostics."""
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

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
