"""SQL entry-point parity (S6/D4): the same relations answer DataFrame
and spark.sql() queries identically; JSONL reads honor declared schemas
(no inference pass)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from rearc_data_engineer_takehome_spark.sources import readers


def test_sql_and_dataframe_paths_agree(spark, sf_smoke):
    readers.register_testdata_views(spark, sf_smoke)
    sql_rows = readers.sql(
        spark,
        """
        SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS q
        FROM lineitem GROUP BY l_returnflag
        """,
    ).collect()
    df_rows = (
        spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_views_cover_all_tables(spark, sf_smoke):
    readers.register_testdata_views(spark, sf_smoke)
    for t in readers.TESTDATA_TABLES:
        assert spark.sql(f"SELECT count(*) FROM {t}").collect()[0][0] > 0


def test_jsonl_read_with_declared_schema(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            json.dumps({"id": i, "text": f"doc {i}", "extra": "ignored"})
            for i in range(5)
        )
    )
    schema = StructType(
        [StructField("id", IntegerType()), StructField("text", StringType())]
    )
    df = readers.read_jsonl(spark, str(p), schema=schema)
    assert df.schema == schema  # no inference, extra field pruned
    assert df.count() == 5


def test_multiline_json_single_document(spark, tmp_path):
    p = tmp_path / "doc.json"
    p.write_text(json.dumps({"meta": {"v": 1}, "data": [{"x": 1}, {"x": 2}]}, indent=2))
    df = readers.read_multiline_json(spark, str(p))
    rows = df.select(F.explode("data").alias("r")).select("r.x").collect()
    assert sorted(r.x for r in rows) == [1, 2]
