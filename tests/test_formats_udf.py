"""Source-format breadth: robust CSV, ORC, codecs, views, SQL-registered UDFs."""

from __future__ import annotations

import pathlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

from rearc_data_engineer_takehome_spark.sources.readers import read_csv_robust


def test_csv_robust_quarantines_malformed_rows(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,9.5\n"
        "not_a_number,bob,oops,extra,fields\n"   # malformed
        "3,carol,7.25\n"
    )
    df = read_csv_robust(spark, str(p), "id long, name string, score double")
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert {(r.id, r.name, r.score) for r in good.collect()} == {
        (1, "alice", 9.5),
        (3, "carol", 7.25),
    }
    # the dirty row survives verbatim for a dead-letter sink, not dropped
    assert [r._corrupt_record for r in bad.collect()] == [
        "not_a_number,bob,oops,extra,fields"
    ]


def test_orc_roundtrip_and_parquet_codecs(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.sha1(F.col("id").cast("string")).alias("payload")
    )
    orc = str(tmp_path / "data.orc")
    df.write.orc(orc)
    back = spark.read.orc(orc)
    # nullability flags legitimately widen on round-trip; names+types must hold
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert back.count() == 1000

    for codec in ("snappy", "zstd", "gzip"):
        out = str(tmp_path / f"pq_{codec}")
        df.write.option("compression", codec).parquet(out)
        files = list(pathlib.Path(out).glob("*.parquet"))
        assert files, codec
        # codec is recorded in the filename suffix by convention
        assert any(codec.replace("gzip", "gz") in f.name for f in files), codec
        assert spark.read.parquet(out).count() == 1000


def test_temp_and_global_views(spark):
    df = spark.range(0, 10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df.createOrReplaceTempView("tv_local")
    assert spark.sql("SELECT sum(v) AS s FROM tv_local").first().s == 90
    df.createOrReplaceGlobalTempView("tv_global")
    # global temp views live in the global_temp database, cross-session
    assert spark.sql("SELECT count(*) AS n FROM global_temp.tv_global").first().n == 10
    spark.catalog.dropTempView("tv_local")
    spark.catalog.dropGlobalTempView("tv_global")


def test_sql_registered_pandas_udf(spark):
    """Extension surface: vectorized (Arrow-batched) UDFs callable from
    SQL — the sanctioned escape hatch when built-ins can't express the
    semantics. Row-at-a-time Python UDFs stay out of hot paths."""

    @pandas_udf("double")
    def geomean_shift(s: pd.Series) -> pd.Series:
        return (s.abs() + 1.0).pow(0.5)

    spark.udf.register("geomean_shift", geomean_shift)
    df = spark.range(0, 100).select(F.col("id").cast("double").alias("x"))
    df.createOrReplaceTempView("udf_in")
    got = spark.sql(
        "SELECT round(sum(geomean_shift(x)), 4) AS s FROM udf_in"
    ).first().s
    expected = round(sum((abs(float(i)) + 1.0) ** 0.5 for i in range(100)), 4)
    assert abs(got - expected) < 1e-6
    spark.catalog.dropTempView("udf_in")


def test_python_udtf_lateral_explodes_rows(spark):
    """Spark 4 Python UDTF surface: a table function registered in SQL,
    used with LATERAL to fan each document out to (word, length) rows —
    the row-generating UDF tier next to scalar pandas UDFs and grouped
    applyInPandas. (UDTFs run row-at-a-time Python: fine for bounded
    fan-out, not a substitute for codegen'd explode in the hot path.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n_chars: int")
    class WordLens:
        def eval(self, text: str):
            for w in (text or "").split():
                yield (w, len(w))

    spark.udtf.register("word_lens", WordLens)
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, None)], ["doc_id", "text"]
    )
    df.createOrReplaceTempView("udtf_docs")
    got = sorted(
        (r.doc_id, r.word, r.n_chars)
        for r in spark.sql(
            "SELECT d.doc_id, w.word, w.n_chars "
            "FROM udtf_docs d, LATERAL word_lens(d.text) w"
        ).collect()
    )
    assert got == [
        (1, "alpha", 5),
        (1, "beta", 4),
        (2, "gamma", 5),
    ]
