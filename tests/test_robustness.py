"""Input robustness: corrupt JSON records (PERMISSIVE capture vs
FAILFAST), malformed BLS lines, and output file sizing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.operators import parse
from rearc_data_engineer_takehome_spark.sources import readers, writers


def test_permissive_jsonl_captures_corrupt_records(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "v": 10}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20}\n'
        '{"id": 3, "v": }\n'
    )
    schema = "id INT, v INT, _corrupt_record STRING"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    df = df.cache()  # corrupt-record column requires a materialized scan
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 2  # quarantined, not dropped, not fatal
    df.unpersist()


def test_failfast_jsonl_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1}\nnot json\n')
    df = spark.read.schema("id INT").option("mode", "FAILFAST").json(str(p))
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_bls_parser_survives_garbage_variants(spark, tmp_path):
    p = tmp_path / "nasty.txt"
    p.write_text(
        "series_id\tyear\tperiod\tvalue\n"      # header
        "\n\n"                                   # blanks
        "S1 2020 Q01 1.5\n"                      # good
        "S1 notayear Q01 2.0\n"                  # bad year → dropped
        "S1 2020 Q02 notanumber\n"               # bad value → dropped
        "S1 2020\n"                              # too few tokens → dropped
        "   S1   2021   Q01   3.25   r   x\n"    # extra ws + extra tokens → ok
    )
    rows = {(r.series_id, r.year, r.period): r.value
            for r in parse.read_and_parse_bls(spark, str(p)).collect()}
    assert rows == {("S1", 2020, "Q01"): 1.5, ("S1", 2021, "Q01"): 3.25}


def test_output_file_sizing(spark, tmp_path):
    """Writers must control output file counts: a 32-partition shuffle
    writing 100 rows must not emit 32 tiny files when coalesced."""
    df = spark.range(100).repartition(32).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "sized")
    writers.write_parquet_dir(df.coalesce(2), out)
    import pathlib

    files = [f for f in pathlib.Path(out).glob("*.parquet")]
    assert len(files) == 2
    assert spark.read.parquet(out).count() == 100
