"""Fixed-window chunking and PII redaction behavior."""

from __future__ import annotations

import pyspark.sql.functions as F

from rearc_data_engineer_takehome_spark.operators.text import chunk_fixed, redact_pii


def test_chunk_fixed_overlap_and_coverage(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(250))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = chunk_fixed(df, "text", size=100, stride=60).collect()
    chunks.sort(key=lambda r: r.chunk_id)
    # windows start at 0, 60, 120, 180, 240 → 5 chunks
    assert [r.chunk_id for r in chunks] == [0, 1, 2, 3, 4]
    for r in chunks:
        start = r.chunk_id * 60
        assert r.chunk_text == text[start : start + 100]
    # stride < size → consecutive chunks overlap by size-stride chars
    assert chunks[0].chunk_text[60:] == chunks[1].chunk_text[:40]
    # full coverage: stitching stride-prefixes + last chunk rebuilds the doc
    rebuilt = "".join(r.chunk_text[:60] for r in chunks[:-1]) + chunks[-1].chunk_text
    assert rebuilt == text


def test_chunk_fixed_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = chunk_fixed(df, "text", size=100, stride=60).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 3  # one chunk each — rows preserved, not dropped
    assert by_id[1].chunk_text == "tiny"
    assert by_id[2].chunk_text == ""
    assert by_id[3].chunk_text is None and by_id[3].chunk_id == 0


def test_redact_pii_patterns_fire_and_clean_text_unchanged(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "server at 192.168.1.254 port 80"),
        (3, "call 555-867-5309 or (212) 555-0187"),
        (4, "no pii here, just 3.14 and v1.2.3 and a@b"),  # near-misses stay
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.red for r in df.select("id", redact_pii("t").alias("red")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> port 80"
    assert got[3] == "call <PHONE> or <PHONE>"
    assert got[4] == rows[3][1]
