"""Text/JSON → typed DataFrame parsing (reference operators P1-P5, F1-F9).

The reference's core parsing problem: a whitespace-delimited BLS time
series file (`series_id year period value [footnote_codes]`) with a
header row and blank lines, and a nested JSON population payload
(`{annotations, columns, data:[{Year, Nation, Population}, ...]}`).
Reference: notebooks/20_analytics.ipynb:335-356 (text parse) and
notebooks/11_ingest_population.ipynb:385-388 (JSON explode-normalize).

Both parsers are pure DataFrame expressions — they run distributed,
stay inside whole-stage codegen, and push the blank-line filter into
the scan's first projection. Header/garbage rows are eliminated by
``try_cast`` semantics exactly as in the reference: a non-numeric year
becomes NULL and the null-rejection filter drops it (SURVEY.md §7.4
risk #1 — never replace with ANSI-strict cast, which would throw).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def parse_whitespace_series(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse BLS-style whitespace-delimited lines into
    ``(series_id string, year int, period string, value double)``.

    Semantics preserved from the reference (20_analytics.ipynb:335-356):
      * blank lines dropped via ``length(trim(line)) > 0``;
      * tokens split on ``\\s+`` after trim;
      * only tokens 0-3 kept — a trailing ``footnote_codes`` column is
        deliberately ignored;
      * ``try_cast`` turns the header row's ``"year"`` token into NULL;
      * conjunctive not-null filter then removes header/garbage rows.
    """
    tokens = F.split(F.trim(F.col(value_col)), r"\s+")
    # F.get (NOT getItem): under ANSI mode (Spark 4 default) getItem
    # THROWS InvalidArrayIndex on lines with fewer than 4 tokens — one
    # short line would kill the whole job. get() yields NULL, which the
    # not-null filter below then drops, preserving the reference's
    # malformed-row semantics.
    parsed = (
        lines.where(F.length(F.trim(F.col(value_col))) > 0)
        .select(
            F.get(tokens, 0).alias("series_id"),
            F.get(tokens, 1).try_cast("int").alias("year"),
            F.get(tokens, 2).alias("period"),
            F.get(tokens, 3).try_cast("double").alias("value"),
        )
        .where(
            F.col("series_id").isNotNull()
            & F.col("year").isNotNull()
            & F.col("period").isNotNull()
            & F.col("value").isNotNull()
        )
    )
    return parsed


def normalize_population_json(doc: DataFrame) -> DataFrame:
    """Explode the nested population payload into ``(Year int,
    Population double)`` rows — the distributed path the reference uses
    in 11_ingest_population.ipynb:385-388 (explode + ``record.*``),
    standardized over its driver-side ``json.loads`` variant which
    cannot scale past driver memory.
    """
    return (
        doc.select(F.explode("data").alias("record"))
        .select(
            F.col("record.Year").cast("int").alias("Year"),
            F.col("record.Population").cast("double").alias("Population"),
        )
        .where(F.col("Year").isNotNull() & F.col("Population").isNotNull())
    )


def read_and_parse_bls(spark: SparkSession, path: str) -> DataFrame:
    """End-to-end: text scan → typed BLS DataFrame."""
    return parse_whitespace_series(spark.read.text(path))


def read_and_normalize_population(spark: SparkSession, path: str) -> DataFrame:
    """End-to-end: multiline JSON scan → (Year, Population) rows."""
    doc = spark.read.option("multiLine", "true").json(path)
    return normalize_population_json(doc)
