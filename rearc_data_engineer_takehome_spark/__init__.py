"""rearc_data_engineer_takehome_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``rohitpradhan2995/rearc-data-engineer-takehome`` (a batch
ETL + analytics pipeline: resilient ingestion, text/JSON parsing,
relational analytics, data-quality validation, curated table publishing),
extended with the operators a large-scale LLM training-data pipeline
needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, multimodal column plumbing, and
text analysis — all designed for a multi-executor cluster at 100 TB even
though tests run on local mode.

Design rules (enforced throughout):
  * DataFrame / Spark SQL only — no RDDs in the hot path.
  * Built-in ``pyspark.sql.functions`` over UDFs; Pandas UDFs only where
    built-ins genuinely cannot express the semantics.
  * Declarative plans so Catalyst gets predicate pushdown, column
    pruning, broadcast-join selection, and AQE for free.
"""

__version__ = "0.1.0"
