"""Column-expression building blocks: portable hashing, vector math,
text tokenization. All pure pyspark.sql.functions compositions — JVM-side,
whole-stage-codegen friendly, no Python UDFs."""
