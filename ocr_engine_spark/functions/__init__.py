"""Column-level operations for large-scale training-data pipelines:
text analysis, deduplication, similarity search.

Everything here is built from ``pyspark.sql.functions`` primitives
(JVM-side, whole-stage-codegen friendly) unless a kernel genuinely
needs Python — in which case it is an Arrow-batched pandas UDF.
Each op has a DuckDB-expressible twin in ``__spark_entry__.py``'s
``oracle_sql`` for the correctness gate.
"""
