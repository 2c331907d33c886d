"""Spark stages: vectorized pandas/Arrow UDF wrappers around the pure
kernels in ``ocr_spark.functions``, plus relational reshaping operators.

No per-row Python UDFs anywhere (BASELINE.json:15) — every Python-side
operator is a pandas UDF / applyInPandas / mapInPandas over Arrow batches,
and everything relational stays in JVM-side ``pyspark.sql.functions``.
"""
