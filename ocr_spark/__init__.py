"""ocr_spark — a PySpark-native document-text extraction engine.

Brand-new implementation (NOT a port) of the capabilities of the reference
app ``MehdiAPBS/OCR`` (see /root/reference): batch text extraction from raw
document bytes, structured-field recovery, nested-record unnesting,
idempotent keyed sinks, per-document default/error semantics — re-expressed
Spark-first:

- ``ocr_spark.functions``  — pure (pandas in / pandas out) extraction kernels:
  HTML boilerplate stripping, XY-cut layout reading order, labeled-field
  structuring, text statistics.  No Spark imports; unit-testable alone.
- ``ocr_spark.operators``  — the Spark stages: vectorized pandas/Arrow UDF
  wrappers, engine dispatch, explode/unnest, dedup, similarity search.
- ``ocr_spark.sources``    — table IO: the ``pages`` source, the "icelite"
  parquet+manifest table layer (atomic commits, MERGE, snapshot resume) used
  where Iceberg jars are unavailable.
- ``ocr_spark.plans``      — job assembly: partitioning/salting policy,
  lineage counters, resumable pipeline driver.
- ``ocr_spark.streaming``  — Structured Streaming ingest of pages.
"""

__version__ = "0.1.0"
