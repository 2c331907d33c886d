"""Table IO: the pages source and the "icelite" snapshot table layer.

Real Iceberg needs its runtime jars on the Spark classpath; this sandbox
image has none, so ``icelite`` provides the same *semantics* on plain
parquet + JSON manifests: atomic snapshot commits, file-granularity
copy-on-write MERGE on a key, bucket pruning, snapshot-based resume, and
per-partition lineage counters.  The pipeline code talks to the small
``IceliteTable`` API; swapping in real Iceberg (`MERGE INTO`, snapshot
metadata) is a connector change, not an engine change.
"""

from ocr_spark.sources.icelite import IceliteTable  # noqa: F401
