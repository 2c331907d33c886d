"""Job assembly: partitioning policy, lineage counters, resumable pipeline."""

from ocr_spark.plans.pipeline import ExtractionPipeline  # noqa: F401
