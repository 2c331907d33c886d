"""QA/report aggregation over the extracted table (reference A1).

The reference summarizes one record with an LLM
(reference: src/ai/flows/summarize-pdf-data.ts:28-45); deterministic
replacement per SURVEY.md §2 A1: grouped metrics over the extraction
output — the one intentionally-wide (shuffling) operator in the engine.
Also carries A2's rule: ``nombre_des_présents`` is the *declared* count and
is never recomputed; ``size(présences)`` is a separate QA column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extraction_report(extracted: DataFrame) -> DataFrame:
    """Per-language QA rollup of an EXTRACTED_SCHEMA table."""
    return (
        extracted.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(F.col("n_blocks").cast("bigint")).alias("total_blocks"),
            F.max(F.length("text")).cast("bigint").alias("max_chars"),
        )
        .withColumn(
            "error_rate",
            F.round(F.col("n_errors") / F.greatest(F.col("n_docs"), F.lit(1)), 6),
        )
    )


def attendance_qa(records: DataFrame) -> DataFrame:
    """A2: declared count vs actual list size, flagged — never overwritten."""
    return records.select(
        "url",
        F.col("fields.nombre_des_présents").alias("declared"),
        F.size("fields.présences").cast("bigint").alias("actual"),
        (F.col("fields.nombre_des_présents") != F.size("fields.présences")).alias(
            "count_mismatch"
        ),
    )
