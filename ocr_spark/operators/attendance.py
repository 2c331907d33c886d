"""Structured-field recovery stage + JSON serialization (E3, E5, E7, E8).

Reference parity: the structuring prompt (extract-data-from-pdf.ts:59-75)
becomes a vectorized pandas UDF returning the exact typed struct of
pdf-data-schema.ts:5-17; ``JSON.stringify(structuredData)``
(extract-data-from-pdf.ts:162) becomes ``to_json(struct)``; the client-side
``JSON.parse`` (page.tsx:181) becomes ``from_json``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyspark.sql import types as T

from ocr_spark.functions.fields import extract_fields, extract_fields_with_spans
from ocr_spark.schemas import ATTENDANCE_RESULT_TYPE, FIELDS_TYPE, SPAN_TYPE

ATTENDANCE_SPANS_RESULT_TYPE = T.StructType(
    [
        T.StructField("fields", FIELDS_TYPE, False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE, containsNull=False), False),
        T.StructField("error", T.StringType(), True),
    ]
)


@pandas_udf(ATTENDANCE_RESULT_TYPE)
def structure_udf(doc_text: pd.Series) -> pd.DataFrame:
    fields: list[dict] = []
    errors: list[str | None] = []
    for t in doc_text:
        f, err = extract_fields(t)
        fields.append(f)
        errors.append(err)
    return pd.DataFrame({"fields": fields, "error": errors})


@pandas_udf(ATTENDANCE_SPANS_RESULT_TYPE)
def structure_spans_udf(doc_text: pd.Series) -> pd.DataFrame:
    fields: list[dict] = []
    spans: list[list[dict]] = []
    errors: list[str | None] = []
    for t in doc_text:
        f, sp, err = extract_fields_with_spans(t)
        fields.append(f)
        spans.append([{"field": a, "begin": b, "end": e} for a, b, e in sp])
        errors.append(err)
    return pd.DataFrame({"fields": fields, "spans": spans, "error": errors})


def attendance_records(docs: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """docs(url, doc_text) -> (url, fields struct, error)."""
    return docs.select(
        "url",
        structure_udf(F.col(text_col)).alias("_r"),
    ).select("url", F.col("_r.fields").alias("fields"), F.col("_r.error").alias("error"))


def attendance_records_with_spans(
    docs: DataFrame, text_col: str = "doc_text"
) -> DataFrame:
    """docs(url, doc_text) -> (url, fields, spans, error) — spans are the
    exact value offsets of every recovered scalar field in the source text
    (north-star span parity for the structured branch)."""
    return docs.select("url", structure_spans_udf(F.col(text_col)).alias("_r")).select(
        "url",
        F.col("_r.fields").alias("fields"),
        F.col("_r.spans").alias("spans"),
        F.col("_r.error").alias("error"),
    )


def with_json_output(records: DataFrame) -> DataFrame:
    """E7: struct -> compact JSON string column ``json_output``."""
    return records.withColumn("json_output", F.to_json(F.col("fields")))


def parse_json_output(df: DataFrame, json_col: str = "json_output") -> DataFrame:
    """E8: JSON string -> typed struct (round-trip of with_json_output)."""
    return df.withColumn("fields", F.from_json(F.col(json_col), FIELDS_TYPE))
