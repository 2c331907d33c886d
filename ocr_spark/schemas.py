"""Canonical schemas for the engine.

The typed record mirrors the reference's only schema
(reference: src/ai/schemas/pdf-data-schema.ts:5-17) with its contractual
missing-data semantics — missing string -> "", missing number -> 0, missing
array -> []; no key is ever omitted (reference:
src/ai/flows/extract-data-from-pdf.ts:48-52,67-71,87-91).  Unicode field
names are kept verbatim so serialized output matches.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# pages — primary input (shape mandated by BASELINE.json:15 input_hint)
# ---------------------------------------------------------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# extraction output
# ---------------------------------------------------------------------------
SPAN_TYPE = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("begin", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)

EXTRACT_RESULT_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE, containsNull=False), False),
        T.StructField("n_blocks", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("text", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE, containsNull=False), False),
        T.StructField("n_blocks", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("engine", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# structured attendance record — reference pdf-data-schema.ts:5-17 verbatim
# ---------------------------------------------------------------------------
PRESENCE_TYPE = T.StructType(
    [
        T.StructField("n", T.StringType(), False),
        T.StructField("nom_prénom", T.StringType(), False),
    ]
)

FIELDS_TYPE = T.StructType(
    [
        T.StructField("classe", T.StringType(), False),
        T.StructField("cours", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("nom_du_professeur", T.StringType(), False),
        T.StructField("nombre_des_présents", T.LongType(), False),
        T.StructField("salle_n", T.StringType(), False),
        T.StructField("séance", T.StringType(), False),
        T.StructField(
            "présences", T.ArrayType(PRESENCE_TYPE, containsNull=False), False
        ),
    ]
)

ATTENDANCE_RESULT_TYPE = T.StructType(
    [
        T.StructField("fields", FIELDS_TYPE, False),
        T.StructField("error", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# glyphs — PDF/scan layout branch input (FIXTURES.md §2)
# ---------------------------------------------------------------------------
GLYPHS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("glyph_id", T.LongType(), False),
        T.StructField("ch", T.StringType(), False),
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
    ]
)

PAGE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)
