"""The flagship extraction stage: pages -> extracted.

Spark shape (SURVEY.md §3.1): scan -> one ArrowEvalPython projection -> sink.
Zero shuffles in steady state; the pandas UDF replaces the reference's
browser->server->Vision/Gemini round-trips
(reference: src/ai/flows/extract-data-from-pdf.ts:78-175) with an in-process
Arrow-vectorized kernel.

Engine dispatch mirrors reference E4 (extract-data-from-pdf.ts:96,150 —
``if (extractionEngine === 'googleCloudVision') ... else ...``) as two
filtered branches + unionByName:

- engine ``dom``  — the DOM-heuristic branch over raw ``html`` bytes
  (stand-in for engine B, direct multimodal extraction).
- engine ``wet``  — pass-through of the crawl's pre-extracted ``text``
  column when ``html`` is absent (stand-in for engine A's external-OCR-text
  path: text arrives already flat, we only normalize it).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import arrow_udf
from pyspark.sql.pandas.types import to_arrow_type

from ocr_spark.functions.html_extract import (
    DEFAULT_MAX_HTML_BYTES,
    ERR_EMPTY,
    extract_html_doc,
)
from ocr_spark.normalize import collapse_ws, nfc
from ocr_spark.schemas import EXTRACT_RESULT_TYPE

ENGINE_DOM = "dom"
ENGINE_WET = "wet"

_RESULT_ARROW_TYPE = to_arrow_type(EXTRACT_RESULT_TYPE)


@arrow_udf(EXTRACT_RESULT_TYPE)
def extract_html_udf(html: pa.Array) -> pa.Array:
    """Vectorized E2+E3: html bytes -> (text, spans, n_blocks, error).

    arrow_udf (not pandas_udf): the kernel consumes raw bytes and emits a
    typed struct — going through pandas would materialize an object Series
    of the binary payloads and a dict->pandas->arrow round trip on the way
    out (~18% measured overhead at this batch shape).
    """
    rows = []
    for doc in html.to_pylist():
        t, sp, nb, err = extract_html_doc(doc, DEFAULT_MAX_HTML_BYTES)
        rows.append(
            {
                "text": t,
                "spans": [{"field": f, "begin": b, "end": e} for f, b, e in sp],
                "n_blocks": nb,
                "error": err,
            }
        )
    return pa.array(rows, type=_RESULT_ARROW_TYPE)


@arrow_udf(T.StringType())
def wet_normalize_udf(text: pa.Array) -> pa.Array:
    """The REAL N2+N4 kernel over crawl-provided flat text: Unicode
    whitespace collapse (``str.split`` semantics) then NFC.  A JVM regexp
    collapse is NOT equivalent — Java/RE2 ``\\s`` is ASCII-only (an NBSP
    or U+2028 run survives it) and Spark has no NFC builtin — so the old
    JVM-side wet branch silently violated the frozen byte-identity spec
    (normalize.py N2/N4) on real crawl text."""
    return pa.array(
        [None if t is None else nfc(collapse_ws(t)) for t in text.to_pylist()],
        type=pa.string(),
    )


def _finalize(df: DataFrame, engine: str) -> DataFrame:
    """Common projection: flatten the kernel struct, default-coalesce (E5)."""
    return df.select(
        "url",
        "warc_ts",
        "lang",
        F.coalesce(F.col("_r.text"), F.lit("")).alias("text"),
        F.coalesce(F.col("_r.spans"), F.array()).alias("spans"),
        F.coalesce(F.col("_r.n_blocks"), F.lit(0)).alias("n_blocks"),
        F.col("_r.error").alias("error"),
        F.lit(engine).alias("engine"),
    )


def extract_pages(pages: DataFrame, engine: str = "auto") -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> extracted (EXTRACTED_SCHEMA).

    ``engine='auto'`` routes rows with html through the DOM branch and
    html-less rows with crawl text through the WET pass-through (E4).
    """
    if engine not in (ENGINE_DOM, ENGINE_WET, "auto"):
        # a typo'd engine silently fell through to auto dispatch
        raise ValueError(f"engine must be 'dom', 'wet' or 'auto', got {engine!r}")
    if engine == ENGINE_DOM:
        return _finalize(
            pages.withColumn("_r", extract_html_udf(F.col("html"))), ENGINE_DOM
        )
    if engine == ENGINE_WET:
        return _wet_branch(pages)
    dom = _finalize(
        pages.filter(F.col("html").isNotNull()).withColumn(
            "_r", extract_html_udf(F.col("html"))
        ),
        ENGINE_DOM,
    )
    wet = _wet_branch(pages.filter(F.col("html").isNull()))
    return dom.unionByName(wet)


def _wet_branch(pages: DataFrame) -> DataFrame:
    """WET pass-through: crawl-provided text through the real normalize
    kernel (see ``wet_normalize_udf``).  The outer coalesce keeps Catalyst
    from inferring isnotnull(udf(...)) probes that would double-evaluate
    the UDF (see CLAUDE.md, inferred-notnull trap)."""
    norm = F.coalesce(
        wet_normalize_udf(F.coalesce(F.col("text"), F.lit(""))), F.lit("")
    )
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        norm.alias("text"),
        F.array().cast("array<struct<field:string,begin:bigint,end:bigint>>").alias(
            "spans"
        ),
        F.when(norm != "", F.lit(1)).otherwise(F.lit(0)).alias("n_blocks"),
        F.when(norm == "", F.lit(ERR_EMPTY)).otherwise(F.lit(None).cast("string")).alias("error"),
        F.lit(ENGINE_WET).alias("engine"),
    )
