"""The PDF/scan layout branch as a Spark stage (reference E1).

``applyInPandas`` per (doc_id, page): each group is one page of glyph boxes;
the kernel recovers reading order (functions/layout.py L1-L4).  Grouping by
(doc_id, page) is the one shuffle this branch needs — it hash-partitions on
the composite key, so glyph rows co-locate per page and skew is bounded by
the largest single page (a few thousand glyphs), not the largest document.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.layout import page_text
from ocr_spark.schemas import PAGE_TEXT_SCHEMA


def _page_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    text = page_text(
        pdf["ch"].to_numpy(),
        pdf["x0"].to_numpy(),
        pdf["y0"].to_numpy(),
        pdf["x1"].to_numpy(),
        pdf["y1"].to_numpy(),
    )
    return pd.DataFrame(
        {"doc_id": [pdf["doc_id"].iloc[0]], "page": [pdf["page"].iloc[0]], "text": [text]}
    )


def glyphs_to_page_text(glyphs: DataFrame) -> DataFrame:
    """glyphs -> (doc_id, page, text) in recovered reading order."""
    return glyphs.groupBy("doc_id", "page").applyInPandas(_page_fn, PAGE_TEXT_SCHEMA)


def ocr_structured_records(glyphs: DataFrame, doc_map: DataFrame) -> DataFrame:
    """The reference's engine-A chain end-to-end (SURVEY.md §3.1 steps 4-5:
    Vision OCR text -> structuring prompt), deterministic: glyph boxes ->
    XY-cut reading-order text -> label-anchored field structuring.

    ``doc_map(doc_id, url)`` keys the output by url (broadcast — it is one
    row per document, tiny relative to the glyph table).
    """
    from pyspark.sql.functions import broadcast

    from ocr_spark.operators.attendance import attendance_records

    doc_text = pages_to_doc_text(glyphs_to_page_text(glyphs))
    keyed = doc_text.join(broadcast(doc_map), "doc_id").select("url", "text")
    return attendance_records(keyed, text_col="text")


def pages_to_doc_text(page_texts: DataFrame) -> DataFrame:
    """Assemble per-document text: pages in order joined by \\n (JVM-side —
    collect_list + array_sort on (page, text) structs, no Python)."""
    return (
        page_texts.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("page", "text"))).alias("_pages"))
        .select(
            "doc_id",
            F.array_join(F.transform("_pages", lambda p: p["text"]), "\n").alias("text"),
            F.size("_pages").alias("n_pages"),
        )
    )
