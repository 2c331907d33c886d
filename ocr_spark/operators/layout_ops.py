"""The PDF/scan layout branch as a Spark stage (reference E1).

One shuffle, zero JVM object aggregation, zero per-glyph Python objects:
glyph rows are projected to ALL-NUMERIC columns (``ch`` becomes its
Unicode code point via ``ascii()``), hash-repartitioned and sorted on
(doc_id, page), and the kernel runs in ``mapInArrow`` — numeric Arrow
columns are zero-copy numpy views, page groups are contiguous runs found
with one diff over the sorted keys, and a partial page at an Arrow batch
boundary is carried into the next batch.

Why this exact shape (measured at 23M glyphs / 24k pages, local[16]):
- per-row ``applyInPandas`` per (doc_id, page): ~80 s — 24k tiny pandas
  groups plus 23M one-char Python strings through the Arrow channel;
- ``collect_list(struct)`` packing + mapInPandas: ~80 s — the JVM
  ObjectHashAggregate building 23M struct copies into lists is the
  bottleneck (the Python side was NOT: a trivial fn cost the same);
- this shape: sort-based grouping on numeric rows, kernel-bound (~6 s).

Skew is bounded by the largest single page (a few thousand glyphs), not
the largest document.  Determinism with arbitrary input order: region
order is geometric (XY-cut), line membership is order-insensitive
running-mean clustering over sorted baselines, and within-line order
sorts on x0 (distinct within a line in well-formed glyph streams,
layout.py L3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.layout import page_text, page_text_codes
from ocr_spark.schemas import PAGE_TEXT_SCHEMA


def _pages_arrow_fn(batches):
    import pyarrow as pa

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("page", pa.int32()), ("text", pa.string())]
    )
    pend = None  # numpy column dict carried across batch boundaries

    def emit(cols, complete_upto):
        """Process contiguous groups in cols[:complete_upto]; returns the
        output RecordBatch (or None) — caller keeps the rest pending."""
        if complete_upto == 0:
            return None
        doc_id, page = cols["doc_id"], cols["page"]
        # group boundaries: positions where the (doc_id, page) key changes
        key_change = np.flatnonzero(
            (np.diff(doc_id[:complete_upto]) != 0)
            | (np.diff(page[:complete_upto]) != 0)
        )
        starts = np.concatenate(([0], key_change + 1))
        ends = np.concatenate((key_change + 1, [complete_upto]))
        out_doc, out_page, out_text = [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            out_doc.append(int(doc_id[s]))
            out_page.append(int(page[s]))
            out_text.append(
                page_text_codes(
                    cols["cp"][s:e], cols["x0"][s:e], cols["y0"][s:e],
                    cols["x1"][s:e], cols["y1"][s:e],
                )
            )
        if not out_doc:
            return None
        return pa.RecordBatch.from_arrays(
            [
                pa.array(out_doc, pa.int64()),
                pa.array(out_page, pa.int32()),
                pa.array(out_text, pa.string()),
            ],
            schema=out_schema,
        )

    names = ("doc_id", "page", "cp", "x0", "y0", "x1", "y1")
    for batch in batches:
        # resolve columns by NAME (schema lookup), not position — an
        # upstream select reorder must fail loudly, never silently mis-map
        idx = {n: batch.schema.get_field_index(n) for n in names}
        missing = [n for n, i in idx.items() if i < 0]
        if missing:
            raise KeyError(f"glyph batch missing columns: {missing}")
        cols = {
            n: batch.column(i).to_numpy(zero_copy_only=False)
            for n, i in idx.items()
        }
        if pend is not None:
            cols = {n: np.concatenate((pend[n], cols[n])) for n in names}
        n = len(cols["doc_id"])
        if n == 0:
            continue
        # rows of the LAST key in the buffer may continue in the next
        # batch: hold them back
        last_key_start = int(
            np.flatnonzero(
                (cols["doc_id"] != cols["doc_id"][-1])
                | (cols["page"] != cols["page"][-1])
            )[-1] + 1
            if ((cols["doc_id"] != cols["doc_id"][-1]) | (cols["page"] != cols["page"][-1])).any()
            else 0
        )
        rb = emit(cols, last_key_start)
        if rb is not None:
            yield rb
        pend = {n: cols[n][last_key_start:] for n in names}
    if pend is not None and len(pend["doc_id"]):
        rb = emit(pend, len(pend["doc_id"]))
        if rb is not None:
            yield rb


def glyphs_to_page_text(glyphs: DataFrame) -> DataFrame:
    """glyphs -> (doc_id, page, text) in recovered reading order."""
    num = glyphs.select(
        "doc_id", "page", F.ascii("ch").alias("cp"), "x0", "y0", "x1", "y1"
    )
    part = num.repartition("doc_id", "page").sortWithinPartitions("doc_id", "page")
    return part.mapInArrow(_pages_arrow_fn, PAGE_TEXT_SCHEMA)


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


def glyphs_to_page_text_grouped(glyphs: DataFrame) -> DataFrame:
    """Reference shape: applyInPandas per (doc_id, page) group with the
    string-glyph spec kernel.  Kept for differential testing against the
    packed fast path (identical output asserted in tests)."""
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
    """Assemble per-document text AND page spans: pages in order joined by
    \\n; span ``page_<n>`` = [begin, end) code-point offsets of that page's
    text inside the document text (the layout branch's parallel of the
    html branch's block spans, north-star "text and character spans per
    document").  JVM-side throughout — collect_list + array_sort + one
    higher-order aggregate building (position, spans) as it folds."""
    zero = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.array().cast(
            "array<struct<field:string,begin:bigint,end:bigint>>"
        ).alias("spans"),
    )

    def step(acc, p):
        begin = acc["pos"]
        end = begin + F.length(p["text"])
        span = F.struct(
            F.concat(F.lit("page_"), p["page"].cast("string")).alias("field"),
            begin.cast("long").alias("begin"),
            end.cast("long").alias("end"),
        )
        return F.struct(
            (end + F.lit(1)).cast("long").alias("pos"),  # +1 for the joiner
            F.array_append(acc["spans"], span).alias("spans"),
        )

    return (
        page_texts.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("page", "text"))).alias("_pages"))
        .select(
            "doc_id",
            F.array_join(F.transform("_pages", lambda p: p["text"]), "\n").alias("text"),
            F.aggregate("_pages", zero, step)["spans"].alias("spans"),
            F.size("_pages").alias("n_pages"),
        )
    )
