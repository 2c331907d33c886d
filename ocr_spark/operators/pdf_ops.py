"""PDF bytes -> glyphs / reading-order text as Spark stages.

Closes the reference's titular front door: it ingests PDF *files*
(reference: src/app/page.tsx:444-452, accept filter :118) and engine A
OCRs the raw bytes (reference: src/ai/flows/extract-data-from-pdf.ts:
114-139).  Here the byte layer is the stdlib parser
(ocr_spark/functions/pdf.py, frozen contract P1-P8) and the layout layer
is the existing XY-cut kernel (functions/layout.py L1-L4) — so the full
engine-A chain runs from raw document bytes with no fixture-born glyph
table in the path.

Scale shape: both operators are single-pass ``mapInArrow`` over the
document relation — no shuffle, no per-row Python UDFs, errors recorded
per document (E6), the same zero-Exchange plan as the html extraction
branch.  PDF payloads are KB-to-MB objects; per-task memory is bounded by
the Arrow batch (session-tuned) times the largest document, the same
envelope as the WARC/multimodal readers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ocr_spark.functions.layout import page_text
from ocr_spark.functions.pdf import pdf_glyphs

PDF_GLYPHS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("glyph_id", T.LongType(), False),
        T.StructField("ch", T.StringType(), False),
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

PDF_PAGE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _glyph_batches(batches):
    import pyarrow as pa

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("page", pa.int32()),
            ("glyph_id", pa.int64()),
            ("ch", pa.string()),
            ("x0", pa.float64()),
            ("y0", pa.float64()),
            ("x1", pa.float64()),
            ("y1", pa.float64()),
            ("error", pa.string()),
        ]
    )
    for batch in batches:
        ids = batch.column(batch.schema.get_field_index("doc_id")).to_pylist()
        pdfs = batch.column(batch.schema.get_field_index("pdf")).to_pylist()
        cols = {name: [] for name in schema.names}
        for did, payload in zip(ids, pdfs):
            rows, err = pdf_glyphs(payload)
            if err is not None:
                # E6 sentinel row: the error travels in the row, page/glyph
                # slots zeroed (mirrors sample_frames' frame_idx -1 row)
                cols["doc_id"].append(did)
                cols["page"].append(0)
                cols["glyph_id"].append(0)
                cols["ch"].append("")
                for c in ("x0", "y0", "x1", "y1"):
                    cols[c].append(0.0)
                cols["error"].append(err)
                continue
            for gid, (page, ch, x0, y0, x1, y1) in enumerate(rows):
                cols["doc_id"].append(did)
                cols["page"].append(page)
                cols["glyph_id"].append(gid)
                cols["ch"].append(ch)
                cols["x0"].append(x0)
                cols["y0"].append(y0)
                cols["x1"].append(x1)
                cols["y1"].append(y1)
                cols["error"].append(None)
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[n], schema.field(n).type) for n in schema.names],
            schema=schema,
        )


def pdf_to_glyphs(docs: DataFrame) -> DataFrame:
    """(doc_id, pdf binary) -> glyph rows in content-stream order (P8 ids).

    Unparseable documents yield ONE sentinel row carrying the taxonomy code
    (``error`` column; P1-P7 codes), never an exception.  Zero-shuffle:
    each scan task parses its own documents."""
    return docs.select("doc_id", "pdf").mapInArrow(
        _glyph_batches, PDF_GLYPHS_SCHEMA
    )


def _page_text_batches(batches):
    import pyarrow as pa

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("page", pa.int32()),
            ("text", pa.string()),
            ("error", pa.string()),
        ]
    )
    for batch in batches:
        ids = batch.column(batch.schema.get_field_index("doc_id")).to_pylist()
        pdfs = batch.column(batch.schema.get_field_index("pdf")).to_pylist()
        cols = {name: [] for name in schema.names}
        for did, payload in zip(ids, pdfs):
            rows, err = pdf_glyphs(payload)
            if err is not None:
                cols["doc_id"].append(did)
                cols["page"].append(0)
                cols["text"].append("")
                cols["error"].append(err)
                continue
            # rows arrive page-contiguous (content-stream order), so page
            # slicing is a single linear scan — no sort, no grouping shuffle
            start = 0
            for i in range(1, len(rows) + 1):
                if i == len(rows) or rows[i][0] != rows[start][0]:
                    chunk = rows[start:i]
                    cols["doc_id"].append(did)
                    cols["page"].append(chunk[0][0])
                    cols["text"].append(
                        page_text(
                            np.array([r[1] for r in chunk], dtype=object),
                            np.array([r[2] for r in chunk]),
                            np.array([r[3] for r in chunk]),
                            np.array([r[4] for r in chunk]),
                            np.array([r[5] for r in chunk]),
                        )
                    )
                    cols["error"].append(None)
                    start = i
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[n], schema.field(n).type) for n in schema.names],
            schema=schema,
        )


def pdf_to_page_text(docs: DataFrame) -> DataFrame:
    """The fused engine-A front door: PDF bytes -> glyphs -> XY-cut
    reading-order text (L1-L4) in ONE Python pass — the intermediate glyph
    table never crosses the JVM<->Python channel (the same argument as the
    layout branch's pyscan path: the channel, not the kernel, is the cost).
    Output rows: (doc_id, page, text, error); error docs yield one
    sentinel row with page 0 and empty text."""
    return docs.select("doc_id", "pdf").mapInArrow(
        _page_text_batches, PDF_PAGE_TEXT_SCHEMA
    )


PDF_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_pages", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _doc_batches(batches):
    import pyarrow as pa

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("n_pages", pa.int32()),
            ("error", pa.string()),
        ]
    )
    for batch in batches:
        ids = batch.column(batch.schema.get_field_index("doc_id")).to_pylist()
        pdfs = batch.column(batch.schema.get_field_index("pdf")).to_pylist()
        cols = {name: [] for name in schema.names}
        for did, payload in zip(ids, pdfs):
            rows, err = pdf_glyphs(payload)
            if err is not None:
                cols["doc_id"].append(did)
                cols["text"].append("")
                cols["n_pages"].append(0)
                cols["error"].append(err)
                continue
            texts = []
            start = 0
            for i in range(1, len(rows) + 1):
                if i == len(rows) or rows[i][0] != rows[start][0]:
                    chunk = rows[start:i]
                    texts.append(
                        page_text(
                            np.array([r[1] for r in chunk], dtype=object),
                            np.array([r[2] for r in chunk]),
                            np.array([r[3] for r in chunk]),
                            np.array([r[4] for r in chunk]),
                            np.array([r[5] for r in chunk]),
                        )
                    )
                    start = i
            cols["doc_id"].append(did)
            cols["text"].append("\n".join(texts))
            cols["n_pages"].append(len(texts))
            cols["error"].append(None)
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[n], schema.field(n).type) for n in schema.names],
            schema=schema,
        )


def pdf_doc_records(docs: DataFrame) -> DataFrame:
    """(doc_id, pdf) -> ONE row per document: assembled reading-order text
    (pages joined with \\n — the layout-branch assembly convention,
    ``pages_to_doc_text``), page count, and the E6 error channel.  The
    whole chain — parse, per-page XY-cut, document assembly — runs in a
    single zero-Exchange Python pass (pages of one doc are already
    together, so the assembly groupBy the glyph branch needs does not
    exist here).  This is the transform the resumable pipeline runs for a
    PDF corpus (jobs/extract_job.py --format pdf)."""
    return docs.select("doc_id", "pdf").mapInArrow(_doc_batches, PDF_DOC_SCHEMA)
