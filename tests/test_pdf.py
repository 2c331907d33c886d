"""PDF byte layer: stdlib parser (functions/pdf.py P1-P8) vs the fixture
generator's composed files — two independent code paths, byte-identical
goldens (the PNG/WAV/MP4 playbook applied to the reference's titular
format, reference src/app/page.tsx:444-452)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_spark.fixtures import generator as gen
from ocr_spark.functions import pdf as pdfmod
from ocr_spark.functions.layout import page_text
from ocr_spark.functions.pdf import pdf_glyphs


# ---------------------------------------------------------------------------
# the two width-table copies must agree (neither side may drift alone)
# ---------------------------------------------------------------------------
def test_width_tables_agree():
    assert gen._PDF_HELV_WIDTHS == pdfmod.HELVETICA_WIDTHS
    for ch in "axM ":
        assert gen._pdf_w("Courier", ch) == pdfmod.COURIER_WIDTHS.get(ch) == 600


# ---------------------------------------------------------------------------
# round trip: generator-composed files parse back bit-identically
# ---------------------------------------------------------------------------
def test_roundtrip_glyphs_and_text_bit_identical():
    rng = random.Random("pdf-roundtrip")
    n_ok = n_err = 0
    for d in range(120):
        pdf, grows, trows, err = gen.gen_pdf_doc(rng, d)
        rows, kerr = pdf_glyphs(pdf)
        if err is not None:
            assert kerr == err
            assert rows == []
            n_err += 1
            continue
        assert kerr is None
        n_ok += 1
        krows = [
            (p, i, ch, x0, y0, x1, y1)
            for i, (p, ch, x0, y0, x1, y1) in enumerate(rows)
        ]
        assert krows == grows  # bit-identical floats, P7 pinned arithmetic
        pages: dict[int, list] = {}
        for p, ch, x0, y0, x1, y1 in rows:
            pages.setdefault(p, []).append((ch, x0, y0, x1, y1))
        for p, text in trows:
            g = pages[p]
            kt = page_text(
                np.array([r[0] for r in g], dtype=object),
                np.array([r[1] for r in g]),
                np.array([r[2] for r in g]),
                np.array([r[3] for r in g]),
                np.array([r[4] for r in g]),
            )
            assert kt == text
    assert n_ok > 60 and n_err > 5  # both populations exercised


# ---------------------------------------------------------------------------
# error taxonomy (P1-P7): each failure class recorded, never raised
# ---------------------------------------------------------------------------
def _minimal_pdf(content: bytes = b"BT /F1 10 Tf 72 700 Td (hi) Tj ET") -> bytes:
    rng = random.Random(0)
    return gen._pdf_build_file(
        rng, [content], inherited_attrs=True, nested_tree=False
    )


def test_error_not_pdf():
    assert pdf_glyphs(b"") == ([], "not_pdf")
    assert pdf_glyphs(None) == ([], "not_pdf")
    assert pdf_glyphs(b"\x00\x01garbage") == ([], "not_pdf")


def test_error_truncation_sweep_never_raises():
    pdf = _minimal_pdf()
    rows, err = pdf_glyphs(pdf)
    assert err is None and rows
    for cut in range(1, len(pdf), 7):
        trows, terr = pdf_glyphs(pdf[:cut])
        assert (terr is None) or terr in pdfmod.ERROR_CODES
        if cut < len(pdf) - 20:  # xref/trailer gone or mangled
            assert terr is not None


def test_error_bad_xref_offset():
    pdf = _minimal_pdf()
    i = pdf.rindex(b"startxref")
    j = pdf.index(b"\n", i) + 1
    k = pdf.index(b"\n", j)
    bad = pdf[:j] + b"1" + pdf[j:k] + pdf[k:]
    assert pdf_glyphs(bad)[1] == "bad_xref"


def test_error_unsupported_filter_and_bad_stream():
    rng = random.Random(1)
    lzw = gen._pdf_build_file(
        rng, [b"BT ET"], inherited_attrs=True, nested_tree=False,
        filter_override="LZWDecode",
    )
    assert pdf_glyphs(lzw)[1] == "unsupported_filter"
    bad = gen._pdf_build_file(
        rng, [b"BT ET"], inherited_attrs=True, nested_tree=False,
        corrupt_flate=True,
    )
    assert pdf_glyphs(bad)[1] == "bad_stream"


def test_error_content_taxonomy():
    cases = {
        b"BT (x) Tj ET": "missing_font",  # show with no font set
        b"BT /F9 10 Tf (x) Tj ET": "missing_font",  # not in /Resources
        b"BT /F2 10 Tf 72 700 Td (\\351) Tj ET": "missing_width",  # Helv é
        b"BT /F1 10 Tf 100 Tz (x) Tj ET": "bad_content",  # unsupported op
        b"BT /F1 10 Tf 2 0 0 2 72 700 Tm (x) Tj ET": "bad_content",  # scale
        b"BT /F1 10 Tf [(a) /oops] TJ ET": "bad_content",
    }
    for content, code in cases.items():
        assert pdf_glyphs(_minimal_pdf(content))[1] == code, content


def test_error_page_tree():
    pdf = _minimal_pdf()
    broken = pdf.replace(b"/Type /Pages", b"/Type /Wrong", 1)
    assert pdf_glyphs(broken)[1] == "bad_page_tree"


# ---------------------------------------------------------------------------
# parser features: hex strings, escapes, TJ kerns, inheritance, T*/'
# ---------------------------------------------------------------------------
def test_hex_and_octal_strings_equivalent():
    lit = _minimal_pdf(b"BT /F1 10 Tf 72 700 Td (ab\\143) Tj ET")
    hexs = _minimal_pdf(b"BT /F1 10 Tf 72 700 Td <61 62 63> Tj ET")
    r1, e1 = pdf_glyphs(lit)
    r2, e2 = pdf_glyphs(hexs)
    assert e1 is None and e2 is None
    assert r1 == r2
    assert "".join(r[1] for r in r1) == "abc"


def test_tj_kern_moves_pen():
    base = _minimal_pdf(b"BT /F1 10 Tf 72 700 Td [(ab)] TJ ET")
    kern = _minimal_pdf(b"BT /F1 10 Tf 72 700 Td [(a) -100 (b)] TJ ET")
    rb, _ = pdf_glyphs(base)
    rk, _ = pdf_glyphs(kern)
    # -100 units at size 10 -> +1.0 pt
    assert rk[1][2] == rb[1][2] + 100.0 * 10.0 / 1000.0


def test_quote_and_tstar_line_advance():
    content = b"BT /F1 10 Tf 14 TL 72 700 Td (one) Tj T* (two) Tj (tri) ' ET"
    rows, err = pdf_glyphs(_minimal_pdf(content))
    assert err is None
    ys = sorted({r[5] for r in rows})  # y1 = y_top per line (top-down)
    assert len(ys) == 3
    assert ys[1] - ys[0] == pytest.approx(14.0)
    assert ys[2] - ys[1] == pytest.approx(14.0)


def test_helvetica_proportional_advance():
    rows, err = pdf_glyphs(_minimal_pdf(b"BT /F2 10 Tf 72 700 Td (il) Tj ET"))
    assert err is None
    i_row, l_row = rows
    assert i_row[1] == "i" and l_row[1] == "l"
    # same form as the kernel's accumulation (x = x + adv), not a
    # subtraction (which reorders the float op and fails on the last ulp)
    assert l_row[2] == i_row[2] + 222 * 10.0 / 1000.0


# ---------------------------------------------------------------------------
# Spark operators over the fixture tier (tiny): oracle-shaped assertions
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pdf_tables(spark, tiny_dir):
    docs = spark.read.parquet(f"{tiny_dir}/pdf_docs.parquet")
    return docs, tiny_dir


def test_spark_pdf_glyphs_match_golden(spark, pdf_tables):
    from ocr_spark.operators.pdf_ops import pdf_to_glyphs

    docs, tiny_dir = pdf_tables
    got = (
        pdf_to_glyphs(docs)
        .filter(F.col("error").isNull())
        .drop("error")
        .toPandas()
        .sort_values(["doc_id", "glyph_id"])
        .reset_index(drop=True)
    )
    want = (
        spark.read.parquet(f"{tiny_dir}/golden_pdf_glyphs.parquet")
        .toPandas()
        .sort_values(["doc_id", "glyph_id"])
        .reset_index(drop=True)
    )
    got["page"] = got["page"].astype("int32")
    assert got.equals(want[got.columns.tolist()])


def test_spark_pdf_errors_match_golden(spark, pdf_tables):
    from ocr_spark.operators.pdf_ops import pdf_to_glyphs

    docs, tiny_dir = pdf_tables
    got = dict(
        pdf_to_glyphs(docs)
        .groupBy("doc_id")
        .agg(F.max("error").alias("error"))
        .collect()
    )
    want = dict(
        spark.read.parquet(f"{tiny_dir}/golden_pdf_errors.parquet").collect()
    )
    assert got == want


def test_spark_pdf_page_text_matches_golden_and_composed(spark, pdf_tables):
    """Fused pdf_to_page_text == golden text == composed
    (pdf_to_glyphs -> glyphs_to_page_text) — the end-to-end engine-A
    front door from raw bytes."""
    from ocr_spark.operators.layout_ops import glyphs_to_page_text
    from ocr_spark.operators.pdf_ops import pdf_to_glyphs, pdf_to_page_text

    docs, tiny_dir = pdf_tables
    fused = {
        (r["doc_id"], r["page"]): r["text"]
        for r in pdf_to_page_text(docs).filter(F.col("error").isNull()).collect()
    }
    golden = {
        (r["doc_id"], r["page"]): r["text"]
        for r in spark.read.parquet(f"{tiny_dir}/golden_pdf_text.parquet").collect()
    }
    assert fused == golden
    composed = {
        (r["doc_id"], r["page"]): r["text"]
        for r in glyphs_to_page_text(
            pdf_to_glyphs(docs).filter(F.col("error").isNull()).drop("error"),
            clustered_input=True,
        ).collect()
    }
    assert composed == golden


def test_pdf_chain_plan_is_exchange_free(spark, pdf_tables):
    """The fused front door must stay a zero-Exchange scan->mapInArrow
    plan (the same shape as the html extraction branch)."""
    from ocr_spark.operators.pdf_ops import pdf_to_page_text

    docs, _ = pdf_tables
    plan = pdf_to_page_text(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fixture_coverage_guard(spark, small_dir):
    """Fixture coverage guard at the ORACLE tier (small, 150 docs): Flate
    AND raw content streams, classic AND xref-stream layouts, ObjStm
    packing, the PNG predictor, incremental updates, and at least 4 error
    kinds must all be exercised — otherwise parser paths silently lose
    coverage."""
    docs = spark.read.parquet(f"{small_dir}/pdf_docs.parquet")
    payloads = [bytes(r["pdf"]) for r in docs.collect()]
    n_flate = sum(b"/Filter /FlateDecode" in p for p in payloads)
    assert 0 < n_flate < len(payloads)
    assert any(b"/Type /XRef" in p for p in payloads)
    assert any(b"/Type /ObjStm" in p for p in payloads)
    assert any(b"/Predictor 12" in p for p in payloads)
    assert any(p.count(b"startxref") > 1 for p in payloads)
    errors = {
        r["error"]
        for r in spark.read.parquet(f"{small_dir}/golden_pdf_errors.parquet").collect()
        if r["error"]
    }
    assert len(errors) >= 4, errors


def test_pdf_attendance_end_to_end(spark, tiny_dir):
    """The reference's actual workflow from its titular format: PDF bytes
    -> parse -> glyphs -> XY-cut reading order -> label-anchored fields ==
    the attendance golden (four chained stages, byte-identity)."""
    from pyspark.sql import functions as FF

    from ocr_spark.operators.attendance import attendance_records
    from ocr_spark.operators.layout_ops import (
        glyphs_to_page_text,
        pages_to_doc_text,
    )
    from ocr_spark.operators.pdf_ops import pdf_to_glyphs

    pdfs = spark.read.parquet(f"{tiny_dir}/attendance_pdfs.parquet")
    glyphs = pdf_to_glyphs(pdfs).filter(FF.col("error").isNull()).drop("error")
    doc_text = pages_to_doc_text(glyphs_to_page_text(glyphs, clustered_input=True))
    keyed = doc_text.join(pdfs.select("doc_id", "url"), "doc_id").select("url", "text")
    got = {
        r["url"]: (
            r["fields"]["classe"],
            r["fields"]["nombre_des_présents"],
            len(r["fields"]["présences"]),
        )
        for r in attendance_records(keyed, text_col="text").collect()
    }
    want = {
        r["url"]: (r["classe"], r["nombre_des_présents"], len(r["présences"]))
        for r in spark.read.parquet(f"{tiny_dir}/golden_attendance.parquet").collect()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# incremental updates (/Prev chains, P2)
# ---------------------------------------------------------------------------
def test_incremental_update_newest_entry_wins():
    """An incremental doc must show the UPDATED content; the base portion
    alone (file cut at the first %%EOF — exactly what an un-updated reader
    would have seen) must show the stale draft."""
    rng = random.Random("incr")
    for d in range(200):
        pdf, grows, trows, err = gen.gen_pdf_doc(rng, d)
        if err is None and pdf.count(b"startxref") > 1:
            break
    else:
        pytest.fail("no incremental doc generated in 200 draws")
    full_rows, e = pdf_glyphs(pdf)
    assert e is None
    base = pdf[: pdf.index(b"%%EOF") + 5]
    base_rows, eb = pdf_glyphs(base)
    assert eb is None
    full_text = "".join(r[1] for r in full_rows)
    base_text = "".join(r[1] for r in base_rows)
    assert "draftpendingreplacement" in base_text.replace(" ", "")
    assert "draftpendingreplacement" not in full_text.replace(" ", "")
    # and the full parse equals the golden (update content mirrored)
    krows = [(p, i, ch, x0, y0, x1, y1) for i, (p, ch, x0, y0, x1, y1) in enumerate(full_rows)]
    assert krows == grows


def test_prev_chain_loop_is_bad_xref():
    pdf = _minimal_pdf()
    i = pdf.rindex(b"startxref")
    off = int(pdf[i + len(b"startxref") : pdf.index(b"%%EOF", i)].strip())
    looped = pdf.replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R /Prev " + str(off).encode() + b" >>", 1
    )
    assert pdf_glyphs(looped)[1] == "bad_xref"


def test_mutation_fuzz_never_raises_and_tail_preserved():
    """Byte-flip mutations that PRESERVE the xref/trailer tail (so parsing
    reaches the object/content layers, unlike the truncation sweep) must
    always land in the error channel or parse cleanly — never raise."""
    rng = random.Random("fuzz")
    pdf, grows, trows, err = gen.gen_pdf_doc(random.Random("fuzz-doc"), 1)
    assert err is None
    tail_start = pdf.rindex(b"xref")
    for trial in range(300):
        b = bytearray(pdf)
        for _ in range(rng.randint(1, 6)):
            i = rng.randrange(tail_start)  # mutate the body only
            b[i] = rng.randrange(256)
        rows, code = pdf_glyphs(bytes(b))
        assert code is None or code in pdfmod.ERROR_CODES, code
    # content-layer type confusion specifically (operand of the wrong
    # type reaching an operator) must be recorded, not raised
    bad_contents = [
        b"BT /F1 10 Tf 5 Tj ET",          # number shown as a string
        b"BT /F1 10 Tf (x) (y) Td (z) Tj ET",  # strings fed to Td
        b"BT (s) 10 Tf (z) Tj ET",        # string font name operand
        b"BT /F1 10 Tf [(a) (b) 5 <41>] TJ T* ET",  # T* with no leading set is fine; junk TJ ok
    ]
    for content in bad_contents:
        rows, code = pdf_glyphs(_minimal_pdf(content))
        assert code is None or code in pdfmod.ERROR_CODES, (content, code)


# ---------------------------------------------------------------------------
# PDF 1.5: xref streams + object streams (P2/P3)
# ---------------------------------------------------------------------------
def test_xref_stream_layouts_parse_identically():
    """The same page content through every file layout — classic table,
    xref stream, +ObjStm packing, +PNG-Up predictor — must yield the
    identical glyph table (the layout is transport, never semantics)."""
    content = b"BT /F1 10 Tf 72 700 Td (layout invariance) Tj ET"
    variants = []
    for xrs, objstm, pred in (
        (False, False, False),
        (True, False, False),
        (True, True, False),
        (True, True, True),
        (True, False, True),
    ):
        pdf = gen._pdf_build_file(
            random.Random(9), [content], inherited_attrs=True,
            nested_tree=False, xref_stream=xrs, use_objstm=objstm,
            xref_predictor=pred,
        )
        rows, err = pdf_glyphs(pdf)
        assert err is None, (xrs, objstm, pred, err)
        variants.append(rows)
    assert all(v == variants[0] for v in variants[1:])
    assert "".join(r[1] for r in variants[0]) == "layoutinvariance"


def test_xref_stream_corruption_is_bad_xref():
    pdf = gen._pdf_build_file(
        random.Random(3), [b"BT /F1 10 Tf 72 700 Td (x) Tj ET"],
        inherited_attrs=True, nested_tree=False,
        xref_stream=True, use_objstm=True, xref_predictor=True,
    )
    # corrupt the xref stream's Flate payload (keyword search must not
    # land inside 'endstream': anchor on the dict-close + keyword)
    x = pdf.index(b"/Type /XRef")
    i = pdf.index(b">>\nstream\n", x) + len(b">>\nstream\n")
    bad = pdf[:i] + b"\x00\x00" + pdf[i + 2 :]
    assert pdf_glyphs(bad)[1] == "bad_xref"
    # corrupting the ObjStm's payload must land in the error channel too
    j = pdf.index(b"/Type /ObjStm")
    k = pdf.index(b">>\nstream\n", j) + len(b">>\nstream\n")
    bad2 = pdf[:k] + b"\x00\x00" + pdf[k + 2 :]
    code = pdf_glyphs(bad2)[1]
    assert code in ("bad_stream", "bad_obj", "bad_xref"), code


# ---------------------------------------------------------------------------
# token-layer properties (hypothesis): generator encoders vs kernel lexer
# ---------------------------------------------------------------------------
def test_literal_string_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=64), st.integers(0, 2**31))
    def prop(data, seed):
        tok = gen._pdf_lit(data, random.Random(seed))
        lx = pdfmod._Lexer(tok.encode("latin-1"))
        assert lx.value() == data
        assert lx.pos == len(tok)

    prop()


def test_hex_string_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=64))
    def prop(data):
        lx = pdfmod._Lexer(b"<" + data.hex().encode() + b">")
        assert lx.value() == data

    prop()


def test_number_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12)
    )
    def prop(v):
        tok = gen._pdf_num(v)
        lx = pdfmod._Lexer(tok.encode("latin-1"))
        parsed = lx.value()
        assert float(parsed) == v  # exact round trip (repr or int form)

    prop()


def test_unpredict_inverts_forward_filters_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(st.binary(min_size=7, max_size=7 * 40).filter(lambda b: len(b) % 7 == 0),
           st.integers(0, 2**31))
    def prop(raw, seed):
        rng = random.Random(seed)
        cols = 7
        out = bytearray()
        prior = bytes(cols)
        for i in range(0, len(raw), cols):
            cur = raw[i : i + cols]
            if rng.random() < 0.3:
                out += b"\x00" + cur
            else:
                out += b"\x02" + bytes((cur[j] - prior[j]) & 0xFF for j in range(cols))
            prior = cur
        assert pdfmod._unpredict(bytes(out), 12, cols) == raw

    prop()


def test_pdf_pipeline_resumable(spark, tiny_dir, tmp_path):
    """The PDF front door through the RESUMABLE production pipeline
    (extract_job --format pdf shape): crash after 2 bucket groups, rerun,
    final table equals the golden doc-text assembly exactly-once."""
    from ocr_spark.operators.pdf_ops import pdf_doc_records
    from ocr_spark.plans.pipeline import ExtractionPipeline
    from ocr_spark.sources.icelite import IceliteTable

    docs = spark.read.parquet(f"{tiny_dir}/pdf_docs.parquet")
    out = IceliteTable(str(tmp_path / "pdf_table"), key_col="doc_id", n_buckets=8)
    pipe = ExtractionPipeline(
        out, n_buckets=8, group_size=2, key_col="doc_id", transform=pdf_doc_records
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe.run(docs, fail_after_groups=2)
    n_before = len(out.committed_groups())
    assert 0 < n_before <= 2
    stats = pipe.run(docs)  # resume: only the remaining groups
    assert stats["groups"] == 4 - n_before
    assert len(out.committed_groups()) == 4
    got = {
        r["doc_id"]: (r["text"], r["error"])
        for r in out.read(spark).select("doc_id", "text", "error").collect()
    }
    golden_pages = {}
    for r in spark.read.parquet(f"{tiny_dir}/golden_pdf_text.parquet").collect():
        golden_pages.setdefault(r["doc_id"], []).append((r["page"], r["text"]))
    want = {}
    for r in spark.read.parquet(f"{tiny_dir}/golden_pdf_errors.parquet").collect():
        if r["error"] is not None:
            want[r["doc_id"]] = ("", r["error"])
        else:
            pages = sorted(golden_pages[r["doc_id"]])
            want[r["doc_id"]] = ("\n".join(t for _, t in pages), None)
    assert got == want
    # idempotent rerun: nothing left to do
    again = pipe.run(docs)
    assert again["groups"] == 0


def test_pdf_streaming_ingest(spark, tiny_dir, tmp_path):
    """Streaming PDF ingestion (readStream -> pdf_doc_records ->
    foreachBatch MERGE, availableNow): the drained table's end state must
    equal the batch operator over the same files (the fixpoint-oracle
    pattern of stream_extract_state, applied to the PDF front door)."""
    from pyspark.sql import functions as FF

    from ocr_spark.operators.pdf_ops import pdf_doc_records
    from ocr_spark.sources.icelite import IceliteTable
    from ocr_spark.streaming.extract_stream import run_stream_once

    docs = spark.read.parquet(f"{tiny_dir}/pdf_docs.parquet")
    inp = str(tmp_path / "in")
    docs.repartition(6).write.parquet(inp)
    out = IceliteTable(str(tmp_path / "table"), key_col="doc_id", n_buckets=8)
    n = run_stream_once(
        spark, inp, out, str(tmp_path / "ckpt"),
        schema="doc_id long, pdf binary", transform=pdf_doc_records,
    )
    assert n == docs.count()
    got = {
        r["doc_id"]: (r["text"], r["n_pages"], r["error"])
        for r in out.read(spark).collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["n_pages"], r["error"])
        for r in pdf_doc_records(docs).collect()
    }
    assert got == want


def test_resource_bounds_zlib_bomb_and_oversize():
    """A zlib bomb in a content stream costs one error row (bounded
    inflation), never memory; an oversized payload is rejected up front —
    the html branch's DOC_TOO_LARGE discipline applied to PDFs."""
    import zlib as _zlib

    # bomb: ~4 KB compressing to 16 MB of content-stream bytes
    bomb = _zlib.compress(b"BT ET " + b"\0" * (16 << 20))
    pdf = gen._pdf_build_file(
        random.Random(5), [b"BT ET"], inherited_attrs=True, nested_tree=False
    )
    # graft the bomb in as the content stream of a handmade minimal file
    objs = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
    )
    c = (
        f"4 0 obj\n<< /Length {len(bomb)} /Filter /FlateDecode >>\nstream\n".encode()
        + bomb
        + b"\nendstream\nendobj\n"
    )
    p3 = b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    f5 = b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\nendobj\n"
    body = objs + p3 + c + f5
    offs = {n: body.index(f"{n} 0 obj".encode()) for n in (1, 2, 3, 4, 5)}
    xref_off = len(body)
    xref = b"xref\n0 6\n0000000000 65535 f \n" + b"".join(
        f"{offs[n]:010d} 00000 n \n".encode() for n in (1, 2, 3, 4, 5)
    )
    tail = f"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n{xref_off}\n%%EOF".encode()
    bombed = body + xref + tail
    rows, err = pdf_glyphs(bombed, max_stream_bytes=1 << 20)
    assert (rows, err) == ([], "stream_too_large")
    # with a roomy bound the same file parses (empty page, no glyphs)
    rows2, err2 = pdf_glyphs(bombed, max_stream_bytes=32 << 20)
    assert err2 is None and rows2 == []
    # payload-size cap
    assert pdf_glyphs(pdf, max_bytes=100) == ([], "doc_too_large")
    assert pdf_glyphs(pdf)[1] is None


def test_empty_shapes_and_glyphless_pages(spark):
    """Edge shapes: an empty input relation, a doc whose page draws no
    glyphs (BT ET), and a zero-page tree — all flow through the operators
    without rows or exceptions (glyphless pages are invisible to the
    assembly: there is no text to place)."""
    from ocr_spark.operators.pdf_ops import (
        pdf_doc_records,
        pdf_to_glyphs,
        pdf_to_page_text,
    )

    empty = spark.createDataFrame([], "doc_id long, pdf binary")
    assert pdf_to_glyphs(empty).count() == 0
    assert pdf_to_page_text(empty).count() == 0
    assert pdf_doc_records(empty).count() == 0

    blank = gen._pdf_build_file(
        random.Random(2), [b"BT ET"], inherited_attrs=True, nested_tree=False
    )
    rows, err = pdf_glyphs(blank)
    assert (rows, err) == ([], None)
    one = spark.createDataFrame(
        [(7, bytearray(blank))], "doc_id long, pdf binary"
    )
    recs = pdf_doc_records(one).collect()
    assert len(recs) == 1
    assert (recs[0]["text"], recs[0]["n_pages"], recs[0]["error"]) == ("", 0, None)
