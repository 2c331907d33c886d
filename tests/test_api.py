"""Reference-parity facade: each reference flow as one call."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.api import (
    append_records,
    export_json,
    extract_records,
    summarize,
    upsert_wide_rows,
)
from ocr_spark.sources.icelite import IceliteTable


@pytest.fixture(scope="module")
def recs(spark, tiny_dir):
    docs = spark.read.parquet(f"{tiny_dir}/attendance_docs.parquet")
    return extract_records(doc_texts=docs).cache()


def test_extract_records_dispatch(spark, tiny_dir, recs):
    pages = spark.read.parquet(f"{tiny_dir}/pages.parquet")
    assert extract_records(pages).count() == 100
    assert recs.count() == 50
    glyphs = spark.read.parquet(f"{tiny_dir}/attendance_glyphs.parquet")
    doc_map = spark.read.parquet(f"{tiny_dir}/attendance_glyph_docs.parquet")
    assert extract_records(glyphs=glyphs, glyph_doc_map=doc_map).count() == 50
    with pytest.raises(ValueError):
        extract_records(pages, doc_texts=pages)
    with pytest.raises(ValueError):
        extract_records(glyphs=glyphs)


def test_upsert_wide_rows_idempotent(spark, recs, tmp_path):
    t = IceliteTable(str(tmp_path / "sheet"), key_col="url", n_buckets=4)
    upsert_wide_rows(recs, t)
    n1 = t.row_count()
    upsert_wide_rows(recs, t)  # re-save same keys: replaced, not duplicated
    assert t.row_count() == n1
    # wide-row law: one row per student, or one empty row
    want = recs.select(
        F.sum(F.greatest(F.size("fields.présences"), F.lit(1))).alias("n")
    ).first()["n"]
    assert n1 == want


def test_append_and_summarize(spark, recs, tmp_path):
    t = IceliteTable(str(tmp_path / "mongo"), key_col="url", n_buckets=4)
    sid = append_records(recs, t)
    assert isinstance(sid, int)
    assert t.row_count() == 50
    s = summarize(recs).first()["summary"]
    assert "classe=" in s and "présents=" in s


def test_export_json(spark, recs, tmp_path):
    out = str(tmp_path / "json_out")
    export_json(recs.limit(5), out)
    lines = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            with open(os.path.join(out, fn)) as f:
                lines += [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 5
    parsed = json.loads(lines[0]["json_output"])
    assert set(parsed) == {
        "classe", "cours", "date", "nom_du_professeur",
        "nombre_des_présents", "salle_n", "séance", "présences",
    }


def test_extract_job_exit_codes(spark, tiny_dir, monkeypatch):
    """The job CLI maps the sink error taxonomy to distinct exit codes:
    2 = unreadable input, 3 = retryable commit conflict, 4 = schema drift."""
    from jobs.extract_job import main
    from ocr_spark.plans import pipeline as P
    from ocr_spark.sources.icelite import CommitConflictError, SchemaMismatchError

    inp = f"{tiny_dir}/pages.parquet"

    with pytest.raises(SystemExit) as e:
        main(["--input", "/nonexistent/nope.parquet", "--output", "/tmp/never"])
    assert e.value.code == 2

    def boom_conflict(self, pages, max_concurrent=1, spark=None):
        raise CommitConflictError("bucket 3 changed under a concurrent merge")

    monkeypatch.setattr(P.ExtractionPipeline, "run", boom_conflict)
    with pytest.raises(SystemExit) as e:
        main(["--input", inp, "--output", "/tmp/never"])
    assert e.value.code == 3

    def boom_schema(self, pages, max_concurrent=1, spark=None):
        raise SchemaMismatchError("missing columns ['text']")

    monkeypatch.setattr(P.ExtractionPipeline, "run", boom_schema)
    with pytest.raises(SystemExit) as e:
        main(["--input", inp, "--output", "/tmp/never"])
    assert e.value.code == 4


def test_extract_job_pdf_format(spark, tiny_dir, tmp_path, capsys):
    """extract_job --format pdf: the PDF front door through the resumable
    CLI lands one doc-text row per input document, rerun is a no-op."""
    from jobs.extract_job import main

    out = str(tmp_path / "pdf_out")
    stats = main(
        ["--input", f"{tiny_dir}/pdf_docs.parquet", "--format", "pdf",
         "--output", out, "--buckets", "8", "--group-size", "4"]
    )
    n_docs = spark.read.parquet(f"{tiny_dir}/pdf_docs.parquet").count()
    assert stats["docs"] == n_docs and stats["groups"] == 2
    again = main(
        ["--input", f"{tiny_dir}/pdf_docs.parquet", "--format", "pdf",
         "--output", out, "--buckets", "8", "--group-size", "4"]
    )
    assert again["groups"] == 0  # resume no-op
    tbl = IceliteTable(out, key_col="doc_id", n_buckets=8)
    assert tbl.read(spark).count() == n_docs
