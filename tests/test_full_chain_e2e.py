"""Capstone integration: the WHOLE engine as one production pipeline.

extract (icelite merge, bucket groups) -> corpus-cleaning CLI (line
cleanup pre-stages, rule battery, exact + near dedup with a persisted
signature table) -> maintenance (compact, expire, orphan GC) — asserting
committed state at every stage boundary.  Each job is tested on its own
elsewhere; this pins the HANDOFFS (schemas, table layouts, exit-free
happy path) that individual tests cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.sources.icelite import IceliteTable


def test_full_production_chain(spark, tiny_dir, tmp_path):
    from jobs.dedup_job import main as dedup_main
    from jobs.maintenance import main as maint_main
    from ocr_spark.plans.pipeline import ExtractionPipeline

    # ---- stage 1: extraction into an icelite table -----------------------
    pages = spark.read.parquet(f"{tiny_dir}/pages.parquet")
    out = IceliteTable(str(tmp_path / "extracted"), key_col="url", n_buckets=16)
    ExtractionPipeline(out, n_buckets=16, group_size=4).run(pages, spark=spark)
    extracted = out.read(spark)
    n_pages = pages.count()
    assert extracted.count() == n_pages  # exactly-once per url

    # ---- stage 2: extracted text -> documents -> cleaning CLI ------------
    # deterministic doc ids from the url (the chain's key handoff); only
    # clean docs enter the corpus, mirroring a production feed
    docs = (
        extracted.filter(F.col("error").isNull())
        .select(F.xxhash64("url").alias("doc_id"), "text")
    )
    assert docs.select("doc_id").distinct().count() == docs.count()
    docs_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(docs_path)

    kept_root = str(tmp_path / "kept")
    stats = dedup_main(
        [
            "--input", docs_path,
            "--output", kept_root,
            "--audit", str(tmp_path / "audit"),
            "--signatures", str(tmp_path / "sigs"),
            "--near-dedup",
            "--min-chars", "30",
            "--strip-boilerplate", "5",
            "--dedup-doc-lines",
            "--redact-pii",
            "--buckets", "4",
        ]
    )
    assert 0 < stats["docs_kept"] <= stats["docs_in"] == docs.count()
    assert sum(stats["reasons"].values()) == stats["docs_in"]

    # ---- stage 3: maintenance over the kept table -------------------------
    # (no --buckets: the job must adopt the table's frozen layout itself)
    maint = maint_main(
        ["--table", kept_root, "--compact", "--expire-keep", "1", "--gc-orphans"]
    )
    assert maint["rows"] == stats["docs_kept"]

    # content survives maintenance byte-for-byte and text is CLEANED
    kept = IceliteTable(kept_root, key_col="doc_id", n_buckets=4).read(spark)
    assert kept.count() == stats["docs_kept"]
    assert kept.filter(F.col("text").rlike(r"[\w.+-]+@[\w.-]+\.\w{2,}")).count() == 0
