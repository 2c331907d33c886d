"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric is the flagship extraction stage over the bench fixture
tier (~20k synthetic Common-Crawl-style pages, FIXTURES.md): wall-clock,
docs/sec, and MB/sec of html.  The queries dict adds per-operator timings
at the given scale factor.  Scaling-efficiency evidence (local[8] vs
local[32]) is produced by tools/scaling.py and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_spark.fixtures.generator import ensure_fixtures  # noqa: E402
from ocr_spark.operators.extract import extract_pages  # noqa: E402
from ocr_spark.session import build_session, default_parallelism  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

BENCH_QUERIES = [
    "dedup_exact",
    "minhash_pairs",
    "simhash_pairs",
    "token_stats",
    "quality",
    "lang_id",
    "topk_cosine",
    "topk_cosine_ivf",
    "embedding_dups",
    "ngram_jaccard",
    "agg_pricing",
    "join_topk_per_group",
    "sessionize",
    "asof_join",
    "broadcast_join_agg",
    "url_canonicalize",
    "corpus_filter_audit",
    "corpus_filter_near",
    "audio_meta",
    "audio_features",
    "video_meta",
    "frame_sample",
    "image_meta",
    "image_resize",
    "sample_deterministic",
    "decontaminate",
    "pack_sequences",
    "unigram_logprob",
    "repetition",
    "dedup_pipeline",
    "pii_redact",
    "boilerplate_lines",
    "dedup_lines",
    "mixture_sample",
]


# 10x tier for the shuffle-bound dedup/corpus family ONLY (r4 VERDICT
# item 6): at sf0.1 most of these run <1 s and fixed overheads drown plan
# differences (the r3->r4 cache artifacts hid in exactly that noise).  The
# headline stays sf0.1 for cross-round comparability.
SF1_QUERIES = [
    "dedup_exact",
    "minhash_pairs",
    "simhash_pairs",
    "ngram_jaccard",
    "embedding_dups",
    "dedup_pipeline",
    "decontaminate",
    "unigram_logprob",
    "repetition",
    "pack_sequences",
    "token_stats",
    "lang_id",
    "quality",
]


def ensure_sf1(sf_dir: str) -> str:
    """Deterministic 10x scale-up of the driver's documents/embeddings
    tables (no external data): copy 0 verbatim; copies 1-2 append a
    copy-tagged suffix (NEAR-dups of copy 0 — realistic template clusters
    the dedup family must price); copies 3-9 deterministically shuffle the
    word order per doc (same vocabulary, decorrelated shingles/grams) and
    perturb embeddings with seeded noise (decorrelated vectors).  Written
    under the gitignored fixtures/ data dir, rebuilt only when the
    manifest drifts."""
    import hashlib
    import random

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(repo, "fixtures", "sf1")
    man_path = os.path.join(out, "_MANIFEST.json")
    manifest = {"source": sf_dir, "copies": 10, "version": 1}
    expected = ["documents.parquet", "embeddings.parquet"]
    if os.path.exists(man_path):
        with open(man_path) as f:
            if json.load(f) == manifest and all(
                os.path.exists(os.path.join(out, e)) for e in expected
            ):
                return out
    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    cols = {n: docs[n].to_pylist() for n in docs.schema.names}
    big = {n: [] for n in docs.schema.names}
    for copy in range(10):
        off = copy * 100_000_000
        for i in range(docs.num_rows):
            text = cols["text"][i] or ""
            if copy == 0:
                pass
            elif copy <= 2:
                text = f"{text} copydup {copy}"
            else:
                words = text.split()
                random.Random(f"{copy}-{cols['doc_id'][i]}").shuffle(words)
                text = " ".join(words)
            big["doc_id"].append(cols["doc_id"][i] + off)
            big["text"].append(text)
            big["lang"].append(cols["lang"][i])
            big["source"].append(cols["source"][i])
            big["n_chars"].append(len(text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(big["doc_id"], pa.int64()),
                "text": big["text"],
                "lang": big["lang"],
                "source": big["source"],
                "n_chars": pa.array(big["n_chars"], pa.int64()),
            }
        ),
        os.path.join(out, "documents.parquet"),
        compression="zstd",
    )
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_ids = emb["vec_id"].to_pylist()
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    labels = emb["label"].to_pylist()
    out_ids, out_vecs, out_labels = [], [], []
    for copy in range(10):
        off = copy * 100_000_000
        if copy == 0:
            v = vecs
        elif copy <= 2:
            v = vecs  # verbatim copies: genuine near-dups (cosine 1.0)
        else:
            seed = int(hashlib.sha256(f"sf1-{copy}".encode()).hexdigest()[:8], 16)
            noise = np.random.default_rng(seed).standard_normal(vecs.shape)
            v = (vecs + noise.astype(np.float32)).astype(np.float32)
        out_ids.extend(i + off for i in vec_ids)
        out_vecs.extend(v.tolist())
        out_labels.extend(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(out_vecs, pa.list_(pa.float32())),
                "label": pa.array(out_labels, pa.int32()),
            }
        ),
        os.path.join(out, "embeddings.parquet"),
        compression="zstd",
    )
    with open(man_path, "w") as f:
        json.dump(manifest, f)
    return out


def run_extraction_bench(spark, bench_dir: str) -> dict:
    pages = spark.read.parquet(f"{bench_dir}/pages.parquet")
    n_docs, html_mb = [
        (r["n"], r["mb"])
        for r in pages.agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.length("html")) / 1e6).alias("mb"),
        ).collect()
    ][0]

    def run() -> tuple[float, int]:
        t0 = time.time()
        # force full extraction compute; aggregate instead of collecting text
        out = (
            extract_pages(pages)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum(F.length("text")).alias("chars"),
                F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errs"),
            )
            .collect()[0]
        )
        assert out["docs"] == n_docs
        return time.time() - t0, int(out["errs"])

    cold_sec, errs = run()  # spawns Python workers, compiles codegen
    # steady-state, best-of-2 (executors are long-lived on a real cluster;
    # the sandbox VM's wall-clock noise is ±20%)
    warm_sec = min(run()[0] for _ in range(2))
    return {
        "extract_sec": round(warm_sec, 3),
        "cold_sec": round(cold_sec, 3),
        "docs": int(n_docs),
        "html_mb": round(float(html_mb), 2),
        "docs_per_sec": round(n_docs / warm_sec, 1),
        "mb_per_sec": round(float(html_mb) / warm_sec, 2),
        "errors": errs,
    }


def run_layout_bench(spark, bench_dir: str) -> dict:
    """Engine-A branch: glyph boxes -> XY-cut reading-order page text
    (the north star's parallel PDF/scan segmentation path).  Measures the
    owned-table production path (r4): page-aligned row groups + pyarrow
    reads INSIDE the tasks — the glyph bytes never cross the JVM->Python
    row channel, whose per-row conversion (not the kernel, not the scan)
    dominated the branch through r3."""
    from ocr_spark.operators.layout_ops import glyphs_to_page_text_pyscan

    path = f"{bench_dir}/glyphs.parquet"
    glyphs = spark.read.parquet(path)
    n_glyphs = glyphs.count()

    def run() -> tuple[float, int]:
        t0 = time.time()
        out = (
            glyphs_to_page_text_pyscan(spark, path)
            .agg(F.count(F.lit(1)).alias("pages"), F.sum(F.length("text")).alias("chars"))
            .collect()[0]
        )
        return time.time() - t0, int(out["pages"])

    cold, n_pages = run()
    warm = min(run()[0] for _ in range(2))
    return {
        "layout_sec": round(warm, 3),
        "cold_sec": round(cold, 3),
        "glyphs": int(n_glyphs),
        "pages": n_pages,
        "pages_per_sec": round(n_pages / warm, 1),
        "glyphs_per_sec": round(n_glyphs / warm, 1),
    }


def run_pdf_bench(spark, bench_dir: str) -> dict:
    """Engine-A byte layer at the bench tier: raw PDF bytes -> glyphs ->
    XY-cut reading-order text, fused in one zero-Exchange Python pass
    (4000 multi-page documents).  Profiled composition (serial): ~8 ms/doc
    spread across the token lexer (~48%), glyph emission (~35%) and the
    object graph (~12%) — no single hot loop; the branch is
    document-parallel and two decimal orders above the reference's
    0.05-0.5 docs/s front door, so a vectorized show-string fast path is
    deliberately NOT taken (it would force a spec change to cumsum-form
    advance arithmetic for ~2x on a non-headline branch)."""
    from ocr_spark.operators.pdf_ops import pdf_to_page_text

    docs = spark.read.parquet(f"{bench_dir}/pdf_docs.parquet")
    n_docs, pdf_mb = [
        (r["n"], r["mb"])
        for r in docs.agg(
            F.count(F.lit(1)).alias("n"), (F.sum(F.length("pdf")) / 1e6).alias("mb")
        ).collect()
    ][0]

    def run() -> tuple[float, int]:
        t0 = time.time()
        out = (
            pdf_to_page_text(docs)
            .agg(
                F.count(F.lit(1)).alias("pages"),
                F.sum(F.length("text")).alias("chars"),
                F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errs"),
            )
            .collect()[0]
        )
        return time.time() - t0, int(out["pages"])

    cold, n_pages = run()
    warm = min(run()[0] for _ in range(2))
    return {
        "pdf_sec": round(warm, 3),
        "cold_sec": round(cold, 3),
        "docs": int(n_docs),
        "pdf_mb": round(float(pdf_mb), 2),
        "pages": n_pages,
        "docs_per_sec": round(n_docs / warm, 1),
        "pages_per_sec": round(n_pages / warm, 1),
        "mb_per_sec": round(float(pdf_mb) / warm, 2),
    }


def run_lineclean_bench(spark, bench_dir: str) -> dict:
    """Line-level cleanup at the bench corpus tier (120k planted-phenomena
    web-text docs): PII redaction (pure JVM regexp, scan-stage) and
    cross-doc boilerplate-line removal (map-side line DF + guarded
    broadcast anti-join + one reassembly shuffle)."""
    from ocr_spark.operators.corpus_ops import remove_boilerplate_lines
    from ocr_spark.operators.pii import redact_pii

    corpus = spark.read.parquet(f"{bench_dir}/corpus.parquet")
    n_docs = corpus.count()

    def run(df) -> float:
        # aggregate over the COMPUTED columns — a bare count(*) lets
        # Catalyst prune the regex/reassembly work entirely
        t0 = time.time()
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").alias("sa"),
            F.sum("b").alias("sb"),
        ).collect()
        return time.time() - t0

    pii_df = redact_pii(corpus).select(
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")).alias("a"),
        F.length("text_redacted").alias("b"),
    )
    boiler_df = remove_boilerplate_lines(corpus, min_doc_freq=5).select(
        F.col("n_removed").alias("a"), F.length("text_clean").alias("b")
    )
    run(pii_df)  # warm
    pii_sec = min(run(pii_df) for _ in range(2))
    run(boiler_df)
    boiler_sec = min(run(boiler_df) for _ in range(2))
    return {
        "docs": int(n_docs),
        "pii_sec": round(pii_sec, 3),
        "boiler_sec": round(boiler_sec, 3),
        "pii_docs_per_sec": round(n_docs / pii_sec, 1),
        "boiler_docs_per_sec": round(n_docs / boiler_sec, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = default_parallelism()
    bench_dir = ensure_fixtures("bench")
    spark = build_session("ocr-spark-bench", cores=cores)

    ext = run_extraction_bench(spark, bench_dir)
    lay = run_layout_bench(spark, bench_dir)
    pdf = run_pdf_bench(spark, bench_dir)
    lc = run_lineclean_bench(spark, bench_dir)

    qtimes: dict[str, float] = {
        "extract_bench": ext["extract_sec"],
        "layout_bench": lay["layout_sec"],
        "pdf_bench": pdf["pdf_sec"],
        "pii_redact_bench": lc["pii_sec"],
        "boilerplate_bench": lc["boiler_sec"],
    }
    qs = entry_mod.queries()
    # warm the pandas-eval Python workers too (arrow_udf and pandas udfs use
    # separate worker pools; executors are long-lived on a real cluster).
    # repartition so EVERY core's worker warms, not just one partition's.
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(4 * cores)
        .repartition(4 * cores)
    )
    from ocr_spark.operators.dedup import minhash_signatures
    from ocr_spark.operators.textstats_ops import with_lang_id

    with_lang_id(docs).count()
    minhash_signatures(docs).count()
    for name in BENCH_QUERIES:
        # best-of-2: the sandbox VM sees heavy neighbor steal (load>7 with
        # zero in-VM CPU use observed); a single shot can read 2-3x slow.
        # The noop sink forces EVERY output column — a bare count() lets
        # Catalyst prune projection-only operators down to a parquet scan
        # (the old loop's projection timings measured scan+count, not the
        # operator).  clearCache runs before EACH iteration: dedup
        # operators .cache() intermediates, and Spark's CacheManager
        # matches the identical rebuilt plan on iteration 2, so the old
        # once-per-query clear let the 'best' run skip the signature/LSH
        # work entirely.
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        qtimes[name] = round(best, 3)
        spark.catalog.clearCache()

    # 10x tier for the shuffle-bound family: single shot per query (these
    # run seconds-to-tens-of-seconds; the point is plan behavior under 10x
    # data, not microbenchmark noise), cache cleared per query
    sf1_dir = ensure_sf1(sf_dir)
    sf1_docs = spark.read.parquet(f"{sf1_dir}/documents.parquet").count()
    qtimes_sf1: dict[str, float] = {}
    for name in SF1_QUERIES:
        spark.catalog.clearCache()
        t0 = time.time()
        qs[name](spark, sf1_dir).write.format("noop").mode("overwrite").save()
        qtimes_sf1[name] = round(time.time() - t0, 3)
    spark.catalog.clearCache()

    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", "")) if base.startswith("sf") else sf_dir
    except ValueError:  # non-numeric dir name: report the path, not a crash
        sf = sf_dir
    print(
        json.dumps(
            {
                "metric": "flagship extraction wall-clock over the bench pages tier "
                f"({ext['docs']} docs, {ext['html_mb']} MB html; "
                f"{ext['docs_per_sec']} docs/sec, {ext['mb_per_sec']} MB/sec)",
                "value": ext["extract_sec"],
                "unit": "sec",
                "queries": qtimes,
                "queries_sf1": qtimes_sf1,
                "sf1_docs": int(sf1_docs),
                "sf": sf,
                "extract": ext,
                "layout": lay,
                "pdf": pdf,
                "lineclean": lc,
                "cores": cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
