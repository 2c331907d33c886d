"""jobs/dedup_job.py — the corpus-cleaning CLI: kept + audit + signature
tables, idempotent reruns, exit codes."""

from __future__ import annotations

import pytest

from ocr_spark.sources.icelite import IceliteTable

SF = "/root/testdata/sf0.001"


def test_dedup_job_end_to_end(spark, tmp_path):
    from jobs.dedup_job import main

    out = str(tmp_path / "kept")
    audit = str(tmp_path / "audit")
    sigs = str(tmp_path / "sigs")
    args = [
        "--input", f"{SF}/documents.parquet",
        "--output", out, "--audit", audit, "--signatures", sigs,
        "--near-dedup", "--near-threshold", "0.8",
        "--min-chars", "60", "--min-gopher-stopwords", "2",
        "--buckets", "4",
    ]
    stats = main(args)
    assert stats["docs_kept"] == IceliteTable(out, "doc_id", 4).row_count()
    assert 0 < stats["docs_kept"] < stats["docs_in"]
    # every input doc has an audited fate; reasons partition the corpus
    assert sum(stats["reasons"].values()) == stats["docs_in"]
    assert stats["reasons"].get("kept") == stats["docs_kept"]
    assert IceliteTable(audit, "doc_id", 4).row_count() == stats["docs_in"]
    # the signature table committed (rule-passing exact survivors only)
    sig_tbl = IceliteTable(sigs, "doc_id", 4)
    assert 0 < sig_tbl.row_count() <= stats["docs_in"]
    sig_head = sig_tbl.head_id()

    # rerun: merge idempotency (same rows) + signature table reused
    stats2 = main(args)
    assert stats2["docs_kept"] == stats["docs_kept"]
    assert IceliteTable(out, "doc_id", 4).row_count() == stats["docs_kept"]
    assert sig_tbl.head_id() == sig_head  # no re-hash on restart


def test_dedup_job_stricter_rerun_replaces_output(spark, tmp_path):
    """The kept table is a pure function of (input, config): a stricter
    rerun must NOT leave rows kept by the looser config (merge-upsert
    would), and a changed config must refuse the stale signature table."""
    import pytest as _pytest

    from jobs.dedup_job import main

    out = str(tmp_path / "kept")
    audit = str(tmp_path / "audit")
    base = [
        "--input", f"{SF}/documents.parquet",
        "--output", out, "--audit", audit, "--buckets", "4",
    ]
    s1 = main(base + ["--min-chars", "10"])
    s2 = main(base + ["--min-chars", "5000"])  # much stricter
    assert s2["docs_kept"] < s1["docs_kept"]
    assert IceliteTable(out, "doc_id", 4).row_count() == s2["docs_kept"]
    assert s2["reasons"].get("kept", 0) == s2["docs_kept"]

    # signature table is config-fingerprinted: a rerun with different
    # rules refuses the stale relation instead of mis-clustering — and the
    # refusal lands in the CLI's documented exit-code taxonomy (4 = table
    # layout rejection), not a raw traceback
    sigs = str(tmp_path / "sigs")
    nd = base + ["--near-dedup", "--signatures", sigs]
    main(nd + ["--min-chars", "10"])
    with _pytest.raises(SystemExit) as e:
        main(nd + ["--min-chars", "200"])
    assert e.value.code == 4


def test_dedup_job_signatures_require_near_dedup(tmp_path):
    import pytest as _pytest

    from jobs.dedup_job import main

    with _pytest.raises(SystemExit) as e:
        main([
            "--input", f"{SF}/documents.parquet",
            "--output", str(tmp_path / "o"),
            "--signatures", str(tmp_path / "s"),
        ])
    assert e.value.code == 2  # argparse usage error


def test_dedup_job_bad_input_exit_2(spark, tmp_path):
    from jobs.dedup_job import main

    with pytest.raises(SystemExit) as e:
        main(["--input", "/nonexistent/nope.parquet", "--output", str(tmp_path / "o")])
    assert e.value.code == 2


def test_dedup_job_line_cleanup_pre_stages(spark, tmp_path):
    """--strip-boilerplate / --dedup-doc-lines / --redact-pii rewrite the
    text BEFORE filtering: the kept table must carry cleaned text (no hot
    boilerplate line, no duplicate lines, no raw emails)."""
    from ocr_spark.fixtures.generator import ensure_fixtures
    from jobs.dedup_job import main

    fix = ensure_fixtures("tiny")
    out = str(tmp_path / "kept")
    stats = main([
        "--input", f"{fix}/corpus.parquet",
        "--output", out,
        "--min-chars", "10",
        "--strip-boilerplate", "5", "--dedup-doc-lines", "--redact-pii",
        "--buckets", "4",
    ])
    assert stats["pre_stages"] == [
        "strip_boilerplate>=5", "dedup_doc_lines", "redact_pii",
    ]
    # lines hot in the INPUT (>= 5 distinct docs) must be gone from the
    # kept text; small-host boilerplate below the threshold legitimately
    # survives
    import collections
    import re

    src = spark.read.parquet(f"{fix}/corpus.parquet").collect()
    df_count = collections.Counter()
    for r in src:
        for ln in set(r["text"].split("\n")):
            df_count[ln] += 1
    hot = {ln for ln, n in df_count.items() if n >= 5 and ln}
    assert hot  # the fixture really plants cross-doc boilerplate

    kept = IceliteTable(out, "doc_id", 4).read(spark)
    rows = kept.select("doc_id", "text").collect()
    assert rows
    email = re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")
    n_redacted = 0
    for r in rows:
        lines = r["text"].split("\n")
        assert len(lines) == len(set(lines)), r["doc_id"]      # intra-doc dedup
        assert not hot.intersection(lines), r["doc_id"]        # hot boiler gone
        assert not email.search(r["text"]), r["doc_id"]        # pii gone
        n_redacted += r["text"].count("<EMAIL>")
    assert n_redacted > 0  # the corpus really contained emails
