"""Resumability property (SURVEY.md §5.2, BASELINE.md): kill after k
bucket-group commits, rerun -> byte-identical result to an uninterrupted
run, exactly-once visible rows per url."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.pipeline import ExtractionPipeline
from ocr_spark.sources.icelite import IceliteTable


@pytest.fixture(scope="module")
def pages(spark, tiny_dir):
    return spark.read.parquet(f"{tiny_dir}/pages.parquet")


def _table_content(spark, table):
    return sorted(
        (r["url"], r["text"], r["error"], r["engine"])
        for r in table.read(spark).collect()
    )


def test_uninterrupted_run(spark, pages, tmp_path):
    out = IceliteTable(str(tmp_path / "out"), key_col="url", n_buckets=8)
    pipe = ExtractionPipeline(out, n_buckets=8, group_size=2)
    stats = pipe.run(pages)
    assert stats["groups"] == 4
    assert stats["docs"] == pages.count()
    assert out.row_count() == pages.count()


def test_kill_and_resume_identical(spark, pages, tmp_path):
    # ground truth: uninterrupted
    ref = IceliteTable(str(tmp_path / "ref"), key_col="url", n_buckets=8)
    ExtractionPipeline(ref, n_buckets=8, group_size=2).run(pages)
    want = _table_content(spark, ref)

    # crash after 2 of 4 group commits
    out = IceliteTable(str(tmp_path / "out"), key_col="url", n_buckets=8)
    pipe = ExtractionPipeline(out, n_buckets=8, group_size=2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe.run(pages, fail_after_groups=2)
    assert len(pipe.remaining_groups()) == 2
    partial = out.row_count()
    assert 0 < partial < pages.count()

    # resume: only remaining groups run; final content identical
    stats = ExtractionPipeline(out, n_buckets=8, group_size=2).run(pages)
    assert stats["groups"] == 2
    assert _table_content(spark, out) == want


def test_rerun_after_completion_is_noop(spark, pages, tmp_path):
    out = IceliteTable(str(tmp_path / "out"), key_col="url", n_buckets=8)
    ExtractionPipeline(out, n_buckets=8, group_size=2).run(pages)
    head = out.head_id()
    stats = ExtractionPipeline(out, n_buckets=8, group_size=2).run(pages)
    assert stats["groups"] == 0
    assert out.head_id() == head


def test_lineage_counters_recorded(spark, pages, tmp_path):
    out = IceliteTable(str(tmp_path / "out"), key_col="url", n_buckets=8)
    ExtractionPipeline(out, n_buckets=8, group_size=4).run(pages)
    counters = [
        s.metadata.get("counters", {})
        for s in out.snapshots()
        if "bucket_group" in s.metadata
    ]
    assert sum(c.get("docs", 0) for c in counters) == pages.count()
    assert all("errors" in c and "text_chars" in c for c in counters)


def test_parallel_groups_match_serial(spark, pages, tmp_path):
    """Concurrent bucket-group jobs (disjoint buckets) produce the same
    table as serial execution; commits interleave safely."""
    serial = IceliteTable(str(tmp_path / "s"), key_col="url", n_buckets=8)
    ExtractionPipeline(serial, n_buckets=8, group_size=2).run(pages)
    par = IceliteTable(str(tmp_path / "p"), key_col="url", n_buckets=8)
    stats = ExtractionPipeline(par, n_buckets=8, group_size=2).run(
        pages, max_concurrent=4
    )
    assert stats["groups"] == 4
    assert _table_content(spark, par) == _table_content(spark, serial)
    # every group's counters landed despite interleaved commits
    counters = [
        s.metadata["counters"]
        for s in par.snapshots()
        if "bucket_group" in s.metadata
    ]
    assert sum(c["docs"] for c in counters) == pages.count()


def test_table_input_prunes_files_physically(spark, pages, tmp_path):
    """icelite (bucket-laid-out) input: each group's read touches ONLY that
    group's bucket files — manifest pruning, no scan-then-filter (VERDICT r2
    'What's missing' #3).  The group slice carries no bucket predicate at
    all (structural pruning), and its file set is a strict subset of the
    table's files, all under the group's bucket= dirs."""
    src = IceliteTable(str(tmp_path / "src"), key_col="url", n_buckets=8)
    src.append(pages)
    pipe = ExtractionPipeline(
        IceliteTable(str(tmp_path / "out"), key_col="url", n_buckets=8),
        n_buckets=8,
        group_size=2,
    )
    group = [0, 1]
    part = pipe._group_input(src, spark, group)
    files = part.inputFiles()
    all_files = src.read(spark).inputFiles()
    assert files and len(files) < len(all_files)
    assert all(
        any(f"__bucket={b}/" in f for b in group) for f in files
    ), files
    # no computed bucket predicate in the plan — pruning is structural
    assert "xxhash64" not in part._jdf.queryExecution().optimizedPlan().toString()
    # rows are exactly the group's buckets
    from ocr_spark.sources.icelite import bucket_expr

    want = pages.filter(bucket_expr("url", 8).isin(group)).count()
    assert part.count() == want


def test_table_input_run_matches_dataframe_run(spark, pages, tmp_path):
    """Full pipeline over icelite input == over the flat DataFrame input,
    including crash-resume (the resume scans only remaining groups)."""
    ref = IceliteTable(str(tmp_path / "ref"), key_col="url", n_buckets=8)
    ExtractionPipeline(ref, n_buckets=8, group_size=2).run(pages)
    want = _table_content(spark, ref)

    src = IceliteTable(str(tmp_path / "src"), key_col="url", n_buckets=8)
    src.append(pages)
    out = IceliteTable(str(tmp_path / "out"), key_col="url", n_buckets=8)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ExtractionPipeline(out, n_buckets=8, group_size=2).run(
            src, fail_after_groups=2, spark=spark
        )
    stats = ExtractionPipeline(out, n_buckets=8, group_size=2).run(src, spark=spark)
    assert stats["groups"] == 2
    assert _table_content(spark, out) == want


def test_same_bucket_conflict_detected(spark, tmp_path):
    """A racing merge on the SAME bucket raises instead of losing data.

    The race is staged by hooking the slow phase (_write_data): while the
    victim merge is writing, a concurrent merge rewrites the same buckets
    and commits first; the victim must then fail its commit validation.
    """
    t = IceliteTable(str(tmp_path / "c"), key_col="url", n_buckets=2)
    t.append(spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, v int"))
    victim = spark.createDataFrame([("u1", 99)], "url string, v int")

    fired = {"done": False}
    orig_write = t._write_data

    def write_with_interleaved_commit(dfx, token):
        res = orig_write(dfx, token)
        if not fired["done"]:
            fired["done"] = True
            t.merge(
                spark.createDataFrame([("u1", 50), ("u2", 51)], "url string, v int")
            )
        return res

    t._write_data = write_with_interleaved_commit
    try:
        with pytest.raises(RuntimeError, match="commit conflict"):
            t.merge(victim)
    finally:
        t._write_data = orig_write
