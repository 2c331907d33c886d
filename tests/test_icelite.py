"""icelite table-format semantics: atomic commits, MERGE idempotency,
bucket pruning, lineage (reference K1-K8 capabilities)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.icelite import IceliteTable


@pytest.fixture()
def tmp_table(tmp_path):
    return IceliteTable(str(tmp_path / "tbl"), key_col="url", n_buckets=4)


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, v int")


def test_append_and_read(spark, tmp_table):
    tmp_table.append(_df(spark, [("u1", 1), ("u2", 2)]))
    got = {r["url"]: r["v"] for r in tmp_table.read(spark).collect()}
    assert got == {"u1": 1, "u2": 2}
    assert tmp_table.row_count() == 2


def test_merge_upsert_replaces_matched(spark, tmp_table):
    tmp_table.append(_df(spark, [("u1", 1), ("u2", 2), ("u3", 3)]))
    tmp_table.merge(_df(spark, [("u2", 20), ("u4", 40)]))
    got = {r["url"]: r["v"] for r in tmp_table.read(spark).collect()}
    assert got == {"u1": 1, "u2": 20, "u3": 3, "u4": 40}


def test_merge_idempotent(spark, tmp_table):
    """K3: running the same merge twice == once (exactly-once per key)."""
    tmp_table.append(_df(spark, [("u1", 1), ("u2", 2)]))
    batch = _df(spark, [("u2", 20), ("u5", 50)])
    tmp_table.merge(batch)
    once = sorted((r["url"], r["v"]) for r in tmp_table.read(spark).collect())
    tmp_table.merge(batch)
    twice = sorted((r["url"], r["v"]) for r in tmp_table.read(spark).collect())
    assert once == twice
    assert tmp_table.row_count() == 3


def test_snapshot_isolation_history(spark, tmp_table):
    tmp_table.append(_df(spark, [("u1", 1)]))
    tmp_table.merge(_df(spark, [("u1", 100)]))
    snaps = tmp_table.snapshots()
    assert [s.operation for s in snaps] == ["append", "merge"]
    assert snaps[-1].parent_id == snaps[0].snapshot_id


def test_bucket_pruned_read(spark, tmp_table):
    rows = [(f"u{i}", i) for i in range(40)]
    tmp_table.append(_df(spark, rows))
    full = tmp_table.read(spark).count()
    head = tmp_table.snapshot()
    some_bucket = int(next(iter(head.files)))
    pruned = tmp_table.read(spark, buckets=[some_bucket])
    assert 0 < pruned.count() < full
    # pruned read only touches that bucket's files
    assert all(f"__bucket={some_bucket}/" in f for f in pruned.inputFiles())


def test_merge_untouched_buckets_carry_over(spark, tmp_table):
    rows = [(f"u{i}", i) for i in range(40)]
    tmp_table.append(_df(spark, rows))
    before = tmp_table.snapshot()
    tmp_table.merge(_df(spark, [("u1", 999)]))
    after = tmp_table.snapshot()
    # at least one bucket's file list is unchanged (carried by reference)
    untouched = [b for b in before.files if before.files[b] == after.files.get(b)]
    assert untouched


def test_time_travel_read(spark, tmp_table):
    tmp_table.append(_df(spark, [("u1", 1)]))
    s1 = tmp_table.head_id()
    tmp_table.merge(_df(spark, [("u1", 100), ("u2", 2)]))
    now = {r["url"]: r["v"] for r in tmp_table.read(spark).collect()}
    then = {r["url"]: r["v"] for r in tmp_table.read(spark, snapshot_id=s1).collect()}
    assert now == {"u1": 100, "u2": 2}
    assert then == {"u1": 1}  # VERSION AS OF semantics


def test_compaction_preserves_content(spark, tmp_table):
    # several appends -> multiple files per bucket
    for i in range(4):
        tmp_table.append(_df(spark, [(f"u{i}a", i), (f"u{i}b", 10 + i)]))
    before = sorted((r["url"], r["v"]) for r in tmp_table.read(spark).collect())
    head = tmp_table.snapshot()
    assert any(len(ps) > 1 for ps in head.files.values())
    sid = tmp_table.compact(spark)
    assert sid is not None
    after_head = tmp_table.snapshot()
    assert all(len(ps) == 1 for ps in after_head.files.values())
    after = sorted((r["url"], r["v"]) for r in tmp_table.read(spark).collect())
    assert before == after
    assert after_head.operation == "compact"
    # idempotent: nothing left to compact
    assert tmp_table.compact(spark) is None


def test_merge_sequence_matches_dict_semantics(spark, tmp_table):
    """Property: any sequence of keyed merges is equivalent to applying
    dict.update per batch (exactly-once visible value per key)."""
    import random

    rng = random.Random(7)
    model: dict[str, int] = {}
    for step in range(5):
        batch = [(f"u{rng.randrange(12)}", rng.randrange(1000)) for _ in range(rng.randrange(1, 6))]
        dedup = {}
        for k, v in batch:
            dedup[k] = v  # last-wins inside a batch is NOT guaranteed; make unique
        batch = list(dedup.items())
        model.update(batch)
        tmp_table.merge(_df(spark, batch))
        got = {r["url"]: r["v"] for r in tmp_table.read(spark).collect()}
        assert got == model, f"diverged at step {step}"


def test_expire_snapshots(spark, tmp_table):
    tmp_table.append(_df(spark, [("u1", 1)]))
    tmp_table.merge(_df(spark, [("u1", 2)]))   # rewrites u1's bucket file
    tmp_table.merge(_df(spark, [("u2", 3)]))
    assert len(tmp_table.snapshots()) == 3
    deleted = tmp_table.expire_snapshots(keep_last=1)
    assert deleted  # the superseded u1-v1 file is gone
    assert len(tmp_table.snapshots()) == 1
    got = {r["url"]: r["v"] for r in tmp_table.read(spark).collect()}
    assert got == {"u1": 2, "u2": 3}  # current state untouched
    assert tmp_table.expire_snapshots(keep_last=1) == []  # idempotent


def test_merge_empty_batch_is_safe(spark, tmp_table):
    tmp_table.append(_df(spark, [("u1", 1), ("u2", 2)]))
    before = sorted((r["url"], r["v"]) for r in tmp_table.read(spark).collect())
    tmp_table.merge(_df(spark, []).limit(0))
    after = sorted((r["url"], r["v"]) for r in tmp_table.read(spark).collect())
    assert before == after


def test_append_schema_validated(spark, tmp_table):
    """K6: the first write freezes the schema; a mismatched append is
    rejected with a typed error BEFORE any file lands."""
    from ocr_spark.sources.icelite import SchemaMismatchError

    tmp_table.append(_df(spark, [("u1", 1)]))
    head_before = tmp_table.head_id()
    bad = spark.createDataFrame([("u2", "oops")], "url string, v string")
    with pytest.raises(SchemaMismatchError, match="type changes.*v"):
        tmp_table.append(bad)
    worse = spark.createDataFrame([("u2",)], "url string")
    with pytest.raises(SchemaMismatchError, match="missing columns.*v"):
        tmp_table.merge(worse)
    # nothing landed: head unchanged, content unchanged
    assert tmp_table.head_id() == head_before
    assert {r["url"] for r in tmp_table.read(spark).collect()} == {"u1"}
    # column ORDER is not part of the contract (unionByName semantics)
    reordered = spark.createDataFrame([(7, "u9")], "v int, url string")
    tmp_table.append(reordered)


def test_remove_orphan_files(spark, tmp_table, tmp_path):
    """Files from a write attempt that crashed before commit are invisible
    to expire_snapshots (never referenced); remove_orphan_files reaps them
    without touching committed data."""
    import os

    tmp_table.append(_df(spark, [("u1", 1), ("u2", 2)]))
    # simulate a crashed _write_data: files + Spark sidecars, no commit
    crashed = os.path.join(tmp_table.root, "data", "w-crashed", "__bucket=0")
    os.makedirs(crashed)
    orphan = os.path.join(crashed, "part-00000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    sidecar = os.path.join(tmp_table.root, "data", "w-crashed", "_SUCCESS")
    open(sidecar, "w").close()
    assert tmp_table.expire_snapshots(keep_last=1) == []  # can't see it
    deleted = tmp_table.remove_orphan_files()
    assert sorted(deleted) == [
        os.path.join("data", "w-crashed", "_SUCCESS"),
        os.path.join("data", "w-crashed", "__bucket=0", "part-00000.parquet"),
    ]
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.dirname(crashed))  # empty dirs pruned
    # committed write dirs keep their Spark sidecars (_SUCCESS at the
    # token-dir root two levels above the bucket files)
    head = tmp_table.snapshot()
    some_live = next(p for ps in head.files.values() for p in ps)
    token_dir = os.path.dirname(os.path.dirname(os.path.join(tmp_table.root, some_live)))
    assert os.path.exists(os.path.join(token_dir, "_SUCCESS"))
    # committed data intact
    assert {r["url"] for r in tmp_table.read(spark).collect()} == {"u1", "u2"}
    # age guard: a "fresh" orphan survives when older_than_s is large
    os.makedirs(crashed)
    with open(orphan, "wb") as f:
        f.write(b"x")
    assert tmp_table.remove_orphan_files(older_than_s=3600) == []
    assert os.path.exists(orphan)


def test_commit_conflict_is_typed(spark, tmp_table):
    """Same-bucket concurrent merges raise CommitConflictError (a
    RuntimeError subclass, so legacy handlers still catch it)."""
    from ocr_spark.sources.icelite import CommitConflictError, IceliteError

    assert issubclass(CommitConflictError, RuntimeError)
    assert issubclass(CommitConflictError, IceliteError)


def test_maintenance_cli(spark, tmp_table, capsys):
    """The maintenance job chains compact -> expire -> orphan GC and
    reports one JSON line; each action is idempotent."""
    import json
    import os

    from jobs.maintenance import main

    for i in range(3):
        tmp_table.append(_df(spark, [(f"u{i}a", i), (f"u{i}b", 10 + i)]))
    # plant a stale orphan from a "crashed" write
    crashed = os.path.join(tmp_table.root, "data", "w-dead", "__bucket=1")
    os.makedirs(crashed)
    orphan = os.path.join(crashed, "part-0.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x")
    os.utime(orphan, (1, 1))  # ancient mtime -> past any age guard

    stats = main(
        [
            "--table", tmp_table.root, "--buckets", "4",
            "--compact", "--expire-keep", "1", "--gc-orphans",
        ]
    )
    assert stats["compacted_snapshot"] is not None
    assert stats["expired_files"] > 0
    assert stats["orphans_removed"] == 1
    assert stats["snapshots"] == 1
    assert stats["rows"] == 6
    assert not os.path.exists(orphan)
    # content survives maintenance
    assert tmp_table.read(spark).count() == 6
    # idempotent second pass: nothing left to do
    stats2 = main(["--table", tmp_table.root, "--buckets", "4", "--compact",
                   "--expire-keep", "1", "--gc-orphans"])
    assert stats2["compacted_snapshot"] is None
    assert stats2["expired_files"] == 0 and stats2["orphans_removed"] == 0
    # missing table -> exit code 2
    with pytest.raises(SystemExit) as e:
        main(["--table", "/tmp/definitely-missing-tbl"])
    assert e.value.code == 2


def test_layout_mismatch_rejected(spark, tmp_table):
    """The first write freezes (key_col, n_buckets) in _table.json; opening
    the table with a different layout raises instead of silently misreading
    bucket-pruned scans (a 4-bucket table opened as 16 buckets would make a
    resume's manifest lookups miss most bucket keys — data loss, no error)."""
    from ocr_spark.sources.icelite import IceliteError

    tmp_table.append(_df(spark, [("u1", 1), ("u2", 2)]))
    # same layout reopens fine
    again = IceliteTable(tmp_table.root, key_col="url", n_buckets=4)
    assert again.row_count() == 2
    with pytest.raises(IceliteError, match="laid out with"):
        IceliteTable(tmp_table.root, key_col="url", n_buckets=16)
    with pytest.raises(IceliteError, match="laid out with"):
        IceliteTable(tmp_table.root, key_col="doc_id", n_buckets=4)
