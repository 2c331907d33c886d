"""Kill-and-rerun resume, end to end through the real spark-submit path.

The north rule requires "any failed run resumes from the last committed
snapshot".  tests/test_pipeline_resume.py proves the resume LOGIC with
property tests; this test proves the whole artifact: a spark-submit launch
is SIGKILLed mid-job, the same command is rerun, and the final table must
be byte-identical to the golden — with the rerun reporting fewer (or zero)
newly-processed bucket groups than a fresh run.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(out_dir: str, cores: int = 8, timeout: float | None = None):
    cmd = [
        os.path.join(REPO, "tools", "submit.sh"),
        "--input", os.path.join(REPO, "fixtures", "small", "pages.parquet"),
        "--output", out_dir,
        "--cores", str(cores),
    ]
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cores)}
    proc = subprocess.Popen(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, start_new_session=True,  # own process group for a clean kill
    )
    if timeout is None:
        out, _ = proc.communicate(timeout=600)
        return proc.returncode, out
    try:
        out, _ = proc.communicate(timeout=timeout)
        return proc.returncode, out
    except subprocess.TimeoutExpired:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait()
        return -signal.SIGKILL, ""


def test_crash_resume_e2e(tmp_path):
    from ocr_spark.fixtures.generator import ensure_fixtures

    ensure_fixtures("small")
    out_dir = str(tmp_path / "tbl")

    # 1. kill a launch mid-job.  The timing is chosen to land after at
    #    least session startup; whether any group committed is immaterial —
    #    resume must be correct either way.  (On an exceptionally fast
    #    host the job may finish before the kill lands — then the rerun
    #    degenerates to a no-op-resume check, which is still the contract.)
    rc, _ = _submit(out_dir, timeout=16)
    assert rc in (-signal.SIGKILL, 0)

    # 2. rerun the identical command to completion
    rc, out = _submit(out_dir)
    assert rc == 0, out
    stats = json.loads(out.strip().splitlines()[-1])
    groups_resumed = stats["groups"]

    # 3. final table is byte-identical to the golden, every url exactly
    #    once — read through the MANIFEST (a raw directory glob could see
    #    orphaned files from the killed attempt; the snapshot cannot)
    con = duckdb.connect()
    from ocr_spark.sources.icelite import IceliteTable

    table = IceliteTable(out_dir, key_col="url", n_buckets=16)
    head = table.snapshot()
    files = [os.path.join(out_dir, p) for ps in head.files.values() for p in ps]
    got = con.execute(
        f"""
        SELECT count(*), count(DISTINCT t.url),
               sum(CASE WHEN g.text = t.text THEN 1 ELSE 0 END)
        FROM parquet_scan({files!r}) t
        JOIN '{REPO}/fixtures/small/golden_pages.parquet' g USING (url)
        """
    ).fetchone()
    assert got == (1000, 1000, 1000), got

    # 4. resume did less work than a fresh 4-group run (some groups were
    #    already committed), or at most a full rerun if the kill landed
    #    before any commit
    assert 0 <= groups_resumed <= 4
    # lineage: committed groups recorded in snapshot metadata
    assert table.committed_groups(), "no bucket-group lineage recorded"
