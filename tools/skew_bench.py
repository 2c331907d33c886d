"""Salted-repartition skew evidence (VERDICT r3 Next #7).

Scenario family: the adversarial file layout for extraction — the
fixture's 1000 normal pages spread across 7 parquet files, plus N GIANT
(~6 MB, just under the 8 MB DOC_TOO_LARGE cap) same-host documents
concentrated in ONE file.  File-granular partitioning (the unsalted,
Exchange-free fast path) serializes all giants into a single task;
``salted_repartition`` (bucket x salt keys) spreads them across tasks at
the cost of one shuffle of the input bytes.

Two points on the skew axis show how the payoff scales (measured 2026-08-17,
local[8], warm, best-of-3 interleaved):

- **moderate** (8 giants, ~50 MB hot file): salting wins 1.5x — the
  straggler already exceeds the one-shuffle cost at this size.
- **extreme** (64 giants, ~390 MB hot file): salting wins 3.8x — the
  unsalted straggler grinds the whole hot file on one core while seven
  idle; the salted plan's cost scales with total bytes / cores instead.

On a UNIFORM corpus the shuffle buys nothing (there is no straggler), so
``salt=0`` stays the default; inputs with hot-host / giant-doc layouts
enable the knob.

Both variants run in the SAME warm session, interleaved best-of-N, so VM
noise applies to both equally (no taskset pinning needed — this measures
a plan-shape effect at fixed core count, not a cluster-size curve).

The 100 TB reading: salting is the knob for *compute* skew AQE cannot see
(there is no shuffle for AQE to re-plan in the unsalted extraction plan),
and the crossover is a straggler-vs-shuffle-cost tradeoff the operator
owns: uniform corpora keep the Exchange-free plan (salt=0); inputs whose
per-task byte spread is pathological enable it (ExtractionPipeline(
salt=...), jobs/extract_job.py --salt).

Usage: python tools/skew_bench.py   # ~5 min; merges results into SCALING.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GIANT_BLOCKS = 48000  # ~6 MB html each: real compute, under the 8 MB cap
SALT = 4
RUNS = 3
SCENARIOS = {"moderate": 8, "extreme": 64}


def build_skewed_input(spark, work_dir: str, n_giants: int) -> str:
    from ocr_spark.fixtures.generator import ensure_fixtures

    fix = ensure_fixtures("small")
    d = os.path.join(work_dir, f"skewed_pages_{n_giants}")
    small = spark.read.parquet(f"{fix}/pages.parquet")
    block = (
        "<p>lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua</p>"
    )
    giants = [
        (
            f"http://hot-host.example.com/giant/{i}",
            None,
            bytearray(
                ("<html><body>" + block * GIANT_BLOCKS + "</body></html>").encode()
            ),
            None,
            "fr",
        )
        for i in range(n_giants)
    ]
    gdf = spark.createDataFrame(giants, small.schema)
    # smalls across 7 files; ALL giants into one additional file — the
    # worst-case layout file-granular partitioning can meet
    small.repartition(7).write.mode("overwrite").parquet(d)
    gdf.coalesce(1).write.mode("append").parquet(d)
    return d


def measure(spark, d: str, n_giants: int) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.plans.partitioning import salted_repartition

    pages = spark.read.parquet(d)
    html_mb = pages.agg((F.sum(F.length("html")) / 1e6).alias("mb")).collect()[0]["mb"]

    def run(df) -> float:
        t0 = time.time()
        extract_pages(df).agg(F.count(F.lit(1)), F.sum(F.length("text"))).collect()
        return time.time() - t0

    unsalted_in = pages
    salted_in = salted_repartition(pages, "url", n_buckets=16, salt=SALT)
    run(unsalted_in)  # warm-up: spawn Python workers, compile codegen
    unsalted, salted = [], []
    for _ in range(RUNS):  # interleaved so drift hits both sides equally
        unsalted.append(run(unsalted_in))
        salted.append(run(salted_in))
    return {
        "scenario": (
            f"{n_giants} giant (~6 MB) same-host docs in ONE parquet file "
            "+ 1000 normal pages in 7 files; local[8], same warm session"
        ),
        "html_mb": round(float(html_mb), 1),
        "unsalted_sec": round(min(unsalted), 3),
        "salted_sec": round(min(salted), 3),
        "unsalted_all_runs": [round(t, 3) for t in unsalted],
        "salted_all_runs": [round(t, 3) for t in salted],
        "salt": SALT,
        "speedup": round(min(unsalted) / min(salted), 2),
    }


def main() -> None:
    import tempfile

    from ocr_spark.session import build_session

    spark = build_session("skew-bench", cores=8, shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="skew_bench_")
    try:
        result = {
            name: measure(spark, build_skewed_input(spark, work, n), n)
            for name, n in SCENARIOS.items()
        }
    finally:
        # ~450 MB of generated skewed parquet per invocation — do not
        # leak it into /tmp across benchmark iterations
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    result["measured_at"] = datetime.now(timezone.utc).isoformat(timespec="seconds")
    result["note"] = (
        "unsalted = the default Exchange-free plan (file-granular tasks): "
        "all giants serialize into one straggler task.  salted = "
        "salted_repartition(bucket x salt): one shuffle of the input bytes "
        "buys task-level spread of the giants.  The payoff grows with the "
        "hot file (the unsalted straggler scales with the hot file, the "
        "salted plan with total bytes/cores).  On a uniform corpus the "
        "shuffle buys nothing, so salt=0 stays the default; hot-host / "
        "giant-doc inputs enable it via ExtractionPipeline(salt=...) / "
        "jobs/extract_job.py --salt"
    )
    print(json.dumps(result, indent=2))
    scaling_path = os.path.join(REPO, "SCALING.json")
    merged = {}
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            merged = json.load(f)
    merged["skew_salting"] = result
    with open(scaling_path, "w") as f:
        json.dump(merged, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
