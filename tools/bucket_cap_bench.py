"""Capped-vs-uncapped LSH band self-join on a planted viral cluster.

Evidence for the r5 hot-bucket bound (dedup._capped_self_join_sides): a
near-identical template cluster of n docs shares every band key, so the
uncapped band self-join materializes ~C(n,2) x bands candidate rows in one
bucket; the cap bounds that to cap x n per bucket while transitive closure
recovers the identical cluster membership.  This tool measures both
wall-clocks on the same planted corpus, verifies the cluster sets are
EQUAL, and merges an ``lsh_bucket_cap`` section into SCALING.json.

Usage: python tools/bucket_cap_bench.py [n_viral] [cap]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_viral = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import minhash_dup_pairs, near_dup_clusters
    from ocr_spark.session import build_session

    spark = build_session("bucket-cap-bench", cores=16, shuffle_partitions=32)
    base = (
        "subscribe to our newsletter for daily updates about products and "
        "services offered across all regional branches of the company "
    ) * 4
    rows = [(i, base + f"ref {i % 7}") for i in range(n_viral)]
    rows += [
        (10_000_000 + j, f"unique document number {j} with its own words {j * 17}")
        for j in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    ids = df.select("doc_id")

    def run(max_bucket):
        spark.catalog.clearCache()
        df.cache().count()  # re-warm the input only
        t0 = time.time()
        pairs = minhash_dup_pairs(df, threshold=0.5, max_bucket=max_bucket)
        n_pairs = pairs.count()
        t_pairs = time.time() - t0
        clusters = near_dup_clusters(ids, pairs.select("id_a", "id_b"))
        sizes = {
            (r["cluster_id"], r["n"])
            for r in clusters.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .collect()
        }
        total = time.time() - t0
        return n_pairs, round(t_pairs, 2), round(total, 2), sizes

    # warm JVM/codegen once on a tiny slice so neither side pays cold-start
    run_warm = minhash_dup_pairs(df.limit(50), threshold=0.5, max_bucket=cap)
    run_warm.count()

    up, ut_pairs, ut_total, usizes = run(None)
    cp, ct_pairs, ct_total, csizes = run(cap)

    assert usizes == csizes, (
        f"cluster sets diverged: uncapped={sorted(usizes)[:5]} "
        f"capped={sorted(csizes)[:5]}"
    )
    section = {
        "n_viral": n_viral,
        "n_normal": 200,
        "cap": cap,
        "uncapped": {"pairs": up, "pairs_sec": ut_pairs, "with_clustering_sec": ut_total},
        "capped": {"pairs": cp, "pairs_sec": ct_pairs, "with_clustering_sec": ct_total},
        "pair_reduction": round(up / max(cp, 1), 1),
        "speedup_pairs": round(ut_pairs / max(ct_pairs, 1e-9), 2),
        "speedup_with_clustering": round(ut_total / max(ct_total, 1e-9), 2),
        "clusters_identical": True,
        "note": (
            "planted viral template cluster (near-identical docs sharing "
            "all 16 band keys; exact-dedup does not remove them).  The cap "
            "emits representative x member edges only — bounded linear per "
            "bucket — and near_dup_clusters' transitive closure recovers "
            "the IDENTICAL cluster membership (asserted).  At the 100 TB "
            "design point the uncapped side is ~C(10^6,2) rows in one "
            "straggler task, i.e. the difference between a job that "
            "finishes and one that does not."
        ),
    }
    print(json.dumps(section, indent=2))
    path = os.path.join(REPO, "SCALING.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["lsh_bucket_cap"] = section
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
