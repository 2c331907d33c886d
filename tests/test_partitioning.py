"""Partitioning & skew policy: bucket uniformity under Zipf host skew,
salted repartition balance, force-reprocess idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans.partitioning import salted_repartition, with_bucket
from ocr_spark.plans.pipeline import ExtractionPipeline
from ocr_spark.sources.icelite import IceliteTable


def test_bucket_spread_despite_host_skew(spark, small_dir):
    """Hosts are Zipf(1.2)-skewed by construction; url-hash buckets must
    still be near-uniform (hashing is the skew killer)."""
    pages = spark.read.parquet(f"{small_dir}/pages.parquet")
    counts = [
        r["n"]
        for r in with_bucket(pages, n_buckets=16)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 16
    assert max(counts) < 2.5 * min(counts)  # no hot bucket


def test_salted_repartition_splits_hot_bucket(spark, small_dir):
    pages = spark.read.parquet(f"{small_dir}/pages.parquet")
    salted = salted_repartition(pages, n_buckets=4, salt=4)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    nonempty = [r["n"] for r in sizes if r["n"] > 0]
    # 4 buckets x 4 salts = up to 16 distinct task groups; far more than 4
    assert len(nonempty) > 4
    assert max(nonempty) < 4 * (sum(nonempty) / len(nonempty))


def test_force_reprocess_overwrites_not_duplicates(spark, tiny_dir, tmp_path):
    pages = spark.read.parquet(f"{tiny_dir}/pages.parquet")
    out = IceliteTable(str(tmp_path / "t"), key_col="url", n_buckets=8)
    pipe = ExtractionPipeline(out, n_buckets=8, group_size=4)
    pipe.run(pages)
    n1 = out.row_count()
    stats = pipe.run(pages, force=True)  # C3: re-process overwrites per key
    assert stats["groups"] == 2
    assert out.row_count() == n1  # exactly-once visible rows per url
