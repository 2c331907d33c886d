"""Partitioning & skew policy (SURVEY.md §4.2, BASELINE.json:6,14).

Common-Crawl-style data is host-skewed (the fixture generator draws hosts
Zipf(s=1.2)).  Extraction itself is embarrassingly parallel — the skew that
matters is *compute* skew (a few huge documents / hot hosts land in one
task), which AQE cannot see because there is no shuffle.  The policy:

- **url-hash buckets** are the unit of layout, pruning, commit, and resume
  (``bucket(N, url)``) — pure hash, so host hotness spreads uniformly.
- **salted repartition** before the extraction UDF: partition on
  ``(bucket, salt)`` where salt = hash(url) % S, giving S× more, smaller
  tasks per bucket so one giant document cannot straggle a whole bucket;
  speculative execution (spark.speculation) covers the residue.
- per-document byte cap inside the kernel (DOC_TOO_LARGE error channel)
  bounds worst-case task time deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.sources.icelite import bucket_expr


def with_bucket(df: DataFrame, key_col: str = "url", n_buckets: int = 16) -> DataFrame:
    return df.withColumn("bucket", bucket_expr(key_col, n_buckets))


def salted_repartition(
    df: DataFrame,
    key_col: str = "url",
    n_buckets: int = 16,
    salt: int = 4,
    target_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (bucket, salt) so hot buckets split into ``salt``
    sub-tasks.  ``salt`` keys derive from a *different* hash seed than the
    bucket (xxhash64 with seed column trick) so they do not alias.

    The default partition count is 4x the tuple count: hashing exactly
    n_buckets*salt distinct (bucket, salt) tuples into that many
    partitions leaves ~1/e of them empty and co-locates several tuples —
    a hot bucket's salt shards frequently re-coalesced into ONE task,
    partially defeating the split.  With 4x head-room singleton placement
    is the overwhelmingly likely outcome; empty partitions cost a no-op
    task each."""
    n = target_partitions or (n_buckets * salt * 4)
    return df.repartition(
        n,
        bucket_expr(key_col, n_buckets),
        F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(salt)),
    )
