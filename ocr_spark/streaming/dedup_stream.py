"""Streaming exact dedup: drop re-crawled duplicates as documents arrive.

A live crawl re-fetches pages; the batch dedup family
(ocr_spark/operators/dedup.py) handles the corpus at rest, this operator
handles the FIREHOSE: state-store-backed
``dropDuplicatesWithinWatermark`` on the content hash keeps exactly the
first arrival of each distinct text within the watermark horizon, and the
watermark bounds the state store (an unbounded ``dropDuplicates`` on a
10^12-doc stream would grow state forever — the horizon is the
operational knob: how stale a re-crawl can be and still be dropped).

Spark-first shape: the hash is ``md5`` (JVM codegen, identical to the
batch ``exact_dedup`` key), dedup state lives in the checkpointed state
store, downstream merge stays idempotent per url (reference K3) so
restarts never double-emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    horizon: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup over a stream: rows whose
    ``text_col`` md5 was already seen within ``horizon`` (event time) are
    dropped; state older than the watermark is evicted, bounding the
    store.  Returns the deduplicated stream (original columns).

    The key is ``md5(text)`` on the RAW column, exactly like the batch
    ``exact_dedup``: null texts key to NULL (one group of their own,
    matching batch groupBy-null semantics) and do NOT collide with
    empty-string texts — a ``coalesce(text, '')`` here would make the
    stream drop an empty doc because a null doc arrived first, diverging
    from what the batch pipeline keeps on the same corpus."""
    return (
        stream.withColumn("_text_md5", F.md5(F.col(text_col)))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["_text_md5"])
        .drop("_text_md5")
    )
