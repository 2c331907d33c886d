"""Custom stateful streaming operator: per-host running extraction stats.

Demonstrates ``applyInPandasWithState`` — the arbitrary-stateful-processing
primitive — on the extraction stream: for each host, maintain running
(n_docs, n_errors, total_chars) across micro-batches and emit the updated
totals whenever the host receives new documents.  At crawl scale this is
the online per-host health/quota signal (e.g. stop fetching a host whose
error rate explodes) that a batch groupBy cannot provide incrementally.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOST_STATS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("total_chars", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n_docs, n_errors, total_chars = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_docs += len(pdf)
        n_errors += int(pdf["error"].notna().sum())
        total_chars += int(pdf["text"].str.len().sum())
    state.update((n_docs, n_errors, total_chars))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "n_docs": [n_docs],
            "n_errors": [n_errors],
            "total_chars": [total_chars],
        }
    )


HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)"  # same authority parse as
# host_report / urlnorm: no trailing-slash requirement (http://example.com
# and https://example.com?q=1 must not all collapse to host ''), port split


def host_stats_stream(extracted: DataFrame) -> DataFrame:
    """extracted (streaming) -> running per-host stats (update-per-batch)."""
    with_host = extracted.withColumn("host", F.regexp_extract("url", HOST_RE, 1))
    return (
        with_host.select("host", "error", "text")
        .groupBy("host")
        .applyInPandasWithState(
            _update,
            outputStructType=HOST_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_host_stats_once(
    spark, input_dir: str, updates_dir: str, checkpoint_dir: str
) -> str:
    """Drain all currently-available page files (availableNow, several
    micro-batch epochs) through extraction + the stateful per-host
    operator, appending every update row tagged with (run, epoch) to
    ``updates_dir`` — the durable update log a monitoring sink would
    consume at crawl scale.  Returns the run token: epochs restart at 0
    under a fresh checkpoint, so rows from different runs sharing an
    append-mode log are only ordered WITHIN a run."""
    import time

    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.schemas import PAGES_SCHEMA

    run_token = f"{time.time_ns():020d}"  # zero-padded: lexicographic == numeric
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    stats = host_stats_stream(extract_pages(stream))

    def sink(batch_df, epoch_id: int) -> None:
        batch_df.withColumn("_run", F.lit(run_token)).withColumn(
            "_epoch", F.lit(int(epoch_id))
        ).write.mode("append").parquet(updates_dir)

    q = (
        stats.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return run_token


def final_host_stats(spark, updates_dir: str, run_token: str | None = None) -> DataFrame:
    """Fold the update log to its FIXPOINT: the last update per host
    within ONE run is the running total after that run's final batch —
    which must equal the batch groupBy over the same input (the
    oracle-checkable end state of the incremental computation).

    Only ``run_token``'s rows (default: the latest run) are folded: a
    reused updates_dir holds earlier runs whose epochs also start at 0,
    and a tie on the bare epoch column would break nondeterministically,
    sometimes returning the PREVIOUS run's totals."""
    from pyspark.sql import Window

    log = spark.read.parquet(updates_dir)
    if run_token is None:
        run_token = log.agg(F.max("_run")).collect()[0][0]
    w = Window.partitionBy("host").orderBy(F.col("_epoch").desc())
    return (
        log.filter(F.col("_run") == run_token)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_epoch", "_run")
    )
