"""SparkSession factory with scale-oriented defaults.

Tuned for the extraction workload: wide binary ``html`` column flowing into
Arrow-vectorized pandas UDFs.  The same config block is what we would ship in
``spark-submit --conf`` on a real multi-executor cluster; in this sandbox the
master is ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches carry the raw html bytes (2–200 KB/doc, long-tailed).  The
# default 10k rows/batch would make multi-GB batches; 512 rows * ~20 KB avg
# keeps a batch ~10 MB — small enough for the Python worker heap, large
# enough to amortize the JVM<->Python Arrow channel.
ARROW_BATCH_ROWS = 512


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "ocr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    use_submit_master: bool = False,
) -> SparkSession:
    """``use_submit_master=True`` leaves the master unset so a
    ``spark-submit --master`` launch controls it (cluster mode).  A
    spark-submit launch is ALSO auto-detected (``PYSPARK_GATEWAY_PORT``
    marks the submit-provided JVM gateway, which already carries the
    submitted conf): builder options override submit conf, so setting
    ``builder.master`` here would silently clobber ``--master yarn`` and
    run the "cluster" job on the driver host at local[N]."""
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = SparkSession.builder
    if not use_submit_master:
        use_submit_master = "PYSPARK_GATEWAY_PORT" in os.environ
    if not use_submit_master:
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.appName(app_name)
        # ---- planner / AQE ------------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ---- Arrow / pandas-UDF channel ----------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        # ---- determinism for the DuckDB oracle ---------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # ---- scan splitting sized for sandbox fixtures -------------------
        # 4 MB: the 158 MB bench tier fans out to ~40 tasks (2-3 waves at
        # local[16], balanced vs the long-tailed doc sizes) and the 30 MB
        # small tier still spreads across 8 cores.  The earlier 1 MB
        # setting over-split the bench input into ~316 tiny tasks whose
        # scheduling + Arrow-channel overhead cost ~40% throughput at
        # local[16].  A production 100 TB table has >128 MB files and
        # keeps the 128m default.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("OCR_SPARK_MAX_PARTITION_BYTES", "4194304"),
        )
        .config("spark.sql.files.openCostInBytes", "65536")
        # ---- stragglers: extraction time varies ~100x by doc size --------
        .config("spark.speculation", "true")
        # ---- local-mode memory (driver == the one JVM) -------------------
        .config("spark.driver.memory", os.environ.get("OCR_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_or_create(app_name: str = "ocr_spark") -> SparkSession:
    """Reuse an active session if one exists (pytest shares one)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return build_session(app_name)
