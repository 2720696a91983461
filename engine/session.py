"""SparkSession construction tuned for this engine.

Settings rationale (scale-first, see SURVEY.md section 4):
- Arrow enabled: every custom stage (tokenize, posting encode, WAND) is an
  Arrow-vectorized pandas UDF / mapInPandas; per-row Python is banned by the
  input_hint.
- AQE on: runtime shuffle coalescing + skew-join splitting back up our
  explicit salting.
- UTC session timezone: the DuckDB oracle compares timestamps UTC-naive.
- shuffle.partitions ~= cores locally; on a real cluster this comes from the
  submit conf (AQE coalesces down anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-fulltext",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # This sandbox makes fresh mmap'd pages very expensive (~60 MB/s first
    # touch); numpy/Arrow buffers above glibc's 128 KiB threshold are mmap'd
    # and unmapped on free, re-faulting every allocation. Keeping large
    # allocations on the sbrk heap makes vectorized UDFs ~50x faster here
    # and is harmless elsewhere. Must be set before the JVM forks so Python
    # workers inherit it.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep AQE from coalescing a BYTE-small but COMPUTE-heavy shuffle
        # (e.g. the per-shard query stage: a few MB of postings, seconds of
        # scoring) below the core count — bytes are the wrong proxy there
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
