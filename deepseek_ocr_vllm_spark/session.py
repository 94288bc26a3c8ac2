"""SparkSession factory tuned for this engine.

Local-mode defaults mirror the reference's Spark conf
(reference: apps/spark-jobs/conf/rapids.conf:1-7 — shuffle partitions
sized to cores) but are written for a multi-executor cluster: AQE on,
Arrow on, UTC session timezone (so results compare bit-for-bit against
the DuckDB oracle), shuffle partitions ~ cores in local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 10_000  # rows per Arrow batch handed to the extraction UDF


def adaptive_width(df, bytes_per_task: int) -> int:
    """Scale-adaptive compute-repartition width (r6, optimization guide
    §2.5/§6), shared by every operator that repartitions before
    compute-dense map work: sized from the relation's PLAN-TIME size
    statistics (file bytes for scans; projections inherit an estimate —
    treat the result as an order of magnitude, not a byte count), so
    byte-small inputs keep their few partitions (the exchange would cost
    more than the compute it parallelizes) and larger inputs fan out,
    capped at the session's shuffle width. Never a literal core count."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    size = int(str(stats.sizeInBytes()))
    cap = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(cap, size // bytes_per_task + 1))


def get_spark(
    app_name: str = "deepseek_ocr_vllm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        # local[N] → N-ish partitions; a real cluster would set 2-3x total cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cores if n in ("", "*") else max(int(n), 4)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # zstd default: at 100 TB the write codec trades CPU for bytes on
        # disk AND bytes over the memory bus / network; measured here, snappy
        # sped up CPU-bound local[2] ~15% but its larger output slowed
        # local[8] (bus-bound) — zstd is the right default at scale, knob
        # for CPU-starved local runs
        .config("spark.sql.parquet.compression.codec",
                os.environ.get("SPARK_GRAFT_CODEC", "zstd"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
