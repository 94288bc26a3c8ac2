"""Micro-batch streaming: the reference's queue-consumer semantics
(batch consume + ack/retry, workers/vessel-ner/src/workers/
ocr-processor.ts:80-118,249-274; idempotent outbox sink,
apps/annotations-sink/outbox.go:75-87) re-expressed as Structured
Streaming with foreachBatch + idempotent append.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(spark: SparkSession, sf_dir: str,
                          window: str = "5 minutes") -> DataFrame:
    """Tumbling-window streaming aggregation over the events table read as
    a file stream; drains synchronously (processAllAvailable) and returns
    the final result as a batch DataFrame.

    complete output mode → every window surfaces (no watermark cutoff),
    so the result is deterministically comparable to a batch GROUP BY.
    """
    name = "stream_out_" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("value_sum_dec"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return (
        out.select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type", "n_events",
            F.col("value_sum_dec").cast("double").alias("value_sum"),
        )
        .orderBy("win_start", "event_type")
    )


def foreach_batch_idempotent(spark: SparkSession, sf_dir: str, out_path: str) -> int:
    """foreachBatch consumer writing to an idempotent keyed sink
    (ON CONFLICT DO NOTHING analog): each micro-batch appends only events
    whose event_id is not already present. Returns rows landed."""
    from ..sources import tableio

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        tableio.idempotent_append(
            spark, batch_df.select("event_id", "ts", "user_id", "event_type"),
            out_path, keys=["event_id"],
        )

    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_path).count()
