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

    This is the ORACLE variant (deterministic, bounded input). The
    production path is windowed_event_counts_append below: append mode +
    watermark bounds state (closed windows are evicted, late rows beyond
    the watermark dropped — semantics pinned by
    tests/test_streaming_semantics.py) and lands finalized windows in a
    file sink instead of holding every window in driver memory.
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


def windowed_event_counts_append(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    ckpt_path: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    glob: str = "*.parquet",
    max_files_per_trigger: int | None = None,
):
    """PRODUCTION window-count path: append output mode + watermark.

    State is bounded — a window is finalized and EVICTED once the
    watermark passes its end (late rows beyond it are dropped; exact
    eviction timing pinned in tests/test_streaming_semantics.py) — and
    finalized windows append to a parquet sink with a durable checkpoint,
    so the query restarts exactly-once from ckpt_path. Contrast
    windowed_event_counts above (complete mode + memory sink): right for
    the deterministic oracle, unbounded state in production.

    Returns the StreamingQuery; callers own its lifecycle
    (awaitTermination / processAllAvailable / stop).
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("value_sum_dec"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type", "n_events",
            F.col("value_sum_dec").cast("double").alias("value_sum"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt_path)
        .start()
    )


def stateful_sessions(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = 30, max_user: int = 100) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with a
    30-min inactivity gap via ``applyInPandasWithState`` — state (open
    session index/count/last-ts) carries across micro-batches.

    Deterministic multi-batch replay: the events table is split into two
    time-ordered files (all ts < cut, then ts >= cut) consumed one file
    per trigger, so every user's open session genuinely crosses the batch
    boundary. Update-mode emits re-publish a session's row as its count
    grows; the final read takes max(n_events) per (user, session), which
    equals the batch lag-gap+running-sum sessionization (w_sessionize) —
    same DuckDB oracle.

    At scale: state is hash-partitioned by user_id (Spark state store);
    a 1000-executor cluster shards it; no driver-side state.
    """
    import os
    import shutil
    import tempfile

    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_s = gap_minutes * 60.0
    work = tempfile.mkdtemp(prefix="sess_stream_")
    src_dir, ckpt_dir = os.path.join(work, "in"), os.path.join(work, "ckpt")
    os.makedirs(src_dir)
    try:
        ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .filter(F.col("user_id") <= max_user)
              .select("event_id", "ts", "user_id"))
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        cut = lo + (hi - lo) / 2  # time-range midpoint: both files non-trivial
        ev.filter(F.col("ts") < F.lit(cut)).coalesce(1) \
          .write.parquet(os.path.join(src_dir, "f0"))
        ev.filter(F.col("ts") >= F.lit(cut)).coalesce(1) \
          .write.parquet(os.path.join(src_dir, "f1"))
        # file-source ordering is (mtime, path): force f0 strictly first
        for i, d in enumerate(("f0", "f1")):
            for f in os.listdir(os.path.join(src_dir, d)):
                os.utime(os.path.join(src_dir, d, f), (1_000_000, 1_000_000 + i))

        def sessionize(key, pdfs, state):
            rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            if state.exists:
                idx, n, last = state.get
            else:
                idx, n, last = 0, 0, None
            sess_ids, counts = [], []
            for ts in rows["ts"]:
                t = ts.timestamp()
                if last is None or t - last > gap_s:
                    if idx > 0:  # previous session closed → final emit
                        sess_ids.append(idx)
                        counts.append(n)
                    idx += 1
                    n = 1
                else:
                    n += 1
                last = t
            sess_ids.append(idx)  # open-session snapshot (update mode:
            counts.append(n)      # a later batch re-emits a larger count)
            state.update((idx, n, last))
            yield pd.DataFrame({
                "user_id": int(key[0]), "session_id": sess_ids,
                "n_events": counts,
            })

        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        )
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            sessionize,
            outputStructType="user_id long, session_id long, n_events long",
            stateStructType="session_idx long, n long, last_ts double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        name = "sess_stream_" + uuid.uuid4().hex[:8]
        q = (sessions.writeStream.outputMode("update").format("memory")
             .queryName(name).option("checkpointLocation", ckpt_dir).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.table(name)
            .groupBy("user_id", "session_id")
            .agg(F.max("n_events").alias("n_events"))
            .orderBy("user_id", "session_id")
            # memory-sink rows must outlive the temp checkpoint dir
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


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
