"""Watermark late-data semantics, pinned deterministically.

Three files consumed one per trigger (mtime-ordered), tumbling 5-minute
windows, 10-minute watermark, append mode. Watermark/eviction are
one-batch delayed (a batch's max event time sets the NEXT batch's
watermark), so the late row arrives only after its window is evicted:

  batch 0: 10:00, 10:02 (window A = [10:00,10:05)), 10:17
           → watermark for batch 1 = 10:07
  batch 1: 10:32 (on-time) — A (end 10:05 ≤ 10:07) is finalized: emitted
           with count 2 and evicted → watermark for batch 2 = 10:22
  batch 2: LATE event 10:01 — window A is closed and evicted; the row
           must be DROPPED, not resurrect A. D = [10:15,10:20) finalizes
           under watermark 10:22 with count 1.

Expected append-mode emissions: exactly {A: 2, D: 1}; no second A row,
and the 10:32 window never finalizes (stream ends) so it is absent.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone


def _write_events(spark, d: str, ts_list: list[str], mtime: int) -> None:
    rows = [
        (i, datetime.fromisoformat(t).replace(tzinfo=timezone.utc))
        for i, t in enumerate(ts_list)
    ]
    spark.createDataFrame(rows, "event_id long, ts timestamp") \
        .coalesce(1).write.parquet(d)
    for f in os.listdir(d):
        os.utime(os.path.join(d, f), (mtime, mtime))


def test_watermark_drops_late_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    src = str(tmp_path / "in")
    _write_events(spark, f"{src}/f0",
                  ["2025-01-01 10:00:00", "2025-01-01 10:02:00",
                   "2025-01-01 10:17:00"], 1_000_000)
    _write_events(spark, f"{src}/f1", ["2025-01-01 10:32:00"], 1_000_001)
    _write_events(spark, f"{src}/f2", ["2025-01-01 10:01:00"], 1_000_002)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"))
    )
    name = "wm_" + uuid.uuid4().hex[:8]
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName(name)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = (spark.table(name)
            .select(F.col("window.start").alias("start"), "n").collect())
    got = {r["start"].strftime("%H:%M"): r["n"] for r in rows}
    assert len(rows) == len(got), f"window emitted twice: {rows}"
    # late 10:01 row dropped (A evicted, not resurrected); D finalized
    # with 1; the 10:30-10:35 window never finalizes and must be absent
    assert got == {"10:00": 2, "10:15": 1}, got


def test_production_append_sink_path(spark, tmp_path):
    """windowed_event_counts_append (the documented production path):
    append mode + watermark land exactly the FINALIZED windows in the
    parquet sink — same eviction schedule as the memory-sink pin above."""
    from deepseek_ocr_vllm_spark.streaming.microbatch import (
        windowed_event_counts_append)

    def write_full(d, ts_list, mtime):
        rows = [
            (i, datetime.fromisoformat(t).replace(tzinfo=timezone.utc),
             1, "click", 1.0, "{}")
            for i, t in enumerate(ts_list)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (mtime, mtime))

    src = tmp_path / "src"
    write_full(str(src / "f0"), ["2024-01-01 10:00:00", "2024-01-01 10:02:00",
                                 "2024-01-01 10:17:00"], 1_000_000)
    write_full(str(src / "f1"), ["2024-01-01 10:32:00"], 1_000_001)
    write_full(str(src / "f2"), ["2024-01-01 10:01:00"], 1_000_002)  # late

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = windowed_event_counts_append(
        spark, str(src) + "/*", out, ckpt, max_files_per_trigger=1,
        glob="*.parquet",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.win_start.strftime("%H:%M"), r.n_events, r.value_sum)
        for r in spark.read.parquet(out).collect()
    }
    # A=[10:00,10:05) finalized with 2 (late 10:01 dropped);
    # D=[10:15,10:20) finalized with 1; 10:32's window never finalizes
    assert got == {("10:00", 2, 2.0), ("10:15", 1, 1.0)}
