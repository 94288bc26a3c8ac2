"""Flagship extraction job (the north rule, /root/repo/BASELINE.json).

Plan shape, designed for 10^12 turns on a 1000-executor cluster:

  scan transcripts (parquet/Iceberg; column-pruned: the UDF only needs the
      six input columns, Catalyst prunes the rest)
  → bucket_id = pmod(hash(conv_id, turn_idx div S), n_buckets)
      [deterministic salted bucketing: the slice term spreads a 5M-turn
       conversation across buckets instead of pinning one core — the
       reference's hash(path)%n endpoint-salting idiom, job.py:144-148]
  → anti-join checkpoint(status=done) on bucket_id        [resume]
  → mapInArrow extract (one Python call per Arrow batch, on scan
      partitions — measured ~35% faster than extracting after the
      shuffle; see build_extract_plan for the A/B)
  → repartition(n_buckets, conv_id, slice_id)
      .sortWithinPartitions(conv_id, turn_idx)            [stable turn order;
      partition index == bucket_id exactly (murmur3 identity, _with_bucket)
      → task == bucket == output dir == lineage row]
  → write partitionBy(bucket_id), dynamic overwrite       [per-bucket atomic,
      idempotent re-run]
  → append per-bucket lineage+metrics rows to checkpoint  [A11 audit pattern,
      sql/ebisu_transform.sql:13-21]

Extraction is per-turn, so conversations need not be co-located; the
(conv_id, turn_idx) sortWithinPartitions gives stable intra-task ordering
(north rule W4) without a global sort.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract import extract_map_in_arrow
from .sources import tableio

TURNS_PER_SLICE = 256
# auto-sizing target: ~256 MB of INPUT per bucket/task. 100 TB → ~400k
# buckets; 64 static buckets would mean 1.5 TB tasks
TARGET_BUCKET_INPUT_BYTES = 256 << 20

INPUT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def turns_path(output_dir: str) -> str:
    return f"{output_dir}/extracted_turns"


def checkpoint_path(output_dir: str) -> str:
    return f"{output_dir}/checkpoint"


def meta_path(output_dir: str) -> str:
    return f"{output_dir}/_job_meta.json"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) via the Hadoop FS API — works for local paths
    here and for HDFS/S3A on a cluster (os.path would silently treat a
    's3a://…' URI as a weird local directory)."""
    jvm = spark._jvm  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath  # noqa: SLF001


def input_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path``. Raises if the path does not exist —
    callers rely on that to validate the input BEFORE pinning job meta."""
    fs, hpath = _hadoop_fs(spark, path)
    return int(fs.getContentSummary(hpath).getLength())


def auto_buckets(spark: SparkSession, input_path: str,
                 target_bytes: int = TARGET_BUCKET_INPUT_BYTES,
                 in_bytes: int | None = None) -> int:
    """Size the bucket count from the data, not a constant: ceil(input
    bytes / target) with a floor of the cluster's parallelism (never leave
    cores idle on small inputs) and a sanity cap."""
    cores = spark.sparkContext.defaultParallelism
    if in_bytes is None:
        in_bytes = input_bytes(spark, input_path)
    by_size = -(-in_bytes // target_bytes)
    return int(min(max(cores, by_size), 1 << 20))


def read_meta(spark: SparkSession, output_dir: str) -> dict | None:
    fs, p = _hadoop_fs(spark, meta_path(output_dir))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = spark._jvm.org.apache.commons.io.IOUtils.toString(  # noqa: SLF001
            stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(raw)


def _write_meta(spark: SparkSession, output_dir: str, meta: dict) -> None:
    fs, p = _hadoop_fs(spark, meta_path(output_dir))
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(meta).encode("utf-8")))
    finally:
        out.close()


def _with_bucket(df: DataFrame, n_buckets: int,
                 turns_per_slice: int = TURNS_PER_SLICE) -> DataFrame:
    """Salted bucket assignment: bucket = pmod(hash(conv_id, slice_id), n).

    The slice term is the skew salt — a pathologically long conversation
    spreads across buckets at slice granularity instead of pinning one task
    (the reference's hash(path)%n distribution idiom, job.py:144-148).

    INVARIANT (CLAUDE.md): F.hash IS Spark's murmur3 with the same seed
    HashPartitioning uses, so bucket_id == pmod(murmur3(conv_id, slice_id),
    n) == the reduce partition index when build_extract_plan repartitions
    by (conv_id, __slice_id). Every write task therefore carries exactly
    ONE bucket (task == bucket == output dir == lineage row) — repartition
    by the bucket_id COLUMN would re-hash it (pmod(murmur3(bucket_id), n))
    and leave ~1/e of write tasks empty while others carry 2+ buckets."""
    slice_id = (F.col("turn_idx") / F.lit(turns_per_slice)).cast("int")
    return df.withColumn("__slice_id", slice_id).withColumn(
        "bucket_id",
        F.pmod(F.hash("conv_id", F.col("__slice_id")), F.lit(n_buckets))
        .cast("int"),
    )


def build_extract_plan(df: DataFrame, n_buckets: int) -> DataFrame:
    """The pre-write plan (also asserted by tests/test_plan_quality.py):

      extract (mapInArrow on SCAN partitions, BEFORE the shuffle)
      → repartition(n_buckets, bucket_id)  [the ONLY shuffle: task ==
          bucket == output dir == lineage row]
      → sortWithinPartitions(conv_id, turn_idx)  [stable turn order, W4]

    Order measured, not assumed — alternating A/B at local[8], 3M turns,
    same session: extract-before-shuffle 78.7s/53.2s vs extract-after
    122.5s/81.4s (~35% faster both rounds). The exchange then carries the
    extracted output (clean_text + spans ≈ 60% of raw text bytes) instead
    of raw text, extraction reads the scan locally with no shuffle-read in
    front of the Python stage, and UDF parallelism is sized by input
    splits (see _scan_split_override) independent of the bucket count.
    The stage barrier this introduces (write starts after extraction
    finishes) costs less than it saves — both stages keep all cores busy.
    """
    out = extract_map_in_arrow(df, text_col="text").drop("text")
    return (
        # repartition on the KEY COLUMNS, not the bucket_id column: Spark
        # hash-partitioning is pmod(murmur3(cols), n), which equals
        # bucket_id exactly (see _with_bucket) — task == bucket == dir
        out.repartition(n_buckets, "conv_id", "__slice_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .drop("__slice_id")
    )


class _PartitionMetricsParam(AccumulatorParam):
    """Accumulator merging {partition_id: {bucket_id: [n, nodes, spans,
    bytes]}}. Keyed by partition id with OVERWRITE merge semantics: a
    retried/speculated task re-sends the identical deterministic entry, so
    the transformation-level exactly-once gap accumulators normally have
    does not corrupt the sums."""

    def zero(self, value):  # noqa: ARG002
        return {}

    def addInPlace(self, a, b):
        a.update(b)
        return a


def _tap_bucket_metrics(df: DataFrame, acc) -> DataFrame:
    """Pass-through mapInArrow AFTER the bucket repartition that streams
    batches unchanged while summing per-bucket lineage metrics into an
    accumulator. Because the exchange makes task == bucket, the driver-side
    dict is O(n_buckets) — per-bucket metrics ride the WRITE action itself,
    with one read of the input and ZERO reads of the output.

    NOT the default: the pass-through sends 100% of output bytes on a
    second JVM→Python→JVM Arrow round trip, and alternating same-session
    A/B at 200k turns / local[32] measured it SLOWER than re-scanning the
    four pruned metric columns in 3 of 4 pairs — (13.7 vs 4.8), (4.5 vs
    5.5), (9.7 vs 9.2), (18.8 vs 7.6) s extract_write — worst exactly when
    the shared memory bus is congested. Kept as metrics_mode='inline' for
    deployments where re-reading the sink is the worse trade (object-store
    egress cost, cold storage)."""
    schema = df.schema

    def tap(batches):
        import pyarrow.compute as pc
        from pyspark import TaskContext

        totals: dict[int, list[int]] = {}
        for batch in batches:
            bids = batch.column("bucket_id")
            uniq = pc.unique(bids).to_pylist()
            if len(uniq) == 1:  # task == bucket: the designed common case
                parts = [(uniq[0], batch)]
            else:
                parts = [(u, batch.filter(pc.equal(bids, u))) for u in uniq]
            for bkt, sel in parts:
                t = totals.setdefault(int(bkt), [0, 0, 0, 0])
                t[0] += sel.num_rows
                t[1] += pc.sum(sel.column("n_nodes")).as_py() or 0
                t[2] += pc.sum(sel.column("n_spans")).as_py() or 0
                t[3] += pc.sum(sel.column("n_bytes")).as_py() or 0
            yield batch
        if totals:
            acc.add({TaskContext.get().partitionId(): totals})

    return df.mapInArrow(tap, schema)


def completed_buckets(spark: SparkSession, output_dir: str) -> DataFrame | None:
    ckpt = tableio.read_or_none(spark, checkpoint_path(output_dir))
    if ckpt is None:
        return None
    return ckpt.filter(F.col("status") == "done").select("bucket_id").distinct()


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    n_buckets: int | None = None,
    run_id: int = 1,
    max_buckets: int | None = None,
    turns_per_slice: int = TURNS_PER_SLICE,
    metrics_mode: str = "rescan",
) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict.

    ``n_buckets=None`` auto-sizes from input bytes (auto_buckets). The
    resolved bucket config is PINNED in ``_job_meta.json`` on first run:
    bucket_id depends on n_buckets, so a resume under a different count
    would silently mis-hash partially-done work — conflicting explicit
    values raise instead.

    ``max_buckets`` processes only the first K pending buckets — used by
    tests to simulate a killed run, and operationally to drain in waves.

    ``metrics_mode``: how per-bucket lineage metrics are computed.
    'rescan' (default, A/B-measured faster — see _tap_bucket_metrics)
    re-reads ONLY the four pruned metric columns of what was just written;
    'inline' accumulates them during the write itself (zero output reads,
    one extra Arrow round trip of all output bytes).
    """
    t0 = time.time()
    # validate the input FIRST (input_bytes raises on a missing path) so a
    # typo'd first run cannot pin job meta for an output that never ran;
    # the byte count also feeds auto-sizing and the scan-split override
    # (one FS listing — on an object store that walk is expensive)
    in_bytes = input_bytes(spark, input_path)
    meta = read_meta(spark, output_dir)
    if meta is not None:
        if n_buckets is not None and n_buckets != meta["n_buckets"]:
            raise ValueError(
                f"resume with n_buckets={n_buckets} but this output was "
                f"started with n_buckets={meta['n_buckets']} "
                f"({meta_path(output_dir)}); bucket hashing is pinned"
            )
        if turns_per_slice != meta["turns_per_slice"]:
            raise ValueError(
                f"resume with turns_per_slice={turns_per_slice} != pinned "
                f"{meta['turns_per_slice']}"
            )
        n_buckets = meta["n_buckets"]
    else:
        if n_buckets is None:
            n_buckets = auto_buckets(spark, input_path, in_bytes=in_bytes)
        _write_meta(spark, output_dir, {
            "n_buckets": n_buckets, "turns_per_slice": turns_per_slice,
            "input_path": input_path,
        })

    with _scan_split_override(spark, in_bytes):
        return _run_pending(spark, input_path, output_dir, n_buckets,
                            run_id, max_buckets, turns_per_slice, t0,
                            metrics_mode)


@contextmanager
def _scan_split_override(spark: SparkSession, in_bytes: int):
    """The extraction UDF runs on SCAN partitions (pre-shuffle), so split
    size must give that stage real parallelism even on small inputs: aim
    for ~4 task waves per core, but never below 4 MB and never above the
    storage-friendly 128 MB default (at 100 TB the cap wins and scan
    splitting behaves normally)."""
    key = "spark.sql.files.maxPartitionBytes"
    cores = spark.sparkContext.defaultParallelism
    split = max(4 << 20, min(128 << 20, in_bytes // (cores * 4)))
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(split))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _run_pending(spark, input_path, output_dir, n_buckets, run_id,
                 max_buckets, turns_per_slice, t0,
                 metrics_mode: str = "rescan") -> dict:
    src = spark.read.parquet(input_path).select(*INPUT_COLS)
    df = _with_bucket(src, n_buckets, turns_per_slice)

    done = completed_buckets(spark, output_dir)
    if done is not None:
        # broadcast: the done-set is ≤ n_buckets rows — never a shuffle
        df = df.join(F.broadcast(done), "bucket_id", "left_anti")
        if done.count() >= n_buckets or df.isEmpty():
            # fully-drained table: no-op resume
            return {"buckets_done": 0, "turns": 0, "elapsed_sec":
                    round(time.time() - t0, 3), "run_id": run_id, "resumed": True}

    if max_buckets is not None:
        pending = sorted(
            r.bucket_id for r in df.select("bucket_id").distinct().collect()
        )[:max_buckets]
        if not pending:
            return {"buckets_done": 0, "turns": 0, "elapsed_sec": 0.0,
                    "run_id": run_id, "resumed": done is not None}
        df = df.filter(F.col("bucket_id").isin(pending))

    out = build_extract_plan(df, n_buckets)
    acc = None
    if metrics_mode == "inline":
        acc = spark.sparkContext.accumulator({}, _PartitionMetricsParam())
        out = _tap_bucket_metrics(out, acc)
    tableio.write_partitioned(out, turns_path(output_dir), ["bucket_id"])
    t_write = time.time()

    # write-then-commit: a crash before the checkpoint append leaves the
    # bucket pending, and the re-run overwrites the same partition — the
    # sink stays idempotent under either metrics mode
    merged: dict[int, list[int]] = {}
    if acc is not None:
        # metrics rode the write itself (pass-through tap)
        for per_bucket in acc.value.values():
            for bkt, sums in per_bucket.items():
                m = merged.setdefault(bkt, [0, 0, 0, 0])
                for i in range(4):
                    m[i] += sums[i]
    else:
        # re-scan ONLY the four metric columns of what landed (parquet
        # column pruning: a ~1-3%-of-bytes read; A/B-measured cheaper
        # than the inline tap on this box — see _tap_bucket_metrics)
        written = spark.read.parquet(turns_path(output_dir))
        if done is not None:
            written = written.join(F.broadcast(done), "bucket_id", "left_anti")
        if max_buckets is not None:
            written = written.filter(F.col("bucket_id").isin(pending))
        for r in written.groupBy("bucket_id").agg(
            F.count("*").alias("n"),
            F.sum("n_nodes").alias("nodes"),
            F.sum("n_spans").alias("spans"),
            F.sum("n_bytes").alias("nbytes"),
        ).collect():  # ≤ n_buckets rows
            merged[r.bucket_id] = [r.n, r.nodes, r.spans, r.nbytes]
    t_metrics = time.time()

    ckpt = tableio.read_or_none(spark, checkpoint_path(output_dir))
    already = (
        {r.bucket_id for r in ckpt.select("bucket_id").distinct().collect()}
        if ckpt is not None else set()
    )
    fresh = sorted(
        (bkt, s) for bkt, s in merged.items() if bkt not in already
    )
    if fresh:
        spark.createDataFrame(
            [(run_id, bkt, s[0], s[1], s[2], s[3], "done")
             for bkt, s in fresh],
            "run_id long, bucket_id int, n_turns long, nodes_classified long, "
            "spans_emitted long, bytes_processed long, status string",
        ).withColumn("committed_at", F.current_timestamp()) \
         .write.mode("append").parquet(checkpoint_path(output_dir))
    return {
        "buckets_done": len(fresh),
        "n_buckets": n_buckets,
        "turns": sum(s[0] for _bkt, s in fresh),
        "elapsed_sec": round(time.time() - t0, 3),
        # phase breakdown: scan→extract→shuffle→write, then the metrics
        # step (pruned re-scan, or ~0 when they rode the write inline) and
        # the checkpoint append — bookkeeping fixed costs that cap
        # measurable single-node scaling
        "extract_write_sec": round(t_write - t0, 3),
        "metrics_sec": round(t_metrics - t_write, 3),
        "checkpoint_sec": round(time.time() - t_metrics, 3),
        "run_id": run_id,
        "resumed": done is not None,
    }


def read_extracted(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(turns_path(output_dir))
