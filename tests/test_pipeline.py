"""End-to-end Spark pipeline: per-turn equality vs golden, stable ordering,
checkpoint/resume at partition granularity, idempotent re-run."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from deepseek_ocr_vllm_spark import pipeline
from deepseek_ocr_vllm_spark.extraction import golden


@pytest.fixture(scope="module")
def extracted(spark, transcripts_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "run")
    summary = pipeline.run_extraction(spark, transcripts_path, out,
                                      n_buckets=16, run_id=1)
    return out, summary


def test_pipeline_runs_all_turns(spark, transcripts_pdf, extracted):
    out, summary = extracted
    assert summary["turns"] == len(transcripts_pdf)
    df = pipeline.read_extracted(spark, out)
    assert df.count() == len(transcripts_pdf)


def test_per_turn_text_equality_vs_golden(spark, transcripts_pdf, extracted):
    """THE correctness gate: Spark output == golden extractor, per turn,
    under stable (conv_id, turn_idx) ordering."""
    out, _ = extracted
    got = (
        pipeline.read_extracted(spark, out)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "clean_text", "spans", "words",
                "tables", "n_nodes", "n_spans", "n_bytes", "kind")
        .collect()
    )
    want = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    for i, row in enumerate(got):
        g = golden.extract_turn(want.loc[i, "text"])
        assert row.conv_id == want.loc[i, "conv_id"]
        assert row.turn_idx == want.loc[i, "turn_idx"]
        assert row.clean_text == g["clean_text"], (row.conv_id, row.turn_idx)
        assert [(s.start, s.end, s.label) for s in row.spans] == [
            (d["start"], d["end"], d["label"]) for d in g["spans"]
        ]
        assert [(w.text, w.x0, w.y0, w.x1, w.y1) for w in row.words] == [
            (d["text"], d["x0"], d["y0"], d["x1"], d["y1"])
            for d in g["words"]
        ]
        assert [[list(r) for r in t] for t in row.tables] == g["tables"]
        assert (row.n_nodes, row.n_spans, row.n_bytes, row.kind) == (
            g["n_nodes"], g["n_spans"], g["n_bytes"], g["kind"]
        )


def test_checkpoint_metrics_match_output(spark, extracted):
    out, _ = extracted
    ckpt = spark.read.parquet(pipeline.checkpoint_path(out))
    agg = ckpt.agg(F.sum("n_turns"), F.sum("spans_emitted")).collect()[0]
    df = pipeline.read_extracted(spark, out)
    real = df.agg(F.count("*"), F.sum("n_spans")).collect()[0]
    assert agg[0] == real[0]
    assert agg[1] == real[1]
    assert ckpt.filter(F.col("status") != "done").count() == 0


def test_resume_from_partial_run(spark, transcripts_path, transcripts_pdf, tmp_path_factory):
    """Kill-then-resume: first wave processes 5 buckets, resume drains the
    rest; no duplicates, no gaps; completed buckets are not re-extracted."""
    out = str(tmp_path_factory.mktemp("out") / "resume")
    s1 = pipeline.run_extraction(spark, transcripts_path, out,
                                 n_buckets=16, run_id=1, max_buckets=5)
    assert s1["buckets_done"] == 5
    assert 0 < s1["turns"] < len(transcripts_pdf)

    s2 = pipeline.run_extraction(spark, transcripts_path, out,
                                 n_buckets=16, run_id=2)
    assert s2["resumed"] is True
    assert s1["turns"] + s2["turns"] == len(transcripts_pdf)

    df = pipeline.read_extracted(spark, out)
    assert df.count() == len(transcripts_pdf)
    dups = df.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dups == 0

    # fully-done table: a third run is a no-op
    s3 = pipeline.run_extraction(spark, transcripts_path, out,
                                 n_buckets=16, run_id=3)
    assert s3["turns"] == 0
    assert pipeline.read_extracted(spark, out).count() == len(transcripts_pdf)


def test_auto_bucket_sizing(spark, transcripts_path, monkeypatch):
    """auto_buckets = ceil(input bytes / target) with a cores floor."""
    cores = spark.sparkContext.defaultParallelism
    # tiny real input → floor at cores
    assert pipeline.auto_buckets(spark, transcripts_path) == cores
    # 10 GiB at 256 MiB/bucket → 40 buckets
    monkeypatch.setattr(pipeline, "input_bytes", lambda s, p: 10 << 30)
    assert pipeline.auto_buckets(spark, transcripts_path) == max(cores, 40)
    # 100 TiB → 409600 buckets (this is why the count can't be a constant)
    monkeypatch.setattr(pipeline, "input_bytes", lambda s, p: 100 << 40)
    assert pipeline.auto_buckets(spark, transcripts_path) == 409600


def test_resume_pins_bucket_config(spark, transcripts_path, transcripts_pdf,
                                   tmp_path_factory):
    """bucket_id depends on n_buckets: a resume under a different count
    must refuse (silent mis-hash of partially-done work otherwise); a
    resume with n_buckets=None picks up the pinned value."""
    out = str(tmp_path_factory.mktemp("out") / "pinned")
    s1 = pipeline.run_extraction(spark, transcripts_path, out,
                                 n_buckets=8, run_id=1, max_buckets=3)
    assert s1["buckets_done"] == 3 and s1["n_buckets"] == 8

    with pytest.raises(ValueError, match="pinned"):
        pipeline.run_extraction(spark, transcripts_path, out,
                                n_buckets=16, run_id=2)
    with pytest.raises(ValueError, match="turns_per_slice"):
        pipeline.run_extraction(spark, transcripts_path, out,
                                run_id=2, turns_per_slice=64)

    s2 = pipeline.run_extraction(spark, transcripts_path, out, run_id=2)
    assert s2["resumed"] is True and s2["n_buckets"] == 8
    assert s1["turns"] + s2["turns"] == len(transcripts_pdf)


def test_bucket_assignment_is_deterministic(spark, transcripts_path, extracted):
    out, _ = extracted
    df = pipeline.read_extracted(spark, out)
    # bucket = hash(conv_id, turn_idx div S): one (conv, slice) never
    # straddles buckets (a long conv spreads across buckets only at slice
    # boundaries — that's the skew salt working as designed)
    slice_id = (F.col("turn_idx") / pipeline.TURNS_PER_SLICE).cast("int")
    n = (
        df.groupBy("conv_id", slice_id.alias("slice_id"))
        .agg(F.countDistinct("bucket_id").alias("nb"))
        .filter("nb > 1")
        .count()
    )
    assert n == 0
    # and a >256-turn conversation really does use multiple buckets
    long_convs = (
        df.groupBy("conv_id").agg(
            F.max("turn_idx").alias("mx"), F.countDistinct("bucket_id").alias("nb")
        ).filter("mx >= 256")
    )
    assert long_convs.filter("nb < 2").count() < long_convs.count() or \
        long_convs.count() == 0


def test_task_equals_bucket_identity(spark, transcripts_path):
    """CLAUDE.md invariant: the reduce partition index equals bucket_id for
    every row — bucket_id = pmod(F.hash(conv_id, slice_id), n) and the
    repartition is on the same (conv_id, slice_id) key columns, and Spark
    hash partitioning is pmod(murmur3(cols), n) with the same murmur3.
    Guarantees every write task carries exactly one bucket (no empty tasks,
    no 2-bucket tasks from re-hashing the bucket_id column)."""
    import pyspark.sql.functions as F

    n = 8
    src = spark.read.parquet(transcripts_path).select(*pipeline.INPUT_COLS)
    out = pipeline.build_extract_plan(pipeline._with_bucket(src, n), n)
    pairs = (
        out.select(F.spark_partition_id().alias("pid"), "bucket_id")
        .distinct()
        .collect()
    )
    assert pairs and all(r.pid == r.bucket_id for r in pairs)
    # and every bucket present maps to exactly one task
    assert len({r.bucket_id for r in pairs}) == len(pairs)


def test_inline_metrics_mode_matches_rescan(spark, transcripts_path, tmp_path_factory):
    """metrics_mode='inline' (accumulator tap riding the write) must
    checkpoint byte-identical per-bucket metrics to the default re-scan."""
    out_a = str(tmp_path_factory.mktemp("mm") / "rescan")
    out_b = str(tmp_path_factory.mktemp("mm") / "inline")
    pipeline.run_extraction(spark, transcripts_path, out_a, n_buckets=8)
    pipeline.run_extraction(spark, transcripts_path, out_b, n_buckets=8,
                            metrics_mode="inline")
    cols = ["bucket_id", "n_turns", "nodes_classified", "spans_emitted",
            "bytes_processed"]
    a = sorted(tuple(r) for r in spark.read.parquet(
        pipeline.checkpoint_path(out_a)).select(*cols).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(
        pipeline.checkpoint_path(out_b)).select(*cols).collect())
    assert a == b and len(a) > 0


def test_salt_defuses_long_conversation_skew(spark):
    """North rule: a pathologically long conversation must SPREAD across
    buckets at slice granularity (turn_idx div TURNS_PER_SLICE joins the
    hash key) instead of pinning one task — with plain hash(conv_id) all
    10k turns of one conv would land in a single bucket."""
    import pyspark.sql.functions as F

    n = 32
    one_conv = spark.range(10_000).select(
        F.lit("conv_monster").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
    )
    dist = (
        pipeline._with_bucket(one_conv, n)
        .groupBy("bucket_id").count().collect()
    )
    n_buckets_hit = len(dist)
    biggest = max(r["count"] for r in dist)
    # 10k turns / 256-per-slice = ~40 slices hashed over 32 buckets
    assert n_buckets_hit >= 20, f"salt failed to spread: {n_buckets_hit}"
    assert biggest <= 10 * pipeline.TURNS_PER_SLICE, "one bucket pinned"
    # within a slice, turns stay together (resume granularity intact)
    slices = (
        pipeline._with_bucket(one_conv, n)
        .select("bucket_id", "__slice_id").distinct()
        .groupBy("__slice_id").count().collect()
    )
    assert all(r["count"] == 1 for r in slices)
