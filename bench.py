"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], plus extraction throughput (the north-rule
metric: extracted turns/sec).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "turns_per_sec": R, "extract_turns": N, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "j1_inner_equi_join",
    "j6_broadcast_dim_join",
    "j10_disjunctive_identity_lookup",
    "w5_confidence_ranked_best",
    "j5_reconciliation_diff",
    "dd_minhash_lsh",
    "dd_embed_cosine",
    "dd_simhash",
    "sim_ivf_topk",
    "t5_fuzzy_trigram_search",
    "tx_quality",
    "stream_window_counts",
]

BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "200000"))


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from deepseek_ocr_vllm_spark.plans import REGISTRY

    # JVM/codegen warmup so the first measured query isn't charged for JIT
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()

    # best-of-2 per query: this box drifts 2-4x between noise windows
    # (BENCH/BASELINE.md "Measurement discipline"); a single sample is
    # as much a measurement of the window as of the query
    times: dict[str, float] = {}
    for _round in range(2):
        for name in HEADLINE:
            fn, _sql = REGISTRY[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            el = round(time.time() - t0, 3)
            if name not in times or el < times[name]:
                times[name] = el
            _ = n
    return times


def bench_ann_probe(spark, sf_dir: str) -> float:
    """Materialized-IVF probe latency: build the index once (untimed —
    that's the amortized build), then time the partition-pruned search
    (the per-query serving cost the index exists for). Best-of-2."""
    from deepseek_ocr_vllm_spark.operators import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        ann.build_ivf_index(emb, idx)
        qvec = [float(v) for v in emb.filter("vec_id = 0").first().embedding]
        best = None
        for _ in range(2):
            t0 = time.time()
            n = ann.ivf_search(spark, idx, qvec, k=10, n_probe=2,
                               exclude_vec_id=0).count()
            el = round(time.time() - t0, 3)
            best = el if best is None or el < best else best
            _ = n
        return best
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _sample_equality(spark, cache: str, out: str, k: int = 200) -> bool:
    """North-rule certificate: K sampled output turns must equal the golden
    extractor on the same input (the full-table equality lives in pytest;
    this pins the BENCHED run itself)."""
    from deepseek_ocr_vllm_spark import pipeline
    from deepseek_ocr_vllm_spark.extraction import golden

    got = (
        pipeline.read_extracted(spark, out)
        .select("conv_id", "turn_idx", "clean_text", "n_spans")
        .sample(False, min(1.0, (k * 4) / max(BENCH_TURNS, 1)), seed=7)
        .limit(k).collect()
    )
    src = spark.read.parquet(cache).select("conv_id", "turn_idx", "text")
    keys = {(r.conv_id, r.turn_idx) for r in got}
    texts = {
        (r.conv_id, r.turn_idx): r.text
        for r in src.filter(
            src.conv_id.isin([c for c, _ in keys])).collect()
        if (r.conv_id, r.turn_idx) in keys
    }
    for r in got:
        g = golden.extract_turn(texts[(r.conv_id, r.turn_idx)])
        if r.clean_text != g["clean_text"] or r.n_spans != g["n_spans"]:
            return False
    return len(got) > 0


def bench_extraction(spark) -> tuple[float, int, float, bool]:
    """Extraction throughput on a cached deterministic transcripts table."""
    from deepseek_ocr_vllm_spark import fixtures, pipeline

    cache = os.path.join(tempfile.gettempdir(), f"bench_transcripts_{BENCH_TURNS}.parquet")
    if not os.path.exists(cache):
        fixtures.write_transcripts_parquet(cache, BENCH_TURNS)
    # buckets size the POST-shuffle sort+write stage only (extraction runs
    # pre-shuffle on scan splits — pipeline.build_extract_plan); cores/2
    # write tasks measured well here, and fewer/larger output files is the
    # right shape anyway. At cluster scale auto-sizing picks the count.
    n_buckets = max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")) // 2, 8)
    best = None
    equality_ok = False
    # best-of-2: single-run timings on this box are bimodal (host/NUMA
    # noise produces occasional 2-4x outliers on identical runs)
    for i in range(2):
        out = tempfile.mkdtemp(prefix="bench_extract_")
        try:
            t0 = time.time()
            summary = pipeline.run_extraction(spark, cache, out, n_buckets=n_buckets)
            elapsed = time.time() - t0
            if best is None or elapsed < best[0]:
                best = (elapsed, summary["turns"])
            if i == 0:  # certify the landed output once (untimed)
                equality_ok = _sample_equality(spark, cache, out)
        finally:
            shutil.rmtree(out, ignore_errors=True)
    elapsed, turns = best
    return elapsed, turns, round(turns / elapsed, 1), equality_ok


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from deepseek_ocr_vllm_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    queries = bench_queries(spark, sf_dir)
    queries["ann_ivf_probe"] = bench_ann_probe(spark, sf_dir)
    ext_sec, ext_turns, turns_per_sec, equality_ok = bench_extraction(spark)
    total = round(sum(queries.values()) + ext_sec, 3)
    print(json.dumps({
        "metric": "headline_queries_plus_extraction_sec",
        "value": total,
        "unit": "sec",
        "queries": {**queries, "extraction_pipeline": round(ext_sec, 3)},
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "extract_turns": ext_turns,
        "turns_per_sec": turns_per_sec,
        "per_turn_equality_sample_ok": equality_ok,
        "cpus": int(cpus),
    }))


if __name__ == "__main__":
    main()
