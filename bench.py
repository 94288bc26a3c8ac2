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
    "mm_media_features",
    "stream_window_counts",
]

BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "200000"))
BENCH_PDF_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_PDF_DOCS", "500"))

# production knobs for the full-corpus dedup/ANN evidence runs (the
# oracle-scale gate keeps the toy 6/2 defaults; these are the documented
# 100-TB settings — knobs are read at query-BUILD time so setting them
# here changes the full-run plans only)
FULL_KNOBS = {
    "SPARK_GRAFT_MINHASH_PERMS": "128",
    "SPARK_GRAFT_MINHASH_ROWS_PER_BAND": "8",
    # hot-band cap for the full-corpus simhash runs — pinned so a leaked
    # user env value can't silently shift the bench evidence (review r5)
    "SPARK_GRAFT_SIMHASH_BAND_POP": "500",
}


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


def bench_full_scale(spark, sf_dir: str) -> dict[str, dict]:
    """VERDICT r3 #2: the banded dedup/ANN family over the FULL corpus —
    no doc_id/vec_id oracle cost slices — at production knobs. Reports
    wall time, result rows and CANDIDATE-PAIR counts: the evidence that
    the blocked joins stay sub-quadratic at volume. Correctness of these
    exact code paths is gated at oracle scale; this is the perf run."""
    from deepseek_ocr_vllm_spark.plans.queries_ml import (
        dd_embed_cosine_full, dd_minhash_full, dd_simhash_full)
    from deepseek_ocr_vllm_spark.plans.queries_text import t5_fuzzy_full

    out: dict[str, dict] = {}
    saved = {k: os.environ.get(k) for k in FULL_KNOBS}
    os.environ.update(FULL_KNOBS)
    try:
        def run(name, builder, n_inputs, cand_counter, allpairs=None):
            best = None
            for _ in range(2):
                # time build + count: dd_embed's builder runs real jobs
                # (centroid collect) that belong to the query's cost
                t0 = time.time()
                result, cand = builder()
                n_res = result.count()
                el = round(time.time() - t0, 3)
                best = el if best is None or el < best else best
            n_cand = cand_counter(cand)
            out[name] = {
                "sec": best, "inputs": n_inputs, "result_rows": n_res,
                "candidate_pairs": n_cand,
                # self-join dedups compare against C(n,2); probe searches
                # (t5) against probes x targets — never overstate the
                # brute-force baseline being avoided
                "allpairs_equivalent": (
                    allpairs if allpairs is not None
                    else n_inputs * (n_inputs - 1) // 2),
            }

        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
        run("dd_minhash_full", lambda: dd_minhash_full(spark, sf_dir),
            n_docs, lambda c: c.count())
        run("dd_simhash_full", lambda: dd_simhash_full(spark, sf_dir),
            n_docs, lambda c: c.first()["n_candidates"])
        run("dd_embed_cosine_full", lambda: dd_embed_cosine_full(spark, sf_dir),
            n_vecs, lambda c: c.count())
        from deepseek_ocr_vllm_spark.plans.queries_text import (
            T5_FULL_PROBE_FILTER)

        n_probes = (spark.read.parquet(f"{sf_dir}/part.parquet")
                    .filter(T5_FULL_PROBE_FILTER).count())
        run("t5_fuzzy_full", lambda: t5_fuzzy_full(spark, sf_dir),
            n_parts, lambda c: c.count(), allpairs=n_probes * n_parts)
        # unlabeled-corpus path: k-means coarse quantizer TRAINED on the
        # full corpus (Lloyd as DataFrame ops) + the same blocked pair
        # generation — single run (training dominates; the banded runs
        # above already carry the best-of-2 discipline)
        from deepseek_ocr_vllm_spark.plans.queries_ml import (
            embed_pairs_unlabeled)

        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select("vec_id", "embedding"))
        t0 = time.time()
        n_pairs = embed_pairs_unlabeled(emb, k=16, n_iter=3).count()
        out["embed_unlabeled_pairs_full"] = {
            "sec": round(time.time() - t0, 3), "inputs": n_vecs,
            "result_rows": n_pairs, "candidate_pairs": n_pairs,
            "allpairs_equivalent": n_vecs * (n_vecs - 1) // 2,
        }
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return out


def bench_pdf_extraction(spark) -> dict:
    """VERDICT r3 #5: the X1 hot path on REAL ``%PDF-`` bytes — binary
    scan → wire-format parse (extraction/pdfbytes) → Arrow extract.
    Deterministic multi-page PDF corpus, cached like the transcripts."""
    from deepseek_ocr_vllm_spark import fixtures
    from deepseek_ocr_vllm_spark.sources.binary_docs import extract_binary_docs

    # cache key includes a hash of the WHOLE fixtures module source (the
    # generator calls _sentence/_seed and reads WORDS — hashing only its
    # own body would miss edits to those), so fixture edits invalidate the
    # corpus automatically (the manual-removal trap CLAUDE.md documents
    # for the transcript caches)
    import hashlib
    import inspect

    gen_tag = hashlib.sha256(
        inspect.getsource(fixtures).encode()).hexdigest()[:8]
    cache = os.path.join(tempfile.gettempdir(),
                         f"bench_pdfs_{BENCH_PDF_DOCS}_{gen_tag}")
    done_marker = os.path.join(cache, ".complete")
    if not os.path.exists(done_marker):
        shutil.rmtree(cache, ignore_errors=True)  # partial write → rebuild
        fixtures.write_pdf_corpus(cache, BENCH_PDF_DOCS)
        open(done_marker, "w").close()
    best = None
    for i in range(2):
        t0 = time.time()
        df = extract_binary_docs(spark, cache)
        n = df.count()
        el = round(time.time() - t0, 3)
        best = el if best is None or el < best else best
        if i == 0:
            # certificate (untimed): K sampled outputs must equal the
            # golden extractor fed by the same wire-format parse — the
            # pdf analog of the transcript bench's equality sample
            from deepseek_ocr_vllm_spark.extraction import golden
            from deepseek_ocr_vllm_spark.extraction.pdfbytes import (
                pdf_bytes_to_layout_records)

            sample = df.select("path", "clean_text").limit(20).collect()
            for r in sample:
                raw = open(r.path.replace("file:", ""), "rb").read()
                g = golden.extract_turn(pdf_bytes_to_layout_records(raw))
                assert r.clean_text == g["clean_text"], r.path
            equality_ok = len(sample) > 0
    return {"sec": best, "docs": n, "docs_per_sec": round(n / best, 1),
            "equality_sample_ok": equality_ok}


def bench_dedup_scaling(spark) -> dict:
    """VERDICT r4 #5: the banded dedup/ANN family one order of magnitude
    up — a deterministic 10× statistical twin of the driver corpus
    (fixtures.write_scaled_corpus: resampled unigram/length distributions
    + the base corpus's seeded dup structure) — so candidate-pair growth
    vs sf0.1 is MEASURED, not argued from cap arithmetic. Single run per
    family (pair counts are deterministic; the sf0.1 best-of-2 numbers in
    full_scale carry the timing discipline). Read side by side with
    full_scale: all-pairs grows 100×; minhash/embed/t5 candidates grow
    ~10× (linear — the caps hold), and simhash runs CAPPED too (r5: hot
    band buckets past SPARK_GRAFT_SIMHASH_BAND_POP dropped, measured
    1.24M → 6.23M across the 10×; its UNCAPPED banding tracked
    all-pairs at ~15% on this tiny-vocab corpus — the motivation,
    recorded in BENCH/BASELINE.md with the recall tradeoff).
    embed_pairs_unlabeled is omitted here: training-dominated, measured
    once for the BASELINE table (19× across the 10×) and covered at
    sf0.1."""
    import hashlib
    import inspect

    from deepseek_ocr_vllm_spark import fixtures
    from deepseek_ocr_vllm_spark.plans.queries_ml import (
        dd_embed_cosine_full, dd_minhash_full, dd_simhash_full)
    from deepseek_ocr_vllm_spark.plans.queries_text import (
        T5_FULL_PROBE_FILTER, t5_fuzzy_full)

    gen_tag = hashlib.sha256(
        inspect.getsource(fixtures).encode()).hexdigest()[:8]
    sf1 = os.path.join(tempfile.gettempdir(), f"bench_sf1_{gen_tag}")
    done_marker = os.path.join(sf1, ".complete")
    if not os.path.exists(done_marker):
        shutil.rmtree(sf1, ignore_errors=True)
        fixtures.write_scaled_corpus(sf1)
        open(done_marker, "w").close()

    out: dict[str, dict] = {}
    saved = {k: os.environ.get(k) for k in FULL_KNOBS}
    os.environ.update(FULL_KNOBS)
    try:
        n_docs = spark.read.parquet(f"{sf1}/documents.parquet").count()
        n_vecs = spark.read.parquet(f"{sf1}/embeddings.parquet").count()
        n_parts = spark.read.parquet(f"{sf1}/part.parquet").count()
        n_probes = (spark.read.parquet(f"{sf1}/part.parquet")
                    .filter(T5_FULL_PROBE_FILTER).count())

        # wall-clock budget for this section (NOT silent: families that
        # don't fit are listed in skipped_for_budget) — a slow host
        # window must degrade the evidence, never time out the whole
        # bench. Families run cheap-first so a partial run still carries
        # the cap-arithmetic curve.
        budget = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET_SEC", "600"))
        t_start = time.time()
        skipped: list[str] = []

        def run(name, builder, n_inputs, cand_counter, allpairs=None):
            if time.time() - t_start > budget:
                skipped.append(name)
                return
            t0 = time.time()
            result, cand = builder()
            n_res = result.count()
            el = round(time.time() - t0, 3)
            out[name] = {
                "sec": el, "inputs": n_inputs, "result_rows": n_res,
                "candidate_pairs": cand_counter(cand),
                "allpairs_equivalent": (
                    allpairs if allpairs is not None
                    else n_inputs * (n_inputs - 1) // 2),
            }

        run("dd_embed_cosine_full",
            lambda: dd_embed_cosine_full(spark, sf1),
            n_vecs, lambda c: c.count())
        run("dd_minhash_full", lambda: dd_minhash_full(spark, sf1),
            n_docs, lambda c: c.count())
        run("dd_simhash_full", lambda: dd_simhash_full(spark, sf1),
            n_docs, lambda c: c.first()["n_candidates"])
        run("t5_fuzzy_full", lambda: t5_fuzzy_full(spark, sf1),
            n_parts, lambda c: c.count(), allpairs=n_probes * n_parts)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return {"scale_vs_base": 10, "docs": n_docs, "vecs": n_vecs,
            "parts": n_parts, "families": out,
            "skipped_for_budget": skipped}


def bench_media_scale(spark) -> dict:
    """VERDICT r4 #3: the multimodal decode path at REALISTIC payload
    sizes (64 KB – 4 MB; the sf0.1 fixtures are ~1.2 KB, hiding every
    size-dependent cost). Per size class: full extract_media_features run
    (real PNG pixel decode incl. multi-stored-block inflate + unfilter,
    WAV/MP4 walks, vectorized byte histogram) → MB/s. Roughly FLAT MB/s
    across classes is the evidence the per-byte work is vectorized
    (r4 #1) and header parsing is O(1) in payload size."""
    import hashlib
    import inspect

    from deepseek_ocr_vllm_spark import fixtures
    from deepseek_ocr_vllm_spark.operators import multimodal
    from deepseek_ocr_vllm_spark.operators.multimodal import (
        extract_media_features)

    gen_tag = hashlib.sha256(
        (inspect.getsource(fixtures)
         + inspect.getsource(multimodal)).encode()).hexdigest()[:8]
    cache = os.path.join(tempfile.gettempdir(), f"bench_media_{gen_tag}")
    done_marker = os.path.join(cache, ".complete")
    if not os.path.exists(done_marker):
        shutil.rmtree(cache, ignore_errors=True)
        fixtures.write_media_scale_corpus(cache)
        open(done_marker, "w").close()
    out: dict[str, dict] = {}
    for size, _count in fixtures.MEDIA_SCALE_SPEC:
        sub = os.path.join(cache, f"size_{size}")
        src = spark.read.parquet(sub)
        mb = (src.selectExpr("sum(length(payload)) AS b").first().b
              / (1024 * 1024))
        best = None
        for _ in range(2):
            t0 = time.time()
            n = extract_media_features(src).count()
            el = round(time.time() - t0, 3)
            best = el if best is None or el < best else best
        out[f"{size // 1024}k"] = {
            "sec": best, "rows": n, "mb": round(mb, 1),
            "mb_per_sec": round(mb / best, 1),
        }
    return out


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
    pdf = bench_pdf_extraction(spark)
    queries["pdf_binary_extraction"] = pdf["sec"]
    full = bench_full_scale(spark, sf_dir)
    media_scale = bench_media_scale(spark)
    dedup_scaling = bench_dedup_scaling(spark)
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
        "pdf_docs": pdf["docs"],
        "pdf_docs_per_sec": pdf["docs_per_sec"],
        "pdf_equality_sample_ok": pdf["equality_sample_ok"],
        # full-corpus dedup/ANN evidence (production knobs, no oracle
        # slices) — kept OUT of `value` so the headline total stays
        # comparable round-over-round
        "full_scale": full,
        "full_scale_sec": round(sum(v["sec"] for v in full.values()), 3),
        # realistic-payload media decode (64 KB – 4 MB) — MB/s per size
        # class; kept OUT of `value` like full_scale
        "mm_media_scale": media_scale,
        # candidate-pair growth one order of magnitude up (10× statistical
        # twin) — read against full_scale for the scaling curve
        "dedup_scaling_sf1": dedup_scaling,
        "cpus": int(cpus),
    }))


if __name__ == "__main__":
    main()
