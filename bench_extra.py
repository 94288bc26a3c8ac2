"""Extra benchmarks for the optimization rounds (guide §1.4: noop-sink
isolation; bench.py itself is FROZEN for driver measurement).

Times named operators/queries with `df.write.format("noop")` so the
computation is measured, not the sink, labels each job
(setJobDescription), and prints one JSON line:

  {"sf_dir": ..., "cpus": N, "times": {"name": [s1, s2, ...]}}

Usage:
  python bench_extra.py [--reps 2] [names...]

Default names: the headline queries plus the full-scale families.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FULL_KNOBS = {
    "SPARK_GRAFT_MINHASH_PERMS": "128",
    "SPARK_GRAFT_MINHASH_ROWS_PER_BAND": "8",
    "SPARK_GRAFT_SIMHASH_BAND_POP": "500",
}

HEADLINE = [
    "q1_pricing_summary", "j1_inner_equi_join", "j6_broadcast_dim_join",
    "j10_disjunctive_identity_lookup", "w5_confidence_ranked_best",
    "j5_reconciliation_diff", "dd_minhash_lsh", "dd_embed_cosine",
    "dd_simhash", "sim_ivf_topk", "t5_fuzzy_trigram_search", "tx_quality",
    "mm_media_features", "stream_window_counts",
]
FULL = ["dd_minhash_full", "dd_simhash_full", "dd_embed_cosine_full",
        "t5_fuzzy_full", "embed_unlabeled_pairs_full"]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def builders(spark, sf_dir):
    from deepseek_ocr_vllm_spark.plans import REGISTRY
    from deepseek_ocr_vllm_spark.plans.queries_ml import (
        dd_embed_cosine_full, dd_minhash_full, dd_simhash_full,
        embed_pairs_unlabeled)
    from deepseek_ocr_vllm_spark.plans.queries_text import t5_fuzzy_full

    out = {}
    for name in HEADLINE:
        # headline queries run at DEFAULT knobs, exactly like bench.py's
        # bench_queries (bench.py only sets FULL_KNOBS inside the
        # full-scale sections and restores them after)
        fn, _sql = REGISTRY[name]
        out[name] = (lambda fn=fn: noop(fn(spark, sf_dir)))

    def with_knobs(f):
        saved = {k: os.environ.get(k) for k in FULL_KNOBS}
        os.environ.update(FULL_KNOBS)
        try:
            f()
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def run_pair(builder):
        result, _cand = builder(spark, sf_dir)
        noop(result)

    out["dd_minhash_full"] = lambda: with_knobs(
        lambda: run_pair(dd_minhash_full))
    out["dd_simhash_full"] = lambda: with_knobs(
        lambda: run_pair(dd_simhash_full))
    out["dd_embed_cosine_full"] = lambda: with_knobs(
        lambda: run_pair(dd_embed_cosine_full))
    out["t5_fuzzy_full"] = lambda: with_knobs(lambda: run_pair(t5_fuzzy_full))

    def run_unlabeled():
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select("vec_id", "embedding"))
        noop(embed_pairs_unlabeled(emb, k=16, n_iter=3).distinct())

    out["embed_unlabeled_pairs_full"] = lambda: with_knobs(run_unlabeled)
    return out


def main():
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from deepseek_ocr_vllm_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()
    b = builders(spark, sf_dir)
    names = args or (HEADLINE + FULL)
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            b[name]()
            el = round(time.time() - t0, 3)
            times[name].append(el)
            print(f"## {name}: {el}s", file=sys.stderr, flush=True)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "reps": reps,
                      "times": times}))


if __name__ == "__main__":
    main()
