"""Dump .explain('formatted') for named queries to plans/r06/<name>_<tag>.txt.

Usage: python tools/plan_dump.py <tag> [names...]
Tag is 'before' or 'after'. Default names = every headline query plus the
full-scale family builders (which return (result, cand) tuples — the result
side is dumped).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")

HEADLINE = [
    "q1_pricing_summary", "j1_inner_equi_join", "j6_broadcast_dim_join",
    "j10_disjunctive_identity_lookup", "w5_confidence_ranked_best",
    "j5_reconciliation_diff", "dd_minhash_lsh", "dd_embed_cosine",
    "dd_simhash", "sim_ivf_topk", "t5_fuzzy_trigram_search", "tx_quality",
    "mm_media_features",
]

FULL_KNOBS = {
    "SPARK_GRAFT_MINHASH_PERMS": "128",
    "SPARK_GRAFT_MINHASH_ROWS_PER_BAND": "8",
    "SPARK_GRAFT_SIMHASH_BAND_POP": "500",
}


def full_builders(spark):
    from deepseek_ocr_vllm_spark.plans.queries_ml import (
        dd_embed_cosine_full, dd_minhash_full, dd_simhash_full)
    from deepseek_ocr_vllm_spark.plans.queries_text import t5_fuzzy_full

    return {
        "dd_minhash_full": lambda: dd_minhash_full(spark, SF_DIR)[0],
        "dd_simhash_full": lambda: dd_simhash_full(spark, SF_DIR)[0],
        "dd_embed_cosine_full": lambda: dd_embed_cosine_full(spark, SF_DIR)[0],
        "t5_fuzzy_full": lambda: t5_fuzzy_full(spark, SF_DIR)[0],
    }


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    from deepseek_ocr_vllm_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="plan_dump", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    from deepseek_ocr_vllm_spark.plans import REGISTRY

    os.environ.update(FULL_KNOBS)
    fb = full_builders(spark)
    if not names:
        names = HEADLINE + list(fb)
    for name in names:
        if name in fb:
            df = fb[name]()
        else:
            fn, _sql = REGISTRY[name]
            df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
