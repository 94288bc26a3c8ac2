"""Plan-quality lint: scale discipline enforced as a test gate.

For every queries() entry, the ANALYZED+OPTIMIZED physical plan must obey:
  * no row-at-a-time Python (`BatchEvalPython`) — only whole-batch Arrow
    (`MapInArrow` / `FlatMapGroupsInPandas` / `MapInPandas`, the sanctioned
    UDF surfaces per SURVEY §2.11);
  * nested-loop / cartesian joins only where the operator is genuinely
    non-equi (embedding pair generation, the A12 scalar cross join);
  * a few named shape checks: broadcast joins where a small side exists,
    TakeOrderedAndProject for top-k, pushed filters on selective scans.

Plans are built against sf0.001; nothing is executed (except the handful
of queries whose CONSTRUCTION already runs jobs — those are skipped here
and exercised by the oracle checker).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# queries whose construction itself runs Spark jobs (streaming drains,
# eager stage materialization) — their plans aren't a pure lazy build
EXECUTES_ON_BUILD = {
    "j5_reconciliation_diff",      # localCheckpoint stages
    "stream_window_counts",        # streaming drain
    "stream_stateful_sessions",    # streaming drain
}

# non-equi by design: scalar/1-row broadcast cross joins (query-vector or
# allocated-id against the fact side) and the band-key bucket joins whose
# residual `<` comparisons ride on an equi join. dd_embed_cosine and
# dd_simhash were removed in round 2: candidate generation is now blocked
# (label-cell equi-join / pigeonhole band equi-join) — no nested loop left.
# t5 joined in round 3: its hot-gram DF cap broadcasts the 1-row distinct
# name count (same shape as dd_ngram_jaccard's hot-shingle guard); the
# candidate generation itself stays a gram equi-join.
NESTED_LOOP_OK = {
    "dd_ngram_jaccard", "dd_minhash_lsh", "t5_fuzzy_trigram_search",
    "sim_topk_bruteforce", "sim_ivf_topk", "a12_monotonic_id_allocation",
    "j8_expected_columns_anti", "tx_fingerprint",
}


def _registry():
    from deepseek_ocr_vllm_spark.plans import REGISTRY

    return REGISTRY


def _physical_plan(spark, name) -> str:
    fn, _sql = _registry()[name]
    df = fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(_registry().keys()))
def test_no_row_python_and_no_stray_nested_loop(spark, name):
    if name in EXECUTES_ON_BUILD:
        pytest.skip("constructed eagerly; covered by oracle checker")
    plan = _physical_plan(spark, name)
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan"
    )
    if name not in NESTED_LOOP_OK:
        assert "CartesianProduct" not in plan and (
            "BroadcastNestedLoopJoin" not in plan
        ), f"{name}: unintended non-equi join\n{plan[:2000]}"


def test_full_scale_paths_obey_plan_discipline(spark):
    """The bench-evidence full-corpus variants share cores with the
    oracle-gated queries but are built OUTSIDE the registry — lint them
    too: no row-at-a-time Python anywhere; the only Python stage is the
    sanctioned MapInPandas prefilter in the embed path."""
    from deepseek_ocr_vllm_spark.plans.queries_ml import (
        dd_embed_cosine_full, dd_minhash_full, dd_simhash_full)
    from deepseek_ocr_vllm_spark.plans.queries_text import t5_fuzzy_full

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    mh_res, mh_cand = dd_minhash_full(spark, SF)
    sh_res, sh_cand = dd_simhash_full(spark, SF)
    em_res, em_cand = dd_embed_cosine_full(spark, SF)
    t5_res, t5_cand = t5_fuzzy_full(spark, SF)
    for df in (mh_res, mh_cand, sh_res, sh_cand, em_cand, t5_res, t5_cand):
        assert "BatchEvalPython" not in plan(df)
    em_plan = plan(em_res)
    assert "BatchEvalPython" not in em_plan
    assert "MapInPandas" in em_plan  # prefilter engaged on the scale path


def test_broadcast_dim_join_shape(spark):
    plan = _physical_plan(spark, "j6_broadcast_dim_join")
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark):
    plan = _physical_plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_left_anti_filter_pushdown(spark):
    plan = _physical_plan(spark, "j2_left_anti")
    assert "PushedFilters: [" in plan and "GreaterThan" in plan


def test_pipeline_single_shuffle(spark, transcripts_path, tmp_path):
    """The extraction pipeline's pre-write plan (the REAL one, via
    build_extract_plan) has exactly ONE exchange — the salted bucket
    repartition — and it carries EXTRACTED output: the Arrow UDF runs
    below the exchange, on scan partitions (A/B-measured ~35% faster;
    see build_extract_plan)."""
    from deepseek_ocr_vllm_spark import pipeline

    src = spark.read.parquet(transcripts_path).select(*pipeline.INPUT_COLS)
    out = pipeline.build_extract_plan(pipeline._with_bucket(src, 8), 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    assert "BatchEvalPython" not in plan
    # UDF below the exchange: tree renders root-first, so the exchange
    # must appear BEFORE the Arrow node in the plan string
    udf_at = max(plan.find("MapInArrow"), plan.find("PythonMapInArrow"))
    assert plan.index("Exchange") < udf_at, plan


def test_dd_exact_single_exchange(spark):
    """dd_exact's claim to scale is ONE shuffle: sha256 map-side, then a
    single hash-partitioned partial+final agg (VERDICT r4 #8). A second
    hash exchange would mean the dedup re-shuffles the corpus (the
    rangepartitioning for the presentation ORDER BY is not a data
    shuffle of the corpus — partial agg output only)."""
    plan = _physical_plan(spark, "dd_exact")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_count" in plan  # map-side combine engaged


def test_mm_media_features_map_in_pandas_only(spark):
    """mm_media_features is pure plumbing: scan → JVM envelope concat →
    one MapInPandas decode — never row-at-a-time Python (VERDICT r4 #8).
    r6: ONE deliberate REPARTITION_BY_NUM hash exchange is allowed — the
    scale-adaptive decode-parallelism repartition that fires only when the
    scan yields fewer partitions than the session width (guide §2.5); no
    ENSURE_REQUIREMENTS hash exchange may shuffle the payload (that would
    mean a join/agg re-shuffles the bytes accidentally)."""
    plan = _physical_plan(spark, "mm_media_features")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    hash_ex = [ln for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln]
    accidental = [ln for ln in hash_ex if "REPARTITION_BY_NUM" not in ln]
    assert not accidental, plan
    assert len(hash_ex) <= 1, plan
