"""Multimodal plumbing, streaming idempotent sink, tableio semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_multimodal_features_deterministic(spark):
    from deepseek_ocr_vllm_spark.operators.multimodal import (
        attach_binary_payload, extract_media_features)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = extract_media_features(attach_binary_payload(docs))
    r1 = feats.orderBy("doc_id").collect()
    r2 = feats.orderBy("doc_id").collect()
    assert r1 == r2
    assert len(r1) == docs.count()
    for r in r1[:20]:
        assert r.content_type in ("image/png", "audio/wav", "video/mp4")
        assert r.width > 0 and r.height > 0
        assert abs(sum(r.byte_hist) - 1.0) < 1e-9
        assert (r.n_frames == 1) == (r.content_type == "image/png")


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    from deepseek_ocr_vllm_spark.streaming.microbatch import (
        foreach_batch_idempotent)

    out = str(tmp_path / "sink")
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    n1 = foreach_batch_idempotent(spark, SF, out)
    assert n1 == n_events
    # replaying the whole stream must not duplicate (ON CONFLICT DO NOTHING)
    n2 = foreach_batch_idempotent(spark, SF, out)
    assert n2 == n_events
    dups = (
        spark.read.parquet(out).groupBy("event_id").count()
        .filter("count > 1").count()
    )
    assert dups == 0


def test_latest_wins(spark):
    from deepseek_ocr_vllm_spark.sources.tableio import latest_wins

    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 2, "new"), ("b", 7, "only")],
        ["key", "run_id", "val"],
    )
    got = {r.key: (r.run_id, r.val) for r in latest_wins(df, ["key"], "run_id").collect()}
    assert got == {"a": (2, "new"), "b": (7, "only")}


def test_idempotent_append(spark, tmp_path):
    from deepseek_ocr_vllm_spark.sources.tableio import idempotent_append

    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    idempotent_append(spark, df1, path, keys=["id"])
    df2 = spark.createDataFrame([(2, "y2"), (3, "z")], ["id", "v"])
    idempotent_append(spark, df2, path, keys=["id"])
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "x", 2: "y", 3: "z"}  # id=2 not overwritten


def test_strip_accents_python_and_sql_agree(spark):
    """F5: the NFD→drop-Mn Python strip and the SQL translate table agree
    on the table's domain (except ø/Ø, which have no NFD decomposition —
    the table handles them like `unaccent` does, the Python path leaves
    them) and both are identity on ASCII."""
    from deepseek_ocr_vllm_spark.extraction.spec import strip_accents
    from deepseek_ocr_vllm_spark.functions.strings import (
        _ACCENTED, _PLAIN, strip_accents_sql)
    import pyspark.sql.functions as F

    assert strip_accents("café naïve Müller") == "cafe naive Muller"
    assert strip_accents("plain ASCII!") == "plain ASCII!"
    for a, p in zip(_ACCENTED, _PLAIN):
        if a in "øØ":
            assert strip_accents(a) == a  # no combining mark to drop
        else:
            assert strip_accents(a) == p
    df = spark.createDataFrame([("Süpplìer# café øre",)], ["s"])
    got = df.select(strip_accents_sql(F.col("s")).alias("o")).first().o
    assert got == "Supplier# cafe ore"


def test_ivf_index_materialized_matches_oneshot(spark, tmp_path):
    """The materialized IVF index (build once, probe per query) returns
    EXACTLY the one-shot sim_ivf_topk result (same quantizer, same probes,
    same decimal-exact scoring), and the probed-cell filter reaches the
    assignments scan as a PARTITION filter (unprobed cells never read)."""
    from deepseek_ocr_vllm_spark.operators import ann
    from deepseek_ocr_vllm_spark.plans.queries_ml import sim_ivf_topk

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    ann.build_ivf_index(emb, idx)

    qvec = [float(v) for v in
            emb.filter("vec_id = 0").first().embedding]
    got = ann.ivf_search(spark, idx, qvec, k=10, n_probe=2,
                         exclude_vec_id=0)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters: [", 1)[1][:120]
    assert "TakeOrderedAndProject" in plan

    want = sim_ivf_topk(spark, sf).collect()
    have = got.collect()
    assert [(r.vec_id, r.label, r.cosine) for r in have] == [
        (r.vec_id, r.label, r.cosine) for r in want
    ]
