"""Text analysis + scalar-function battery + reconciliation diff.

Implements the F-series scalar inventory (SURVEY §2.8), the reconciliation
diff classifier (J5/A7/A8 — the reference's core test harness,
scripts/reconciliation/phase_b_diff.py), language-ID / quality / token
metrics for a training-data pipeline, and an IVF-style bucketed ANN.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import dec, q, t

# --------------------------------------------------------- F-series battery

_NULL_TOKENS = "('N/A','NA','NONE','NULL','','-','—','UNK')"


@q(
    "f_string_battery",
    f"""
    SELECT doc_id,
           trim(regexp_replace(upper(source), '[^A-Z0-9]+', '_', 'g'), '_')
             AS canon_source,
           CASE WHEN upper(trim(lang)) IN {_NULL_TOKENS}
                THEN '<NULL>' ELSE lang END AS lang_canon,
           lower(regexp_replace(substr(text, 1, 30), '[^a-zA-Z0-9]+', '-', 'g'))
             AS slug,
           substr(sha256(text), 1, 16) AS sha16,
           levenshtein(lang, 'en') AS lev_en,
           1.0 - CAST(levenshtein(lang, 'en') AS DOUBLE)
               / greatest(length(lang), 2) AS lev_sim,
           concat_ws('||', upper(source), upper(lang),
                     CAST(n_chars AS VARCHAR)) AS composite_key,
           substr(regexp_replace(replace(text, '&', ' AND '),
                  '\\s+', ' ', 'g'), 1, 40) AS norm_prefix
    FROM documents WHERE doc_id < 300 ORDER BY doc_id
    """,
)
def f_string_battery(spark, sf_dir):
    """F1 canon_col_name, F2/F3 null canonicalization, F24 slugify,
    F16 sha-256, F17 levenshtein similarity, F20 composite key assembly,
    F12 normalizers — all JVM-side built-ins, zero Python."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    lang_u = F.upper(F.trim(F.col("lang")))
    null_toks = ["N/A", "NA", "NONE", "NULL", "", "-", "—", "UNK"]
    return d.select(
        "doc_id",
        F.expr("trim(BOTH '_' FROM regexp_replace(upper(source), '[^A-Z0-9]+', '_'))")
        .alias("canon_source"),
        F.when(lang_u.isin(null_toks), F.lit("<NULL>"))
        .otherwise(F.col("lang"))
        .alias("lang_canon"),
        F.lower(
            F.regexp_replace(F.substring("text", 1, 30), "[^a-zA-Z0-9]+", "-")
        ).alias("slug"),
        F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("sha16"),
        F.levenshtein("lang", F.lit("en")).alias("lev_en"),
        (
            F.lit(1.0)
            - F.levenshtein("lang", F.lit("en")).cast("double")
            / F.greatest(F.length("lang"), F.lit(2))
        ).alias("lev_sim"),
        F.concat_ws(
            "||", F.upper("source"), F.upper("lang"),
            F.col("n_chars").cast("string"),
        ).alias("composite_key"),
        F.substring(
            F.regexp_replace(
                F.regexp_replace("text", "&", " AND "), r"\s+", " "
            ),
            1, 40,
        ).alias("norm_prefix"),
    ).orderBy("doc_id")


@q(
    "f_date_coercion",
    r"""
    WITH src AS (
      SELECT o_orderkey,
             CASE CAST(o_orderkey % 3 AS INTEGER)
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
               ELSE strftime(o_orderdate, '%d/%m/%Y') END AS raw,
             CAST(o_orderkey % 3 AS INTEGER) AS fmt
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey, raw,
           strftime(COALESCE(
             try_strptime(raw, '%Y-%m-%d'),
             CASE WHEN fmt = 1 THEN try_strptime(raw, '%m/%d/%Y')
                  ELSE try_strptime(raw, '%d/%m/%Y') END), '%Y-%m-%d')
             AS parsed_iso,
           CASE WHEN try_strptime(raw, '%m/%d/%Y') IS NOT NULL
                 AND try_strptime(raw, '%d/%m/%Y') IS NOT NULL
                 AND try_strptime(raw, '%m/%d/%Y') <> try_strptime(raw, '%d/%m/%Y')
                THEN TRUE ELSE FALSE END AS scheme_ambiguous
    FROM src ORDER BY o_orderkey
    """,
)
def f_date_coercion(spark, sf_dir):
    """F8 multi-format date coercion (processor.go:250-266 format chain) +
    F9 dual-scheme month-first/day-first ambiguity flag
    (phase_b_diff.py:694-769). try_to_date chain = the COALESCE ladder."""
    o = t(spark, sf_dir, "orders").filter("o_orderkey < 2000")
    fmt = (F.col("o_orderkey") % 3).cast("int")
    raw = (
        F.when(fmt == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(fmt == 1, F.date_format("o_orderdate", "MM/dd/yyyy"))
        .otherwise(F.date_format("o_orderdate", "dd/MM/yyyy"))
    )
    src = o.select("o_orderkey", raw.alias("raw"), fmt.alias("fmt"))
    md = F.try_to_timestamp(F.col("raw"), F.lit("MM/dd/yyyy"))
    dm = F.try_to_timestamp(F.col("raw"), F.lit("dd/MM/yyyy"))
    iso = F.try_to_timestamp(F.col("raw"), F.lit("yyyy-MM-dd"))
    parsed = F.coalesce(iso, F.when(F.col("fmt") == 1, md).otherwise(dm))
    return src.select(
        "o_orderkey",
        "raw",
        F.date_format(parsed, "yyyy-MM-dd").alias("parsed_iso"),
        (md.isNotNull() & dm.isNotNull() & (md != dm)).alias("scheme_ambiguous"),
    ).orderBy("o_orderkey")


# ------------------------------------------------------ reconciliation diff

_RECON_TMPL = """
    WITH base AS (
      SELECT c_custkey AS row_index,
             CASE WHEN c_custkey % 5 <> 0 THEN c_name END AS join_key,
             concat(CAST(c_nationkey AS {S}), '||', c_mktsegment)
               AS composite_key,
             'acctbal' AS column_name,
             CASE WHEN c_custkey % 13 = 0 THEN NULL
                  ELSE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS {S}) END AS value
      FROM customer
      UNION ALL
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 <> 0 THEN c_name END,
             concat(CAST(c_nationkey AS {S}), '||', c_mktsegment),
             'mktsegment', c_mktsegment
      FROM customer
    ),
    pipe_raw AS (
      SELECT c_custkey AS row_index,
             CASE WHEN c_custkey % 5 <> 0 THEN c_name END AS join_key,
             concat(CAST(c_nationkey AS {S}), '||', c_mktsegment)
               AS composite_key,
             'acctbal' AS column_name,
             CASE WHEN c_custkey % 11 = 0
                  THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 1 AS {S})
                  ELSE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS {S}) END AS value
      FROM customer
      UNION ALL
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 <> 0 THEN c_name END,
             concat(CAST(c_nationkey AS {S}), '||', c_mktsegment),
             'mktsegment',
             CASE WHEN c_custkey % 7 = 0 THEN 'N/A' ELSE c_mktsegment END
      FROM customer
    ),
    pipe AS (
      SELECT row_index, join_key, composite_key, column_name,
             CASE WHEN upper(coalesce(value, '')) IN
                  ('N/A','NA','NONE','NULL','','-') THEN NULL
                  ELSE value END AS value
      FROM pipe_raw
    ),
    b1 AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY join_key, column_name) AS c
        FROM base WHERE join_key IS NOT NULL) WHERE c = 1
    ),
    p1 AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY join_key, column_name) AS c
        FROM pipe WHERE join_key IS NOT NULL) WHERE c = 1
    ),
    s1 AS (
      SELECT b.row_index AS b_row, p.row_index AS p_row, b.column_name,
             b.value AS b_val, p.value AS p_val, 'join_key' AS strategy
      FROM b1 b JOIN p1 p USING (join_key, column_name)
    ),
    lb1 AS (
      SELECT * FROM base b WHERE NOT EXISTS (
        SELECT 1 FROM s1 WHERE s1.b_row = b.row_index
                           AND s1.column_name = b.column_name)
    ),
    lp1 AS (
      SELECT * FROM pipe p WHERE NOT EXISTS (
        SELECT 1 FROM s1 WHERE s1.p_row = p.row_index
                           AND s1.column_name = p.column_name)
    ),
    b2 AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY composite_key, column_name) AS c
        FROM lb1 WHERE composite_key IS NOT NULL) WHERE c = 1
    ),
    p2 AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY composite_key, column_name) AS c
        FROM lp1 WHERE composite_key IS NOT NULL) WHERE c = 1
    ),
    s2 AS (
      SELECT b.row_index AS b_row, p.row_index AS p_row, b.column_name,
             b.value AS b_val, p.value AS p_val, 'composite_key' AS strategy
      FROM b2 b JOIN p2 p USING (composite_key, column_name)
    ),
    lb2 AS (
      SELECT * FROM lb1 b WHERE NOT EXISTS (
        SELECT 1 FROM s2 WHERE s2.b_row = b.row_index
                           AND s2.column_name = b.column_name)
    ),
    lp2 AS (
      SELECT * FROM lp1 p WHERE NOT EXISTS (
        SELECT 1 FROM s2 WHERE s2.p_row = p.row_index
                           AND s2.column_name = p.column_name)
    ),
    s3 AS (
      SELECT coalesce(b.row_index, p.row_index) AS b_row,
             coalesce(p.row_index, b.row_index) AS p_row,
             coalesce(b.column_name, p.column_name) AS column_name,
             b.value AS b_val, p.value AS p_val, 'row_index' AS strategy
      FROM lb2 b FULL OUTER JOIN lp2 p
        ON b.row_index = p.row_index AND b.column_name = p.column_name
    ),
    allcells AS (
      SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
    ),
    classified AS (
      SELECT column_name, strategy,
             CASE WHEN b_val IS NULL AND p_val IS NULL THEN 'match_null'
                  WHEN b_val = p_val THEN 'match_value'
                  WHEN b_val IS NULL THEN 'info_gain'
                  WHEN p_val IS NULL THEN 'info_loss'
                  ELSE 'changed_value' END AS diff_class
      FROM allcells
    )
    SELECT column_name, strategy, diff_class, COUNT(*) AS n
    FROM classified GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


_RECON_DUCK = _RECON_TMPL.format(S="VARCHAR")


def _recon_side(c, pipe: bool):
    """Baseline / pipeline cell tables with seeded perturbations."""
    key = F.col("c_custkey")
    jk = F.when(key % 5 != 0, F.col("c_name")).alias("join_key")
    ck = F.concat(F.col("c_nationkey").cast("string"), F.lit("||"),
                  F.col("c_mktsegment")).alias("composite_key")
    acct = F.col("c_acctbal").cast("decimal(18,2)")
    if pipe:
        acct_val = (F.when(key % 11 == 0, (acct + 1).cast("string"))
                    .otherwise(acct.cast("string")))
        seg_val = (F.when(key % 7 == 0, F.lit("N/A"))
                   .otherwise(F.col("c_mktsegment")))
    else:
        acct_val = F.when(key % 13 != 0, acct.cast("string"))
        seg_val = F.col("c_mktsegment")
    rows = lambda name, val: c.select(  # noqa: E731
        key.alias("row_index"), jk, ck,
        F.lit(name).alias("column_name"), val.alias("value"))
    out = rows("acctbal", acct_val).unionByName(rows("mktsegment", seg_val))
    if pipe:  # null-token canonicalization (F2/P3)
        out = out.withColumn(
            "value",
            F.when(F.upper(F.coalesce(F.col("value"), F.lit(""))).isin(
                "N/A", "NA", "NONE", "NULL", "", "-"), F.lit(None))
            .otherwise(F.col("value")))
    return out


def _recon_uniq(df, key):
    """Dup keys excluded from key-based stages (phase_b_diff.py:519-532)."""
    w = Window.partitionBy(key, "column_name")
    return (df.filter(F.col(key).isNotNull())
            .withColumn("__c", F.count("*").over(w))
            .filter(F.col("__c") == 1).drop("__c"))


def _recon_match(b, p, key, strategy):
    return (b.alias("b").join(p.alias("p"), [key, "column_name"])
            .select(F.col("b.row_index").alias("b_row"),
                    F.col("p.row_index").alias("p_row"), "column_name",
                    F.col("b.value").alias("b_val"),
                    F.col("p.value").alias("p_val"),
                    F.lit(strategy).alias("strategy")))


def _recon_leftover(side, matched, row_col):
    return side.join(
        matched.select(F.col(row_col).alias("row_index"), "column_name"),
        ["row_index", "column_name"], "left_anti")


_FALLBACK_SCRATCH_ROOT: list[str] = []


def _scratch_fallback_root() -> str:
    """One process-wide, atexit-cleaned root for scratch-mode stage landings
    when SPARK_GRAFT_SCRATCH_DIR is unset (ADVICE r3: a bare mkdtemp per
    query invocation leaked a directory with two materialized parquet
    stages on every j5 run). Per-call subdirs under it keep concurrent
    queries in this process apart."""
    import atexit
    import shutil
    import tempfile

    if not _FALLBACK_SCRATCH_ROOT:
        root = tempfile.mkdtemp(prefix="spark_graft_stage_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _FALLBACK_SCRATCH_ROOT.append(root)
    return _FALLBACK_SCRATCH_ROOT[0]


def _stage_lander(spark):
    """Materializer for cascade stage minimum-cuts (VERDICT r2 #4).

    SPARK_GRAFT_STAGE_LANDING=local (default): localCheckpoint(eager) —
    cuts the logical plan in executor memory; right for a single box, but
    an executor loss invalidates the checkpoint blocks mid-job.
    SPARK_GRAFT_STAGE_LANDING=scratch: land the stage in a parquet scratch
    table and read it back — same plan-cut, but DURABLE: at cluster scale
    a lost executor just re-reads the scratch files. Scratch root comes
    from SPARK_GRAFT_SCRATCH_DIR (point it at job-scoped cluster storage);
    unset, a per-call subdir under one atexit-cleaned process tempdir keeps
    concurrent runs apart without leaking directories."""
    import os
    import tempfile

    if os.environ.get("SPARK_GRAFT_STAGE_LANDING", "local") != "scratch":
        return lambda df, name: df.localCheckpoint(eager=True)
    base = os.environ.get("SPARK_GRAFT_SCRATCH_DIR") or tempfile.mkdtemp(
        dir=_scratch_fallback_root()
    )

    def land(df, name):
        path = f"{base}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    return land


@q("j5_reconciliation_diff", _RECON_DUCK)
def j5_reconciliation_diff(spark, sf_dir):
    """J5+A7+A8: the reference's 3-stage keyed reconciliation diff
    (phase_b_diff.py:500-629): join_key stage (dup keys excluded via
    window-count=1, :519-532) → composite_key stage on leftovers →
    row_index full-outer fallback; cells classified into the null-aware
    diff classes (:842-870) and counted per column × alignment strategy
    (:872-914). Baseline/pipeline derived deterministically from customer
    with seeded perturbations + null-token canonicalization (F2/P3).

    Each stage is MATERIALIZED before the next — exactly what the
    reference does with eager pandas frames. Lazily composed, the cascade
    doubles the logical plan per stage (every stage references its
    predecessor twice: matches + anti-join leftovers) and Catalyst
    analysis goes exponential. The materializer is config-gated
    (_stage_lander): localCheckpoint locally, a durable parquet scratch
    table at cluster scale — identical output either way (test-pinned)."""
    # two landings keep every downstream plan linear: lb1/lp1 are the only
    # nodes referenced on BOTH sides of the remaining cascade (stage-2
    # match + stage-2 leftovers + stage-3 outer). r6 (guide §2.4/§5):
    # the landings are re-cut so the EXPENSIVE stage-1 chain (both
    # window-dedup sides + the match join) runs exactly once — r5 landed
    # the two leftover sides in two separate jobs, each of which
    # re-evaluated s1, and the final job evaluated it a third time for
    # allcells. Now s1 itself is landed (it is the minimum cut: matched
    # cells, bounded by the input), and both leftovers land in ONE job as
    # a side-tagged union over the landed s1 — identical rows, test- and
    # oracle-pinned.
    land = _stage_lander(spark)
    c = t(spark, sf_dir, "customer")
    base = _recon_side(c, pipe=False)
    pipe = _recon_side(c, pipe=True)

    s1 = land(_recon_match(_recon_uniq(base, "join_key"),
                           _recon_uniq(pipe, "join_key"),
                           "join_key", "join_key"), "s1")
    l1 = land(
        _recon_leftover(base, s1, "b_row").withColumn("__side", F.lit("b"))
        .unionByName(
            _recon_leftover(pipe, s1, "p_row").withColumn("__side",
                                                          F.lit("p"))),
        "l1")
    lb1 = l1.filter("__side = 'b'").drop("__side")
    lp1 = l1.filter("__side = 'p'").drop("__side")

    s2 = _recon_match(_recon_uniq(lb1, "composite_key"),
                      _recon_uniq(lp1, "composite_key"),
                      "composite_key", "composite_key")
    lb2 = _recon_leftover(lb1, s2, "b_row")
    lp2 = _recon_leftover(lp1, s2, "p_row")

    s3 = (lb2.alias("b").join(
            lp2.alias("p"),
            (F.col("b.row_index") == F.col("p.row_index"))
            & (F.col("b.column_name") == F.col("p.column_name")), "full_outer")
          .select(
              F.coalesce(F.col("b.row_index"), F.col("p.row_index")).alias("b_row"),
              F.coalesce(F.col("p.row_index"), F.col("b.row_index")).alias("p_row"),
              F.coalesce(F.col("b.column_name"), F.col("p.column_name")).alias("column_name"),
              F.col("b.value").alias("b_val"), F.col("p.value").alias("p_val"),
              F.lit("row_index").alias("strategy")))

    allcells = s1.unionByName(s2).unionByName(s3)
    b_val, p_val = F.col("b_val"), F.col("p_val")
    classified = allcells.select(
        "column_name", "strategy",
        F.when(b_val.isNull() & p_val.isNull(), "match_null")
        .when(b_val == p_val, "match_value")
        .when(b_val.isNull(), "info_gain")
        .when(p_val.isNull(), "info_loss")
        .otherwise("changed_value").alias("diff_class"))
    return (classified.groupBy("column_name", "strategy", "diff_class")
            .agg(F.count("*").alias("n"))
            .orderBy("column_name", "strategy", "diff_class"))


# ------------------------------------------------------------ text analysis

_STOP_EN = "('the','a','of','and','to','in','is','for','on','with')"
_STOP_ES = "('el','la','de','y','en','es','un','que','los','del')"
_STOP_DE = "('der','die','das','und','zu','ist','ein','den','von','mit')"


@q(
    "tx_langid",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), w -> w IN {_STOP_EN})) AS hits_en,
             len(list_filter(string_split(text, ' '), w -> w IN {_STOP_ES})) AS hits_es,
             len(list_filter(string_split(text, ' '), w -> w IN {_STOP_DE})) AS hits_de
      FROM documents
    )
    SELECT doc_id, lang, hits_en, hits_es, hits_de,
           CASE WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
                WHEN hits_es >= hits_de THEN 'es'
                ELSE 'de' END AS lang_pred
    FROM scored ORDER BY doc_id
    """,
)
def tx_langid(spark, sf_dir):
    """Language-ID by stopword-hit scoring (n-gram heuristic family) —
    higher-order array functions, JVM-side, no UDF."""
    d = t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    en = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]
    es = ["el", "la", "de", "y", "en", "es", "un", "que", "los", "del"]
    de = ["der", "die", "das", "und", "zu", "ist", "ein", "den", "von", "mit"]

    def hits(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))

    scored = d.select(
        "doc_id", "lang",
        hits(en).alias("hits_en"),
        hits(es).alias("hits_es"),
        hits(de).alias("hits_de"),
    )
    return scored.select(
        "*",
        F.when(
            (F.col("hits_en") >= F.col("hits_es"))
            & (F.col("hits_en") >= F.col("hits_de")),
            F.lit("en"),
        )
        .when(F.col("hits_es") >= F.col("hits_de"), F.lit("es"))
        .otherwise(F.lit("de"))
        .alias("lang_pred"),
    ).orderBy("doc_id")


@q(
    "tx_quality",
    f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
             len(list_filter(string_split(text, ' '), w -> w IN {_STOP_EN}))
               AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_words,
           ROUND(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 6) AS stop_ratio,
           CASE WHEN n_words >= 50
                 AND CAST(n_stop AS DOUBLE) / greatest(n_words, 1) >= 0.05
                THEN 'high'
                WHEN n_words >= 10 THEN 'medium' ELSE 'low' END AS quality
    FROM m ORDER BY doc_id
    """,
)
def tx_quality(spark, sf_dir):
    """Quality scoring: length / punctuation / stopword ratios → bucket
    (training-data filtering heuristic)."""
    d = t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    en = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]
    arr = F.array(*[F.lit(w) for w in en])
    m = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(ws).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), F.lit(0)))
        .alias("n_punct"),
        F.size(F.filter(ws, lambda w: F.array_contains(arr, w))).alias("n_stop"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.greatest(F.col("n_words"), F.lit(1))
    return m.select(
        "doc_id", "n_chars", "n_words",
        F.round(
            F.col("n_punct").cast("double") / F.greatest(F.col("n_chars"), F.lit(1)), 6
        ).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.when((F.col("n_words") >= 50) & (stop_ratio >= 0.05), F.lit("high"))
        .when(F.col("n_words") >= 10, F.lit("medium"))
        .otherwise(F.lit("low"))
        .alias("quality"),
    ).orderBy("doc_id")


@q(
    "tx_tokens",
    r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             AS bpe_ish_tokens,
           ROUND(CAST(length(text) AS DOUBLE)
                 / greatest(len(regexp_extract_all(
                     text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 1), 6)
             AS chars_per_token
    FROM documents ORDER BY doc_id
    """,
)
def tx_tokens(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (letters | digits | single punctuation) + chars/token."""
    d = t(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    bpe = F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        F.round(
            F.length("text").cast("double") / F.greatest(bpe, F.lit(1)), 6
        ).alias("chars_per_token"),
    ).orderBy("doc_id")


@q(
    "tx_fingerprint",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_transform(
               range(1, len(ws) - 1),
               i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS h
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      WHERE len(ws) >= 3
    ),
    ranked AS (
      SELECT doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
      FROM (SELECT DISTINCT doc_id, h FROM sh)
    )
    SELECT doc_id, string_agg(h, '|' ORDER BY h) AS fingerprint
    FROM ranked WHERE rn <= 3 GROUP BY doc_id ORDER BY doc_id
    """,
)
def tx_fingerprint(spark, sf_dir):
    """Document fingerprinting: min-3 shingle-hash sketch (winnowing-style
    rolling-hash family) — near-dup docs share fingerprint prefixes."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    sh = (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 2),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ",
                            F.element_at("ws", i),
                            F.element_at("ws", i + 1),
                            F.element_at("ws", i + 2),
                        )
                    ),
                )
            ).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("h")
    return (
        sh.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list("h")), "|").alias("fingerprint"))
        .orderBy("doc_id")
    )


@q(
    "f25_json_ops",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           json_object('id', event_id, 'type', event_type) AS packed
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
)
def f25_json_ops(spark, sf_dir):
    """F25 JSON build/parse (jsonb_build_object / ->> extraction,
    intelligence_entity_resolution.sql:75-80; checks_integrity.sql:18-28):
    get_json_object + to_json(struct(...))."""
    e = t(spark, sf_dir, "events").filter("event_id < 500")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("type"))
        ).alias("packed"),
    ).orderBy("event_id")


@q(
    "a9_declared_vs_actual",
    """
    WITH declared AS (
      SELECT o_custkey, COUNT(*) + CASE WHEN o_custkey % 50 = 0 THEN 1 ELSE 0 END
               AS declared_n
      FROM orders GROUP BY o_custkey
    ),
    actual AS (SELECT o_custkey, COUNT(DISTINCT o_orderkey) AS actual_n
               FROM orders GROUP BY o_custkey)
    SELECT d.o_custkey, d.declared_n, a.actual_n
    FROM declared d JOIN actual a USING (o_custkey)
    WHERE d.declared_n <> a.actual_n
    ORDER BY d.o_custkey
    """,
)
def a9_declared_vs_actual(spark, sf_dir):
    """A9 declared-vs-actual audit (checks_integrity.sql:79-90): HAVING
    declared <> COUNT(DISTINCT id) — declared counts perturbed on a
    deterministic subset to make the audit non-empty."""
    o = t(spark, sf_dir, "orders")
    declared = o.groupBy("o_custkey").agg(
        (
            F.count("*")
            + F.when(F.col("o_custkey") % 50 == 0, 1).otherwise(0)
        ).alias("declared_n")
    )
    actual = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderkey").alias("actual_n")
    )
    return (
        declared.join(actual, "o_custkey")
        .filter("declared_n <> actual_n")
        .select("o_custkey", "declared_n", "actual_n")
        .orderBy("o_custkey")
    )


@q(
    "p1_strict_threshold",
    """
    SELECT doc_id, n_chars,
           CASE WHEN n_chars < 100 THEN TRUE ELSE FALSE END AS failed
    FROM documents ORDER BY doc_id
    """,
)
def p1_strict_threshold(spark, sf_dir):
    """P1 strict text-threshold filter (pdf_extract.py:224-236;
    job.py:80-83): flag docs under the minimum extracted-chars bar."""
    return (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id", "n_chars",
            (F.col("n_chars") < 100).alias("failed"),
        )
        .orderBy("doc_id")
    )


def _x7_spans_oracle() -> str:
    """Full span oracle INCLUDING offsets: DuckDB has no finditer, so match
    start positions are reconstructed from regexp_split_to_array /
    regexp_extract_all prefix sums — start_k = len(parts[1..k]) +
    len(matches[1..k-1]). Exact for non-overlapping leftmost matches (RE2
    and Python re agree on these \\b-anchored patterns over the ASCII
    corpus); span_id re-derived as the per-doc (start, end, label)
    row_number, the same total order the extractor sorts by."""
    from ..operators.ner import MODEL_NAME, PATTERNS

    arms = "\n      UNION ALL ".join(
        f"SELECT doc_id, '{label}' AS label, "
        f"CAST({conf} AS DOUBLE) AS confidence, "
        f"regexp_extract_all(text, '{pat.pattern}') AS m, "
        f"regexp_split_to_array(text, '{pat.pattern}') AS p FROM d"
        for label, pat, conf in PATTERNS
    )
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents),
    per AS ({arms}),
    idx AS (
      SELECT doc_id, label, confidence, m, p,
             unnest(range(1, len(m) + 1)) AS i
      FROM per
    ),
    spans AS (
      SELECT doc_id, label, confidence,
             CAST(COALESCE(list_sum(list_transform(p[1:i], y -> length(y))), 0)
                + COALESCE(list_sum(list_transform(m[1:i-1], y -> length(y))), 0)
               AS INTEGER) AS "start",
             m[i] AS mtext
      FROM idx
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY doc_id
                  ORDER BY "start", "start" + length(mtext), label)
                - 1 AS INTEGER) AS span_id,
           label, "start",
           CAST("start" + length(mtext) AS INTEGER) AS "end",
           mtext AS text, confidence,
           '{MODEL_NAME}' AS model
    FROM spans
    ORDER BY doc_id, span_id
    """


@q("x7_ner_spans", _x7_spans_oracle())
def x7_ner_spans(spark, sf_dir):
    """X7/X8 deterministic span extraction over documents, fully
    oracle-gated including char offsets (end-exclusive span contract per
    PREANNOTATION_SCHEMA.md:9-12); the chunk/offset-remap machinery is
    additionally exercised by pytest on >CHUNK_SIZE texts."""
    from ..operators.ner import extract_spans

    return extract_spans(t(spark, sf_dir, "documents")).orderBy(
        "doc_id", "span_id"
    )


def _x7_counts_oracle() -> str:
    """Generated per-label DuckDB count query — RE2 runs the same patterns
    the operator runs, so the extractor's match semantics (though not its
    offsets, which SQL can't express) are oracle-gated."""
    from ..operators.ner import PATTERNS

    arms = "\n      UNION ALL ".join(
        f"SELECT doc_id, '{label}' AS label, "
        f"len(regexp_extract_all(text, '{pat.pattern}')) AS n_spans FROM d"
        for label, pat, _conf in PATTERNS
    )
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents),
    m AS ({arms})
    SELECT doc_id, label, n_spans FROM m WHERE n_spans > 0
    ORDER BY doc_id, label
    """


def x7_ner_label_counts(spark, sf_dir):
    """X7 match-semantics oracle: per-(doc, label) span counts from the
    REAL extractor (chunked + offset-remapped + deduped) must equal plain
    whole-text regex counts in DuckDB — proving the chunk/overlap machinery
    neither drops nor duplicates matches.

    NOT registered in REGISTRY (VERDICT r4 #6): the driver gate records
    only 50 queries and this is a derivative view of the gated
    x7_ner_spans; its DuckDB comparison runs as a pytest
    (tests/test_ner_guardrails.py::test_x7_label_counts_match_duckdb)
    via the same type-faithful checker as tools/check_oracle.py."""
    from ..operators.ner import extract_spans

    return (
        extract_spans(t(spark, sf_dir, "documents"))
        .groupBy("doc_id", "label")
        .agg(F.count("*").alias("n_spans"))
        .orderBy("doc_id", "label")
    )


def trigram_gram_array(name_col: str):
    """Distinct char trigrams of a name column as an ARRAY column.

    sequence(1, 0) in Spark auto-steps DOWN to [1, 0] — for names shorter
    than 3 chars that would emit bogus short grams while the DuckDB
    range(1, length-1) is empty. greatest(...,1) + the length(g)=3 filter
    makes sub-trigram names yield NO grams on both engines (substring past
    the end returns the short tail)."""
    return F.expr(
        f"array_distinct(filter(transform("
        f"sequence(1, greatest(length({name_col}) - 2, 1)), "
        f"i -> substring({name_col}, i, 3)), g -> length(g) = 3))"
    )


def trigram_grams(name_col: str):
    """Distinct char trigrams of a name column, exploded one per row."""
    return F.explode(trigram_gram_array(name_col)).alias("g")


def _max_gram_df_frac() -> float:
    """Hot-gram document-frequency cap for t5 (same skew guard as
    MAX_SHINGLE_DF: a gram in more than this fraction of target names is
    boilerplate — 'sup'/'upp'/… appear in EVERY supplier name — whose
    equi-join bucket is O(df²); dropping it on both engines keeps the
    gate green and the discriminative digit grams carry the match)."""
    import os

    return float(os.environ.get("SPARK_GRAFT_MAX_GRAM_DF", "0.5"))


def _t5_oracle() -> str:
    return f"""
    WITH probes AS (
      SELECT s_suppkey AS probe_key,
             'Süpplìer# ' || substr(s_name, 10) AS probe_raw
      FROM supplier WHERE s_suppkey % 7 = 3
    ),
    pn AS (SELECT probe_key, lower(strip_accents(probe_raw)) AS pname
           FROM probes),
    tn AS (SELECT s_suppkey, lower(s_name) AS tname FROM supplier),
    pg_all AS (
      SELECT probe_key, unnest(list_distinct(list_transform(
               range(1, length(pname) - 1), i -> substr(pname, i, 3)))) AS g
      FROM pn
    ),
    tg_all AS (
      SELECT s_suppkey, unnest(list_distinct(list_transform(
               range(1, length(tname) - 1), i -> substr(tname, i, 3)))) AS g
      FROM tn
    ),
    nn AS (SELECT COUNT(DISTINCT s_suppkey) AS n FROM tg_all),
    hot AS (
      SELECT g FROM tg_all GROUP BY g
      HAVING COUNT(*) > (SELECT n FROM nn) * {_max_gram_df_frac()}
    ),
    pg AS (SELECT probe_key, g FROM pg_all WHERE g NOT IN (SELECT g FROM hot)),
    tg AS (SELECT s_suppkey, g FROM tg_all WHERE g NOT IN (SELECT g FROM hot)),
    psz AS (SELECT probe_key, COUNT(*) AS np FROM pg GROUP BY 1),
    tsz AS (SELECT s_suppkey, COUNT(*) AS nt FROM tg GROUP BY 1),
    inter AS (
      SELECT probe_key, s_suppkey, COUNT(*) AS nc
      FROM pg JOIN tg ON pg.g = tg.g GROUP BY 1, 2
    ),
    scored AS (
      SELECT probe_key, s_suppkey,
             CAST(nc AS DOUBLE) / (np + nt - nc) AS sim,
             ROW_NUMBER() OVER (PARTITION BY probe_key
                                ORDER BY CAST(nc AS DOUBLE) / (np + nt - nc)
                                         DESC, s_suppkey) AS rk
      FROM inter
      JOIN psz USING (probe_key) JOIN tsz USING (s_suppkey)
    )
    SELECT probe_key, s_suppkey AS matched_suppkey, ROUND(sim, 6) AS sim
    FROM scored WHERE rk = 1 ORDER BY probe_key
    """


@q("t5_fuzzy_trigram_search", _t5_oracle)
def t5_fuzzy_trigram_search(spark, sf_dir):
    """T5 fuzzy entity search (sql/vessels_lookup.sql:6-43: unaccent +
    pg_trgm similarity): accent-stripped lowercase names → distinct char
    trigrams → HOT-GRAM DF CAP (grams in > MAX_GRAM_DF of target names are
    dropped on both engines — the boilerplate 'supplier#' grams whose join
    buckets are O(df²) at scale) → candidate pairs from a trigram EQUI-join
    (never an all-pairs scan) → Jaccard over the FILTERED gram sets → best
    match per probe. Probes are deterministic accented/typo'd supplier-name
    variants built identically in the oracle. 100-TB shape: the gram join
    shuffles on the gram hash; the tiny probe side and hot-gram set
    broadcast."""
    from ..functions.strings import strip_accents_sql

    sup = t(spark, sf_dir, "supplier")
    probes = sup.filter("s_suppkey % 7 = 3").select(
        F.col("s_suppkey").alias("probe_key"),
        F.concat(F.lit("Süpplìer# "), F.expr("substr(s_name, 10)"))
        .alias("probe_raw"),
    )
    pn = probes.select(
        "probe_key", F.lower(strip_accents_sql(F.col("probe_raw"))).alias("pname")
    )
    tn = sup.select(
        F.col("s_suppkey").alias("target_key"), F.lower("s_name").alias("tname")
    )
    best, _inter = _trigram_best_match(pn, tn)
    return (
        best.select(
            "probe_key",
            F.col("target_key").alias("matched_suppkey"),
            "sim",
        )
        .orderBy("probe_key")
    )


def _trigram_best_match(pn, tn, wide: bool = False):
    """Trigram fuzzy-match core: pn(probe_key, pname) against
    tn(target_key, tname) → (best_df with rk=1 rows, candidate inter_df).
    Hot-gram DF cap, gram equi-join, probe side broadcast — the t5 shape,
    factored so the bench-scale run (part names, 20x the supplier table)
    reuses the identical semantics and can report its candidate-pair
    count.

    ``wide=False`` (the oracle arm) keeps the r5 plan verbatim — at the
    1k-name oracle scale the r6 scale shape's extra exchange and broadcast
    stages cost more latency than they save (measured in interleaved
    sf1 A/Bs). ``wide=True`` (the bench/production arm) switches to the
    r6 scale shape; both produce identical rows
    (tests/test_operators_misc.py pins the equality):

    * the targets are hash-repartitioned before the gram fan-out — the
      name scan is 1-2 byte-sized splits, so without it the candidate
      fan-out (the dominant compute) runs on 1-2 cores (guide §2.5);
    * the target gram-set size nt rides ALONG on each gram row
      (array_except against the tiny hot-gram set — bounded by
      construction at ≤ avg_grams_per_name / MAX_GRAM_DF entries — then
      size() before the explode) instead of being re-aggregated into a
      corpus-keyed tsz table that the r5 plan shuffle-joined against
      every candidate row (guide §2.3);
    * best-per-probe is a min(struct) hash aggregate (map-side partial
      combine; sim > 0 always since nc ≥ 1, so the (−sim, target_key)
      struct min IS the (sim DESC, target_key) first row) instead of a
      row_number window that shuffled AND sorted every candidate row
      (guide §2.4)."""
    if wide:
        n_part = int(tn.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        tga = (tn.repartition(n_part, "target_key")
               .select("target_key", trigram_gram_array("tname").alias("gs")))
        tg_all = tga.select("target_key", F.explode("gs").alias("g"))
    else:
        tg_all = tn.select("target_key", trigram_grams("tname"))
    nn = tg_all.agg(F.countDistinct("target_key").alias("n"))
    hot = (
        tg_all.groupBy("g")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(nn))
        .filter(F.col("df") > F.col("n") * _max_gram_df_frac())
        .select("g")
    )
    pg = (
        pn.select("probe_key", trigram_grams("pname"))
        .join(F.broadcast(hot), "g", "left_anti")
    )
    psz = pg.groupBy("probe_key").agg(F.count("*").alias("np"))
    if not wide:
        tg = tg_all.join(F.broadcast(hot), "g", "left_anti")
        tsz = tg.groupBy("target_key").agg(F.count("*").alias("nt"))
        inter = (
            F.broadcast(pg).join(tg, "g")
            .groupBy("probe_key", "target_key")
            .agg(F.count("*").alias("nc"))
        )
        sim = (F.col("nc").cast("double")
               / (F.col("np") + F.col("nt") - F.col("nc")))
        scored = (
            inter.join(F.broadcast(psz), "probe_key")
            .join(tsz, "target_key")
            .withColumn("sim_raw", sim)
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("probe_key").orderBy(F.desc("sim_raw"),
                                                        "target_key")))
        )
        best = (
            scored.filter("rk = 1")
            .select("probe_key", "target_key",
                    F.round("sim_raw", 6).alias("sim"))
        )
        return best, inter
    hot_set = hot.agg(F.collect_list("g").alias("hot_gs"))
    tg = (
        tga.crossJoin(F.broadcast(hot_set))
        .select("target_key", F.array_except("gs", "hot_gs").alias("gs"))
        .select("target_key", F.size("gs").alias("nt"),
                F.explode("gs").alias("g"))
    )
    inter = (
        F.broadcast(pg).join(tg, "g")
        .groupBy("probe_key", "target_key")
        .agg(F.count("*").alias("nc"), F.min("nt").alias("nt"))
    )
    sim = F.col("nc").cast("double") / (F.col("np") + F.col("nt") - F.col("nc"))
    scored = (
        inter.join(F.broadcast(psz), "probe_key")
        .withColumn("sim_raw", sim)
    )
    best = (
        scored.groupBy("probe_key")
        .agg(F.min(F.struct((-F.col("sim_raw")).alias("ns"),
                            F.col("target_key").alias("tk"),
                            F.col("sim_raw").alias("sv"))).alias("m"))
        .select("probe_key", F.col("m.tk").alias("target_key"),
                F.round(F.col("m.sv"), 6).alias("sim"))
    )
    return best, inter


# probe-selection predicate for the bench-scale run — bench.py computes
# its probes x targets baseline from the SAME constant, so the two can't
# drift apart
T5_FULL_PROBE_FILTER = "p_partkey % 97 = 3"


def t5_fuzzy_full(spark, sf_dir):
    """Bench-scale evidence run (VERDICT r3 #2): the same trigram
    fuzzy-match over the part table — 20k names at sf0.1 vs the oracle's
    1k-supplier corpus — with deterministically accented/truncated probes
    (every 97th part). Not @q-registered: no oracle at this volume by
    design; the identical core is oracle-gated through
    t5_fuzzy_trigram_search. Returns (best_df, candidates_df)."""
    from ..functions.strings import strip_accents_sql

    part = t(spark, sf_dir, "part")
    probes = part.filter(T5_FULL_PROBE_FILTER).select(
        F.col("p_partkey").alias("probe_key"),
        F.translate(F.expr("substr(p_name, 4)"), "aeo", "äéö")
        .alias("probe_raw"),
    )
    pn = probes.select(
        "probe_key", F.lower(strip_accents_sql(F.col("probe_raw"))).alias("pname")
    )
    tn = part.select(
        F.col("p_partkey").alias("target_key"), F.lower("p_name").alias("tname")
    )
    return _trigram_best_match(pn, tn, wide=True)
