"""Training-data-pipeline operators: deduplication, similarity search,
text analysis. Each is a queries()/oracle_sql() pair over the documents /
embeddings tables.

Cross-engine hash-stability tricks used here:
  * float dot products quantize each elementwise product to DECIMAL(18,9)
    before summing — the sum is then exact and order-independent, so Spark
    and DuckDB produce bit-identical doubles at the end
  * MinHash permutations are min() over md5 hex STRINGS (lexicographic min
    of hex == numeric min) — portable, no engine-specific hash()
  * SimHash bits come from md5 nibbles via instr('0123456789abcdef', ...),
    identical SQL semantics in both engines
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import q, t

# ------------------------------------------------------------------ dedup

@q(
    "dd_exact",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- deterministic duplicate seeding: the synthetic corpus has no
      -- full-text dups, so re-insert every 13th doc under a new id
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id % 13 = 0
    )
    SELECT text_sha, n_copies, canonical_doc_id FROM (
      SELECT sha256(text) AS text_sha,
             COUNT(*) AS n_copies,
             MIN(doc_id) AS canonical_doc_id
      FROM corpus GROUP BY 1
    ) WHERE n_copies > 1
    ORDER BY text_sha
    """,
)
def dd_exact(spark, sf_dir):
    """Exact dedup: sha256(full text) hash-groupBy, keep min-id canonical
    row (SURVEY §2.5 W1 family). At 100 TB this is ONE shuffle on the
    256-bit digest — collision-free in practice, and the map-side partial
    agg hashes locally before the exchange. Duplicates are seeded
    deterministically (every 13th doc re-inserted under a new id) because
    the synthetic corpus has no organic full-text dups; the oracle seeds
    identically."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") % 13 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return (
        d.unionByName(dups)
        .groupBy(F.sha2("text", 256).alias("text_sha"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter("n_copies > 1")
        .orderBy("text_sha")
    )


_SHINGLE_SQL_DUCK = """
  SELECT doc_id, unnest(list_transform(
           range(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE doc_id < 150)
  WHERE len(ws) >= 3
"""

# hot-shingle skew guard: a shingle appearing in more than this fraction
# of docs is boilerplate — it contributes no near-dup signal but its
# equi-join bucket is O(df²) pairs (THE skew bomb at 100 TB). Dropped on
# both engines, so the gate checks identical semantics.
#
# ALL knobs here are read at QUERY-BUILD time (function call), never at
# import: the oracle SQL strings that embed them are registered as
# BUILDERS (callables) so an env flip in-process changes both sides.


def _max_shingle_df_frac() -> float:
    return float(os.environ.get("SPARK_GRAFT_MAX_SHINGLE_DF", "0.25"))


def _shingle_filtered_duck() -> str:
    return f"""
    ds_all AS (SELECT DISTINCT doc_id, shingle FROM sh),
    n_docs AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM ds_all),
    hot AS (
      SELECT shingle FROM ds_all GROUP BY shingle
      HAVING COUNT(*) > (SELECT nd FROM n_docs) * {_max_shingle_df_frac()}
    ),
    ds AS (
      SELECT doc_id, shingle FROM ds_all
      WHERE shingle NOT IN (SELECT shingle FROM hot)
    )
"""


def _shingles(spark, sf_dir, max_doc: int | None = 150):
    """Word-trigram shingles, 1-indexed windows — mirrors the DuckDB CTE.
    ``max_doc=None`` skips the oracle cost slice (bench-scale runs)."""
    d = t(spark, sf_dir, "documents")
    if max_doc is not None:
        d = d.filter(F.col("doc_id") < max_doc)
    ws = F.split("text", " ")
    return (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("ws", i),
                        F.element_at("ws", i + 1),
                        F.element_at("ws", i + 2),
                    ),
                )
            ).alias("shingle"),
        )
    )


@q(
    "dd_ngram_jaccard",
    lambda: f"""
    WITH sh AS ({_SHINGLE_SQL_DUCK}),
    {_shingle_filtered_duck()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.03
    ORDER BY jaccard DESC, doc_a, doc_b LIMIT 200
    """,
)
def dd_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup: shingle → self-join on shingle → |∩|/|∪|,
    with a hot-shingle document-frequency cap (MAX_SHINGLE_DF_FRAC): a
    shingle in >25% of docs is boilerplate whose join bucket is O(df²)
    pairs — THE skew bomb at 100 TB — so it is dropped before the
    equi-join on both engines. The df computation is itself one groupBy
    and the drop is a broadcast left-anti (the hot set is tiny); Jaccard
    sizes use the FILTERED sets so similarity semantics stay consistent."""
    ds_all = _shingles(spark, sf_dir).distinct()
    nd = ds_all.agg(F.countDistinct("doc_id").alias("nd"))
    hot = (
        ds_all.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") > F.col("nd") * _max_shingle_df_frac())
        .select("shingle")
    )
    ds = ds_all.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ds.alias("a")
    b = ds.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        F.col("n_common").cast("double")
        / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    )
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.03)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(200)
    )


# MinHash scale knobs. Test default is the toy size (6 perms / 2-row
# bands) so the DuckDB oracle stays cheap; the 100-TB config is
# SPARK_GRAFT_MINHASH_PERMS=128 ROWS_PER_BAND=8 (16 bands — band-collision
# prob at jaccard .8 = 1-(1-.8^8)^16 ≈ .95, at .5 ≈ .06: a usable S-curve).
# Both the Spark plan and the oracle SQL builder read the knobs at query
# BUILD time, so the gate stays green at any setting and an in-process env
# flip actually changes the plan.


def _minhash_cfg() -> tuple[int, int]:
    n = int(os.environ.get("SPARK_GRAFT_MINHASH_PERMS", "6"))
    rpb = int(os.environ.get("SPARK_GRAFT_MINHASH_ROWS_PER_BAND", "2"))
    return n, rpb


def _adaptive_width(df, bytes_per_task: int) -> int:
    """Delegates to the ONE shared sizing heuristic (session.adaptive_width)
    — measured rationale: a fixed session-width repartition regressed
    sim_ivf_topk 2× at sf0.1 while winning 35% at sf1."""
    from ..session import adaptive_width

    return adaptive_width(df, bytes_per_task)


def _n_shuffle(spark) -> int:
    """The session's shuffle-partition count — the scale-adaptive
    parallelism target for deliberate repartitions placed BEFORE
    CPU-heavy map work (r6, guide §2.5 'input skew' / §6): the corpora
    here are byte-small but compute-dense (128 md5s or a k×dim decimal
    fold per row), so the parquet scan yields 1–4 splits and AQE's
    byte-based coalescing keeps post-shuffle partitions just as few —
    leaving 28+ cores idle under the most expensive expressions. A hash
    repartition on the grouping key costs one exchange of the narrow
    input and makes every downstream stage (dedup, aggregate) partition-
    local. Parameterized by spark.sql.shuffle.partitions, never a local
    constant."""
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def _minhash_oracle() -> str:
    n_minhash, rows_per_band = _minhash_cfg()
    return f"""
    WITH sh AS ({_SHINGLE_SQL_DUCK}),
    ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
    mh AS (
      SELECT doc_id, j, MIN(md5(shingle || ':' || CAST(j AS VARCHAR))) AS h
      FROM ds CROSS JOIN range({n_minhash}) r(j)
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, CAST(FLOOR(j / {rows_per_band}) AS INTEGER) AS band_id,
             string_agg(h, '|' ORDER BY j) AS band_key
      FROM mh GROUP BY doc_id, CAST(FLOOR(j / {rows_per_band}) AS INTEGER)
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    ver AS (
      SELECT c.doc_a, c.doc_b, c.n_shared_bands, COUNT(*) AS n_common
      FROM cand c
      JOIN ds a ON a.doc_id = c.doc_a
      JOIN ds b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2, 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY 1)
    SELECT doc_a, doc_b, n_shared_bands,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
             AS jaccard
    FROM ver
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY jaccard DESC, doc_a, doc_b LIMIT 200
    """


def _minhash_from_shingles(spark, ds, n_minhash: int, rows_per_band: int,
                           materialize: bool = False):
    """MinHash+LSH candidates→verify core over a DISTINCT (doc_id, shingle)
    set; returns (result_df, candidates_df) so bench-scale runs can report
    the candidate-pair count alongside the verified output.

    r6 restructure (guide §2.3/§2.4) — identical rows, new shape:

    * ONE-PASS signatures: the r5 shape crossJoined every (doc, shingle)
      row against spark.range(n_minhash) (a ×128 row fan-out at production
      knobs) and shuffled the (doc_id, j) partials — ~900M rows at sf1.
      Now each row computes its n_minhash md5s as columns and ONE hash
      aggregate takes n_minhash MINs per doc: same min-over-md5-strings
      math, no fan-out, and the shuffle carries one row per doc.
    * ``materialize=True`` (the full-corpus arm): the band table (the LSH
      signature proxy — n_bands rows × one short string per doc, bounded
      ~300 B/doc at any corpus size) is localCheckpoint-ed because the
      self-join references it on both sides — without the cut the whole
      shingle→signature chain re-runs per side; and verify runs off the
      CANDIDATE-DOC slice of ds (cand is materialized — tiny, the whole
      point of LSH — and its doc ids broadcast-semi-join prune ds once),
      so the corpus-sized shingle table is scanned twice total
      (signatures + the pruning pass) instead of four times, and is never
      pinned. The oracle arm keeps the lazy lineage: its ds slice is
      already checkpointed and bounded, and the visible plan is what the
      knob tests inspect."""
    hcols = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f":{j}")))).alias(f"h{j}")
        for j in range(n_minhash)
    ]
    mh = ds.groupBy("doc_id").agg(*hcols)
    n_bands = -(-n_minhash // rows_per_band)
    band_structs = [
        F.struct(
            F.lit(bi).alias("band_id"),
            F.concat_ws("|", *[
                F.col(f"h{j}")
                for j in range(bi * rows_per_band,
                               min((bi + 1) * rows_per_band, n_minhash))
            ]).alias("band_key"),
        )
        for bi in range(n_bands)
    ]
    bands = (
        mh.select(
            "doc_id", F.explode(F.array(*band_structs)).alias("bx")
        )
        .select("doc_id", F.col("bx.band_id").alias("band_id"),
                F.col("bx.band_key").alias("band_key"))
    )
    if materialize:
        bands = bands.localCheckpoint(eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )
    if materialize:
        cand = cand.localCheckpoint(eager=True)
        cand_docs = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        ds_verify = (
            ds.join(F.broadcast(cand_docs), "doc_id", "left_semi")
            .localCheckpoint(eager=True)
        )
    else:
        ds_verify = ds  # caller already checkpointed the bounded slice
    sa = ds_verify.alias("sa")
    sb = ds_verify.alias("sb")
    ver = (
        F.broadcast(cand)
        .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, (F.col("sb.doc_id") == F.col("doc_b"))
              & (F.col("sb.shingle") == F.col("sa.shingle")))
        .groupBy("doc_a", "doc_b", "n_shared_bands")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = ds_verify.groupBy("doc_id").agg(F.count("*").alias("n"))
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    jac = (
        F.col("n_common").cast("double")
        / (F.col("za.n") + F.col("zb.n") - F.col("n_common"))
    )
    # broadcast the TINY side (verified candidates), never `sizes` — that
    # is one row per doc, corpus-sized at 100 TB
    result = (
        F.broadcast(ver)
        .join(za, F.col("za.doc_id") == F.col("doc_a"))
        .join(zb, F.col("zb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", "n_shared_bands",
                F.round(jac, 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(200)
    )
    return result, cand


@q("dd_minhash_lsh", _minhash_oracle)
def dd_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup, full candidates→VERIFY pipeline: shingle → K
    min-hashes (min over md5 strings: engine-portable 'permutations') →
    band keys → bucket self-join for CANDIDATES → exact Jaccard on the
    candidates only (broadcast the tiny candidate set against the shingle
    table — the corpus-sized side never self-joins). K and band width come
    from SPARK_GRAFT_MINHASH_* (toy 6/2 for the test oracle, 128/8 at
    100 TB — see the knob comment above), read at build time.

    The doc_id<150 oracle slice bounds the shingle set BY CONSTRUCTION, so
    it is localCheckpoint-ed once for its 4 reuses (minhashes, both verify
    sides, sizes) — the unsliced dd_minhash_full path stays lazy (a
    corpus-sized shingle table must never be pinned in executor memory)."""
    n_minhash, rows_per_band = _minhash_cfg()
    ds = _shingles(spark, sf_dir).distinct().localCheckpoint(eager=True)
    result, _cand = _minhash_from_shingles(spark, ds, n_minhash, rows_per_band)
    return result


def dd_minhash_full(spark, sf_dir):
    """Bench-scale evidence run (VERDICT r3 #2): the SAME banded pipeline
    over the FULL documents corpus — no doc_id cost slice — at whatever
    SPARK_GRAFT_MINHASH_* currently says (bench.py sets the production
    128/8). Not @q-registered: there is no DuckDB oracle at this volume by
    design; correctness is gated at oracle scale on the identical code
    path. Returns (result_df, candidates_df)."""
    n_minhash, rows_per_band = _minhash_cfg()
    # r6: hash-repartition the shingle rows by doc_id BEFORE the dedup —
    # HashPartitioning(doc_id) satisfies the (doc_id, shingle) clustering,
    # so the dedup AND the n_minhash-column min aggregate both run
    # partition-local on _n_shuffle cores with ONE exchange total. The r5
    # shape left the 128-md5s-per-row aggregate on the byte-based
    # (AQE-coalesced) partitioning of distinct() — ≤4 partitions at sf1.
    ds = (
        _shingles(spark, sf_dir, max_doc=None)
        .repartition(_n_shuffle(spark), "doc_id")
        .dropDuplicates(["doc_id", "shingle"])
    )
    return _minhash_from_shingles(spark, ds, n_minhash, rows_per_band,
                                  materialize=True)


_NIBBLE_BIT = (
    "(instr('0123456789abcdef', substr(md5(w), {j}, 1)) - 1) % 2"
)


def _band_exprs(band_bits: list[int]) -> str:
    """named_struct band-slice expressions for a simhash split into bands
    of the given widths (low bits first) — div/mod only, so the SQL is
    portable and integer-exact."""
    entries, off = [], 0
    for i, w in enumerate(band_bits):
        if off == 0:
            expr = f"simhash % {1 << w}"
        elif i == len(band_bits) - 1:
            expr = f"simhash div {1 << off}"
        else:
            expr = f"(simhash div {1 << off}) % {1 << w}"
        entries.append(f"named_struct('band_id', {i}, 'band_val', {expr})")
        off += w
    return ",\n        ".join(entries)


def _simhash_sql(engine: str, n_bits: int = 16,
                 band_bits: tuple[int, ...] = (4, 3, 3, 3, 3),
                 max_ham: int = 4,
                 where: str = "WHERE doc_id < 200",
                 emit: str = "pairs",
                 max_band_pop: int | None = None,
                 sig_table: str | None = None) -> str:
    """SimHash over word tokens; identical nibble math both engines.

    The DuckDB oracle keeps the naive all-pairs join (it DEFINES the
    semantics, at sf0.01). The Spark plan generates candidates by
    PIGEONHOLE BANDING instead: the signature splits into len(band_bits)
    bands; any pair at hamming <= max_ham differs in at most max_ham
    bands, so with >= max_ham+1 bands at least one band is bit-identical —
    join on (band_id, band_val) EQUALITY, then exact-verify hamming on the
    candidates. Lossless recall at the threshold, and the O(n²) all-pairs
    join becomes one equi-join shuffle on the band value — the shape that
    survives 100 TB.

    Defaults are the oracle config (16-bit sig, 4+3+3+3+3 bands, ham<=4,
    doc_id<200 cost slice). Bench-scale runs pass n_bits=32 with 8-bit
    bands: a 16-bit signature space SATURATES at a few thousand docs
    (every band bucket huge), the exact failure a production config must
    avoid. md5's 32 hex nibbles support up to 32 bits. emit='cand_count'
    (spark only) returns the candidate-pair count instead of the verified
    pairs, for bench evidence.

    ``max_band_pop`` (spark arm only, r5): drop band buckets whose
    population exceeds the cap before the self-join — the same hot-key
    discipline as dd_ngram's hot-shingle DF drop and t5's hot-gram cap.
    Candidate pairs become Σ C(pop,2) over surviving buckets, bounded
    ~n_docs·bands·cap/2 — LINEAR in corpus at fixed cap instead of
    tracking all-pairs on value-skewed corpora (measured at sf1: 186M →
    6.2M with cap 500). Recall tradeoff, stated plainly: a qualifying
    pair is lost only when EVERY band it agrees on is saturated; a
    saturated band value is corpus-generic, so such pairs are
    overwhelmingly non-dups — and the pigeonhole guarantee still holds
    through any unsaturated agreeing band. The oracle-gated config never
    caps (the all-pairs oracle DEFINES the semantics)."""
    assert sum(band_bits) == n_bits and n_bits <= 32
    assert len(band_bits) >= max_ham + 1  # pigeonhole recall guarantee
    if engine == "duck":
        toks = ("SELECT doc_id, unnest(string_split(text, ' ')) AS w "
                f"FROM documents {where}")
        jgen = f"CROSS JOIN range(1, {n_bits + 1}) r(j)"
        xor = "bit_count(xor(a.simhash, b.simhash))"
        pair_src = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {xor} AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE {xor} <= {max_ham}"""
    else:
        toks = ("SELECT doc_id, explode(split(text, ' ')) AS w "
                f"FROM documents {where}")
        src = "bands"
        if max_band_pop is not None:
            src = "bands_capped"
        cand = f"""
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.simhash AS sig_a, b.simhash AS sig_b
      FROM {src} a JOIN {src} b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id"""
        if emit == "cand_count":
            pair_src = f"""
    SELECT COUNT(*) AS n_candidates FROM ({cand}
    ) cand"""
        else:
            pair_src = f"""
    SELECT doc_a, doc_b, bit_count(sig_a ^ sig_b) AS hamming FROM ({cand}
    ) cand
    WHERE bit_count(sig_a ^ sig_b) <= {max_ham}"""
    bands_cte = f""",
    bands AS (
      SELECT doc_id, simhash, band.band_id, band.band_val
      FROM sig
      LATERAL VIEW explode(array(
        {_band_exprs(list(band_bits))}
      )) bx AS band
    )""" if engine != "duck" else ""
    if engine != "duck" and max_band_pop is not None:
        # window count, not aggregate+join: a separate band_pop CTE would
        # reference the expensive toks→bits→sig chain a second time (the
        # CLAUDE.md stage-referenced-twice plan-doubling trap); the window
        # shuffles on (band_id, band_val) — the partitioning the band
        # equi-join needs anyway (review r5)
        bands_cte += f""",
    bands_capped AS (
      SELECT doc_id, simhash, band_id, band_val
      FROM (
        SELECT doc_id, simhash, band_id, band_val,
               COUNT(*) OVER (PARTITION BY band_id, band_val) AS pop
        FROM bands
      ) WHERE pop <= {max_band_pop}
    )"""
    tail = ("" if emit == "cand_count"
            else "\n    ORDER BY hamming, doc_a, doc_b LIMIT 200")
    if engine == "duck":
        return f"""
    WITH toks AS ({toks}),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (instr('0123456789abcdef', substr(md5(w), j, 1)) - 1) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM toks {jgen}
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN CAST(pow(2, j - 1) AS BIGINT) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    )
    {pair_src}{tail}
    """
    if sig_table is not None:
        sig_src = f"WITH sig AS (SELECT doc_id, simhash FROM {sig_table})"
    else:
        sig_src = f"WITH {_simhash_sig_ctes(toks, n_bits)}"
    return f"""
    {sig_src}{bands_cte}
    {pair_src}{tail}
    """


def _simhash_sig_ctes(toks: str, n_bits: int) -> str:
    """Spark-arm signature chain (r6 optimization, guide §2.3/§4.1).

    The r5 shape fanned every token row out ×n_bits (LATERAL VIEW explode)
    and re-evaluated md5(w) on every fanned row, then shuffled the
    (doc_id, j) partials — at sf1 that is ~240M rows and ~240M md5 calls
    per evaluation. This chain computes md5 ONCE per token, maps the hex
    digits to their nibble parity in one codegen'd translate() (hex digit
    d has odd low bit exactly for '13579bdf'), and aggregates the n_bits
    per-doc bit counts as n_bits SUM columns in a single hash aggregate —
    one shuffle of one row per doc, no fan-out.

    Integer-exact equivalence to the oracle's signed-sum formulation:
    s_j = (+1 per odd-nibble token) + (-1 per even) = 2*c_j - n, so
    s_j > 0  <=>  2*c_j > n. Bit weights are integer literals, so the
    signature is bit-identical to the r5 SQL (pinned by
    tests/test_simhash_band_cap_semantics' pure-Python recomputation)."""
    cols = "".join(
        f",\n             SUM(ascii(substr(m, {j}, 1)) - 48) AS c{j}"
        for j in range(1, n_bits + 1)
    )
    sig_expr = "\n             + ".join(
        f"CASE WHEN 2 * c{j} > n THEN {1 << (j - 1)} ELSE 0 END"
        for j in range(1, n_bits + 1)
    )
    return f"""toks AS ({toks}),
    tb AS (
      SELECT doc_id,
             translate(substr(md5(w), 1, {n_bits}),
                       '0123456789abcdef', '0101010101010101') AS m
      FROM toks
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n{cols}
      FROM tb GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id,
             CAST({sig_expr} AS BIGINT) AS simhash
      FROM agg
    )"""


def _simhash_sig_view(spark, n_bits: int, where: str) -> str:
    """Materialize the per-doc signature table once and register it as a
    uniquely-named temp view (r6, guide §2.4/§5): the band self-join
    references sig on BOTH sides, and the cand-count twin query references
    it twice more — without a plan cut the whole toks→agg→sig chain is
    recomputed per reference (the r5 plan computed it 2× per query, 4× per
    full-arm bench iteration). The signature table is the classic
    lightweight proxy (guide §8): one row and one BIGINT per doc, bounded
    ~8 B/doc at any corpus size, so pinning it is cheap where re-deriving
    it re-reads every text byte."""
    import uuid

    # the repartition hint spreads the md5-per-token map work over the
    # session's shuffle partitions BEFORE the explode (the documents scan
    # is 1-4 byte-sized splits); the sig aggregate then reuses the doc_id
    # partitioning — one narrow exchange, full-width compute (guide §2.5)
    toks = ("SELECT doc_id, explode(split(text, ' ')) AS w FROM ("
            f"SELECT /*+ REPARTITION({_n_shuffle(spark)}, doc_id) */ "
            f"doc_id, text FROM documents {where}) src")
    sig = spark.sql(
        f"WITH {_simhash_sig_ctes(toks, n_bits)}\n"
        "    SELECT doc_id, simhash FROM sig"
    ).localCheckpoint(eager=True)
    view = "simhash_sig_" + uuid.uuid4().hex[:8]
    sig.createOrReplaceTempView(view)
    return view


@q("dd_simhash", _simhash_sql("duck"))
def dd_simhash(spark, sf_dir):
    """SimHash near-dup: per-token md5-nibble bits → signed bit sums →
    16-bit signature → pigeonhole-banded candidate equi-join → exact
    hamming verify (see _simhash_sql: identical result set to the oracle's
    all-pairs spec, but no O(n²) join). Declarative SQL end to end (no
    UDF): Catalyst plans the explodes, aggregations and the band
    equi-join. r6: the signature chain computes md5 once per token and
    aggregates bit counts in one pass (_simhash_sig_ctes). The oracle
    slice stays a SINGLE lazy query — measured at sf1, adding the full
    arm's sig checkpoint here costs more in extra job latency than the
    200-doc chain recompute it saves (the checkpoint belongs to
    dd_simhash_full, where the chain is corpus-sized)."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_simhash_sql("spark"))


def _simhash_band_pop_cap() -> int:
    """Hot-band bucket cap for the full-corpus simhash runs (r5: the
    same hot-key discipline as MAX_CELL_POP / the shingle and gram DF
    caps) — read at BUILD time like every other knob."""
    return int(os.environ.get("SPARK_GRAFT_SIMHASH_BAND_POP", "500"))


def _simhash_full_cfg() -> dict:
    return dict(n_bits=32, band_bits=(8, 8, 8, 8), max_ham=3, where="",
                max_band_pop=_simhash_band_pop_cap())


def dd_simhash_full(spark, sf_dir):
    """Bench-scale evidence run (VERDICT r3 #2): SimHash over the FULL
    documents corpus in the production shape — 32-bit signature, 4x8-bit
    bands, hamming<=3, hot-band buckets past SPARK_GRAFT_SIMHASH_BAND_POP
    dropped (r5: candidate count LINEAR in corpus at fixed cap; see
    _simhash_sql for the stated recall tradeoff). The oracle's 16-bit
    signature space saturates at a few thousand docs (5k docs / 65k
    signatures → every band bucket huge); widening the signature is
    exactly what a production config does, and the md5-nibble
    construction extends to 32 bits unchanged.
    Returns (pairs_df, cand_count_df)."""
    _SIMHASH_FULL = _simhash_full_cfg()
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    # one signature materialization shared by the pairs AND cand-count
    # twins (r6): previously each twin recomputed the full token chain
    # per self-join side — 4 evaluations per bench iteration
    view = _simhash_sig_view(spark, _SIMHASH_FULL["n_bits"],
                             _SIMHASH_FULL["where"])
    out = (
        spark.sql(_simhash_sql("spark", sig_table=view, **_SIMHASH_FULL)),
        spark.sql(_simhash_sql("spark", emit="cand_count", sig_table=view,
                               **_SIMHASH_FULL)),
    )
    # spark.sql analyzes eagerly, so the view is already resolved into
    # both plans — drop it so repeated builder calls (best-of-2 bench
    # loops) don't accumulate catalog references pinning checkpoint
    # blocks (review r6)
    spark.catalog.dropTempView(view)
    return out


# ------------------------------------------------------- embedding space

_DOT_DECIMAL = """
      CAST(SUM(CAST(CAST(a.embedding[i.i] AS DOUBLE)
                    * CAST(b.embedding[i.i] AS DOUBLE) AS DECIMAL(18,9)))
           AS DOUBLE)
"""


def _dot_dec(x, y):
    """Decimal-quantized dot product of two array<float> columns: each
    elementwise product rounds to DECIMAL(18,9) before the fold, so the sum
    is exact and order-independent — bit-identical across engines and
    partitionings. JVM higher-order functions only."""
    prod = F.zip_with(
        x, y, lambda p, r: (p.cast("double") * r.cast("double")).cast("decimal(18,9)")
    )
    return F.aggregate(
        prod,
        F.lit(0).cast("decimal(38,9)"),
        lambda acc, v: (acc + v).cast("decimal(38,9)"),
    ).cast("double")


def _np_dot(batches):
    # numpy row-wise dot over the whole Arrow batch — used only to
    # PREFILTER (double has ~1e-15 relative error vs the exact fold)
    import numpy as np

    for pdf in batches:
        ea = np.vstack(pdf["ea"].to_numpy()).astype("float64")
        eb = np.vstack(pdf["eb"].to_numpy()).astype("float64")
        pdf["dotd"] = np.einsum("ij,ij->i", ea, eb)
        yield pdf


# dd_embed_cosine scale knobs (read at build time, mirrored in the oracle
# builder):
#   SPARK_GRAFT_MAX_CELL_POP — hot-cell guard. A skewed quantizer cell with
#     m vectors materializes m²/2 within-cell pairs (the embedding-space
#     analogue of the hot-shingle skew bomb), so cells above this
#     population are SUB-SPLIT: n_sub = ceil(pop / cap) subcells keyed by
#     vec_id % n_sub (engine-portable secondary hash — at 100 TB use any
#     stable id hash), bounding every join bucket to ~cap vectors. The
#     recall inside an oversized cell drops to ~1/n_sub of its pairs — the
#     same deliberate recall-for-survival trade the shingle DF cap makes.
#   SPARK_GRAFT_EMBED_PROBES — multiprobe width. Each vector is assigned to
#     its home cell (label) PLUS its (probes-1) nearest OTHER centroids by
#     the decimal-quantized dot score, recovering near-dup pairs that
#     straddle a cell boundary. Pairs found in two shared cells dedup via
#     DISTINCT.


def _max_cell_pop() -> int:
    return int(os.environ.get("SPARK_GRAFT_MAX_CELL_POP", "500"))


def _embed_probes() -> int:
    return int(os.environ.get("SPARK_GRAFT_EMBED_PROBES", "2"))


def _embed_inline_max_cells() -> int:
    """Quantizer-size bound for the inlined-literal centroid scoring
    (ADVICE r4): up to this many cells the centroids are collected and
    inlined as plan literals (shuffle-free, one decimal fold per cell in
    the expression tree); above it the SAME fold runs through a broadcast
    join against the centroid table so the Catalyst tree stays O(1) in k.
    Both paths emit bit-identical scores — this is a plan-size knob, not a
    semantics knob. ONE reader (operators/ann._inline_max_cells) serves
    both the embed probe scoring here and the kmeans/assign argmin, so
    the switchover can never drift between them (review r6)."""
    from ..operators.ann import _inline_max_cells

    return _inline_max_cells()


def _prefilter_min_vecs() -> int:
    """Input-vector-count threshold below which dd_embed_cosine SKIPS the
    numpy prefilter (VERDICT r3 #3). The prefilter ships every candidate's
    two vectors through an extra Arrow round trip — a win when it can
    discard most of a large candidate set before the decimal-exact fold,
    pure fixed cost on a few hundred pairs (measured 4.2x on the 200-vector
    bench slice). Gating on the INPUT count instead of the blocked-pair
    count keeps the decision free: the slice is already materialized for
    reuse, while counting pairs would eagerly run half the query. With
    MAX_CELL_POP=500 the pair count is ~n_vecs x bucket/2, so 1000 vectors
    ~ the >=10k-pair regime where the round trip pays. Both paths produce
    identical rows — the gate is a plan choice, not a semantics knob."""
    return int(os.environ.get("SPARK_GRAFT_EMBED_PREFILTER_MIN_VECS", "1000"))


def _embed_cosine_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 200),
    cent AS (
      SELECT label AS cell, i.i AS pos,
             CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE) AS DECIMAL(18,9)))
                  AS DOUBLE) / COUNT(*) AS c
      FROM e CROSS JOIN range(1, 65) i(i) GROUP BY label, i.i
    ),
    vscore AS (
      SELECT v.vec_id, v.label, c.cell,
             CAST(SUM(CAST(CAST(v.embedding[c.pos] AS DOUBLE) * c.c
                           AS DECIMAL(18,9))) AS DOUBLE) AS score
      FROM e v CROSS JOIN cent c GROUP BY v.vec_id, v.label, c.cell
    ),
    probe AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, cell) AS rk
        FROM vscore WHERE cell <> label
      ) WHERE rk <= {_embed_probes() - 1}
    ),
    asg AS (
      SELECT vec_id, label AS cell FROM e
      UNION ALL SELECT vec_id, cell FROM probe
    ),
    pop AS (SELECT cell, COUNT(*) AS cnt FROM asg GROUP BY cell),
    asg2 AS (
      SELECT a.vec_id, a.cell,
             a.vec_id % CAST(CEIL(p.cnt / {float(_max_cell_pop())}) AS BIGINT)
               AS sub
      FROM asg a JOIN pop p ON p.cell = a.cell
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM asg2 a JOIN asg2 b
        ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
    ),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE)
                                * CAST(embedding[i.i] AS DOUBLE)
                                AS DECIMAL(18,9))) AS DOUBLE)) AS nrm
      FROM e CROSS JOIN range(1, 65) i(i) GROUP BY vec_id
    ),
    dots AS (
      SELECT p.vec_a, p.vec_b, {_DOT_DECIMAL} AS dot
      FROM pairs p
      JOIN e a ON a.vec_id = p.vec_a
      JOIN e b ON b.vec_id = p.vec_b
      CROSS JOIN range(1, 65) i(i)
      GROUP BY p.vec_a, p.vec_b
    )
    SELECT vec_a, vec_b, ROUND(dot / na.nrm / nb.nrm, 6) AS cosine
    FROM dots JOIN norms na ON na.vec_id = vec_a
              JOIN norms nb ON nb.vec_id = vec_b
    WHERE dot / na.nrm / nb.nrm >= 0.35
    ORDER BY cosine DESC, vec_a, vec_b LIMIT 200
    """


def _embed_blocked_pairs(e, max_cell_pop: int, probes: int,
                         n_vecs: int | None = None,
                         broadcast_pairs: bool = False,
                         inrow_probe: bool = False):
    """Candidate-pair generation for dd_embed_cosine: multiprobe cell
    assignment + hot-cell sub-split, all equi-joins. Returns a DataFrame
    (vec_a, vec_b) of DISTINCT candidate pairs. Factored out so the
    skewed-cell test can assert the pair-count bound directly.

    ``n_vecs`` (when the caller already knows it): if n_vecs*probes <=
    max_cell_pop then NO cell can exceed the cap, the sub-split is
    provably the identity (sub == 0 for every row), and its population
    groupBy + join are elided — same rows, two fewer exchanges.
    ``broadcast_pairs`` hints the self-join's build side — valid only for
    inputs bounded by construction (the oracle slice).

    Centroid scoring is SHUFFLE-FREE on the corpus side: the centroid
    table is k x dim — bounded by the quantizer knob at ANY corpus size —
    so it is collected and inlined as literal arrays, and each vector
    scores all k cells in one map-only decimal fold per cell (same
    DECIMAL(18,9)-quantized products as the oracle's SUM, so the scores
    stay bit-identical). The old shape shuffled an (n_vecs x dim x k)-row
    aggregation — a corpus-sized exchange the blocking exists to avoid."""
    ex = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        ex.groupBy(F.col("label").alias("cell"), F.col("pos"))
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,9)"))
                .cast("double") / F.count("*")
            ).alias("c")
        )
    )
    by_cell: dict = {}
    for r in cent.collect():  # k x dim rows — bounded by the k knob
        by_cell.setdefault(r.cell, {})[r.pos] = r.c
    cent_arrays = {cell: [m[p] for p in sorted(m)]
                   for cell, m in by_cell.items()}

    inline = len(cent_arrays) <= _embed_inline_max_cells()

    def score_against(arr):
        # the ONE decimal fold (module-level _dot_dec) against the
        # inlined centroid literal — never a second copy of the
        # bit-exactness-critical fold. Inline-literal scoring is
        # shuffle-free but grows the Catalyst tree one fold per cell, so
        # it is BOUNDED by the knob (ADVICE r4: an unbounded quantizer k
        # would bloat the tree the linear-tree invariant guards against).
        return _dot_dec(F.col("embedding"),
                        F.array(*[F.lit(float(v)) for v in arr]))

    if inrow_probe and inline and probes - 1 == 1:
        # r6 (guide §2.4): top-1 probe computed IN-ROW — an array of
        # (−score, cell) structs filtered to nonhome cells and reduced
        # with array_min, which IS the keyed min(struct(−score, cell))
        # hash aggregate without the ×k explode and the groupBy(vec_id)
        # exchange (equality pinned in tests/test_operators_misc.py).
        # NO production caller currently opts in: the keyed probe's
        # exchange doubles as the plan's reuse point, and removing it
        # measured SLOWER end to end wherever the probe subtree is
        # referenced more than once (OPTIMIZATION_r06.md, finding #2) —
        # the flag stays as the measured-and-rejected alternative, pinned
        # equal. Scores come from a decimal fold cast to double, so every
        # zero is the same +0.0 and negation cannot split a tie.
        best = F.array_min(F.filter(
            F.array(*[
                F.struct((-score_against(arr)).alias("ns"),
                         F.lit(cell).alias("cell"))
                for cell, arr in sorted(cent_arrays.items())
            ]),
            lambda s: s["cell"] != F.col("label"),
        ))
        probe = (
            e.select("vec_id", best.alias("b"))
            .filter(F.col("b").isNotNull())
            .select("vec_id", F.col("b.cell").alias("cell"))
        )
        return _pairs_from_assignment(e, probe, max_cell_pop, probes,
                                      n_vecs, broadcast_pairs)
    if inline:
        vscore = e.select(
            "vec_id", "label",
            F.explode(F.array(*[
                F.struct(F.lit(cell).alias("cell"),
                         score_against(arr).alias("score"))
                for cell, arr in sorted(cent_arrays.items())
            ])).alias("cs"),
        ).select("vec_id", "label", F.col("cs.cell").alias("cell"),
                 F.col("cs.score").alias("score"))
    else:
        # broadcast-join fallback above the bound: the k x dim centroid
        # table broadcasts (still no corpus-side shuffle) and the SAME
        # decimal fold runs against the centroid COLUMN — identical
        # scores, plan size O(1) in k
        cent_df = e.sparkSession.createDataFrame(
            [(cell, [float(v) for v in arr])
             for cell, arr in sorted(cent_arrays.items())],
            ["cell", "centroid"])
        vscore = (
            e.crossJoin(F.broadcast(cent_df))
            .select("vec_id", "label", "cell",
                    _dot_dec(F.col("embedding"),
                             F.col("centroid")).alias("score"))
        )
    nonhome = vscore.filter(F.col("cell") != F.col("label"))
    if probes - 1 == 1:
        # keyed top-1 fallback (k above the inline bound): min(struct) hash
        # agg — map-side partial combine shuffles n rows, not the n×k a
        # rank window would
        probe = (
            nonhome.groupBy("vec_id")
            .agg(F.min(F.struct((-F.col("score")).alias("ns"),
                                F.col("cell"))).alias("m"))
            .select("vec_id", F.col("m.cell").alias("cell"))
        )
    elif probes <= 1:
        probe = nonhome.select("vec_id", "cell").limit(0)
    else:
        probe = (
            nonhome.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(F.desc("score"),
                                                         "cell")
                ),
            )
            .filter(F.col("rk") <= probes - 1)
            .select("vec_id", "cell")
        )
    return _pairs_from_assignment(e, probe, max_cell_pop, probes, n_vecs,
                                  broadcast_pairs)


def _pairs_from_assignment(e, probe, max_cell_pop, probes, n_vecs,
                           broadcast_pairs):
    """Tail of _embed_blocked_pairs: home+probe assignment union, hot-cell
    sub-split, and the (cell, sub) equi self-join producing DISTINCT
    candidate pairs (factored out in r6 so both probe paths share it)."""
    asg = e.select("vec_id", F.col("label").alias("cell")).unionByName(probe)
    if n_vecs is not None and n_vecs * probes <= max_cell_pop:
        # every cell's population is bounded by the total assignment count,
        # which is already under the cap — sub ≡ 0 by construction
        asg2 = asg.withColumn("sub", F.lit(0).cast("long"))
    else:
        pop = asg.groupBy("cell").agg(F.count("*").alias("cnt"))
        asg2 = asg.join(F.broadcast(pop), "cell").select(
            "vec_id",
            "cell",
            (
                F.col("vec_id")
                % F.ceil(F.col("cnt") / F.lit(float(max_cell_pop))).cast("long")
            ).alias("sub"),
        )
    a = asg2.alias("a")
    b = asg2.alias("b")
    bside = F.broadcast(b) if broadcast_pairs else b
    return (
        a.join(
            bside,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )


def embed_pairs_unlabeled(emb, max_cell_pop: int | None = None,
                          probes: int | None = None,
                          k: int = 8, n_iter: int = 5):
    """Unlabeled-corpus path for embed-cosine blocking (VERDICT r2 #3):
    when no quantizer cell column exists, train the k-means coarse
    quantizer (operators/ann.train_kmeans — deterministic decimal fold),
    assign each vector its learned cell, and run the same multiprobe +
    hot-cell-capped pair generation. Returns (vec_a, vec_b) candidates."""
    from ..operators.ann import assign_cells, train_kmeans

    cents, _inertia = train_kmeans(emb, k=k, n_iter=n_iter)
    labeled = (
        assign_cells(emb, cents)
        .withColumn("label", F.col("cell").cast("string"))
        .drop("cell")
    )
    # r6: one deliberate narrow exchange AFTER the in-row assignment
    # argmin — it is the plan's reuse point (ReusedExchange): downstream,
    # pair generation references the labeled table several times (home
    # cells, probe scoring, cell populations, both self-join sides), and
    # without an exchange above the argmin every reference re-evaluates
    # the k×dim decimal folds per row (measured 3.4× slower at sf1 when
    # this was map-only end to end). The exchange carries exactly what
    # r5's keyed-argmin aggregate shuffled — (vec_id, embedding, label) —
    # so the byte cost is unchanged while the argmin itself became
    # map-side (guide §2.4, §5 'localCheckpoint vs lineage').
    labeled = labeled.repartition(
        int(emb.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        "vec_id")
    return _embed_blocked_pairs(
        labeled,
        _max_cell_pop() if max_cell_pop is None else max_cell_pop,
        _embed_probes() if probes is None else probes,
    )


@q("dd_embed_cosine", _embed_cosine_oracle)
def dd_embed_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, CANDIDATE-BLOCKED by the coarse
    quantizer cell with MULTIPROBE and a HOT-CELL GUARD (see
    _embed_blocked_pairs): each vector joins its home cell (label) plus its
    (probes-1) nearest other centroids — recovering boundary-straddling
    near-dups — and any cell above MAX_CELL_POP is sub-split by a secondary
    hash so no join bucket ever materializes an unbounded m²/2 pairs. Pair
    generation stays pure equi-joins shuffling on (cell, sub). The oracle
    blocks identically, so the gate checks the same semantics.

    Elementwise products quantized to DECIMAL(18,9) before the sum →
    order-independent, bit-identical across engines; a vectorized numpy
    double dot PREFILTERS candidates (margin 1e-6 ≫ double-vs-decimal
    divergence), decimal-exact scoring only on survivors. The prefilter is
    SIZE-GATED (engages at >= SPARK_GRAFT_EMBED_PREFILTER_MIN_VECS input
    vectors): its Arrow round trip only pays off when there are losers to
    discard, and both paths return identical rows.

    The vec_id<200 oracle slice bounds the input BY CONSTRUCTION, so it is
    localCheckpoint-ed once (it is re-read ~4x: pair generation, both pair
    sides, norms) and the per-vector sides below are broadcast — measured
    3.07 s -> ~2.2 s at sf0.1 in alternating same-session A/Bs (the
    remaining cost is the sequential stage chain of the blocking DAG, not
    data). The UNSLICED scale path (no checkpoint of a corpus-sized table,
    prefilter engaged) is bench.py's dd_embed_cosine_full."""
    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "label", "embedding")
        .localCheckpoint(eager=True)
    )
    n_vecs = e.count()  # free: the slice is checkpointed
    ids = _embed_blocked_pairs(e, _max_cell_pop(), _embed_probes(),
                               n_vecs=n_vecs, broadcast_pairs=True)
    return _embed_score_pairs(
        e, ids,
        broadcast_sides=True,
        prefilter=n_vecs >= _prefilter_min_vecs(),
    )


def _embed_score_pairs(e, ids, broadcast_sides: bool, prefilter: bool):
    """Score candidate (vec_a, vec_b) pairs against the vector table ``e``:
    attach both embeddings + per-VECTOR norms (the decimal fold is the
    expensive scalar — inlining 3 folds/pair measured ~40% slower than
    joining precomputed norms), optionally numpy-prefilter, then the
    decimal-exact fold on survivors. ``broadcast_sides`` hints the
    per-vector sides — valid only when ``e`` is bounded by construction
    (the oracle slice); the full-corpus path leaves the join strategy to
    AQE."""
    nrm = F.sqrt(_dot_dec(F.col("embedding"), F.col("embedding")))
    if broadcast_sides:
        # bounded slice: separate embedding/norm sides, all broadcast —
        # measured faster than fused sides at toy scale (norm folds are
        # the expensive scalar and the small broadcasts are nearly free)
        norms = e.select("vec_id", nrm.alias("nrm"))
        ea_df = e.select(F.col("vec_id").alias("vec_a"),
                         F.col("embedding").alias("ea"))
        eb_df = e.select(F.col("vec_id").alias("vec_b"),
                         F.col("embedding").alias("eb"))
        na, nb = norms.alias("na"), norms.alias("nb")
        pairs = (
            ids.join(F.broadcast(ea_df), "vec_a")
            .join(F.broadcast(eb_df), "vec_b")
            .join(F.broadcast(na), F.col("na.vec_id") == F.col("vec_a"))
            .join(F.broadcast(nb), F.col("nb.vec_id") == F.col("vec_b"))
            .select("vec_a", "vec_b", "ea", "eb",
                    F.col("na.nrm").alias("nrm_a"),
                    F.col("nb.nrm").alias("nrm_b"))
        )
    else:
        # corpus scale: fuse embedding + norm into ONE side per end — two
        # corpus-sized joins instead of four (each is a real shuffle here)
        side_a = e.select(F.col("vec_id").alias("vec_a"),
                          F.col("embedding").alias("ea"),
                          nrm.alias("nrm_a"))
        side_b = e.select(F.col("vec_id").alias("vec_b"),
                          F.col("embedding").alias("eb"),
                          nrm.alias("nrm_b"))
        pairs = (
            ids.join(side_a, "vec_a").join(side_b, "vec_b")
            .select("vec_a", "vec_b", "ea", "eb", "nrm_a", "nrm_b")
        )
    if prefilter:
        pairs = pairs.mapInPandas(
            _np_dot,
            "vec_a long, vec_b long, ea array<float>, eb array<float>, "
            "nrm_a double, nrm_b double, dotd double",
        ).filter(F.col("dotd") / F.col("nrm_a") / F.col("nrm_b") >= 0.35 - 1e-6)
    cos = F.col("dot") / F.col("nrm_a") / F.col("nrm_b")
    return (
        pairs.select("vec_a", "vec_b", "nrm_a", "nrm_b",
                     _dot_dec(F.col("ea"), F.col("eb")).alias("dot"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(cos >= 0.35)
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
        .limit(200)
    )


def dd_embed_cosine_full(spark, sf_dir):
    """Bench-scale evidence run (VERDICT r3 #2): the UNSLICED embedding
    corpus through the same blocking machinery — no corpus checkpoint, no
    broadcast hints on corpus-sized sides (AQE picks the strategy at this
    volume), numpy prefilter ALWAYS engaged (this is the regime the size
    gate enables it for). Returns (result_df, candidates_df)."""
    # r6 (guide §2.5): the embeddings scan is one byte-sized split; the
    # in-row centroid fold is the expensive map work — repartition first
    # so it runs at session width
    e = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .repartition(_n_shuffle(spark), "vec_id")
    )
    ids = _embed_blocked_pairs(e, _max_cell_pop(), _embed_probes())
    return (
        _embed_score_pairs(e, ids, broadcast_sides=False, prefilter=True),
        ids,
    )


@q(
    "sim_topk_bruteforce",
    f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE)
                                * CAST(embedding[i.i] AS DOUBLE)
                                AS DECIMAL(18,9))) AS DOUBLE)) AS nrm
      FROM e CROSS JOIN range(1, 65) i(i) GROUP BY vec_id
    ),
    dots AS (
      SELECT b.vec_id,
             CAST(SUM(CAST(CAST(q.embedding[i.i] AS DOUBLE)
                           * CAST(b.embedding[i.i] AS DOUBLE)
                           AS DECIMAL(18,9))) AS DOUBLE) AS dot
      FROM qv q CROSS JOIN e b CROSS JOIN range(1, 65) i(i)
      WHERE b.vec_id <> 0
      GROUP BY b.vec_id
    )
    SELECT d.vec_id, ROUND(d.dot / nq.nrm / nb.nrm, 6) AS cosine
    FROM dots d
    JOIN norms nb ON nb.vec_id = d.vec_id
    CROSS JOIN (SELECT nrm FROM norms WHERE vec_id = 0) nq
    ORDER BY cosine DESC, d.vec_id LIMIT 10
    """,
)
def sim_topk_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: broadcast the single query
    vector against every embedding (one scan, no shuffle until the final
    top-k which is TakeOrderedAndProject)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def dot_dec(x, y):
        prod = F.zip_with(
            x, y, lambda p, r: (p.cast("double") * r.cast("double")).cast("decimal(18,9)")
        )
        return F.aggregate(
            prod,
            F.lit(0).cast("decimal(38,9)"),
            lambda acc, v: (acc + v).cast("decimal(38,9)"),
        ).cast("double")

    qv = e.filter("vec_id = 0").select(F.col("embedding").alias("q_embedding"))
    scored = (
        e.filter("vec_id <> 0")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            dot_dec(F.col("q_embedding"), F.col("embedding")).alias("dot"),
            F.sqrt(dot_dec(F.col("embedding"), F.col("embedding"))).alias("nrm"),
            F.sqrt(dot_dec(F.col("q_embedding"), F.col("q_embedding"))).alias("qnrm"),
        )
    )
    return (
        scored.select(
            "vec_id",
            F.round(F.col("dot") / F.col("qnrm") / F.col("nrm"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


_IVF_DUCK = """
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
    cent AS (
      SELECT label, i.i AS pos,
             CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE) AS DECIMAL(18,9)))
                  AS DOUBLE) / COUNT(*) AS c
      FROM e CROSS JOIN range(1, 65) i(i) GROUP BY label, i.i
    ),
    qe AS (
      SELECT i.i AS pos, CAST(embedding[i.i] AS DOUBLE) AS qv
      FROM e CROSS JOIN range(1, 65) i(i) WHERE vec_id = 0
    ),
    label_scores AS (
      SELECT c.label,
             CAST(SUM(CAST(q.qv * c.c AS DECIMAL(18,9))) AS DOUBLE) AS score
      FROM cent c JOIN qe q ON c.pos = q.pos GROUP BY c.label
    ),
    top_labels AS (
      SELECT label FROM label_scores ORDER BY score DESC, label LIMIT 2
    ),
    cand AS (
      SELECT e.vec_id, e.label, e.embedding FROM e
      WHERE e.label IN (SELECT label FROM top_labels) AND e.vec_id <> 0
    ),
    qv AS (SELECT embedding FROM e WHERE vec_id = 0),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE)
                                * CAST(embedding[i.i] AS DOUBLE)
                                AS DECIMAL(18,9))) AS DOUBLE)) AS nrm
      FROM cand CROSS JOIN range(1, 65) i(i) GROUP BY vec_id
    ),
    qnorm AS (
      SELECT sqrt(CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE)
                                * CAST(embedding[i.i] AS DOUBLE)
                                AS DECIMAL(18,9))) AS DOUBLE)) AS qnrm
      FROM qv CROSS JOIN range(1, 65) i(i)
    ),
    dots AS (
      SELECT b.vec_id, b.label,
             CAST(SUM(CAST(CAST(q.embedding[i.i] AS DOUBLE)
                           * CAST(b.embedding[i.i] AS DOUBLE)
                           AS DECIMAL(18,9))) AS DOUBLE) AS dot
      FROM qv q CROSS JOIN cand b CROSS JOIN range(1, 65) i(i)
      GROUP BY b.vec_id, b.label
    )
    SELECT d.vec_id, d.label,
           ROUND(d.dot / q.qnrm / n.nrm, 6) AS cosine
    FROM dots d JOIN norms n ON n.vec_id = d.vec_id CROSS JOIN qnorm q
    ORDER BY cosine DESC, d.vec_id LIMIT 10
"""


@q("sim_ivf_topk", _IVF_DUCK)
def sim_ivf_topk(spark, sf_dir):
    """IVF-bucketed ANN (scale path): per-label centroids = coarse
    quantizer; probe the 2 nearest centroids, brute-force only inside those
    buckets. At 100 TB the candidate set shrinks ~5x per probed bucket and
    the centroid table broadcasts."""
    # r6 (guide §2.5): one narrow exchange so the centroid aggregation and
    # the decimal folds over the probed buckets stop running on the 1-2
    # byte-sized scan splits; the repeated e subtrees share the exchange
    # (ReusedExchange). Width is SIZE-adaptive (_adaptive_width): at the
    # oracle/sf0.1 scale the input is small enough that a session-width
    # exchange costs more than it parallelizes.
    e = t(spark, sf_dir, "embeddings")
    w = _adaptive_width(e, 192 * 1024)
    if w >= 8:
        # below an 8-way fan-out the exchange costs more than the
        # parallelism buys (sf0.1 measured neutral-to-worse at w=5; the
        # oracle slice keeps the r5 single-split plan exactly)
        e = e.repartition(w, "vec_id")

    def dot_dec(x, y):
        prod = F.zip_with(
            x, y, lambda p, r: (p.cast("double") * r.cast("double")).cast("decimal(18,9)")
        )
        return F.aggregate(
            prod,
            F.lit(0).cast("decimal(38,9)"),
            lambda acc, v: (acc + v).cast("decimal(38,9)"),
        ).cast("double")

    ex = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    cent = ex.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(18,9)")).cast("double")
            / F.count("*")
        ).alias("c")
    )
    qe = ex.filter("vec_id = 0").select("pos", F.col("v").cast("double").alias("qv"))
    label_scores = (
        cent.join(qe, "pos")
        .groupBy("label")
        .agg(
            F.sum((F.col("qv") * F.col("c")).cast("decimal(18,9)"))
            .cast("double")
            .alias("score")
        )
    )
    top_labels = label_scores.orderBy(F.desc("score"), "label").limit(2).select("label")
    cand = e.join(F.broadcast(top_labels), "label", "left_semi").filter("vec_id <> 0")
    qv = e.filter("vec_id = 0").select(F.col("embedding").alias("q_embedding"))
    scored = cand.crossJoin(F.broadcast(qv)).select(
        "vec_id", "label",
        dot_dec(F.col("q_embedding"), F.col("embedding")).alias("dot"),
        F.sqrt(dot_dec(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        F.sqrt(dot_dec(F.col("q_embedding"), F.col("q_embedding"))).alias("qnrm"),
    )
    return (
        scored.select(
            "vec_id", "label",
            F.round(F.col("dot") / F.col("qnrm") / F.col("nrm"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )
