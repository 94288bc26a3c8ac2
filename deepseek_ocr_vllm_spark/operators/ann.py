"""Materialized IVF index for repeated ANN queries.

``sim_ivf_topk`` (plans/queries_ml.py) recomputes the coarse quantizer
from the full corpus on every call — right for a one-shot query, wasteful
for a query SERVICE. This module splits the cost:

  build_ivf_index  — once: per-cell centroids (the coarse quantizer, =
      per-label mean as in sim_ivf_topk) + vector assignments written
      PARTITIONED BY cell, with per-vector norms precomputed.
  ivf_search       — per query: score the (tiny) centroid table on the
      driver, pick n_probe cells, and scan ONLY those cells' partition
      directories — partition pruning makes the 100-TB read proportional
      to the probed cells, not the corpus.

Scoring uses the same DECIMAL(18,9)-quantized dot fold as the gated
queries, so results are bit-identical to sim_ivf_topk on the same probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dot_dec(x, y):
    """Order-independent exact dot product (see queries_ml module doc)."""
    prod = F.zip_with(
        x, y, lambda p, r: (p.cast("double") * r.cast("double")).cast("decimal(18,9)")
    )
    return F.aggregate(
        prod,
        F.lit(0).cast("decimal(38,9)"),
        lambda acc, v: (acc + v).cast("decimal(38,9)"),
    ).cast("double")


def _mean_dec(col):
    """Decimal-quantized mean (order-independent, bit-stable across
    partitionings) — the same fold the gated queries use."""
    return (
        F.sum(col.cast("double").cast("decimal(18,9)")).cast("double")
        / F.count("*")
    )


def _inline_max_cells() -> int:
    """Same plan-size bound as _embed_blocked_pairs' inline centroid
    scoring (ADVICE r4): up to this many centroids the in-row argmin
    inlines k × dim literals; above it the keyed broadcast-join fallback
    keeps the Catalyst tree O(1) in k. Read at call time like every knob."""
    import os

    return int(os.environ.get("SPARK_GRAFT_EMBED_INLINE_MAX_CELLS", "64"))


def _argmin_join(df: DataFrame, id_col: str, vec_col: str, centroids,
                 carry: list[str]) -> DataFrame:
    """Keyed argmin fallback for k above the inline bound: broadcast the
    k-row centroid table, min(struct(d2, cell, carry...)) per id — the r5
    shape. Same fold, same tie-break as _argmin_cell."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(c, v, float(_py_dot_dec(v, v))) for c, v in centroids],
        "cell int, centroid array<double>, c2 double",
    )
    scored = df.crossJoin(F.broadcast(cent_df)).select(
        id_col,
        (
            F.col("c2") - 2 * _dot_dec(F.col(vec_col), F.col("centroid"))
        ).alias("__d2"),
        F.col("cell").alias("__cell"),
        *carry,
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min(F.struct("__d2", "__cell", *carry)).alias("__m"))
        .select(id_col, F.col("__m.__d2").alias("d2"),
                F.col("__m.__cell").alias("cell"),
                *[F.col(f"__m.{c}").alias(c) for c in carry])
    )


def _argmin_cell(centroids, vec_col: str):
    """In-ROW nearest-centroid argmin (r6, guide §2.4): an array of
    (d2, cell) structs — one decimal-fold score per centroid, centroids
    inlined as plan literals — reduced with array_min, whose struct
    comparison is exactly the min(struct(d2, cell)) the r5 shape computed
    with a crossJoin ×k row fan-out plus a corpus-wide groupBy shuffle.
    Same fold, same tie-break, zero exchanges. Returns a struct column
    with fields d2 and cell; plan size is k × dim literals, bounded by the
    quantizer knob (the same bound the inline centroid scoring in
    _embed_blocked_pairs relies on)."""
    return F.array_min(F.array(*[
        F.struct(
            (
                F.lit(float(_py_dot_dec(v, v)))
                - 2 * _dot_dec(F.col(vec_col),
                               F.array(*[F.lit(float(x)) for x in v]))
            ).alias("d2"),
            F.lit(c).alias("cell"),
        )
        for c, v in centroids
    ]))


def train_kmeans(
    embeddings: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Learned coarse quantizer: Lloyd's k-means as pure DataFrame ops
    (VERDICT r2 #3 — unlabeled corpora previously had no ANN path).

    Deterministic end to end: seeds = the k lowest-id vectors; assignment
    ranks squared-L2 (up to the per-vector constant) via the DECIMAL(18,9)
    dot fold with a cell-id tie-break; the update step is the decimal mean.
    Each iteration is one broadcast-join assignment (centroids are k rows —
    never a shuffle of the corpus against itself) plus one groupBy mean;
    only the k×dim centroid table is ever collected to the driver, so the
    loop is shallow-plan and cluster-safe at any corpus size. The argmin
    itself is a min(struct(d2, cell, ...)) hash agg — map-side partial
    combine shuffles n rows, not the n×k a rank window would.

    Returns (centroids, inertia_history): centroids as [(cell, vector)],
    inertia as the per-iteration sum of min assignment scores (shifted by
    the constant Σ‖v‖², so non-increasing exactly like true inertia).
    """
    spark = embeddings.sparkSession
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    # r6 (guide §2.5): embedding tables are byte-small but the per-row
    # k×dim decimal fold is compute-dense; the scan yields 1-2 splits, so
    # without a deliberate repartition every assignment pass runs on 1-2
    # cores. One narrow hash exchange per pass buys session-width compute
    # (parameterized by the session conf, never a local constant).
    emb = emb.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions")), "vec_id")
    seeds = emb.orderBy("vec_id").limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, [float(v) for v in r.embedding]) for i, r in enumerate(seeds)
    ]
    inertia: list[float] = []
    for _ in range(n_iter):
        # argmin_c ‖v-c‖² == argmin_c (‖c‖² - 2·v·c): rank by the decimal
        # fold so ties and near-ties resolve identically on every run.
        # ‖c‖² is a per-centroid CONSTANT folded once driver-side with
        # _py_dot_dec (the proven bit-identical mirror of the in-plan
        # fold). r6: the argmin happens IN-ROW (_argmin_cell) — the r5
        # crossJoin ×k fan-out plus corpus-wide groupBy(vec_id) shuffle
        # per iteration is gone; each iteration is now one map-only
        # assignment pass feeding the centroid-update aggregate.
        if len(cents) <= _inline_max_cells():
            asg = emb.select(
                "vec_id", "embedding",
                _argmin_cell(cents, "embedding").alias("m"),
            ).select("vec_id", F.col("m.d2").alias("d2"),
                     F.col("m.cell").alias("cell"), "embedding")
        else:
            asg = _argmin_join(emb, "vec_id", "embedding", cents,
                               ["embedding"])
        agg = asg.select(
            "cell", "d2", F.posexplode("embedding").alias("pos", "v")
        )
        stats = (
            agg.groupBy("cell", "pos")
            .agg(
                _mean_dec(F.col("v")).alias("c"),
                F.sum(F.when(F.col("pos") == 0, F.col("d2"))).alias("d2sum"),
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("centroid"),
                F.max("d2sum").alias("d2sum"),
            )
            .collect()
        )
        inertia.append(float(sum(r.d2sum for r in stats)))
        # a cell that lost every member keeps its previous centroid
        updated = {r.cell: [float(v) for v in r.centroid] for r in stats}
        cents = [(c, updated.get(c, v)) for c, v in cents]
    return cents, inertia


def assign_cells(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (same decimal ranking as training —
    bit-stable). Adds a `cell` column; use as the quantizer for unlabeled
    corpora in IVF indexing and embed-cosine dedup blocking. argmin is the
    min(struct) hash agg (see train_kmeans): n rows shuffle, not n×k.

    Ride-along columns travel INSIDE the min(struct) comparator (a keyed
    re-join would cost a second shuffle); the (__d2, cell) prefix fully
    decides the ordering — within one vec_id group every row carries the
    same ride-along values, so they never influence the argmin — but
    Spark still requires every struct field to be ORDERABLE (no map
    columns), and a pre-existing 'cell'/'__d2' column would silently
    corrupt the comparator, so both are rejected loudly here (ADVICE r4)."""
    # "d2"/"__cell"/"__m" are additionally claimed by the keyed fallback's
    # output/comparator aliases (review r6: a ride-along named "d2" would
    # hit AMBIGUOUS_COLUMN_REFERENCE only above the inline bound — reject
    # loudly on both paths instead)
    reserved = {"cell", "__d2", "d2", "__cell", "__m"} & set(embeddings.columns)
    if reserved:
        raise ValueError(
            f"assign_cells: input columns {sorted(reserved)} collide with "
            "the comparator fields; rename them before assignment")
    from pyspark.sql.types import MapType

    unorderable = [f.name for f in embeddings.schema.fields
                   if isinstance(f.dataType, MapType)]
    if unorderable:
        raise ValueError(
            f"assign_cells: map-typed columns {unorderable} are not "
            "orderable inside the argmin struct; drop or re-encode them")
    rest = [c for c in embeddings.columns if c != id_col]
    # same deliberate repartition as train_kmeans: the k×dim fold per row
    # is the cost, the input bytes are not (guide §2.5)
    embeddings = embeddings.repartition(
        int(embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        id_col)
    # r6: in-row argmin (see _argmin_cell) — map-only, so ride-along
    # columns simply stay on their row; no comparator, no shuffle. The
    # reserved/unorderable guards above are kept as the API contract:
    # above the inline bound the keyed fallback's comparator really does
    # carry the ride-alongs.
    if len(centroids) <= _inline_max_cells():
        return embeddings.select(
            id_col, *rest,
            _argmin_cell(centroids, vec_col)["cell"].alias("cell"),
        )
    return _argmin_join(embeddings, id_col, vec_col, centroids, rest) \
        .select(id_col, *rest, "cell")


def centroids_path(index_dir: str) -> str:
    return f"{index_dir}/centroids"


def assignments_path(index_dir: str) -> str:
    return f"{index_dir}/assignments"


def build_ivf_index(embeddings: DataFrame, index_dir: str,
                    cell_col: str | None = "label",
                    k: int = 8, n_iter: int = 5) -> None:
    """Materialize the index: centroids (one row per cell — broadcastable)
    and cell-partitioned assignments with precomputed norms. One shuffle
    for the centroid agg, one for the partitioned write.

    cell_col=None trains a k-means coarse quantizer instead of trusting a
    pre-existing cell column (the unlabeled-corpus path): centroids come
    from train_kmeans and assignments from nearest-centroid, both on the
    decimal fold, so a rebuild is bit-identical."""
    if cell_col is None:
        cents, _inertia = train_kmeans(embeddings, k=k, n_iter=n_iter)
        spark = embeddings.sparkSession
        cent = spark.createDataFrame(
            list(cents), "cell int, centroid array<double>"
        ).select(F.col("cell").cast("string").alias("cell"), "centroid")
        assigned = assign_cells(embeddings, cents).withColumn(
            "cell", F.col("cell").cast("string")
        )
    else:
        ex = embeddings.select(
            cell_col, F.posexplode("embedding").alias("pos", "v")
        )
        cent = (
            ex.groupBy(cell_col, "pos")
            .agg(_mean_dec(F.col("v")).alias("c"))
            .groupBy(cell_col)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("centroid")
            )
            .withColumnRenamed(cell_col, "cell")
        )
        assigned = embeddings.withColumn("cell", F.col(cell_col))
    cent.coalesce(1).write.mode("overwrite").parquet(centroids_path(index_dir))
    assign = assigned.select(
        "vec_id",
        "cell",
        "embedding",
        F.sqrt(_dot_dec(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    (
        assign.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(assignments_path(index_dir))
    )


def _py_dot_dec(x, y):
    """Python mirror of _dot_dec: quantize every elementwise product to
    9 dp HALF_UP before summing, exactly like Spark's double→DECIMAL(18,9)
    cast (BigDecimal of Double.toString == Decimal(repr(d)) — both shortest
    round-trip decimal). Near-tied centroids therefore rank identically
    here and in sim_ivf_topk's in-plan decimal fold."""
    from decimal import ROUND_HALF_UP, Decimal

    nine = Decimal("1.000000000")
    acc = Decimal(0)
    for a, b in zip(x, y):
        acc += Decimal(repr(float(a) * float(b))).quantize(
            nine, rounding=ROUND_HALF_UP
        )
    return acc


def probe_cells(spark: SparkSession, index_dir: str,
                query_vec: list[float], n_probe: int = 2) -> list:
    """Driver-side quantizer lookup: the centroid table is one row per
    cell, so scoring it in Python costs microseconds and the chosen cells
    become a partition-pruning predicate. Scoring uses the decimal fold
    (_py_dot_dec) so cell RANKING is bit-identical to the one-shot
    sim_ivf_topk query's in-plan ranking."""
    rows = spark.read.parquet(centroids_path(index_dir)).collect()
    scored = sorted(
        ((-_py_dot_dec(query_vec, r.centroid), r.cell) for r in rows),
    )
    return [cell for _neg, cell in scored[:n_probe]]


def ivf_search(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Top-k cosine inside the probed cells only. The `cell IN (...)`
    filter is a PARTITION filter on the assignments scan (asserted by
    tests): unprobed cells are never read. Final top-k is
    TakeOrderedAndProject — no global sort."""
    cells = probe_cells(spark, index_dir, query_vec, n_probe)
    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = spark.read.parquet(assignments_path(index_dir)).filter(
        F.col("cell").isin(cells)
    )
    if exclude_vec_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_vec_id)
    qnrm = F.sqrt(_dot_dec(qarr, qarr))
    scored = cand.select(
        "vec_id",
        F.col("cell").alias("label"),
        F.round(_dot_dec(qarr, F.col("embedding")) / qnrm / F.col("nrm"), 6)
        .alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), "vec_id").limit(k)
