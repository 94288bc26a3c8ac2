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


def centroids_path(index_dir: str) -> str:
    return f"{index_dir}/centroids"


def assignments_path(index_dir: str) -> str:
    return f"{index_dir}/assignments"


def build_ivf_index(embeddings: DataFrame, index_dir: str,
                    cell_col: str = "label") -> None:
    """Materialize the index: centroids (one row per cell — broadcastable)
    and cell-partitioned assignments with precomputed norms. One shuffle
    for the centroid agg, one for the partitioned write."""
    ex = embeddings.select(
        cell_col, F.posexplode("embedding").alias("pos", "v")
    )
    cent = (
        ex.groupBy(cell_col, "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,9)"))
                .cast("double") / F.count("*")
            ).alias("c")
        )
        .groupBy(cell_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
        .withColumnRenamed(cell_col, "cell")
    )
    cent.coalesce(1).write.mode("overwrite").parquet(centroids_path(index_dir))
    assign = embeddings.select(
        "vec_id",
        F.col(cell_col).alias("cell"),
        "embedding",
        F.sqrt(_dot_dec(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    (
        assign.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(assignments_path(index_dir))
    )


def probe_cells(spark: SparkSession, index_dir: str,
                query_vec: list[float], n_probe: int = 2) -> list:
    """Driver-side quantizer lookup: the centroid table is one row per
    cell, so scoring it in Python costs microseconds and the chosen cells
    become a partition-pruning predicate."""
    rows = spark.read.parquet(centroids_path(index_dir)).collect()
    scored = sorted(
        (
            (-sum(float(q) * float(c) for q, c in zip(query_vec, r.centroid)),
             r.cell)
            for r in rows
        ),
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
