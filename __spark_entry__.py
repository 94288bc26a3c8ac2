"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship extraction pipeline over sf0.001 documents
                 wrapped into the transcripts shape (north rule).
queries()      — SURVEY.md §2 operator inventory + training-data ops.
oracle_sql()   — DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wrap sf0.001 documents into transcript turns (HTML/PDF/plain
    payload mix keyed by doc_id), run the vectorized Arrow-batch extraction,
    return cleaned text + span metrics per turn."""
    from pyspark.sql import functions as F

    from deepseek_ocr_vllm_spark.operators.extract import extract_map_in_arrow

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    kind = F.col("doc_id") % 10
    html_payload = F.concat(
        F.lit('<html><body><nav><ul><li><a href="/home">home page link</a></li>'
              '<li><a href="/about">about link</a></li></ul></nav>'
              '<main><article><h2>Document '),
        F.col("doc_id").cast("string"),
        F.lit("</h2><p>"),
        F.col("text"),
        F.lit('</p><table><tr><td>lang</td><td>'),
        F.col("lang"),
        F.lit("</td></tr></table></article></main>"
              "<footer><p>footer boilerplate text that should be stripped away"
              "</p></footer></body></html>"),
    )
    pdf_payload = F.concat(
        F.lit("72,40,20,Serif-Bold|Document "),
        F.col("doc_id").cast("string"),
        F.lit("\n72,100,10,Serif|"),
        F.substring("text", 1, 120),
        F.lit("\n72,112,10,Serif|"),
        F.substring("text", 121, 120),
    )
    transcripts = docs.select(
        F.format_string("conv_%08d", F.col("doc_id") % 50).alias("conv_id"),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.when(kind < 6, html_payload)
        .when(kind < 8, pdf_payload)
        .otherwise(F.col("text"))
        .alias("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )
    out = extract_map_in_arrow(transcripts, text_col="text").drop("text")
    return out.select(
        "conv_id", "turn_idx", "role", "clean_text",
        "n_nodes", "n_spans", "n_bytes", "kind",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from deepseek_ocr_vllm_spark.plans import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from deepseek_ocr_vllm_spark.plans import REGISTRY
    from deepseek_ocr_vllm_spark.plans.queries import resolve_oracle

    return {
        name: resolve_oracle(sql)
        for name, (_fn, sql) in REGISTRY.items()
        if sql is not None
    }
