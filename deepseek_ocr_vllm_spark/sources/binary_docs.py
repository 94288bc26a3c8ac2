"""S1/S2/S11/S8: binary document scan + manifest sink.

Reference: recursive PDF dir walk + parallelize (apps/spark-jobs/
pdf-extract/job.py:41-47,127) → here a declarative binaryFile scan (the
scan itself is the parallelism — no driver-side os.walk, no RDD);
content-addressed SHA-256 while reading (S11, ocr_service/storage.py:69-102);
JSONL manifest sink (S8, job.py:153-168).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_docs(spark: SparkSession, path: str,
                     glob: str = "*.pdf") -> DataFrame:
    """Recursive binary scan with content hashing: one row per file
    (path, modificationTime, length, content, doc_sha256)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return df.select(
        "path", "modificationTime", "length", "content",
        F.sha2(F.col("content"), 256).alias("doc_sha256"),
    )


def extract_binary_docs(spark: SparkSession, path: str,
                        glob: str = "*.pdf") -> DataFrame:
    """S1 → X1 end-to-end: the binaryFile scan FEEDS the extraction
    operator. REAL ``%PDF-`` binaries are parsed by the stdlib wire-format
    parser (extraction/pdfbytes.py: object scan, FlateDecode streams,
    BT/ET text operators → layout records — the round-2 gap where a real
    PDF payload would not extract); anything else is decoded as UTF-8
    (text-encoded HTML/PDF-layout payloads). Both run whole-batch inside
    mapInPandas, then every file flows through the same mapInArrow
    extractor the transcript pipeline uses. Returns one row per file with
    (path, doc_sha256, clean_text, spans, words, tables, metrics)."""
    from ..extraction.pdfbytes import pdf_bytes_to_layout_records
    from ..operators.extract import extract_map_in_arrow

    docs = read_binary_docs(spark, path, glob=glob).select(
        "path", "doc_sha256", "content"
    )

    def to_text(batches):
        for pdf in batches:
            texts = []
            for content in pdf["content"]:
                b = bytes(content)
                rec = pdf_bytes_to_layout_records(b)
                texts.append(rec if rec is not None
                             else b.decode("utf-8", "replace"))
            out = pdf[["path", "doc_sha256"]].copy()
            out["text"] = texts
            yield out

    as_text = docs.mapInPandas(
        to_text, "path string, doc_sha256 string, text string"
    )
    return extract_map_in_arrow(as_text, text_col="text").drop("text")


def write_manifest_jsonl(df: DataFrame, out_path: str,
                         min_chars: int = 1, min_pages: int = 1) -> None:
    """S8 + P1: one JSON object per processed doc with strict-mode failure
    flag (pdf_extract.py:224-236 text thresholds; job.py:153-168 manifest).
    Expects columns (path|doc_id, total_chars, n_pages)."""
    cols = df.columns
    key = "path" if "path" in cols else "doc_id"
    out = df.select(
        F.col(key).alias("doc"),
        "total_chars",
        "n_pages",
        (
            (F.col("total_chars") < min_chars) | (F.col("n_pages") < min_pages)
        ).alias("failed"),
    )
    out.write.mode("overwrite").json(out_path)
