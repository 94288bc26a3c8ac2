"""X7/X8: deterministic span extractor (the LLM-NER replacement).

The reference extracts char-span entities with an LLM prompt
(workers/vessel-ner/src/workers/entity-extractor.ts:124-198) and stores
them as (doc_id, span_id, label, start, end, text, confidence, model) rows
(sql/motherduck/PREANNOTATION_SCHEMA.md:5-18; entities table
workers/vessel-ner/src/lib/motherduck.ts:26-35). This module reproduces the
*output contract* with a deterministic regex + gazetteer extractor — same
schema, start inclusive / end exclusive, text = source[start:end] —
implemented as a whole-batch Arrow UDF (mapInPandas).

X8 chunk + offset remap (docs/operations/preannotation-spark-ollama-
spec.md:17-19): long texts are split into overlapping chunks, patterns run
per chunk, and match offsets are remapped to the full-document coordinate
space with overlap de-duplication.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# label → compiled pattern (deterministic gazetteer/regex, not a model)
PATTERNS: list[tuple[str, re.Pattern, float]] = [
    ("IMO", re.compile(r"\bIMO\s?\d{7}\b"), 0.99),
    ("MMSI", re.compile(r"\bMMSI\s?\d{9}\b"), 0.95),
    ("YEAR", re.compile(r"\b(19|20)\d{2}\b"), 0.6),
    # repetition is BOUNDED (20+1+10+1+3 = 35 chars max) so the chunk-edge
    # invariant "every genuine match is shorter than CHUNK_OVERLAP" is
    # enforced by the pattern itself, not assumed (an unbounded \d+ match
    # of length >= CHUNK_OVERLAP touching a cut would be dropped in BOTH
    # adjacent chunks)
    ("MONEY", re.compile(r"\b\d{1,20}(?:\.\d{1,10})?\s?(?:USD|EUR)\b"), 0.8),
    ("TERM", re.compile(r"\b(?:vessel|spark|parquet|iceberg|shuffle)\b"), 0.5),
]

CHUNK_SIZE = 4096  # chars per chunk (≈ the 4-8k-token chunking in the spec)
CHUNK_OVERLAP = 64

SPAN_SCHEMA = (
    "doc_id long, span_id int, label string, start int, end int, "
    "text string, confidence double, model string"
)
MODEL_NAME = "regex-gazetteer-v1"


def extract_spans_text(doc_id: int, text: str) -> list[tuple]:
    """Pure function: spans for one document (chunked, offsets remapped).

    Boundary discipline (every pattern is \\b-anchored and shorter than
    CHUNK_OVERLAP): truncating a chunk manufactures a word boundary at its
    edges, so a match TOUCHING a cut edge may be an artifact (e.g. an
    8-digit run split after 4 digits "matching" YEAR). A match is kept only
    when at least one REAL character of context exists inside the chunk on
    both sides — i.e. skip matches ending at the end of a non-final chunk
    or starting at offset 0 of a non-first chunk. Every genuine match
    (length < CHUNK_OVERLAP) sits strictly inside some chunk, so nothing
    is lost; the (start,end,label) dedup collapses the double-scanned
    overlap region."""
    found: dict[tuple[int, int, str], float] = {}
    n = len(text)
    pos = 0
    while pos == 0 or pos < n:
        chunk = text[pos : pos + CHUNK_SIZE]
        is_first = pos == 0
        is_final = pos + CHUNK_SIZE >= n
        for label, pat, conf in PATTERNS:
            for m in pat.finditer(chunk):
                if not is_final and m.end() >= len(chunk):
                    continue  # artificial trailing \b at the cut
                if not is_first and m.start() == 0:
                    continue  # artificial leading \b at the cut
                start = pos + m.start()  # X8: chunk → document offsets
                end = pos + m.end()
                found.setdefault((start, end, label), conf)
        if pos + CHUNK_SIZE >= n:
            break
        pos += CHUNK_SIZE - CHUNK_OVERLAP
    rows = []
    for span_id, ((start, end, label), conf) in enumerate(
        sorted(found.items(), key=lambda kv: (kv[0][0], kv[0][1], kv[0][2]))
    ):
        rows.append(
            (doc_id, span_id, label, start, end, text[start:end], conf, MODEL_NAME)
        )
    return rows


def extract_spans(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Whole-batch span extraction (W3-ordered within document)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "span_id", "label", "start", "end", "text",
                "confidence", "model"]
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                rows.extend(extract_spans_text(int(doc_id), text or ""))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(run, schema=SPAN_SCHEMA)


def normalize_annotations(df: DataFrame, json_col: str) -> DataFrame:
    """X9 annotation→training normalize (scripts/normalize_ner_from_
    outbox.py:33-66): Label-Studio-style JSON records → {text, spans} via
    from_json + higher-order functions (no Python)."""
    from pyspark.sql import functions as F

    schema = (
        "struct<text:string, "
        "annotations:array<struct<start:int,end:int,labels:array<string>>>>"
    )
    parsed = df.withColumn("__r", F.from_json(F.col(json_col), schema))
    return parsed.select(
        F.col("__r.text").alias("text"),
        F.filter(
            F.transform(
                F.col("__r.annotations"),
                lambda a: F.struct(
                    a["start"].alias("start"),
                    a["end"].alias("end"),
                    F.element_at(a["labels"], 1).alias("label"),
                ),
            ),
            lambda s: s["start"].isNotNull() & s["end"].isNotNull(),
        ).alias("spans"),
    )
