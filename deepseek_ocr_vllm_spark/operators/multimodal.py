"""Multimodal column plumbing: binary payloads + typed metadata + a
feature-extraction pass over mapInPandas.

Mirrors the reference's binary handling: content-addressed storage with
SHA-256 while streaming (apps/ocr-service/src/ocr_service/storage.py:69-102,
S11) and per-file OCR dispatch (X1/X4). The image/audio decode libraries are
NOT in this container, so ``_fake_decode`` below is a clearly-marked
DETERMINISTIC STUB standing in for PIL/ffmpeg — the Spark-side plumbing
(binary schema, metadata struct, Arrow batch shape, partitioning) is real
and tested; swap ``_fake_decode`` for a real decoder in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, content_type string, size_bytes long, sha16 string, "
    "width int, height int, n_frames int, byte_hist array<double>"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → opaque binary column + typed metadata struct
    (content-type keyed off doc_id; sha256 content addressing, F16/S11)."""
    ct = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            ct.alias("content_type"),
            F.length(payload).alias("size_bytes"),
            F.substring(F.sha2(payload, 256), 1, 16).alias("sha16"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, content_type: str) -> tuple[int, int, int, list[float]]:
    """DETERMINISTIC STUB for the media decoder (PIL/ffmpeg not installed).

    Derives pseudo width/height/frame-count from the payload bytes and a
    4-bin byte histogram as the 'feature vector'. Replace with a real
    decoder (NotImplementedError path) when the libs exist.
    """
    if not payload:
        return 0, 0, 0, [0.0, 0.0, 0.0, 0.0]
    b0, b1 = payload[0], payload[-1]
    width = 64 + (b0 % 16) * 64
    height = 64 + (b1 % 9) * 64
    n_frames = 1 if content_type.startswith("image") else 1 + (len(payload) % 240)
    hist = [0, 0, 0, 0]
    for byte in payload:
        hist[byte >> 6] += 1
    n = float(len(payload))
    return width, height, n_frames, [h / n for h in hist]


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: whole Arrow batches of binary
    payloads per Python call (the multimodal analog of the text
    extraction operator — same batch discipline, X1/X5 plumbing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                ct = meta["content_type"]
                w, h, nf, hist = _fake_decode(bytes(payload), ct)
                rows.append((doc_id, ct, meta["size_bytes"], meta["sha16"],
                             w, h, nf, hist))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "content_type", "size_bytes", "sha16",
                         "width", "height", "n_frames", "byte_hist"],
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
