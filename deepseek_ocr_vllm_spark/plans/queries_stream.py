"""Streaming + multimodal queries() entries.

stream_window_counts has a SQL oracle (tumbling window == floor-epoch
bucketing). mm_media_features decodes REAL wire formats for every
content type — PNG sig+IHDR, RIFF/WAVE chunk walk, ISO-BMFF box walk —
and the oracle re-derives every feature in SQL from the same
constants/spec. The byte-level SQL (ascii(), char-class counts) relies
on the corpus being ASCII, which the fixture probe verified (all docs
printable ASCII, so byte == char).
"""

from __future__ import annotations

from .queries import q, t


@q(
    "stream_window_counts",
    """
    SELECT strftime(to_timestamp(floor(epoch(ts) / 300) * 300),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def stream_window_counts(spark, sf_dir):
    """Structured Streaming tumbling-window agg drained synchronously;
    equals the batch GROUP BY on floor-epoch buckets (SURVEY §2.10: the
    reference streams are micro-batches made effectively-once — complete
    mode replay gives the same determinism here)."""
    from ..streaming.microbatch import windowed_event_counts

    return windowed_event_counts(spark, sf_dir)


@q(
    "stream_stateful_sessions",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                   OR LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id <= 100
    ),
    sess AS (
      SELECT user_id, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def stream_stateful_sessions(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    30-min-gap sessionization whose state crosses a real micro-batch
    boundary (two time-ordered files, one per trigger). The oracle is the
    BATCH lag-gap sessionization SQL — streaming state must reproduce it
    exactly."""
    from ..streaming.microbatch import stateful_sessions

    return stateful_sessions(spark, sf_dir)


def _mm_oracle() -> str:
    # constants derived from the SAME png_header / WAV_MID the Spark side
    # stamps, so the oracle stays in lockstep with the wire format by
    # construction
    from ..operators.multimodal import (
        MP4_FIXTURE_DIMS, MP4_MDAT_TAG, PNG_FIXTURE_DIMS, WAV_BLOCK_ALIGN,
        WAV_FIXTURE_CHANNELS, WAV_FIXTURE_RATE, WAV_HEADER_LEN, WAV_MID,
        mp4_header, mp4_header_parts, png_header)

    prefix = png_header(*PNG_FIXTURE_DIMS)
    lp = len(prefix)
    mp4_pre, mp4_mid = mp4_header_parts()
    lv = len(mp4_header(0))  # full video envelope length at any size
    mp4_fixed_mid = sum(1 for b in mp4_pre + mp4_mid + MP4_MDAT_TAG
                        if (b >> 6) == 1)
    vw, vh = MP4_FIXTURE_DIMS
    # envelope bin-1 counts use the SAME bin definition as the decoder's
    # _byte_hist ((b >> 6) == 1, i.e. 64-127) — an ad-hoc 64..126 range
    # would silently desync if a future fixture constant put byte 127 in
    # the header (ADVICE r3). The regex-based [@-~] text count is 64..126,
    # which equals bin 1 for the printable-ASCII corpus (no DEL byte).
    n_mid = sum(1 for b in prefix if (b >> 6) == 1)
    wav_fixed_mid = sum(1 for b in b"RIFF" + WAV_MID if (b >> 6) == 1)
    w, h = PNG_FIXTURE_DIMS
    lw = WAV_HEADER_LEN

    def mid4(x: str) -> str:
        # bin-1 byte count of a 4-byte integer encoding of x (the byte
        # MULTISET is endianness-independent, so this serves the WAV
        # little-endian and MP4 big-endian size fields alike) — these
        # fields vary per row, so the count is computed from the SQL
        # expression, one term per byte
        return "(" + " + ".join(
            f"CASE WHEN (({x}) // {256 ** i}) % 256 BETWEEN 64 AND 127 "
            "THEN 1 ELSE 0 END" for i in range(4)) + ")"

    return f"""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS content_type,
           length(text) + CASE WHEN doc_id % 3 = 0 THEN {lp}
                               WHEN doc_id % 3 = 1 THEN {lw}
                               ELSE {lv} END AS size_bytes,
           substr(sha256(text), 1, 16) AS sha16,
           CAST(CASE WHEN doc_id % 3 = 0 THEN {w}
                WHEN doc_id % 3 = 1 THEN {WAV_FIXTURE_RATE}
                ELSE {vw}
                END AS INTEGER) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 THEN {h}
                WHEN doc_id % 3 = 1 THEN {WAV_FIXTURE_CHANNELS}
                ELSE {vh}
                END AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                     WHEN doc_id % 3 = 1
                          THEN length(text) // {WAV_BLOCK_ALIGN}
                     ELSE length(text) END AS INTEGER) AS n_frames,
           ROUND(CAST(length(regexp_replace(text, '[^@-~]', '', 'g'))
                      + CASE WHEN doc_id % 3 = 0 THEN {n_mid}
                             WHEN doc_id % 3 = 1
                                  THEN {wav_fixed_mid}
                                       + {mid4('length(text) + 36')}
                                       + {mid4('length(text)')}
                             ELSE {mp4_fixed_mid}
                                  + {mid4('length(text)')}
                                  + {mid4('length(text) + 8')}
                             END
                      AS DOUBLE)
                 / (length(text)
                    + CASE WHEN doc_id % 3 = 0 THEN {lp}
                           WHEN doc_id % 3 = 1 THEN {lw}
                           ELSE {lv} END),
                 6) AS hist_b1
    FROM documents ORDER BY doc_id
    """


@q("mm_media_features", _mm_oracle)
def mm_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload + metadata struct →
    mapInPandas feature extraction — every content type now decodes REAL
    wire format: PNG signature+IHDR for images (decode_png_dims, VERDICT
    r2 #5), RIFF/WAVE fmt/data chunk walk for audio (decode_wav_meta,
    r3 #6: sample rate/channels/PCM frames), and ISO-BMFF box walk for
    video (decode_mp4_meta, r4: ftyp + moov/mvhd duration + trak/tkhd
    16.16 dims; frame decode itself still needs ffmpeg — header metadata
    is what the pipeline consumes). The oracle mirrors all three from the
    same header constants; the per-row size/duration fields are
    re-derived from length(text) in SQL (byte == char: the corpus is
    printable ASCII, probe-verified)."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import attach_binary_payload, extract_media_features

    docs = t(spark, sf_dir, "documents")
    feats = extract_media_features(attach_binary_payload(docs))
    return feats.select(
        "doc_id", "content_type", "size_bytes", "sha16", "width", "height",
        "n_frames",
        F.round(F.element_at("byte_hist", 2), 6).alias("hist_b1"),
    ).orderBy("doc_id")
