"""Streaming + multimodal queries() entries.

stream_window_counts has a SQL oracle (tumbling window == floor-epoch
bucketing). mm_media_features' decode stage is a clearly-marked
deterministic stub over mapInPandas (the point is the Arrow/binary
plumbing) — but the stub is pure byte arithmetic over the utf-8 payload,
so its oracle re-derives every feature in SQL from the same spec. The
byte-level SQL (ascii(), char-class counts) relies on the corpus being
ASCII, which the fixture probe verified (all docs printable ASCII, so
byte == char).
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


@q(
    "mm_media_features",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS content_type,
           length(text) AS size_bytes,
           substr(sha256(text), 1, 16) AS sha16,
           CAST(64 + (ascii(substr(text, 1, 1)) % 16) * 64 AS INTEGER)
             AS width,
           CAST(64 + (ascii(substr(text, length(text), 1)) % 9) * 64
                AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                     ELSE 1 + length(text) % 240 END AS INTEGER) AS n_frames,
           ROUND(CAST(length(regexp_replace(text, '[^@-~]', '', 'g'))
                      AS DOUBLE) / length(text), 6) AS hist_b1
    FROM documents ORDER BY doc_id
    """,
)
def mm_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload + metadata struct →
    mapInPandas feature extraction (deterministic stub decoder —
    operators/multimodal.py). The oracle re-derives the stub's byte
    arithmetic in SQL: payload = utf-8 text (ASCII corpus ⇒ byte == char ⇒
    first/last byte = ascii(), byte_hist[1] = chars in [@-~] i.e. bytes
    64-126 / total)."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import attach_binary_payload, extract_media_features

    docs = t(spark, sf_dir, "documents")
    feats = extract_media_features(attach_binary_payload(docs))
    return feats.select(
        "doc_id", "content_type", "size_bytes", "sha16", "width", "height",
        "n_frames",
        F.round(F.element_at("byte_hist", 2), 6).alias("hist_b1"),
    ).orderBy("doc_id")
