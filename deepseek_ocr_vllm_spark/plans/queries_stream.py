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


def _crc_table() -> list[int]:
    """Standard CRC-32 (reflected, poly 0xEDB88320) byte table — the same
    function zlib.crc32 and Spark's F.crc32 implement."""
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        tbl.append(c)
    return tbl


def _mm_oracle() -> str:
    # constants derived from the SAME envelope builders the Spark side
    # stamps (png_envelope / WAV_MID / mp4_header_parts), so the oracle
    # stays in lockstep with the wire format by construction.
    #
    # r5: image rows are a COMPLETE valid PNG (1-row grayscale, stored-
    # block zlib, real CRC32/adler32). The oracle therefore RECOMPUTES
    # both chunk CRCs with a list_reduce fold over the exact chunk bytes
    # (table-driven CRC-32, identical to zlib) and the adler32 from char
    # sums — every byte of the envelope is accounted for in hist_b1, and
    # content_mean (the REAL decoded pixel/PCM/mdat stat) is plain
    # sum(codes)/n.
    from ..operators.multimodal import (
        MP4_FIXTURE_DIMS, MP4_MDAT_TAG, PNG_IEND, PNG_IHDR_POST, PNG_SIG,
        WAV_BLOCK_ALIGN, WAV_FIXTURE_CHANNELS, WAV_FIXTURE_RATE,
        WAV_HEADER_LEN, WAV_MID, ZLIB_STORED_HEAD, mp4_header,
        mp4_header_parts, png_envelope)

    import struct as _struct

    mp4_pre, mp4_mid = mp4_header_parts()
    lv = len(mp4_header(0))  # full video envelope length at any size
    li = len(png_envelope(b""))  # image envelope overhead (size = n + li)
    mp4_fixed_mid = sum(1 for b in mp4_pre + mp4_mid + MP4_MDAT_TAG
                        if (b >> 6) == 1)
    vw, vh = MP4_FIXTURE_DIMS
    # envelope bin-1 counts use the SAME bin definition as the decoder's
    # _byte_hist ((b >> 6) == 1, i.e. 64-127) — an ad-hoc 64..126 range
    # would silently desync if a future fixture constant put byte 127 in
    # the header (ADVICE r3). The regex-based [@-~] text count is 64..126,
    # which equals bin 1 for the printable-ASCII corpus (no DEL byte).
    png_fixed = (PNG_SIG + _struct.pack(">I", 13) + b"IHDR" + PNG_IHDR_POST
                 + b"IDAT" + ZLIB_STORED_HEAD + b"\x01" + b"\x00" + PNG_IEND)
    png_fixed_mid = sum(1 for b in png_fixed if (b >> 6) == 1)
    wav_fixed_mid = sum(1 for b in b"RIFF" + WAV_MID if (b >> 6) == 1)
    lw = WAV_HEADER_LEN
    ihdr_post_list = ",".join(str(b) for b in PNG_IHDR_POST)
    crc_tbl = "[" + ",".join(map(str, _crc_table())) + "]"

    def midk(x: str, k: int) -> str:
        # bin-1 byte count of a k-byte integer encoding of x (the byte
        # MULTISET is endianness-independent, so this serves LE and BE
        # size fields alike) — these fields vary per row, so the count is
        # computed from the SQL expression, one term per byte
        return "(" + " + ".join(
            f"CASE WHEN (({x}) // {256 ** i}) % 256 BETWEEN 64 AND 127 "
            "THEN 1 ELSE 0 END" for i in range(k)) + ")"

    def mid4(x: str) -> str:
        return midk(x, 4)

    def crc_fold(list_expr: str) -> str:
        # table-driven CRC-32 fold: crc = tbl[(crc ⊕ byte) & 255] ⊕ (crc>>8)
        return (
            f"xor(list_reduce(list_prepend(4294967295::BIGINT, {list_expr}), "
            f"(c, b) -> xor(({crc_tbl})[(xor(c, b) % 256) + 1]::BIGINT, "
            "c // 256)), 4294967295)"
        )

    def cat(*lists: str) -> str:
        out = lists[0]
        for nxt in lists[1:]:
            out = f"list_concat(({out})::BIGINT[], ({nxt})::BIGINT[])"
        return out

    ihdr_list = cat(
        "[73,72,68,82]",
        "[(n // 16777216) % 256, (n // 65536) % 256, "
        "(n // 256) % 256, n % 256]",
        f"[{ihdr_post_list}]")
    idat_list = cat(
        "[73,68,65,84,120,1,1]",
        "[(n + 1) % 256, (n + 1) // 256, "
        "(65534 - n) % 256, (65534 - n) // 256, 0]",
        "codes",
        "[adB // 256, adB % 256, adA // 256, adA % 256]")

    return f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n,
             list_transform(string_split(text, ''),
                            x -> unicode(x)::BIGINT) AS codes
      FROM documents
    ),
    ad AS (
      SELECT *,
             CASE WHEN doc_id % 3 = 0 THEN
               (1 + COALESCE(list_sum(codes), 0)) % 65521 END AS adA,
             CASE WHEN doc_id % 3 = 0 THEN
               (n + 1 + COALESCE(list_sum(list_transform(codes,
                  (x, i) -> (length(text) - i + 1) * x)), 0)) % 65521
             END AS adB
      FROM d
    ),
    crc AS (
      SELECT *,
             CASE WHEN doc_id % 3 = 0
                  THEN {crc_fold(ihdr_list)} END AS crc_ihdr,
             CASE WHEN doc_id % 3 = 0
                  THEN {crc_fold(idat_list)} END AS crc_idat
      FROM ad
    )
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS content_type,
           n + CASE WHEN doc_id % 3 = 0 THEN {li}
                    WHEN doc_id % 3 = 1 THEN {lw}
                    ELSE {lv} END AS size_bytes,
           substr(sha256(text), 1, 16) AS sha16,
           CAST(CASE WHEN doc_id % 3 = 0 THEN n
                WHEN doc_id % 3 = 1 THEN {WAV_FIXTURE_RATE}
                ELSE {vw}
                END AS INTEGER) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                WHEN doc_id % 3 = 1 THEN {WAV_FIXTURE_CHANNELS}
                ELSE {vh}
                END AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                     WHEN doc_id % 3 = 1
                          THEN n // {WAV_BLOCK_ALIGN}
                     ELSE n END AS INTEGER) AS n_frames,
           ROUND(CAST(length(regexp_replace(text, '[^@-~]', '', 'g'))
                      + CASE WHEN doc_id % 3 = 0
                             THEN {png_fixed_mid}
                                  + {mid4('n')}
                                  + {mid4('n + 12')}
                                  + {midk('n + 1', 2)}
                                  + {midk('65534 - n', 2)}
                                  + {mid4('adB * 65536 + adA')}
                                  + {mid4('crc_ihdr')}
                                  + {mid4('crc_idat')}
                             WHEN doc_id % 3 = 1
                                  THEN {wav_fixed_mid}
                                       + {mid4('n + 36')}
                                       + {mid4('n')}
                             ELSE {mp4_fixed_mid}
                                  + {mid4('n')}
                                  + {mid4('n + 8')}
                             END
                      AS DOUBLE)
                 / (n + CASE WHEN doc_id % 3 = 0 THEN {li}
                             WHEN doc_id % 3 = 1 THEN {lw}
                             ELSE {lv} END),
                 6) AS hist_b1,
           ROUND(CAST(COALESCE(list_sum(codes), 0) AS DOUBLE) / n, 6)
             AS content_mean,
           CASE WHEN doc_id % 3 = 1 THEN
             ROUND(sqrt(CAST(list_sum(list_transform(
                     range(1, n // 2 + 1),
                     i -> (codes[2*i-1] + 256 * codes[2*i])
                          * (codes[2*i-1] + 256 * codes[2*i])))
                   AS DOUBLE) / (n // 2)), 6)
           END AS audio_rms
    FROM crc ORDER BY doc_id
    """


@q("mm_media_features", _mm_oracle)
def mm_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload + metadata struct →
    mapInPandas feature extraction — every content type decodes REAL wire
    format, and image rows are now a COMPLETE valid PNG decoded down to
    the PIXELS (r5: decode_png_content — chunk walk with CRC verify, zlib
    inflate, scanline unfilter; content_mean is the mean decoded luma).
    Audio rows: RIFF/WAVE fmt/data chunk walk (rate/channels/PCM frames)
    PLUS real SAMPLE decode — PCM is uncompressed, so the int16 LE
    samples decode with numpy alone and audio_rms is the RMS over the
    actual samples (the oracle reproduces it from byte-pair arithmetic;
    high bytes < 128 in the ASCII corpus make signed == unsigned). Video
    rows: ISO-BMFF box walk (ftyp + moov/mvhd duration + trak/tkhd 16.16
    dims, content_mean over the mdat body; mdat frames are codec
    compressed, so frame decode needs ffmpeg — the ONE remaining content
    stub). The oracle re-derives every
    envelope byte in SQL from the same constants — including the PNG
    CRC32s (table-driven list_reduce fold, identical to zlib) and adler32
    (char-sum arithmetic) — so hist_b1 covers checksums too (byte ==
    char: the corpus is printable ASCII, probe-verified)."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import attach_binary_payload, extract_media_features
    from ..session import adaptive_width

    docs = t(spark, sf_dir, "documents")
    # r6 (review): repartition the NARROW documents rows before the
    # envelope-building projection — this parallelizes both the JVM
    # envelope construction and the Python decode while shuffling only
    # (doc_id, text, ...); extract_media_features' internal fallback then
    # sees enough partitions and never shuffles the built payload bytes.
    w = adaptive_width(docs, 192 * 1024)
    if w > 1:
        docs = docs.repartition(w, "doc_id")
    feats = extract_media_features(attach_binary_payload(docs))
    return feats.select(
        "doc_id", "content_type", "size_bytes", "sha16", "width", "height",
        "n_frames",
        F.round(F.element_at("byte_hist", 2), 6).alias("hist_b1"),
        F.round("content_mean", 6).alias("content_mean"),
        F.round("audio_rms", 6).alias("audio_rms"),
    ).orderBy("doc_id")
