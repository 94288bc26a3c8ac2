"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Input-hint shape (/root/repo/BASELINE.json:15):
  (conv_id string, turn_idx int32, role string, text string, tool string,
   ts timestamp)

Payload mix per turn keyed by sha256(conv_id, turn_idx):
  6/10 HTML-ish (boilerplate nav/header/footer/aside + main/article content,
       link-heavy asides, <table> fragments — the OCR markdown contract,
       reference deepseek-ocr.ts:100,222)
  2/10 pseudo-PDF layout line records ``x,y,size,font|content``
       (block segmentation / reading order / span merge — pdf_extract.py:58-73)
  2/10 plain text incl. empty strings, whitespace-only, NFC/NFD pairs,
       emoji/status noise lines (deepseek-ocr.ts:383-393)

Conversation lengths are Zipf-distributed so a few conversations are
pathologically long → exercises conv_id salting / skew handling.
Fully deterministic: seeded RNGs, ts derived from row index, no wall clock.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

WORDS = (
    "spark arrow batch vector column parquet shuffle join merge sort scan "
    "filter window agg table stream page span text block line order key hash "
    "data query part salt bucket turn conv role tool lineage metric resume "
    "checkpoint iceberg extract clean node density link heading anchor"
).split()

import unicodedata as _ud

UNICODE_SAMPLES = [
    _ud.normalize("NFC", "caf\u00e9 r\u00e9sum\u00e9"),  # composed
    _ud.normalize("NFD", "caf\u00e9 r\u00e9sum\u00e9"),  # decomposed: NFC step must unify
    "na\u00efve \u2014 stra\u00dfe",
    "\u6d77\u4e8b \u60c5\u5831 \u5206\u6790",
]
NOISE_LINES = [
    "Processing image 3/10 ...",
    "OCR completed in 4.2s",
    "---",
    "## OCR Output",
    "===",
    "\U0001f6a2\U0001f30a✨",
]
TOOLS = ["search", "fetch_page", "run_sql", "extract_pdf", ""]
ROLES = ["user", "assistant", "tool"]

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _seed(conv_id: str, turn_idx: int) -> int:
    h = hashlib.sha256(f"{conv_id}:{turn_idx}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def _sentence(rng: random.Random, lo: int = 6, hi: int = 18) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


def _html_payload(rng: random.Random) -> str:
    nav_items = "".join(
        f'<li><a href="/{rng.choice(WORDS)}">{rng.choice(WORDS)}</a></li>'
        for _ in range(rng.randint(3, 7))
    )
    parts = [
        "<!doctype html><html><head><title>t</title>"
        "<script>var x=1;</script><style>.a{color:red}</style></head><body>",
        f"<nav><ul>{nav_items}</ul></nav>",
        f"<header><h1>{_sentence(rng, 2, 5)}</h1></header>",
    ]
    use_main = rng.random() < 0.7
    if use_main:
        parts.append("<main><article>")
    parts.append(f"<h2>{_sentence(rng, 3, 6)}</h2>")
    for _ in range(rng.randint(1, 4)):
        body = _sentence(rng, 25, 60)
        if rng.random() < 0.3:
            body += f' see <a href="/{rng.choice(WORDS)}">{rng.choice(WORDS)}</a> for more'
        parts.append(f"<p>{body}</p>")
    if rng.random() < 0.4:
        rows = "".join(
            "<tr>" + "".join(f"<td>{rng.choice(WORDS)}</td>" for _ in range(3)) + "</tr>"
            for _ in range(rng.randint(2, 4))
        )
        parts.append(f"<table>{rows}</table>")
    if rng.random() < 0.4:
        items = "".join(f"<li>{_sentence(rng, 5, 12)}</li>" for _ in range(rng.randint(2, 4)))
        parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.25:
        parts.append(f"<p>{rng.choice(UNICODE_SAMPLES)} {_sentence(rng, 10, 25)}</p>")
    if rng.random() < 0.3:  # short junk div — should be dropped by density gate
        parts.append(f"<div>{rng.choice(WORDS)}</div>")
    if rng.random() < 0.3:  # link farm — dropped by link-density gate
        farm = " ".join(
            f'<a href="/{w}">{w} {rng.choice(WORDS)}</a>' for w in rng.sample(WORDS, 6)
        )
        parts.append(f"<div>{farm}</div>")
    if use_main:
        parts.append("</article></main>")
    parts.append(
        f'<aside><a href="/x">{_sentence(rng, 2, 4)}</a></aside>'
        f"<footer><p>© 2025 {rng.choice(WORDS)}</p></footer></body></html>"
    )
    return "".join(parts)


def _pdf_payload(rng: random.Random) -> str:
    lines: list[str] = []
    y = 40.0
    two_col = rng.random() < 0.3
    lines.append(f"72,{y:.1f},20,Serif-Bold|{_sentence(rng, 3, 6)}")
    y += 40
    for _ in range(rng.randint(2, 5)):
        x = 72.0 if not two_col or rng.random() < 0.5 else 320.0
        n_lines = rng.randint(2, 5)
        for j in range(n_lines):
            txt = _sentence(rng, 5, 10)
            if j < n_lines - 1 and rng.random() < 0.25:
                txt += "-"  # hyphenated wrap → span merge drops it
            lines.append(f"{x:.1f},{y:.1f},10,Serif|{txt}")
            y += 12
        y += 40
    if rng.random() < 0.4:
        for _ in range(rng.randint(2, 4)):
            cells = " | ".join(rng.choice(WORDS) for _ in range(3))
            lines.append(f"72,{y:.1f},9,Serif|{cells}")
            y += 11
        y += 40
    if rng.random() < 0.3:
        for _ in range(rng.randint(1, 3)):
            lines.append(f"90,{y:.1f},9,Mono|{rng.choice(WORDS)} = {rng.randint(0, 99)}")
            y += 11
        y += 40
    if rng.random() < 0.2:  # formula block (Math font → [FORMULA] marker)
        lines.append(
            f"90,{y:.1f},11,CMU-Math|{rng.choice(WORDS)}^2 + {rng.randint(1, 9)}"
        )
    rng.shuffle(lines)  # arrival order ≠ reading order → sort must fix it
    return "\n".join(lines)


def _plain_payload(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.08:
        return ""
    if r < 0.14:
        return "   \n\t  \n "
    lines = []
    for _ in range(rng.randint(1, 6)):
        if rng.random() < 0.3:
            lines.append(rng.choice(NOISE_LINES))
        elif rng.random() < 0.2:
            lines.append(rng.choice(UNICODE_SAMPLES))
        else:
            lines.append(_sentence(rng, 6, 20))
    return "\n".join(lines)


def conv_lengths(n_turns: int, seed: int = 42, max_conv_turns: int = 500) -> list[int]:
    """Deterministic Zipf conversation lengths summing to ≥ n_turns."""
    nprng = np.random.RandomState(seed)
    lengths: list[int] = []
    total = 0
    while total < n_turns:
        length = min(int(nprng.zipf(1.2)), max_conv_turns)
        lengths.append(length)
        total += length
    return lengths


def _gen_conv_range(args) -> pd.DataFrame:
    """Generate rows for convs [lo, hi); deterministic regardless of how
    the conv space is split across workers (per-turn content keyed by
    sha256(conv_id, turn_idx); ts keyed by the global row index)."""
    lo, hi, lengths, offsets = args
    rows: list[tuple] = []
    for conv_i in range(lo, hi):
        length = lengths[conv_i]
        conv_id = f"conv_{conv_i:08d}"
        base = offsets[conv_i]
        for turn_idx in range(length):
            s = _seed(conv_id, turn_idx)
            rng = random.Random(s)
            kind = s % 10
            role = ROLES[turn_idx % 3]
            if kind < 6:
                text = _html_payload(rng)
            elif kind < 8:
                text = _pdf_payload(rng)
            else:
                text = _plain_payload(rng)
            tool = TOOLS[s % len(TOOLS)] if role == "tool" else ""
            ts = EPOCH + timedelta(seconds=7 * (base + turn_idx))
            rows.append((conv_id, turn_idx, role, text, tool, ts))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def gen_transcripts(n_turns: int, seed: int = 42, max_conv_turns: int = 500) -> pd.DataFrame:
    """Generate ≈n_turns transcript rows (full conversations, so slightly over)."""
    lengths = conv_lengths(n_turns, seed, max_conv_turns)
    offsets = [0] * len(lengths)
    acc = 0
    for i, ln in enumerate(lengths):
        offsets[i] = acc
        acc += ln
    return _gen_conv_range((0, len(lengths), lengths, offsets))


PA_SCHEMA_FIELDS = [
    ("conv_id", "string"), ("turn_idx", "int32"), ("role", "string"),
    ("text", "string"), ("tool", "string"),
]


def _pa_schema():
    import pyarrow as pa

    return pa.schema(
        [pa.field(n, getattr(pa, t)()) for n, t in PA_SCHEMA_FIELDS]
        + [pa.field("ts", pa.timestamp("us", tz="UTC"))]
    )


def _write_chunk(args) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    lo, hi, lengths, offsets, out_file = args
    df = _gen_conv_range((lo, hi, lengths, offsets))
    pq.write_table(
        pa.Table.from_pandas(df, schema=_pa_schema(), preserve_index=False),
        out_file, compression="zstd", row_group_size=10_000,
    )
    return out_file


def write_transcripts_parquet(path: str, n_turns: int, seed: int = 42,
                              max_conv_turns: int = 500,
                              n_files: int = 16,
                              n_jobs: int | None = None) -> str:
    """Write as a DIRECTORY of n_files parquet files with small row groups
    so the Spark scan has file- and row-group-level split points (a single
    big file caps scan parallelism — at 100 TB the table is thousands of
    files anyway, so the fixture should look the same). Generation is
    parallel across processes but deterministic: the conv-length sequence
    and all per-turn seeds are independent of the worker split."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    lengths = conv_lengths(n_turns, seed, max_conv_turns)
    offsets = [0] * len(lengths)
    acc = 0
    for i, ln in enumerate(lengths):
        offsets[i] = acc
        acc += ln
    os.makedirs(path, exist_ok=True)
    # split conv space into n_files chunks balanced by turn count
    target = acc / n_files
    bounds = [0]
    run = 0.0
    for i, ln in enumerate(lengths):
        run += ln
        if run >= target * len(bounds) and len(bounds) < n_files:
            bounds.append(i + 1)
    bounds.append(len(lengths))
    jobs = [
        (bounds[k], bounds[k + 1], lengths, offsets,
         os.path.join(path, f"part-{k:04d}.parquet"))
        for k in range(len(bounds) - 1)
        if bounds[k] < bounds[k + 1]
    ]
    n_jobs = n_jobs or min(len(jobs), os.cpu_count() or 4)
    if n_jobs <= 1 or len(jobs) == 1:
        for j in jobs:
            _write_chunk(j)
    else:
        with ProcessPoolExecutor(max_workers=n_jobs) as ex:
            list(ex.map(_write_chunk, jobs))
    return path


# --------------------------------------------------------- real PDF binaries

def _pdf_binary(rng: random.Random) -> bytes:
    """One deterministic genuine ``%PDF-`` binary: multi-page, flate-
    compressed content streams, Tf/Td/TD/T*/Tj/TJ text ops across three
    fonts — the wire-format analog of ``_pdf_payload`` so the X1 hot path
    (extraction/pdfbytes.py) can be BENCHED on real bytes, not just the
    text-encoded layout records. Vocabulary has no ()\\ so no string
    escaping is needed."""
    import zlib as _zlib

    def obj(n: int, body: bytes) -> bytes:
        return f"{n} 0 obj\n".encode() + body + b"\nendobj\n"

    n_pages = rng.randint(2, 5)
    out = [b"%PDF-1.4\n", obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")]
    kids = " ".join(f"{10 + i} 0 R" for i in range(n_pages)).encode()
    out.append(obj(2, b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                   + str(n_pages).encode() + b" >>"))
    for i in range(n_pages):
        ops = [b"BT"]
        ops.append(f"/F2 18 Tf 72 720 Td ({_sentence(rng, 3, 6)}) Tj".encode())
        ops.append(b"/F1 10 Tf 0 -36 Td")
        for _ in range(rng.randint(15, 30)):
            if rng.random() < 0.2:
                parts = " ".join(
                    f"({w}) -{rng.randint(200, 320)}"
                    for w in rng.sample(WORDS, rng.randint(3, 6)))
                ops.append(f"[{parts}] TJ T*".encode())
            else:
                ops.append(f"({_sentence(rng, 5, 12)}) Tj T*".encode())
        if rng.random() < 0.3:
            ops.append(f"/F3 9 Tf 1 0 0 1 72 200 Tm "
                       f"({rng.choice(WORDS)} = {rng.randint(0, 99)}) Tj".encode())
        ops.append(b"ET")
        stream = _zlib.compress(b"\n".join(ops))
        out.append(obj(10 + i, (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents " + str(30 + i).encode() + b" 0 R /Resources "
            b"<< /Font << /F1 50 0 R /F2 51 0 R /F3 52 0 R >> >> >>")))
        out.append(obj(30 + i, (
            b"<< /Length " + str(len(stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + stream
            + b"\nendstream")))
    out.append(obj(50, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    out.append(obj(51, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>"))
    out.append(obj(52, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"))
    out.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


def write_pdf_corpus(path: str, n_docs: int, seed: int = 42) -> str:
    """Deterministic directory of genuine multi-page PDF binaries for
    benching the binary-scan → wire-format-parse → extract pipeline."""
    import os

    os.makedirs(path, exist_ok=True)
    for i in range(n_docs):
        rng = random.Random(_seed(f"pdfdoc-{seed}", i))
        with open(os.path.join(path, f"doc_{i:05d}.pdf"), "wb") as f:
            f.write(_pdf_binary(rng))
    return path
