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


MEDIA_SCALE_SPEC = (
    (65536, 96), (262144, 48), (1048576, 24), (4194304, 24))


def write_media_scale_corpus(path: str,
                             spec=MEDIA_SCALE_SPEC,
                             seed: int = 20260817) -> str:
    """Deterministic REALISTIC-size media corpus (VERDICT r4 #3): sf0.1
    media payloads are ~1.2 KB, real media are MBs — size-dependent decode
    costs (byte histogram, envelope walk, Arrow transfer) are invisible at
    bench scale without this. One parquet per size class under
    ``path/size_<bytes>/``, rows shaped exactly like
    attach_binary_payload's output (doc_id, payload, meta struct) with
    genuine envelopes: multi-stored-block PNGs (png_envelope), RIFF/WAVE,
    ISO-BMFF — cycled per row like the fixture corpus."""
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .operators.multimodal import mp4_header, png_envelope, wav_header

    rng = np.random.RandomState(seed)
    doc_id = 0
    for size, count in spec:
        rows = {"doc_id": [], "payload": [], "meta": []}
        for _ in range(count):
            data = rng.bytes(size)
            kind = doc_id % 3
            if kind == 0:
                payload, ct = png_envelope(data), "image/png"
            elif kind == 1:
                payload, ct = wav_header(len(data)) + data, "audio/wav"
            else:
                payload, ct = mp4_header(len(data)) + data, "video/mp4"
            rows["doc_id"].append(doc_id)
            rows["payload"].append(payload)
            rows["meta"].append({
                "content_type": ct,
                "size_bytes": len(payload),
                "sha16": hashlib.sha256(data).hexdigest()[:16],
            })
            doc_id += 1
        sub = os.path.join(path, f"size_{size}")
        os.makedirs(sub, exist_ok=True)
        schema = pa.schema([
            pa.field("doc_id", pa.int64()),
            pa.field("payload", pa.binary()),
            pa.field("meta", pa.struct([
                pa.field("content_type", pa.string()),
                pa.field("size_bytes", pa.int64()),
                pa.field("sha16", pa.string()),
            ])),
        ])
        pq.write_table(pa.Table.from_pydict(rows, schema=schema),
                       os.path.join(sub, "media.parquet"))
    return path


def write_scaled_corpus(path: str, base_dir: str = "/root/testdata/sf0.1",
                        scale: int = 10, seed: int = 7) -> str:
    """Deterministic SCALE× corpus fitted to the driver testdata's
    empirical distributions (VERDICT r4 #5: the dedup/ANN candidate-pair
    growth curve needs a second, bigger scale and the driver ships none
    past sf0.1). Statistical twin, not a copy:

    * documents — text resampled from the base corpus's unigram
      frequency + empirical length distribution (the tiny shared vocab is
      exactly what gives the base corpus its shingle/minhash collision
      statistics, so similarity structure carries over);
    * embeddings — per-label diagonal-Gaussian fit, L2-normalized (the
      base vectors are unit-norm label clusters);
    * part — per-column empirical resampling (p_name's two word pools
      drawn independently, preserving trigram collision rates for t5).
    """
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)

    docs = pq.read_table(f"{base_dir}/documents.parquet").to_pandas()
    tokens = [t.split() for t in docs["text"]]
    lengths = np.array([len(t) for t in tokens])
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tokens])
    vocab, counts = np.unique(flat.astype(str), return_counts=True)
    p = counts / counts.sum()
    n_docs = len(docs) * scale
    lens = rng.choice(lengths, size=n_docs)
    words = rng.choice(vocab, size=int(lens.sum()), p=p)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    # the base corpus carries SEEDED duplicate structure (probed at sf0.1:
    # 8/5000 exact dups, ~198 shared-120-char-prefix near-dup groups) —
    # the minhash/simhash candidate counts exist BECAUSE of it, so the
    # scaled twin reproduces the same per-doc rates: ~4% near-dups (clone
    # an earlier doc, resample ~10% of its words) and ~0.16% exact dups.
    n_near = int(round(0.04 * n_docs))
    n_exact = int(round(0.0016 * n_docs))
    victims = rng.choice(n_docs, size=n_near + n_exact, replace=False)
    # sources drawn from NON-victims only (review r5): a victim-sourced
    # clone could pick a doc that a later rewrite destroys (eroding the
    # seeded pair) or clone itself (no dup at all) — the stated rates
    # must be the actual rates
    non_victims = np.setdiff1d(np.arange(n_docs), victims)
    sources = rng.choice(non_victims, size=len(victims))
    for j, (vi, src_i) in enumerate(zip(victims, sources)):
        if j < n_exact:
            texts[vi] = texts[src_i]
        else:
            toks = texts[src_i].split()
            k = max(1, len(toks) // 10)
            for pos in rng.choice(len(toks), size=min(k, len(toks)),
                                  replace=False):
                toks[pos] = str(rng.choice(vocab))
            texts[vi] = " ".join(toks)
    langs = docs["lang"].to_numpy()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(langs, size=n_docs), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{path}/documents.parquet")

    emb = pq.read_table(f"{base_dir}/embeddings.parquet").to_pandas()
    vecs = np.stack(emb["embedding"].to_numpy())
    labels = emb["label"].to_numpy()
    out_v, out_l = [], []
    for lab in np.unique(labels):
        sel = vecs[labels == lab]
        n_out = len(sel) * scale
        gen = rng.normal(sel.mean(axis=0), sel.std(axis=0) + 1e-9,
                         size=(n_out, sel.shape[1]))
        gen /= np.linalg.norm(gen, axis=1, keepdims=True)
        out_v.append(gen.astype(np.float32))
        out_l.append(np.full(n_out, lab))
    allv = np.concatenate(out_v)
    alll = np.concatenate(out_l)
    order = rng.permutation(len(allv))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(allv)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in allv[order]],
                              pa.list_(pa.float32())),
        "label": pa.array(alll[order].astype(np.int32), pa.int32()),
    }), f"{path}/embeddings.parquet")

    part = pq.read_table(f"{base_dir}/part.parquet").to_pandas()
    n_part = len(part) * scale
    w1 = np.array([n.split()[0] for n in part["p_name"]])
    w2 = np.array([n.split()[-1] for n in part["p_name"]])
    names = [f"{a} {b}" for a, b in
             zip(rng.choice(w1, size=n_part), rng.choice(w2, size=n_part))]
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array(names, pa.string()),
        "p_brand": pa.array(rng.choice(part["p_brand"].to_numpy(),
                                       size=n_part), pa.string()),
        "p_type": pa.array(rng.choice(part["p_type"].to_numpy(),
                                      size=n_part), pa.string()),
        "p_size": pa.array(rng.choice(part["p_size"].to_numpy(),
                                      size=n_part).astype(np.int32),
                           pa.int32()),
        "p_retailprice": pa.array(
            rng.choice(part["p_retailprice"].to_numpy(), size=n_part),
            pa.float64()),
    }), f"{path}/part.parquet")
    return path
