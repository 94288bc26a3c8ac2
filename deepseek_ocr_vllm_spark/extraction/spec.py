"""Shared extraction spec: constants, regexes, and *leaf* helpers.

Both the golden (row-at-a-time) and vectorized (Arrow-batch) extractors
import these so that whitespace/entity/label semantics cannot drift, while
each keeps its own parsing/scoring control flow.

Reference semantics surveyed in /root/repo/SURVEY.md §2.9:
  * kill-list boilerplate strip + [TABLE] markers mirror the docling
    block iteration contract (triton-models/docling_granite_python/1/
    model.py:18-72: tables become markers in the joined full_text)
  * OCR noise lines mirror workers/vessel-ner/src/lib/deepseek-ocr.ts:383-393
  * span offsets are char-based, start inclusive / end exclusive
    (sql/motherduck/PREANNOTATION_SCHEMA.md:9-12)
"""

from __future__ import annotations

import re
import unicodedata

# ---------------------------------------------------------------- HTML spec

# subtree-dropping boilerplate tags (readability kill list)
KILL_TAGS = frozenset(
    """script style noscript nav header footer aside form iframe svg button
       select option head template""".split()
)
# tags that terminate/flush a text segment (block-level boundaries)
BLOCK_TAGS = frozenset(
    """p div section article main li ul ol table thead tbody tr td th caption
       h1 h2 h3 h4 h5 h6 blockquote pre br hr body html figure figcaption""".split()
)
HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
CONTENT_TAGS = frozenset(["main", "article"])  # always-keep ancestors
LABEL_BY_TAG = {"li": "list_item", "pre": "code", "table": "table"}
VOID_TAGS = frozenset(["br", "hr", "img", "meta", "link", "input"])

MIN_BLOCK_CHARS = 25  # readability text-length gate for non-content blocks
MAX_LINK_DENSITY = 0.4  # readability link-density gate

TOKEN_RE = re.compile(r"<!--.*?-->|<[^>]*>|[^<]+", re.DOTALL)
TAG_NAME_RE = re.compile(r"^</?\s*([a-zA-Z][a-zA-Z0-9]*)")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))

# ------------------------------------------------------------ PDF-layout spec

# text-encoded layout line record: x,y,size,font|content
PDF_LINE_RE = re.compile(
    r"^\s*(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),([^|]*)\|(.*)$"
)
PDF_Y_GAP_FACTOR = 1.8  # new block when vertical gap > factor * prev line size
PDF_X_JUMP = 50.0  # new block when x shifts by more than this (column break)
PDF_HEADING_FACTOR = 1.5  # block is heading when size >= factor * median size
TABLE_MARKER = "[TABLE]"
# docling-contract marker for formula blocks (the reference joins full_text
# with [TABLE]/[FORMULA] markers, docling_granite_python/1/model.py:18-72);
# a block set in a Math font is a formula, as Mono marks code
FORMULA_MARKER = "[FORMULA]"


def formula_block_text(merged: str) -> str:
    """X5 formula emission keeps the source content: the reference emits
    '[FORMULA] $latex$' (triton-models/docling_granite_python/1/model.py:51),
    so the merged block text rides along after the marker, $-delimited.
    An empty merge degrades to the bare marker."""
    return f"{FORMULA_MARKER} ${merged}$" if merged else FORMULA_MARKER
PDF_CHAR_ADVANCE = 0.6  # fixed-advance glyph model: advance ≈ 0.6 × size
_PDF_WORD_RE = re.compile(r"\S+")

# ------------------------------------------------------------ plain-text spec

NOISE_LINE_RE = re.compile(
    r"^(Processing image\b.*|OCR completed\b.*|-{3,}|={3,}|#{1,6}\s*OCR Output\b.*)$"
)
WORDCHAR_RE = re.compile(r"\w")
WS_RE = re.compile(r"\s+")
# a collapse_ws call is a no-op unless the string has a whitespace RUN or a
# non-space whitespace char — one C-level search decides, skipping the sub
_WS_NEEDS_RE = re.compile(r"\s\s|[^\S ]")

# ------------------------------------------------------------------ detection


def detect_kind(text: str) -> str:
    """Classify a turn payload: 'pdf' | 'html' | 'plain'."""
    if not text:
        return "plain"
    n_pdf = 0
    for line in text.split("\n"):
        if PDF_LINE_RE.match(line):
            n_pdf += 1
            if n_pdf >= 2:
                return "pdf"
    if re.search(r"<[a-zA-Z!/][^>]*>", text):
        return "html"
    return "plain"


# ---------------------------------------------------------------- leaf helpers


def decode_entities(s: str) -> str:
    if "&" not in s:  # fast path: most text pieces carry no entities
        return s
    return _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)


def sanitize_utf8(s: str) -> str:
    """F6 invalid-UTF8 strip (processor.go:320-334): drop runes that can't
    encode (lone surrogates), keep diacritics. Arrow/Spark strings are
    UTF-8 so the hot path never sees these; the golden path must still be
    total over arbitrary Python strings."""
    try:
        s.encode("utf-8")
        return s
    except UnicodeEncodeError:
        return s.encode("utf-8", "ignore").decode("utf-8")


def nfc(s: str) -> str:
    if s.isascii():  # NFC is the identity on ASCII (C-speed check)
        return s
    return unicodedata.normalize("NFC", s)


def strip_accents(s: str) -> str:
    """F5 accent strip (the reference's `unaccent` in
    sql/vessels_lookup.sql:6-43): NFD-decompose, drop every combining mark
    (category Mn), recompose. Total over arbitrary Unicode; identity on
    ASCII (C-speed check)."""
    if s.isascii():
        return s
    decomposed = unicodedata.normalize("NFD", s)
    stripped = "".join(c for c in decomposed
                       if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFC", stripped)


def collapse_ws(s: str) -> str:
    if _WS_NEEDS_RE.search(s) is None:
        return s
    return WS_RE.sub(" ", s)


def append_piece(buf: str, piece: str) -> str:
    """Append a raw text piece to a segment buffer with single-space collapse.

    Whitespace runs inside the piece collapse to one space; a space is never
    doubled across piece boundaries; a leading space is never emitted at the
    start of the buffer. The buffer therefore only ever needs a final
    ``rstrip()`` — so recorded span offsets into it stay exact.
    """
    s = collapse_ws(piece)
    if not s:
        return buf
    if s == " ":
        if buf and not buf.endswith(" "):
            return buf + " "
        return buf
    if s.startswith(" ") and (not buf or buf.endswith(" ")):
        s = s.lstrip(" ")
    return buf + s


def segment_label(tag: str) -> str:
    if tag in HEADING_TAGS:
        return "heading"
    return LABEL_BY_TAG.get(tag, "paragraph")


def keep_segment(n_chars: int, link_chars: int, label: str, in_content: bool) -> bool:
    """Readability-style keep decision (text density vs link density)."""
    if n_chars == 0:
        return False
    if label == "table":
        return True
    link_density = link_chars / n_chars
    if in_content:
        return True
    if label == "heading":
        return link_density <= MAX_LINK_DENSITY
    return n_chars >= MIN_BLOCK_CHARS and link_density <= MAX_LINK_DENSITY


def pdf_word_boxes(x: float, y: float, size: float, content: str) -> list[tuple]:
    """X2 word-level layout boxes for one line record under a fixed-advance
    glyph model (advance = PDF_CHAR_ADVANCE × size): a word starting at
    char offset c spans x0 = x + c·adv … x1 = x0 + len(word)·adv over the
    line's [y, y + size) vertical extent. The geometry MODEL is synthetic —
    the text-encoded records carry line origins, not per-glyph metrics —
    but the output contract (text, x0, y0, x1, y1 in reading order) is the
    reference's pdfplumber word list (scripts/pdf_extract.py:58-73); a real
    PDF parser would supply real advances."""
    adv = PDF_CHAR_ADVANCE * (size if size > 0 else 1.0)
    y1 = y + size
    out: list[tuple] = []
    for m in _PDF_WORD_RE.finditer(content):  # \S+ runs == str.split words
        c, e = m.span()
        x0 = x + c * adv
        out.append((m.group(0), x0, y, x0 + (e - c) * adv, y1))
    return out


def pdf_table_cells(texts: list[str]) -> list[list[str]]:
    """X3 cell grid for one table block: each '|'-bearing line is a row,
    cells split on '|' and stripped (the reference emits tables as
    row-lists of cell strings, scripts/pdf_extract.py:74-81)."""
    return [[c.strip() for c in t.split("|")] for t in texts if "|" in t]


def pdf_median_size(sizes: list[float]) -> float:
    if not sizes:
        return 0.0
    s = sorted(sizes)
    return s[(len(s) - 1) // 2]


def merge_pdf_lines(lines: list[str]) -> str:
    """Span merge within a block: hyphenation-aware line join."""
    out = ""
    for t in lines:
        t = collapse_ws(t).strip()
        if not t:
            continue
        if not out:
            out = t
        elif out.endswith("-"):
            out = out[:-1] + t
        else:
            out = out + " " + t
    return out
