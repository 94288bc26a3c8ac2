"""Golden reference extractor — naive, row-at-a-time, pure Python.

Plays the role of the reference repo's pandas golden baselines
(tests/reconciliation/baseline; diff harness scripts/reconciliation/
phase_b_diff.py): the Spark pipeline's output must equal this extractor's
output per turn, under stable (conv_id, turn_idx) ordering.

Never used on the Spark hot path — the job uses extraction.vectorized.
"""

from __future__ import annotations

from . import spec


def _extract_html(text: str) -> tuple[list[tuple[str, int, str, bool, list[tuple[int, int]]]], int]:
    """Parse HTML-ish markup into candidate segments.

    Returns (segments, n_nodes); each segment is
    (text, link_chars, label, in_content, link_spans_within_segment).
    Event-driven single pass: a stack of open tags, kill-subtree depth,
    table swallow depth, anchor depth.
    """
    segments: list[tuple[str, int, str, bool, list[tuple[int, int]]]] = []
    stack: list[str] = []
    buf = ""
    link_chars = 0
    link_spans: list[tuple[int, int]] = []
    kill_depth = 0
    table_depth = 0
    anchor_depth = 0
    n_nodes = 0

    def innermost_label() -> str:
        for tag in reversed(stack):
            if tag in spec.HEADING_TAGS or tag in ("li", "pre", "td", "th", "p",
                                                   "blockquote", "caption", "figcaption"):
                return spec.segment_label(tag)
        return "paragraph"

    def in_content() -> bool:
        return any(t in spec.CONTENT_TAGS for t in stack)

    def flush() -> None:
        nonlocal buf, link_chars, link_spans
        t = buf.rstrip()
        if t:
            clipped = [(s, min(e, len(t))) for s, e in link_spans if s < len(t)]
            segments.append((t, link_chars, innermost_label(), in_content(), clipped))
        buf = ""
        link_chars = 0
        link_spans = []

    for tok in spec.TOKEN_RE.finditer(text):
        t = tok.group(0)
        if t.startswith("<!--"):
            continue
        if t.startswith("<"):
            n_nodes += 1
            m = spec.TAG_NAME_RE.match(t)
            if not m:
                continue  # <!doctype ...>, <? ... >
            name = m.group(1).lower()
            closing = t.startswith("</")
            selfclosing = t.rstrip().endswith("/>") or name in spec.VOID_TAGS
            if kill_depth > 0:
                if name in spec.KILL_TAGS:
                    if closing:
                        kill_depth -= 1
                    elif not selfclosing:
                        kill_depth += 1
                continue
            if table_depth > 0:
                if name == "table":
                    if closing:
                        table_depth -= 1
                        if table_depth == 0:
                            segments.append(
                                (spec.TABLE_MARKER, 0, "table", in_content(), [])
                            )
                            if "table" in stack:
                                stack.remove("table")
                    else:
                        table_depth += 1
                continue
            if name in spec.KILL_TAGS:
                if not closing and not selfclosing:
                    flush()
                    kill_depth += 1
                continue
            if name == "a":
                if closing:
                    anchor_depth = max(0, anchor_depth - 1)
                elif not selfclosing:
                    anchor_depth += 1
                continue
            if name == "table" and not closing:
                flush()
                stack.append("table")
                table_depth = 1
                continue
            if name in spec.BLOCK_TAGS:
                flush()
                if closing:
                    if name in stack:
                        while stack:
                            if stack.pop() == name:
                                break
                elif not selfclosing:
                    stack.append(name)
                continue
            continue  # inline tag (span/b/i/em/strong/...): no flush
        # text node
        if kill_depth > 0 or table_depth > 0:
            continue
        piece = spec.decode_entities(t)
        start = len(buf)
        buf = spec.append_piece(buf, piece)
        if anchor_depth > 0 and len(buf) > start:
            link_spans.append((start, len(buf)))
            link_chars += len(buf) - start

    if table_depth > 0:  # unclosed table at EOF still yields its marker
        segments.append((spec.TABLE_MARKER, 0, "table", in_content(), []))
    flush()
    return segments, n_nodes


def _assemble_html(
    segments: list[tuple[str, int, str, bool, list[tuple[int, int]]]],
) -> tuple[str, list[tuple[int, int, str]]]:
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    off = 0
    for text, link_chars, label, content, lspans in segments:
        if not spec.keep_segment(len(text), link_chars, label, content):
            continue
        if parts:
            off += 1  # '\n' joiner
        parts.append(text)
        spans.append((off, off + len(text), label))
        for s, e in lspans:
            if e > s:
                spans.append((off + s, off + e, "link"))
        off += len(text)
    return "\n".join(parts), spans


def _extract_pdf(
    text: str,
) -> tuple[str, list[tuple[int, int, str]], int, list[tuple], list[list[list[str]]]]:
    recs: list[tuple[float, float, float, str, str]] = []
    for line in text.split("\n"):
        m = spec.PDF_LINE_RE.match(line)
        if m:
            recs.append(
                (float(m.group(1)), float(m.group(2)), float(m.group(3)),
                 m.group(4).strip(), m.group(5))
            )
    n_nodes = len(recs)
    order = sorted(range(len(recs)), key=lambda i: (recs[i][1], recs[i][0], i))

    # X2 word boxes: every word of every line record, reading order
    words: list[tuple] = []
    for idx in order:
        x, y, size, _font, txt = recs[idx]
        words.extend(spec.pdf_word_boxes(x, y, size, txt))

    blocks: list[list[int]] = []
    for idx in order:
        x, y, size, _font, _txt = recs[idx]
        if blocks:
            px, py, psize, _, _ = recs[blocks[-1][-1]]
            gap = spec.PDF_Y_GAP_FACTOR * (psize if psize > 0 else 1.0)
            if (y - py) > gap or abs(x - px) > spec.PDF_X_JUMP:
                blocks.append([idx])
                continue
            blocks[-1].append(idx)
        else:
            blocks.append([idx])

    median = spec.pdf_median_size([r[2] for r in recs])
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    tables: list[list[list[str]]] = []
    off = 0
    for blk in blocks:
        texts = [recs[i][4] for i in blk]
        sizes = [recs[i][2] for i in blk]
        fonts = [recs[i][3] for i in blk]
        is_table = sum(1 for t in texts if "|" in t) >= 2
        if is_table:
            label, btxt = "table", spec.TABLE_MARKER
            tables.append(spec.pdf_table_cells(texts))  # X3 cell grid
        elif any("Math" in f for f in fonts):
            # X5 docling marker + content ('[FORMULA] $latex$', reference format)
            label, btxt = "formula", spec.formula_block_text(spec.merge_pdf_lines(texts))
        elif median > 0 and max(sizes) >= spec.PDF_HEADING_FACTOR * median:
            label, btxt = "heading", spec.merge_pdf_lines(texts)
        elif any("Mono" in f for f in fonts):
            label, btxt = "code", spec.merge_pdf_lines(texts)
        else:
            label, btxt = "paragraph", spec.merge_pdf_lines(texts)
        if not btxt:
            continue
        if parts:
            off += 1
        parts.append(btxt)
        spans.append((off, off + len(btxt), label))
        off += len(btxt)
    return "\n".join(parts), spans, n_nodes, words, tables


def _extract_plain(text: str) -> tuple[str, list[tuple[int, int, str]], int]:
    lines = text.split("\n")
    kept: list[str] = []
    for line in lines:
        s = spec.collapse_ws(line).strip()
        if not s or spec.NOISE_LINE_RE.match(s) or not spec.WORDCHAR_RE.search(s):
            continue
        kept.append(s)
    clean = "\n".join(kept)
    spans = [(0, len(clean), "body")] if clean else []
    return clean, spans, len(lines)


def extract_turn(text: str | None) -> dict:
    """Extract one turn. Returns clean_text, spans, metrics, payload kind.

    Spans are char offsets into clean_text, start inclusive / end exclusive,
    so ``clean_text[start:end]`` round-trips (PREANNOTATION_SCHEMA.md:9-12).
    """
    raw = spec.sanitize_utf8(text or "")
    n_bytes = len(raw.encode("utf-8"))
    kind = spec.detect_kind(raw)
    t = spec.nfc(raw)
    words: list[tuple] = []
    tables: list[list[list[str]]] = []
    if kind == "html":
        segments, n_nodes = _extract_html(t)
        clean, spans = _assemble_html(segments)
    elif kind == "pdf":
        clean, spans, n_nodes, words, tables = _extract_pdf(t)
    else:
        clean, spans, n_nodes = _extract_plain(t)
    return {
        "clean_text": clean,
        "spans": [{"start": s, "end": e, "label": lb} for s, e, lb in spans],
        # X2 word layout boxes (PDF only; [] otherwise) — reference contract
        # scripts/pdf_extract.py:58-73
        "words": [
            {"text": w, "x0": x0, "y0": y0, "x1": x1, "y1": y1}
            for w, x0, y0, x1, y1 in words
        ],
        # X3 table cell grids (PDF only) — scripts/pdf_extract.py:74-81
        "tables": tables,
        "n_nodes": n_nodes,
        "n_spans": len(spans),
        "n_bytes": n_bytes,
        "kind": kind,
    }
