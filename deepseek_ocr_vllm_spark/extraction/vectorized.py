"""Vectorized extractor — whole-Arrow-batch, used by the Spark job.

Organization (deliberately different from golden.py, same semantics):
  stage A  classify every row in the batch (html/pdf/plain)
  stage B  tokenize rows into *flat batch-level segment arrays*
  stage C  numpy keep-mask over all segments of the batch at once
           (text-density / link-density readability scoring)
  stage D  per-row assembly with cumulative offsets

The Spark operator (operators/extract.py) calls ``extract_batch`` once per
Arrow batch — never per row (north rule input_hint: no per-row Python).
"""

from __future__ import annotations

import numpy as np

from . import spec

LABELS = ("paragraph", "heading", "list_item", "code", "table", "body")
_LBL = {name: i for i, name in enumerate(LABELS)}
_TABLE, _HEADING, _BODY = _LBL["table"], _LBL["heading"], _LBL["body"]

# innermost labelable tags → label id (mirror of golden.innermost_label)
_LABELABLE = {
    t: _LBL[spec.segment_label(t)]
    for t in ("li", "pre", "td", "th", "p", "blockquote", "caption", "figcaption",
              "h1", "h2", "h3", "h4", "h5", "h6")
}


_TAG_MEMO: dict[str, tuple[str, bool, bool] | None] = {}
_TAG_MEMO_CAP = 100_000  # attr-bearing tags can be unbounded (hrefs)
_MISS = object()  # memo-miss sentinel (None is a valid memo value)

# text pieces repeat heavily too (measured 74% dup rate on the bench mix —
# boilerplate nav/footer strings): memoize collapse_ws(decode_entities(t))
# for short tokens. Pure caching — identical output to the uncached path.
_TEXT_MEMO: dict[str, str] = {}
_TEXT_MEMO_CAP = 100_000
_TEXT_MEMO_MAXLEN = 64  # long tokens are mostly unique sentences


def _parse_tag(t: str) -> tuple[str, bool, bool] | None:
    """token → (name, closing, void) | None; memoized (tag tokens repeat
    heavily, and a dict hit is ~10x cheaper than the regex)."""
    hit = _TAG_MEMO.get(t, 0)
    if hit != 0:
        return hit
    m = spec.TAG_NAME_RE.match(t)
    if m is None:
        out = None
    else:
        name = m.group(1).lower()
        # tokens always end '>' (TOKEN_RE), so no trailing-ws rstrip needed
        out = (name, t[1] == "/", t.endswith("/>") or name in spec.VOID_TAGS)
    if len(_TAG_MEMO) < _TAG_MEMO_CAP:
        _TAG_MEMO[t] = out
    return out


def _tokenize_html(text: str, seg_text: list, seg_link: list, seg_label: list,
                   seg_content: list, seg_lspans: list) -> int:
    """Single pass over one HTML payload; append segments to the flat
    batch-level lists. Returns the node count (tags seen).
    """
    stack: list[str] = []
    content_depth = 0  # nesting count of main/article currently open
    label_stack: list[int] = []  # ids of open labelable tags
    buf_parts: list[str] = []
    buf_len = 0
    buf_tail_space = False
    link_chars = 0
    lspans: list[tuple[int, int]] = []
    kill = 0
    table = 0
    anchor = 0
    n_nodes = 0

    def emit() -> None:
        nonlocal buf_parts, buf_len, buf_tail_space, link_chars, lspans
        t = "".join(buf_parts).rstrip()
        if t:
            seg_text.append(t)
            seg_link.append(link_chars)
            seg_label.append(label_stack[-1] if label_stack else _LBL["paragraph"])
            seg_content.append(content_depth > 0)
            seg_lspans.append([(s, min(e, len(t))) for s, e in lspans if s < len(t)])
        buf_parts = []
        buf_len = 0
        buf_tail_space = False
        link_chars = 0
        lspans = []

    def emit_table_marker() -> None:
        seg_text.append(spec.TABLE_MARKER)
        seg_link.append(0)
        seg_label.append(_TABLE)
        seg_content.append(content_depth > 0)
        seg_lspans.append([])

    # hot-loop locals: global/attr lookups cost ~30% at ~100 tokens/turn
    memo_get = _TAG_MEMO.get
    text_memo = _TEXT_MEMO
    text_memo_get = _TEXT_MEMO.get
    kill_tags, block_tags = spec.KILL_TAGS, spec.BLOCK_TAGS
    collapse_ws, decode_entities = spec.collapse_ws, spec.decode_entities

    # findall (no capture groups → whole matches) avoids 2 Python calls
    # per token vs finditer + group(0)
    for t in spec.TOKEN_RE.findall(text):
        if t[0] == "<":
            if t[1] == "!" and t.startswith("<!--"):
                continue
            n_nodes += 1
            parsed = memo_get(t, _MISS)
            if parsed is _MISS:
                parsed = _parse_tag(t)
            if parsed is None:
                continue
            name, closing, void = parsed
            if kill:
                if name in kill_tags:
                    kill += -1 if closing else (0 if void else 1)
                continue
            if table:
                if name == "table":
                    if closing:
                        table -= 1
                        if table == 0:
                            emit_table_marker()
                            if "table" in stack:
                                stack.remove("table")
                    else:
                        table += 1
                continue
            if name in kill_tags:
                if not closing and not void:
                    if buf_parts:
                        emit()
                    kill = 1
                continue
            if name == "a":
                anchor += -1 if (closing and anchor) else (0 if (closing or void) else 1)
                continue
            if name == "table" and not closing:
                if buf_parts:
                    emit()
                stack.append(name)
                table = 1
                continue
            if name in block_tags:
                if buf_parts:
                    emit()
                if closing:
                    if name in stack:
                        while stack:
                            popped = stack.pop()
                            if popped in spec.CONTENT_TAGS:
                                content_depth -= 1
                            if popped in _LABELABLE:
                                label_stack.pop()
                            if popped == name:
                                break
                elif not void:
                    stack.append(name)
                    if name in spec.CONTENT_TAGS:
                        content_depth += 1
                    if name in _LABELABLE:
                        label_stack.append(_LABELABLE[name])
            continue
        # text node
        if kill or table:
            continue
        start = buf_len
        piece = text_memo_get(t, _MISS)
        if piece is _MISS:
            piece = collapse_ws(decode_entities(t))
            if len(t) <= _TEXT_MEMO_MAXLEN and len(text_memo) < _TEXT_MEMO_CAP:
                text_memo[t] = piece
        if piece:
            if piece == " ":
                if buf_len and not buf_tail_space:
                    buf_parts.append(" ")
                    buf_len += 1
                    buf_tail_space = True
            else:
                if piece[0] == " " and (buf_len == 0 or buf_tail_space):
                    piece = piece.lstrip(" ")
                buf_parts.append(piece)
                buf_len += len(piece)
                buf_tail_space = piece.endswith(" ")
        if anchor and buf_len > start:
            lspans.append((start, buf_len))
            link_chars += buf_len - start

    if table:
        emit_table_marker()
    if buf_parts:
        emit()
    return n_nodes


_PDF_DT = np.dtype([("x", "f8"), ("y", "f8"), ("size", "f8")])


def _word_boxes_row(x, y, sz, contents, order) -> list[tuple]:
    """X2 word boxes for one PDF row, vectorized: join the reading-order
    lines on '\\n', find \\S+ runs with a numpy byte mask (ASCII fast
    path — the regex + per-word Python arithmetic was ~19% of kernel
    time), attribute words to lines via searchsorted, and do the box math
    on whole arrays. Float ops replicate spec.pdf_word_boxes exactly
    (same operations, same order → identical IEEE doubles); non-ASCII
    rows fall back to the per-line leaf helper."""
    ordered = order.tolist()
    lines = [contents[i] for i in ordered]
    joined = "\n".join(lines)
    b = joined.encode("utf-8")
    if len(b) != len(joined):  # non-ASCII: byte offsets != char offsets
        xl, yl, szl = x.tolist(), y.tolist(), sz.tolist()
        boxes = spec.pdf_word_boxes
        words: list[tuple] = []
        for i in ordered:
            words.extend(boxes(xl[i], yl[i], szl[i], contents[i]))
        return words
    arr = np.frombuffer(b, dtype=np.uint8)
    if arr.size == 0:  # all-empty contents (unreachable via detect_kind,
        return []      # which needs >=2 line records — guard direct calls)
    # Python re \S complement over ASCII: \t\n\v\f\r, \x1c-\x1f, space
    ws = ((arr == 32) | ((arr >= 9) & (arr <= 13))
          | ((arr >= 28) & (arr <= 31)))
    nws = ~ws
    prev = np.empty_like(nws)
    prev[0] = False
    prev[1:] = nws[:-1]
    starts = np.flatnonzero(nws & ~prev)
    if starts.size == 0:
        return []
    nxt = np.empty_like(nws)
    nxt[-1] = False
    nxt[:-1] = nws[1:]
    ends = np.flatnonzero(nws & ~nxt) + 1

    n_lines = len(lines)
    line_starts = np.zeros(n_lines, dtype=np.int64)
    lens_l = np.fromiter((len(ln) for ln in lines), dtype=np.int64,
                         count=n_lines)
    if n_lines > 1:
        np.cumsum(lens_l[:-1] + 1, out=line_starts[1:])
    li = np.searchsorted(line_starts, starts, side="right") - 1

    szo = sz[order]
    adv_l = spec.PDF_CHAR_ADVANCE * np.where(szo > 0, szo, 1.0)
    adv_w = adv_l[li]
    x0 = x[order][li] + (starts - line_starts[li]) * adv_w
    x1 = x0 + (ends - starts) * adv_w
    y0 = y[order][li]
    y1 = y0 + szo[li]
    texts = [joined[s:e] for s, e in zip(starts.tolist(), ends.tolist())]
    return list(zip(texts, x0.tolist(), y0.tolist(), x1.tolist(), y1.tolist()))


def _extract_pdf_rows(texts: list[str]) -> list[tuple[str, list, int, list, list]]:
    """PDF-layout rows: parse line records, numpy reading-order + block
    segmentation (vectorized gap/column-break tests), per-block merge,
    X2 word boxes (reading order), X3 table cell grids.
    """
    out = []
    line_match = spec.PDF_LINE_RE.match
    for text in texts:
        recs = []
        for line in text.split("\n"):
            m = line_match(line)
            if m:
                recs.append(m.groups())  # one call for all 5 groups
        n = len(recs)
        if n == 0:
            out.append(("", [], 0, [], []))
            continue
        fonts = [r[3] for r in recs]
        contents = [r[4] for r in recs]
        x = np.array([r[0] for r in recs], dtype=np.float64)
        y = np.array([r[1] for r in recs], dtype=np.float64)
        sz = np.array([r[2] for r in recs], dtype=np.float64)
        order = np.lexsort((np.arange(n), x, y))  # stable (y, x, idx)
        xo, yo, so = x[order], y[order], sz[order]
        words = _word_boxes_row(x, y, sz, contents, order)
        prev_sz = np.where(so[:-1] > 0, so[:-1], 1.0)
        brk = ((yo[1:] - yo[:-1]) > spec.PDF_Y_GAP_FACTOR * prev_sz) | (
            np.abs(xo[1:] - xo[:-1]) > spec.PDF_X_JUMP
        )
        # blocks are contiguous runs in reading order → slice bounds, not
        # per-block boolean masks (those cost O(blocks × lines))
        bounds = np.concatenate(([0], np.flatnonzero(brk) + 1, [n]))
        median = float(np.sort(sz)[(n - 1) // 2])
        heading_cut = spec.PDF_HEADING_FACTOR * median

        parts: list[str] = []
        spans: list[tuple[int, int, str]] = []
        tables: list[list[list[str]]] = []
        off = 0
        for b in range(len(bounds) - 1):
            sl = slice(bounds[b], bounds[b + 1])
            idxs = order[sl]
            btexts = [contents[i] for i in idxs]
            n_pipe = sum(1 for t in btexts if "|" in t)
            if n_pipe >= 2:
                label, btxt = "table", spec.TABLE_MARKER
                tables.append(spec.pdf_table_cells(btexts))
            elif any("Math" in fonts[i] for i in idxs):
                # X5 marker + content ('[FORMULA] $latex$', reference format)
                label, btxt = "formula", spec.formula_block_text(spec.merge_pdf_lines(btexts))
            else:
                btxt = spec.merge_pdf_lines(btexts)
                if median > 0 and float(so[sl].max()) >= heading_cut:
                    label = "heading"
                elif any("Mono" in fonts[i] for i in idxs):
                    label = "code"
                else:
                    label = "paragraph"
            if not btxt:
                continue
            if parts:
                off += 1
            parts.append(btxt)
            spans.append((off, off + len(btxt), label))
            off += len(btxt)
        out.append(("\n".join(parts), spans, n, words, tables))
    return out


def extract_batch(texts) -> dict:
    """Extract a whole batch of turn texts.

    ``texts``: sequence of str|None. Returns dict of equal-length lists:
    clean_text, spans (list of (start,end,label)), n_nodes, n_spans,
    n_bytes, kind.
    """
    n_rows = len(texts)
    raw = [spec.sanitize_utf8(t) if t else "" for t in texts]
    n_bytes = [len(t.encode("utf-8")) for t in raw]
    kinds = [spec.detect_kind(t) for t in raw]
    norm = [spec.nfc(t) for t in raw]

    clean = [""] * n_rows
    spans: list[list] = [[] for _ in range(n_rows)]
    n_nodes = [0] * n_rows
    words: list[list] = [[] for _ in range(n_rows)]  # X2 (PDF rows only)
    tables: list[list] = [[] for _ in range(n_rows)]  # X3 (PDF rows only)

    # ---- HTML rows: flat segment arrays + numpy keep mask
    html_rows = [i for i in range(n_rows) if kinds[i] == "html"]
    if html_rows:
        seg_row: list[int] = []
        seg_text: list[str] = []
        seg_link: list[int] = []
        seg_label: list[int] = []
        seg_content: list[bool] = []
        seg_lspans: list[list] = []
        for i in html_rows:
            before = len(seg_text)
            n_nodes[i] = _tokenize_html(
                norm[i], seg_text, seg_link, seg_label, seg_content, seg_lspans
            )
            seg_row.extend([i] * (len(seg_text) - before))
        if seg_text:
            lens = np.fromiter((len(t) for t in seg_text), dtype=np.int64)
            links = np.asarray(seg_link, dtype=np.float64)
            labels = np.asarray(seg_label, dtype=np.int64)
            content = np.asarray(seg_content, dtype=bool)
            ld_ok = (links / lens) <= spec.MAX_LINK_DENSITY
            keep = (
                (labels == _TABLE)
                | content
                | ((labels == _HEADING) & ld_ok)
                | ((lens >= spec.MIN_BLOCK_CHARS) & ld_ok)
            )
            for k in np.flatnonzero(keep):
                i = seg_row[k]
                t = seg_text[k]
                off = len(clean[i]) + 1 if clean[i] else 0
                clean[i] = clean[i] + "\n" + t if clean[i] else t
                spans[i].append((off, off + len(t), LABELS[labels[k]]))
                for s, e in seg_lspans[k]:
                    if e > s:
                        spans[i].append((off + s, off + e, "link"))

    # ---- PDF rows
    pdf_rows = [i for i in range(n_rows) if kinds[i] == "pdf"]
    if pdf_rows:
        for i, (ctext, sp, nn, wd, tb) in zip(
            pdf_rows, _extract_pdf_rows([norm[i] for i in pdf_rows])
        ):
            clean[i], spans[i], n_nodes[i] = ctext, sp, nn
            words[i], tables[i] = wd, tb

    # ---- plain rows
    for i in range(n_rows):
        if kinds[i] != "plain":
            continue
        lines = norm[i].split("\n")
        n_nodes[i] = len(lines)
        kept = []
        for line in lines:
            s = spec.collapse_ws(line).strip()
            if s and not spec.NOISE_LINE_RE.match(s) and spec.WORDCHAR_RE.search(s):
                kept.append(s)
        c = "\n".join(kept)
        clean[i] = c
        spans[i] = [(0, len(c), "body")] if c else []

    return {
        "clean_text": clean,
        "spans": spans,
        "words": words,
        "tables": tables,
        "n_nodes": n_nodes,
        "n_spans": [len(s) for s in spans],
        "n_bytes": n_bytes,
        "kind": kinds,
    }


def extract_batch_flat(texts) -> dict:
    """extract_batch + spans flattened to Arrow-ready buffers:
    span_offsets (len n_rows+1, int32), span_starts/span_ends (int32),
    span_labels (list[str]) — lets the operator build the list<struct>
    column with pa.ListArray.from_arrays instead of a Python dict loop
    (the dict path was ~10x slower per batch)."""
    res = extract_batch(texts)
    spans = res["spans"]
    offsets = np.zeros(len(spans) + 1, dtype=np.int32)
    np.cumsum(res["n_spans"], out=offsets[1:])
    total = int(offsets[-1])
    starts = np.empty(total, dtype=np.int32)
    ends = np.empty(total, dtype=np.int32)
    labels: list[str] = []
    k = 0
    for row in spans:
        for s, e, lb in row:
            starts[k] = s
            ends[k] = e
            labels.append(lb)
            k += 1
    res["span_offsets"] = offsets
    res["span_starts"] = starts
    res["span_ends"] = ends
    res["span_labels"] = labels

    # words flattened the same way (flat buffers → ListArray.from_arrays;
    # the per-row dict path was ~10x slower for spans and words are denser)
    wrows = res["words"]
    w_counts = [len(w) for w in wrows]
    w_offsets = np.zeros(len(wrows) + 1, dtype=np.int32)
    np.cumsum(w_counts, out=w_offsets[1:])
    w_total = int(w_offsets[-1])
    wx0 = np.empty(w_total, dtype=np.float64)
    wy0 = np.empty(w_total, dtype=np.float64)
    wx1 = np.empty(w_total, dtype=np.float64)
    wy1 = np.empty(w_total, dtype=np.float64)
    w_texts: list[str] = []
    k = 0
    for row in wrows:
        for w, x0, y0, x1, y1 in row:
            w_texts.append(w)
            wx0[k] = x0
            wy0[k] = y0
            wx1[k] = x1
            wy1[k] = y1
            k += 1
    res["word_offsets"] = w_offsets
    res["word_texts"] = w_texts
    res["word_x0"] = wx0
    res["word_y0"] = wy0
    res["word_x1"] = wx1
    res["word_y1"] = wy1
    return res
