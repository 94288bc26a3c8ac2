"""Real %PDF- wire-format parsing (extraction/pdfbytes.py) and its
binary-scan wiring — the round-2 "first gap a real user hits": a genuine
PDF binary must extract through the UNCHANGED layout pipeline."""

from __future__ import annotations

import zlib

from deepseek_ocr_vllm_spark.extraction import golden
from deepseek_ocr_vllm_spark.extraction.pdfbytes import (
    pdf_bytes_to_layout_records)


def _obj(n: int, body: bytes) -> bytes:
    return f"{n} 0 obj\n".encode() + body + b"\nendobj\n"


def _page(num: int, contents: int, parent: int = 2,
          fonts: bytes = b"/F1 50 0 R /F2 51 0 R /F3 52 0 R") -> bytes:
    return _obj(num, (
        b"<< /Type /Page /Parent " + str(parent).encode()
        + b" 0 R /MediaBox [0 0 612 792] /Contents "
        + str(contents).encode() + b" 0 R /Resources << /Font << "
        + fonts + b" >> >> >>"
    ))


def _content(num: int, ops: bytes, compress: bool = True) -> bytes:
    stream = zlib.compress(ops) if compress else ops
    filt = b" /Filter /FlateDecode" if compress else b""
    return _obj(num, (
        b"<< /Length " + str(len(stream)).encode() + filt
        + b" >>\nstream\n" + stream + b"\nendstream"
    ))


_FONT_OBJS = (
    _obj(50, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    + _obj(51, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    + _obj(52, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier-Mono >>")
)


def _mk_pdf(pages: list[bytes], compress: bool = True) -> bytes:
    kids = b" ".join(f"{10 + i} 0 R".encode() for i in range(len(pages)))
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    pdf += _obj(2, b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                + str(len(pages)).encode() + b" >>")
    for i, ops in enumerate(pages):
        pdf += _page(10 + i, 30 + i)
        pdf += _content(30 + i, ops, compress=compress)
    pdf += _FONT_OBJS
    pdf += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return pdf


_PAGE1_OPS = b"""BT
/F2 20 Tf 72 720 Td (Annual Vessel Report) Tj
/F1 10 Tf 0 -40 Td (The quick brown fox jumps) Tj
0 -12 TD (over the lazy harbour dog.) Tj
T* [(kerned) -250 (words) 10 (kept)] TJ
/F3 9 Tf 1 0 0 1 72 600 Tm (x = load\\(manifest\\)) Tj
ET"""


def test_real_pdf_extracts_through_layout_pipeline():
    recs = pdf_bytes_to_layout_records(_mk_pdf([_PAGE1_OPS]))
    g = golden.extract_turn(recs)
    assert g["kind"] == "pdf"
    labels = [s["label"] for s in g["spans"]]
    # 20pt bold → heading; 10pt body merges its Td/TD/T*/TJ lines; Courier
    # (Mono) → code — font names flowed from /BaseFont through the records
    assert labels == ["heading", "paragraph", "code"]
    blocks = g["clean_text"].split("\n")
    assert blocks[0] == "Annual Vessel Report"
    assert blocks[1] == ("The quick brown fox jumps over the lazy harbour "
                         "dog. kerned wordskept")
    assert blocks[2] == "x = load(manifest)"
    assert len(g["words"]) > 10  # X2 word boxes ride along


def test_pdf_uncompressed_hex_octal_and_multipage():
    ops2 = b"""BT
/F1 10 Tf 72 700 Td <48656c6c6f20686578> Tj
0 -12 Td (octal \\110\\111 pair) Tj
ET"""
    pdf = _mk_pdf([_PAGE1_OPS, ops2], compress=False)
    recs = pdf_bytes_to_layout_records(pdf)
    g = golden.extract_turn(recs)
    assert "Hello hex" in g["clean_text"]
    assert "octal HI pair" in g["clean_text"]
    # page 2 lands BELOW page 1 in reading order (y shifted by page height)
    assert g["clean_text"].index("Annual") < g["clean_text"].index("Hello hex")


def test_filter_array_form_and_length_delimited_streams():
    """ADVICE r3: '/Filter [/FlateDecode]' (array form) must inflate, and a
    declared direct /Length must delimit stream bytes so 'endstream' /
    'endobj' byte sequences INSIDE the deflate data don't truncate the
    object (the sequential-scan silent-loss mode)."""
    # craft ops whose compressed bytes contain both marker strings: stuff
    # them into a comment (ignored by the tokenizer) UNCOMPRESSED payload
    ops = (b"BT /F1 10 Tf 72 700 Td (array filter ok) Tj ET\n"
           b"% endstream endobj padding to defeat naive scans")
    stream = zlib.compress(ops, 0)  # level 0: stored blocks keep raw bytes
    assert b"endstream" in stream and b"endobj" in stream
    content = _obj(30, (
        b"<< /Length " + str(len(stream)).encode()
        + b" /Filter [ /FlateDecode ] >>\nstream\n" + stream + b"\nendstream"
    ))
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + _page(10, 30) + content + _FONT_OBJS
           + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    g = golden.extract_turn(pdf_bytes_to_layout_records(pdf))
    assert "array filter ok" in g["clean_text"]


def test_stale_short_length_falls_back_to_regex_scan():
    """A stale /Length smaller than the real stream (incremental update)
    inflates the PREFIX without a zlib error — the parser must detect the
    missing deflate end-of-stream marker and fall back to the
    endstream-delimited candidate instead of silently truncating."""
    ops = b"BT /F1 10 Tf 72 700 Td (full text survives) Tj ET"
    stream = zlib.compress(ops)
    content = _obj(30, (
        b"<< /Length " + str(len(stream) // 2).encode()  # stale-short
        + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream"
    ))
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + _page(10, 30) + content + _FONT_OBJS
           + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    g = golden.extract_turn(pdf_bytes_to_layout_records(pdf))
    assert "full text survives" in g["clean_text"]


def test_stale_short_length_with_instream_endobj_bytes():
    """review r5: a stale-SHORT /Length whose DEFLATE DATA contains the
    bytes 'endobj' past the declared extent must not truncate the object
    at the in-stream marker (the r4 over-declared fix regressed this
    path) — the scan closes at the first real 'endstream…endobj'
    ADJACENCY instead."""
    ops = (b"BT /F1 10 Tf 72 700 Td (stale short with markers) Tj ET\n"
           b"% endobj endobj padding that is NOT the real object end")
    stream = zlib.compress(ops, 0)  # stored blocks keep the marker bytes
    assert b"endobj" in stream
    content = _obj(30, (
        b"<< /Length " + str(len(stream) // 4).encode()  # stale-short
        + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream"
    ))
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + _page(10, 30) + content + _FONT_OBJS
           + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    g = golden.extract_turn(pdf_bytes_to_layout_records(pdf))
    assert "stale short with markers" in g["clean_text"]


def test_overdeclared_length_does_not_absorb_later_objects():
    """ADVICE r4: a corrupt OVER-declared /Length that still fits in the
    file used to jump past a LATER object's endobj, silently absorbing the
    page/font objects in between. The declared extent is only trusted when
    the bytes there actually read 'endstream…endobj'; otherwise the scan
    falls back to the first-endobj candidate and the later objects
    survive."""
    ops = b"BT /F1 10 Tf 72 700 Td (later objects survive) Tj ET"
    stream = zlib.compress(ops)
    content = _obj(30, (
        b"<< /Length " + str(len(stream) + 120).encode()  # overshoots
        + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream"
    ))
    # the page + font objects come AFTER the corrupt stream object, inside
    # the over-declared extent
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + content + _page(10, 30) + _FONT_OBJS
           + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    g = golden.extract_turn(pdf_bytes_to_layout_records(pdf))
    assert "later objects survive" in g["clean_text"]


def test_missing_endobj_does_not_swallow_later_objects():
    """One truncated object (no endobj — e.g. a cut-off download) must not
    consume the NEXT object: the scan closes the broken dict at the next
    object header. The broken object sits IMMEDIATELY before the page
    object, so absorption would lose the page's text entirely (the first
    version of this fix only fired when no endobj existed anywhere later —
    the mid-file case is the common one)."""
    broken = b"99 0 obj\n<< /Type /Junk >>\n"  # no endobj
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + broken
           + _page(10, 30) + _content(30, _PAGE1_OPS) + _FONT_OBJS
           + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    g = golden.extract_turn(pdf_bytes_to_layout_records(pdf))
    assert "Annual Vessel Report" in g["clean_text"]


def test_corrupt_bfrange_never_emits_surrogates():
    """A hostile/corrupt ToUnicode bfrange mapping into U+D800-DFFF must
    not leak lone surrogates into the records — they survive Python str
    but CRASH at the Arrow/utf-8 boundary of the Spark task."""
    cmap = zlib.compress(
        b"begincmap beginbfrange <41> <43> <D7FF> endbfrange endcmap")
    font = (_obj(60, b"<< /Length " + str(len(cmap)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + cmap
                + b"\nendstream")
            + _obj(50, b"<< /Type /Font /Subtype /Type1 /BaseFont /X"
                       b" /ToUnicode 60 0 R >>"))
    ops = b"BT /F1 10 Tf 72 700 Td (ABC) Tj ET"
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + _page(10, 30, fonts=b"/F1 50 0 R") + _content(30, ops) + font
           + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    recs = pdf_bytes_to_layout_records(pdf)
    assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in recs)
    recs.encode("utf-8")  # must not raise (the Arrow boundary check)


def test_truncated_mid_stream_recovers_prefix():
    """A file cut off INSIDE a flate content stream (no end-of-stream
    marker, no endstream) must still yield the inflatable prefix — total
    loss only when nothing inflates at all."""
    ops = (b"BT /F1 10 Tf 72 700 Td (recoverable text here) Tj T*\n"
           + b"(filler line) Tj T*\n" * 50 + b"ET")
    stream = zlib.compress(ops)
    body = (b"<< /Length " + str(len(stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + stream)
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + _page(10, 30) + b"30 0 obj\n" + body + _FONT_OBJS)
    pdf = pdf[:pdf.find(b"stream\n") + 7 + len(stream) - 8]  # cut the tail
    g = golden.extract_turn(pdf_bytes_to_layout_records(pdf))
    assert "recoverable text here" in g["clean_text"]


def test_corrupt_bytes_never_raise():
    """The X1 hot path meets damaged PDFs at corpus scale — the parser
    must degrade (partial/empty records), never throw out of the Spark
    task. Covers the targeted crash shapes (garbage ObjStm header tokens,
    bfrange past Unicode, non-numeric MediaBox) plus a seeded random
    corruption sweep over a valid document."""
    import random

    def obj(n, body):
        return f"{n} 0 obj\n".encode() + body + b"\nendobj\n"

    g = zlib.compress(b"aa bb cc dd rest of stream")
    objstm_garbage = obj(5, b"<< /Type /ObjStm /N 2 /First 11 /Length "
                            + str(len(g)).encode()
                            + b" /Filter /FlateDecode >>\nstream\n" + g
                            + b"\nendstream")
    cmap = zlib.compress(
        b"beginbfrange <0001> <ffff> <10FFF0> endbfrange")
    bad_range = (obj(7, b"<< /Length " + str(len(cmap)).encode()
                     + b" /Filter /FlateDecode >>\nstream\n" + cmap
                     + b"\nendstream")
                 + obj(8, b"<< /Type /Font /Subtype /Type0 /BaseFont /X"
                          b" /ToUnicode 7 0 R >>"))
    bad_box = obj(10, b"<< /Type /Page /MediaBox [ . - .. - ]"
                      b" /Contents 30 0 R >>")
    for payload in (objstm_garbage, bad_range, bad_box):
        assert pdf_bytes_to_layout_records(b"%PDF-1.4\n" + payload) is not None

    base = _mk_pdf([_PAGE1_OPS, _PAGE1_OPS])
    rng = random.Random(7)
    for _ in range(300):
        b = bytearray(base)
        mode = rng.randrange(3)
        if mode == 0:
            for _ in range(rng.randrange(1, 30)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif mode == 1:
            i = rng.randrange(len(b))
            del b[i:min(len(b), i + rng.randrange(1, 400))]
        else:
            del b[rng.randrange(1, len(b)):]
        data = bytes(b)
        if not data.startswith(b"%PDF-"):
            data = b"%PDF-" + data
        pdf_bytes_to_layout_records(data)  # must not raise


def test_non_pdf_bytes_fall_back():
    assert pdf_bytes_to_layout_records(b"just some text") is None
    # PDF magic but no parsable pages → empty records, not a crash
    assert pdf_bytes_to_layout_records(b"%PDF-1.4\ngarbage") == ""


def test_binary_scan_extracts_real_pdf(spark, tmp_path):
    """S1→X1 with REAL bytes: binaryFile scan → wire-format parse →
    mapInArrow extractor, plus the UTF-8 fallback for text payloads."""
    from deepseek_ocr_vllm_spark.sources.binary_docs import extract_binary_docs

    d = tmp_path / "docs"
    d.mkdir()
    (d / "real.pdf").write_bytes(_mk_pdf([_PAGE1_OPS]))
    (d / "textenc.pdf").write_text(
        "72,40,20,Serif-Bold|Plain Title\n72,100,10,Serif|body line here"
    )
    rows = {r.path.rsplit("/", 1)[-1]: r
            for r in extract_binary_docs(spark, str(d)).collect()}
    assert rows["real.pdf"].clean_text.startswith("Annual Vessel Report")
    assert rows["real.pdf"].kind == "pdf"
    assert rows["textenc.pdf"].clean_text.startswith("Plain Title")


def test_width_table_parsers():
    """VERDICT r3 #7: /FirstChar+/Widths (direct and via indirect ref) and
    CID /W (both the ``c [w...]`` and ``c1 c2 w`` entry forms) + /DW."""
    from deepseek_ocr_vllm_spark.extraction.pdfbytes import (
        parse_cid_widths, parse_simple_widths)

    fb = b"<< /Type /Font /FirstChar 32 /Widths [ 250 333 500.5 ] >>"
    assert parse_simple_widths(fb, {}) == {32: 250.0, 33: 333.0, 34: 500.5}
    fb_ref = b"<< /Type /Font /FirstChar 65 /Widths 7 0 R >>"
    objs = {7: b"[600 700]"}
    assert parse_simple_widths(fb_ref, objs) == {65: 600.0, 66: 700.0}
    assert parse_simple_widths(b"<< /Type /Font >>", {}) is None

    desc = b"<< /Subtype /CIDFontType2 /DW 800 /W [ 1 [500 600] 10 12 450 ] >>"
    widths, dw = parse_cid_widths(desc)
    assert dw == 800.0
    assert widths == {1: 500.0, 2: 600.0, 10: 450.0, 11: 450.0, 12: 450.0}


def test_widths_drive_cursor_advance():
    """Consecutive Tj ops with NO repositioning between them must land at
    real width-table advances: same word when glyphs abut, a word gap when
    the PDF leaves space-width room (the pre-r4 parser left the cursor
    still and could only guess)."""
    ops = (b"BT /F1 10 Tf 72 700 Td (AB) Tj (CD) Tj ET\n"
           b"BT /F1 10 Tf 72 650 Td (AB) Tj 15 0 Td (EF) Tj ET")
    font = _obj(50, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                    b" /FirstChar 65 /Widths [500 500 500 500 500 500] >>")
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
           + _obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
           + _page(10, 30, fonts=b"/F1 50 0 R") + _content(30, ops)
           + font + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    recs = pdf_bytes_to_layout_records(pdf)
    # AB at 72 advances 2x500/1000x10 = 10pt; CD shows at the cursor -> one
    # word. Second line: 15pt jump from 72 with run end at 82 -> 5pt gap
    # (0.3-2.5 em at 10pt) -> word gap.
    lines = [r.split("|", 1)[1] for r in recs.split("\n")]
    assert lines == ["ABCD", "AB EF"]


import os

import pytest

# third-party PDFs we did NOT author — the strongest wire-format evidence
_REF_PDF = "/root/reference/workers/vessel-ner/test-vessel-registry.pdf"
_SYS_PDF = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"


@pytest.mark.skipif(not os.path.exists(_REF_PDF), reason="reference tree absent")
def test_reference_vessel_registry_pdf():
    g = golden.extract_turn(
        pdf_bytes_to_layout_records(open(_REF_PDF, "rb").read()))
    assert g["kind"] == "pdf"
    assert "MV Test Ship" in g["clean_text"]
    assert "IMO: 1234567" in g["clean_text"]


@pytest.mark.skipif(not os.path.exists(_SYS_PDF), reason="system doc absent")
def test_objstm_docbook_pdf():
    """PDF 1.5 compressed object streams: a 140 KB fop-generated spec PDF
    must yield full text through the ObjStm expansion path."""
    recs = pdf_bytes_to_layout_records(open(_SYS_PDF, "rb").read())
    assert recs and recs.count("\n") > 500
    g = golden.extract_turn(recs)
    assert "Shared MIME-info Database" in g["clean_text"]
    assert len(g["clean_text"]) > 20000


_TEX_PDF = "/usr/share/doc/libtasn1-doc/libtasn1.pdf"


@pytest.mark.skipif(not os.path.exists(_TEX_PDF), reason="system doc absent")
def test_pdftex_manual_pdf():
    """Fourth third-party generator family: a 263 KB pdfTeX manual
    (Type1 subset fonts, per-glyph kerning TJ arrays). Full text must
    come out coherent with real word spacing."""
    recs = pdf_bytes_to_layout_records(open(_TEX_PDF, "rb").read())
    assert recs and recs.count("\n") > 2000
    g = golden.extract_turn(recs)
    assert "Abstract Syntax Notation One (ASN.1) library" in g["clean_text"]
    assert "This manual is for GNU Libtasn1" in g["clean_text"]
    assert len(g["clean_text"]) > 50000


_SEAFO_PDF = ("/root/reference/data/raw/vessels/RFMO/raw/"
              "SEAFO_vessels_2025-08-26.pdf")


@pytest.mark.skipif(not os.path.exists(_SEAFO_PDF), reason="reference absent")
def test_tounicode_subset_font_pdf():
    """Subset fonts remap glyph codes (Caesar-shifted garbage without the
    /ToUnicode CMap): the reference's real SEAFO vessel list must decode
    to readable vessel names. Since r4 the CID /W width tables drive the
    advance (VERDICT r3 #7), so assertions are LAYOUT-exact: multi-word
    vessel names carry real spaces and whole table lines are stable."""
    recs = pdf_bytes_to_layout_records(open(_SEAFO_PDF, "rb").read())
    g = golden.extract_turn(recs)
    lines = g["clean_text"].split("\n")
    # word spacing from the real width table, not estimation
    assert "6 Ibsa Quinto" in lines
    assert "4 King Kauluma 1 Namibia" in lines
    assert "2 Daito Maru No.8 Japan" in lines
    assert ("Vessel Name Flag State Radio Call Sign IMO Gear Length(m) "
            "Gross Tonnage") in lines
    # stable per-line word counts for every vessel row (id + name + flag)
    row6 = lines[lines.index("6 Ibsa Quinto")]
    assert len(row6.split()) == 3
    assert len(g["words"]) == 97
