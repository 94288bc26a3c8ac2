"""Golden ⟷ vectorized equality — the per-turn text-equality oracle
(north rule; plays the role of the reference's pandas-golden reconciliation,
tests/reconciliation/README.md + scripts/reconciliation/phase_b_diff.py)."""

from __future__ import annotations

import random
import string

import pytest

from deepseek_ocr_vllm_spark.extraction import golden, spec, vectorized


def _golden_tuple(t):
    g = golden.extract_turn(t)
    return (
        g["clean_text"],
        [(d["start"], d["end"], d["label"]) for d in g["spans"]],
        g["n_nodes"],
        g["n_spans"],
        g["n_bytes"],
        g["kind"],
        [(d["text"], d["x0"], d["y0"], d["x1"], d["y1"]) for d in g["words"]],
        g["tables"],
    )


def _assert_batch_equals_golden(texts):
    res = vectorized.extract_batch(texts)
    for i, t in enumerate(texts):
        ct, sp, nn, ns, nb, kd, wd, tb = _golden_tuple(t)
        assert res["clean_text"][i] == ct, f"row {i}: clean_text mismatch"
        assert [(s, e, l) for s, e, l in res["spans"][i]] == sp, f"row {i}: spans"
        assert res["n_nodes"][i] == nn
        assert res["n_spans"][i] == ns
        assert res["n_bytes"][i] == nb
        assert res["kind"][i] == kd
        assert [tuple(w) for w in res["words"][i]] == wd, f"row {i}: words"
        assert res["tables"][i] == tb, f"row {i}: tables"


def test_fixture_corpus_equality(transcripts_pdf):
    _assert_batch_equals_golden(transcripts_pdf["text"].tolist())


def test_adversarial_equality():
    rng = random.Random(7)
    frag = [
        "<p>", "</p>", "<div>", "</div>", "<main>", "</main>", "<article>",
        "</article>", "<table>", "</table>", "<tr>", "<td>", "</td>",
        "<a href='x'>", "</a>", "<a>", "<script>", "</script>", "<nav>",
        "</nav>", "<br>", "<br/>", "<hr>", "<li>", "</li>", "<ul>", "</ul>",
        "<h1>", "</h1>", "<pre>", "</pre>", "<!-- c -->", "<!doctype html>",
        "<span>", "</span>", "<td/>", "<table/>", "<script/>", "&amp;",
        "&nbsp;", "text here ", "  spaced   out  ", "word", "\n", "\t",
        "ünïcödé", "a|b|c",
    ]
    pdf_frag = [
        "72,40,10,Serif|hello world", "10,20,0,|empty size", "badline",
        "1,2,3,Mono|x = 1", "5.5,6.6,7.7,Serif-Bold|big title",
        "8,9,10,CMU-Math|e^x + 1", "8,20,10,Math|a|b formula with pipe",
        "-1,-2,3,F|neg", "72,41,10,Serif|wrap-", "1,2,3,|a | b | c",
    ]
    cases = []
    for _ in range(1500):
        k = rng.random()
        if k < 0.5:
            cases.append("".join(rng.choice(frag) for _ in range(rng.randint(1, 40))))
        elif k < 0.8:
            cases.append("\n".join(rng.choice(pdf_frag) for _ in range(rng.randint(1, 12))))
        else:
            cases.append("".join(rng.choice(string.printable) for _ in range(rng.randint(0, 200))))
    cases += [
        "", None, "<", ">", "<>", "</>", "<p", "a<b>c",
        "<table><table></table></table>x", "<main><table></main>",
        "<script><p>hidden</p>", "<a><a>ll</a></a></a>",
        "<td>orphan cell</td>", "72,40,10,Serif|only one pdf line",
    ]
    _assert_batch_equals_golden(cases)


def test_span_roundtrip_invariant(transcripts_pdf):
    """start inclusive / end exclusive; clean_text[start:end] round-trips
    (PREANNOTATION_SCHEMA.md:9-12, F21 end-exclusive)."""
    texts = transcripts_pdf["text"].tolist()[:500]
    res = vectorized.extract_batch(texts)
    for i in range(len(texts)):
        ct = res["clean_text"][i]
        for s, e, label in res["spans"][i]:
            assert 0 <= s <= e <= len(ct)
            if label == "table":
                assert ct[s:e] == spec.TABLE_MARKER


def test_boilerplate_actually_stripped():
    html = (
        "<html><head><script>x</script></head><body>"
        "<nav><a href='/'>HomeNavLink</a></nav>"
        "<main><p>This is the real main content of the page body here.</p></main>"
        "<footer><p>CopyrightFooterBoilerplate notice text here okay</p></footer>"
        "</body></html>"
    )
    g = golden.extract_turn(html)
    assert "real main content" in g["clean_text"]
    assert "HomeNavLink" not in g["clean_text"]
    assert "Footer" not in g["clean_text"]


def test_link_density_gate():
    farm = "<div>" + " ".join(f"<a href='/{i}'>link text {i}</a>" for i in range(8)) + "</div>"
    kept = "<div>" + "plain words " * 10 + "</div>"
    g = golden.extract_turn("<html><body>" + farm + kept + "</body></html>")
    assert "link text" not in g["clean_text"]
    assert "plain words" in g["clean_text"]


def test_table_marker_and_unclosed_table():
    g = golden.extract_turn("<main><p>before table text</p><table><tr><td>a</td></tr></table></main>")
    assert spec.TABLE_MARKER in g["clean_text"]
    assert "a" not in g["clean_text"].replace(spec.TABLE_MARKER, "").split()
    g2 = golden.extract_turn("<main><table><tr><td>x</td>")
    assert g2["clean_text"] == spec.TABLE_MARKER


def test_pdf_reading_order_and_hyphen_merge():
    # shuffled arrival order; y sort must restore reading order
    payload = "\n".join(
        [
            "72,100,10,Serif|second para line one",
            "72,40,20,Serif-Bold|Big Title",
            "72,112,10,Serif|line two wraps-",
            "72,124,10,Serif|here cleanly",
        ]
    )
    g = golden.extract_turn(payload)
    blocks = g["clean_text"].split("\n")
    assert blocks[0] == "Big Title"
    assert "wrapshere" in g["clean_text"]
    assert g["spans"][0]["label"] == "heading"


def test_pdf_table_and_code_labels():
    payload = "\n".join(
        [
            "72,40,10,Serif|a | b | c",
            "72,51,10,Serif|d | e | f",
            "72,140,9,Mono|x = 1",
            "72,240,9,CMU-Math|E = mc^2",
        ]
    )
    g = golden.extract_turn(payload)
    labels = [s["label"] for s in g["spans"]]
    assert "table" in labels and "code" in labels and "formula" in labels
    assert spec.TABLE_MARKER in g["clean_text"]
    # formula content is KEPT after the marker, $-delimited (reference
    # format '[FORMULA] $latex$', docling_granite_python/1/model.py:51)
    assert spec.FORMULA_MARKER + " $E = mc^2$" in g["clean_text"]


def test_plain_noise_strip_and_nfc():
    import unicodedata

    nfd = unicodedata.normalize("NFD", "café résumé")
    text = "\n".join(["Processing image 1/3 ...", "---", nfd, "## OCR Output", "🚢🌊", "real line"])
    g = golden.extract_turn(text)
    assert g["clean_text"] == unicodedata.normalize("NFC", nfd) + "\nreal line"
    assert g["kind"] == "plain"


def test_empty_and_null():
    for t in ["", None, "   \n  "]:
        g = golden.extract_turn(t)
        assert g["clean_text"] == ""
        assert g["spans"] == []


@pytest.mark.parametrize(
    "text,kind",
    [
        ("<p>x</p>", "html"),
        ("1,2,3,F|a\n4,5,6,F|b", "pdf"),
        ("just words", "plain"),
        ("1,2,3,F|only one line", "plain"),
    ],
)
def test_detect_kind(text, kind):
    assert spec.detect_kind(text) == kind


def test_pdf_word_boxes_and_table_cells_contract():
    """X2/X3: word boxes carry the pdfplumber contract (text,x0,y0,x1,y1,
    reading order, fixed-advance model) and table blocks emit their cell
    grid alongside the [TABLE] marker in clean_text."""
    payload = (
        "72,40,10,Serif|alpha beta\n"
        "72,100,9,Serif|h1 | h2 | h3\n"
        "72,111,9,Serif|v1 | v2 | v3\n"
    )
    g = golden.extract_turn(payload)
    assert g["kind"] == "pdf"
    # word boxes: reading order, advance = 0.6 * size
    w0 = g["words"][0]
    assert w0 == {"text": "alpha", "x0": 72.0, "y0": 40.0,
                  "x1": 72.0 + 5 * 6.0, "y1": 50.0}
    w1 = g["words"][1]  # 'beta' starts at char offset 6
    assert w1["text"] == "beta" and w1["x0"] == 72.0 + 6 * 6.0
    assert [w["text"] for w in g["words"]] == [
        "alpha", "beta", "h1", "|", "h2", "|", "h3", "v1", "|", "v2", "|", "v3",
    ]
    # table cells: rows x cells, stripped; marker still in clean_text
    assert g["tables"] == [[["h1", "h2", "h3"], ["v1", "v2", "v3"]]]
    assert spec.TABLE_MARKER in g["clean_text"]
    # vectorized path emits the identical values
    v = vectorized.extract_batch([payload])
    assert [tuple(w) for w in v["words"][0]] == [
        (d["text"], d["x0"], d["y0"], d["x1"], d["y1"]) for d in g["words"]
    ]
    assert v["tables"][0] == g["tables"]
    # html/plain rows carry empty layout columns
    h = golden.extract_turn("<main><p>hello world of text</p></main>")
    assert h["words"] == [] and h["tables"] == []


def test_pdf_word_boxes_non_ascii_fallback():
    """Non-ASCII PDF content takes the per-line fallback (byte offsets !=
    char offsets) — still identical to golden."""
    payload = (
        "72,40,10,Serif|café résumé naïve\n"
        "72,52,10,Serif|plain ascii words here\n"
    )
    _assert_batch_equals_golden([payload])
    g = golden.extract_turn(payload)
    assert g["words"][0]["text"] == "café"
