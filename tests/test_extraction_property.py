"""Property-based equality: hypothesis-generated payloads through both
extractor implementations (the golden/vectorized pair must agree on ANY
string, not just the fixture distribution)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_vllm_spark.extraction import golden, vectorized

TAGS = [
    "<p>", "</p>", "<div>", "</div>", "<main>", "</main>", "<table>",
    "</table>", "<tr>", "<td>", "</td>", "<a href='x'>", "</a>", "<script>",
    "</script>", "<nav>", "</nav>", "<br>", "<li>", "</li>", "<h1>", "</h1>",
    "<pre>", "</pre>", "<!-- c -->", "<span>", "</span>", "<b>", "</b>",
]

html_fragments = st.lists(
    st.one_of(
        st.sampled_from(TAGS),
        st.text(max_size=30),
        st.just("&amp;"), st.just("&nbsp;"), st.just("\n"), st.just("  "),
    ),
    max_size=30,
).map("".join)

pdf_lines = st.lists(
    st.one_of(
        st.builds(
            lambda x, y, s, f, c: f"{x},{y},{s},{f}|{c}",
            st.floats(-100, 1000, allow_nan=False).map(lambda v: round(v, 1)),
            st.floats(-100, 5000, allow_nan=False).map(lambda v: round(v, 1)),
            st.floats(0, 40, allow_nan=False).map(lambda v: round(v, 1)),
            st.sampled_from(["Serif", "Serif-Bold", "Mono", ""]),
            st.text(alphabet=st.characters(blacklist_characters="\n"), max_size=40),
        ),
        st.text(max_size=40).filter(lambda s: "\n" not in s),
    ),
    max_size=12,
).map("\n".join)

payloads = st.one_of(html_fragments, pdf_lines, st.text(max_size=300))


def _norm(g):
    return (
        g["clean_text"],
        [(d["start"], d["end"], d["label"]) for d in g["spans"]],
        g["n_nodes"], g["n_spans"], g["n_bytes"], g["kind"],
        [(d["text"], d["x0"], d["y0"], d["x1"], d["y1"]) for d in g["words"]],
        g["tables"],
    )


@settings(max_examples=300, deadline=None)
@given(st.lists(payloads, min_size=1, max_size=8))
def test_golden_equals_vectorized_property(texts):
    res = vectorized.extract_batch(texts)
    for i, t in enumerate(texts):
        g = _norm(golden.extract_turn(t))
        v = (
            res["clean_text"][i],
            [(s, e, l) for s, e, l in res["spans"][i]],
            res["n_nodes"][i], res["n_spans"][i], res["n_bytes"][i],
            res["kind"][i],
            [tuple(w) for w in res["words"][i]],
            res["tables"][i],
        )
        assert g == v, (repr(t[:120]), g[:2], v[:2])
        # span invariant: end-exclusive, in-bounds
        for s, e, _ in v[1]:
            assert 0 <= s <= e <= len(v[0])


# --------------------------------------------------- PDF wire-format round trip

_pdf_words = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1,
            max_size=10),
    min_size=1, max_size=8,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_pdf_words, min_size=1, max_size=6),
       st.booleans(), st.integers(0, 2))
def test_pdf_bytes_round_trip_property(lines, compress, kern_mode):
    """Property: arbitrary word lines → genuine %PDF- bytes (flate or raw,
    Tj or TJ-with-kerning) → wire-format parse → every word survives in
    order with the word gaps the geometry implies. Guards the tokenizer,
    stream delimiting and width-table cursor against whole families of
    generator quirks, not just the handcrafted fixtures."""
    import zlib as _z

    from deepseek_ocr_vllm_spark.extraction import golden as _g
    from deepseek_ocr_vllm_spark.extraction.pdfbytes import (
        pdf_bytes_to_layout_records)

    def obj(n, body):
        return f"{n} 0 obj\n".encode() + body + b"\nendobj\n"

    ops = [b"BT", b"/F1 10 Tf 72 720 Td"]
    for words in lines:
        if kern_mode == 0:
            ops.append(("(" + " ".join(words) + ") Tj T*").encode())
        elif kern_mode == 1:  # one Tj per word, explicit kern gaps
            parts = " ".join(f"({w}) -400" for w in words)
            ops.append(f"[{parts}] TJ T*".encode())
        else:  # hex strings
            hx = " ".join(words).encode().hex()
            ops.append(f"<{hx}> Tj T*".encode())
    ops.append(b"ET")
    stream = b"\n".join(ops)
    filt = b""
    if compress:
        stream, filt = _z.compress(stream), b" /Filter /FlateDecode"
    pdf = (
        b"%PDF-1.4\n"
        + obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + obj(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
        + obj(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                  b" /Contents 30 0 R /Resources << /Font <<"
                  b" /F1 50 0 R >> >> >>")
        + obj(30, b"<< /Length " + str(len(stream)).encode() + filt
                  + b" >>\nstream\n" + stream + b"\nendstream")
        + obj(50, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                  b" /FirstChar 97 /Widths [500] /MissingWidth 500 >>")
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    recs = pdf_bytes_to_layout_records(pdf)
    out = _g.extract_turn(recs)["clean_text"]
    # every input word appears, in input order
    pos = 0
    for words in lines:
        for w in words:
            i = out.find(w, pos)
            assert i >= 0, (w, out)
            pos = i + len(w)
