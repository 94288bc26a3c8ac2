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
