"""X7/X8 span extraction, X9 annotation normalize, P5 guardrails,
S1 binary scan + S8 manifest sink."""

from __future__ import annotations

import json

import pytest

from deepseek_ocr_vllm_spark.operators.ner import (
    CHUNK_SIZE, extract_spans, extract_spans_text)

SF = "/root/testdata/sf0.001"


def test_span_roundtrip_contract():
    text = "the vessel IMO 9074729 sailed in 2019 costing 5000 USD near spark"
    rows = extract_spans_text(7, text)
    assert rows, "expected spans"
    labels = {r[2] for r in rows}
    assert {"IMO", "YEAR", "MONEY", "TERM"} <= labels
    for doc_id, span_id, label, start, end, t, conf, model in rows:
        assert doc_id == 7
        assert text[start:end] == t  # end exclusive, round-trips
        assert 0 < conf <= 1.0
    # W3 ordering: spans sorted by start_char within doc
    starts = [r[3] for r in rows]
    assert starts == sorted(starts)


def test_chunk_offset_remap():
    """X8: a match far past the first chunk boundary must carry
    document-space offsets."""
    filler = "x " * (CHUNK_SIZE // 2)  # no matches inside
    text = filler + "IMO 1234567" + " y" * 50
    rows = [r for r in extract_spans_text(1, text) if r[2] == "IMO"]
    assert len(rows) == 1
    _, _, _, start, end, t, _, _ = rows[0]
    assert start > CHUNK_SIZE // 2
    assert text[start:end] == t == "IMO 1234567"


def test_chunk_boundary_no_artifacts():
    """A \\b manufactured by the chunk cut must not mint spans: an 8-digit
    run straddling the cut is NOT a YEAR, and the chunked scan must equal a
    single full-text scan for every pattern."""
    import re

    from deepseek_ocr_vllm_spark.operators.ner import PATTERNS

    # place "20249999" so the first cut (CHUNK_SIZE) lands mid-run: the
    # truncated head "2024" would match YEAR under the old behavior
    head = "a " * ((CHUNK_SIZE - 4) // 2)
    text = (head + "20249999 then 1999 and IMO 7654321 near the cut "
            + "b " * CHUNK_SIZE)
    assert len(text) > CHUNK_SIZE  # really chunks
    rows = extract_spans_text(3, text)
    for _, _, label, start, end, t, _, _ in rows:
        assert text[start:end] == t
        assert (t, label) != ("2024", "YEAR"), "cut-artifact span survived"
    # chunked == one whole-text pass, per pattern
    expect = set()
    for label, pat, _c in PATTERNS:
        for m in pat.finditer(text):
            expect.add((m.start(), m.end(), label))
    got = {(r[3], r[4], r[2]) for r in rows}
    assert got == expect


def test_extract_spans_spark(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    spans = extract_spans(df)
    rows = spans.collect()
    assert len(rows) > 0
    texts = {r.doc_id: r.text for r in df.collect()}
    for r in rows[:50]:
        assert texts[r.doc_id][r.start:r.end] == r.text


def test_normalize_annotations(spark):
    from deepseek_ocr_vllm_spark.operators.ner import normalize_annotations

    rec = json.dumps(
        {
            "text": "hello vessel world",
            "annotations": [
                {"start": 6, "end": 12, "labels": ["TERM"]},
                {"start": None, "end": 5, "labels": ["BAD"]},
            ],
        }
    )
    df = spark.createDataFrame([(rec,)], ["j"])
    out = normalize_annotations(df, "j").collect()[0]
    assert out.text == "hello vessel world"
    assert [(s.start, s.end, s.label) for s in out.spans] == [(6, 12, "TERM")]


def test_guardrails(spark):
    from deepseek_ocr_vllm_spark.plans.guardrails import (
        GuardrailError, check_sql, guarded_sql)

    with pytest.raises(GuardrailError):
        check_sql("DROP TABLE x")
    with pytest.raises(GuardrailError):
        check_sql("update t set a=1")
    check_sql("SELECT 1")
    check_sql("WITH t AS (SELECT 1) SELECT * FROM t")

    spark.range(50_000).createOrReplaceTempView("big")
    got = guarded_sql(spark, "SELECT * FROM big").collect()
    assert len(got) == 10_000  # auto-LIMIT injected
    got2 = guarded_sql(spark, "SELECT * FROM big LIMIT 5").collect()
    assert len(got2) == 5  # explicit limit respected


def test_binary_scan_feeds_extractor(spark, tmp_path):
    """S1 → X1: files from the binaryFile scan run through the SAME
    extraction operator as transcript turns, producing identical results
    to the golden extractor on the decoded payload."""
    from deepseek_ocr_vllm_spark.extraction import golden
    from deepseek_ocr_vllm_spark.sources.binary_docs import extract_binary_docs

    d = tmp_path / "bin"
    d.mkdir()
    pdfish = "72,40,20,Serif-Bold|Doc Title\n72,100,10,Serif|a | b | c\n72,111,10,Serif|d | e | f\n"
    htmlish = "<main><p>the real body of this little page here</p></main>"
    (d / "x.pdf").write_text(pdfish)
    (d / "y.pdf").write_text(htmlish)
    rows = {r.path.rsplit("/", 1)[-1]: r
            for r in extract_binary_docs(spark, str(d)).collect()}
    for fname, payload in [("x.pdf", pdfish), ("y.pdf", htmlish)]:
        g = golden.extract_turn(payload)
        r = rows[fname]
        assert r.clean_text == g["clean_text"]
        assert r.kind == g["kind"]
        assert [[list(row) for row in t] for t in r.tables] == g["tables"]
        assert len(r.words) == len(g["words"])


def test_binary_scan_and_manifest(spark, tmp_path):
    from deepseek_ocr_vllm_spark.sources.binary_docs import (
        read_binary_docs, write_manifest_jsonl)
    import pyspark.sql.functions as F

    d = tmp_path / "docs" / "nested"
    d.mkdir(parents=True)
    (d / "a.pdf").write_bytes(b"%PDF-1.4 fake content aaaa")
    (d / "b.pdf").write_bytes(b"%PDF-1.4 fake bbbb")
    (d / "skip.txt").write_text("not a pdf")

    df = read_binary_docs(spark, str(tmp_path / "docs"))
    rows = df.collect()
    assert len(rows) == 2  # glob filtered, recursive
    assert all(len(r.doc_sha256) == 64 for r in rows)

    m_in = df.select(
        "path",
        F.length("content").cast("long").alias("total_chars"),
        F.lit(1).alias("n_pages"),
    )
    out = str(tmp_path / "manifest")
    write_manifest_jsonl(m_in, out, min_chars=20, min_pages=1)
    man = [json.loads(line) for f in (tmp_path / "manifest").glob("*.json")
           for line in f.read_text().splitlines()]
    assert len(man) == 2
    assert sum(1 for m in man if m["failed"]) == 1  # b.pdf under 20 bytes


def test_money_bounded_across_chunk_cut():
    """ADVICE: MONEY's repetition is bounded so every genuine match is
    shorter than CHUNK_OVERLAP — a max-length money straddling the first
    chunk cut must be re-found intact via the overlap scan, not dropped
    in both adjacent chunks."""
    money = "12345678901234567890.1234567890 USD"  # 35 chars = max match
    head = "a " * ((CHUNK_SIZE - 10) // 2)  # cut lands 10 chars into money
    text = head + money + " tail"
    assert len(head) < CHUNK_SIZE < len(head) + len(money)
    rows = [r for r in extract_spans_text(9, text) if r[2] == "MONEY"]
    assert [r[5] for r in rows] == [money]
    start = rows[0][3]
    assert text[start:start + len(money)] == money


def test_money_overlong_digit_run_never_matches():
    """A digit run longer than the bound has no \\b inside it, so neither
    a full nor a partial MONEY match exists — identical semantics to the
    RE2 oracle that runs the same pattern."""
    text = "pay " + "9" * 25 + " USD now, but 42 EUR is fine"
    got = [r[5] for r in extract_spans_text(1, text) if r[2] == "MONEY"]
    assert got == ["42 EUR"]


def test_x7_label_counts_match_duckdb(spark):
    """The x7_ner_label_counts derivative view (de-registered in r5 to keep
    REGISTRY at the driver's 50-entry window, VERDICT r4 #6): per-(doc,
    label) counts from the REAL chunked extractor must equal whole-text RE2
    counts in DuckDB — same comparison tools/check_oracle.py ran when this
    was the overflow registry slot, now pinned here instead."""
    import duckdb

    from tools.check_oracle import canon_rows
    from deepseek_ocr_vllm_spark.plans.queries_text import (
        _x7_counts_oracle, x7_ner_label_counts)

    sdf = x7_ner_label_counts(spark, SF)
    s_cols, s_rows = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    cur = con.execute(_x7_counts_oracle())
    d_cols = [d[0] for d in cur.description]
    d_cols, d_rows = canon_rows(d_cols, cur.fetchall())
    assert s_cols == d_cols
    assert len(s_rows) > 0
    assert s_rows == d_rows
