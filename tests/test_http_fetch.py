"""S5 HTTP download against a REAL localhost HTTP server (stdlib
http.server in a thread — no external network): success + content-hash
landing, mid-stream size-limit abort on a lying Content-Length, retry
with backoff over transient 500s, per-URL degradation in fetch_all, and
the landed directory feeding the S1 binaryFile scan end-to-end."""

from __future__ import annotations

import http.server
import threading

import pytest

from deepseek_ocr_vllm_spark.sources.http_fetch import (
    FetchTooLarge, fetch_all, fetch_url)

PAYLOAD = b"%PDF-like bytes for the fetch test " * 100
FLAKY_FAILS = 2


class _Handler(http.server.BaseHTTPRequestHandler):
    flaky_count = 0
    gone_hits = 0
    pdf_bytes = b""  # set by the e2e test before requesting /d.pdf

    def do_GET(self):  # noqa: N802 — http.server API
        if self.path == "/d.pdf":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(type(self).pdf_bytes)
        elif self.path == "/gone":
            type(self).gone_hits += 1
            self.send_error(404)
        elif self.path == "/slow-loris":
            # trickles bytes forever — only a TOTAL deadline stops it
            self.send_response(200)
            self.end_headers()
            import time as _time

            try:
                while True:
                    self.wfile.write(b"x")
                    self.wfile.flush()
                    _time.sleep(0.05)
            except (BrokenPipeError, ConnectionResetError):
                pass
        elif self.path == "/doc.bin":
            self.send_response(200)
            self.send_header("Content-Length", str(len(PAYLOAD)))
            self.end_headers()
            self.wfile.write(PAYLOAD)
        elif self.path == "/lying-length":
            # declares 10 bytes, streams far more — the cap must trip
            # from the ACTUAL stream, not the header
            self.send_response(200)
            self.send_header("Content-Length", str(64 * 1024))
            self.end_headers()
            self.wfile.write(b"x" * 64 * 1024)
        elif self.path == "/flaky":
            cls = type(self)
            cls.flaky_count += 1
            if cls.flaky_count <= FLAKY_FAILS:
                self.send_error(503)
            else:
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"finally ok")
        else:
            self.send_error(404)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_lands_under_content_hash(http_base, tmp_path):
    import hashlib

    r = fetch_url(f"{http_base}/doc.bin", str(tmp_path), suffix=".bin")
    assert r["bytes"] == len(PAYLOAD)
    assert r["sha256"] == hashlib.sha256(PAYLOAD).hexdigest()
    assert open(r["path"], "rb").read() == PAYLOAD
    assert r["path"].endswith(".bin")
    # idempotent: same bytes → same content-hash path, no duplicate files
    r2 = fetch_url(f"{http_base}/doc.bin", str(tmp_path), suffix=".bin")
    assert r2["path"] == r["path"]
    assert len(list(tmp_path.iterdir())) == 1


def test_size_limit_trips_mid_stream(http_base, tmp_path):
    with pytest.raises(FetchTooLarge):
        fetch_url(f"{http_base}/lying-length", str(tmp_path),
                  max_bytes=1024)
    # no partial temp files left behind
    assert list(tmp_path.iterdir()) == []


def test_transient_errors_retry_then_succeed(http_base, tmp_path):
    _Handler.flaky_count = 0
    r = fetch_url(f"{http_base}/flaky", str(tmp_path),
                  retries=FLAKY_FAILS + 1, backoff=0.01)
    assert r["attempts"] == FLAKY_FAILS + 1
    assert open(r["path"], "rb").read() == b"finally ok"


def test_fetch_all_degrades_per_url(http_base, tmp_path):
    _Handler.flaky_count = 10**6  # keep /flaky healthy for this test
    rows = fetch_all(
        [f"{http_base}/doc.bin", f"{http_base}/missing",
         f"{http_base}/flaky"],
        str(tmp_path), retries=1)
    assert rows[0]["path"] and rows[2]["path"]
    assert rows[1]["path"] is None and "error" in rows[1]


def test_fetched_dir_feeds_binary_scan(http_base, tmp_path, spark):
    """S5 → S1 wiring: the landed directory is exactly what the
    binaryFile scan ingests (the reference's download→parse handoff,
    parser.go:227)."""
    fetch_url(f"{http_base}/doc.bin", str(tmp_path), suffix=".bin")
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.bin").load(str(tmp_path)))
    rows = df.select("path", "length").collect()
    assert len(rows) == 1 and rows[0].length == len(PAYLOAD)


def test_permanent_404_does_not_retry(http_base, tmp_path):
    """review r5: HTTP 4xx is permanent — burning retries x backoff on a
    dead URL stalls the whole batch. Exactly ONE request must hit the
    server."""
    import urllib.error

    _Handler.gone_hits = 0
    with pytest.raises(urllib.error.HTTPError):
        fetch_url(f"{http_base}/gone", str(tmp_path), retries=5,
                  backoff=0.5)
    assert _Handler.gone_hits == 1


def test_total_deadline_stops_slow_loris(http_base, tmp_path):
    """review r5: the reference enforces a TOTAL download budget
    (parser.go:196); a server trickling one byte per read must trip it —
    a per-socket-read timeout alone never would."""
    import time as _time

    t0 = _time.monotonic()
    with pytest.raises(RuntimeError):
        fetch_url(f"{http_base}/slow-loris", str(tmp_path), timeout=1.0,
                  retries=1)
    assert _time.monotonic() - t0 < 10
    assert list(tmp_path.iterdir()) == []


def test_fetch_then_extract_real_pdf_end_to_end(http_base, tmp_path, spark):
    """The full S5 → S1 → X1 chain: a REAL generated %PDF- binary served
    over localhost HTTP (the module's shared server — review r5: no
    second server lifecycle), streamed down by fetch_url, landed under
    its content hash, then extracted through the same wire-format parse +
    Arrow extractor the pipeline uses."""
    import random

    from deepseek_ocr_vllm_spark.fixtures import _pdf_binary
    from deepseek_ocr_vllm_spark.sources.binary_docs import (
        extract_binary_docs)

    _Handler.pdf_bytes = _pdf_binary(random.Random(7))
    r = fetch_url(f"{http_base}/d.pdf", str(tmp_path), suffix=".pdf")
    assert open(r["path"], "rb").read().startswith(b"%PDF-")
    rows = extract_binary_docs(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].doc_sha256 == r["sha256"]  # same content address
    assert len(rows[0].clean_text) > 50  # real text extracted
