"""S5: HTTP file download — the reference's registry-fetch step
(apps/csv-ingestion-worker/parser.go:193-227: download with a 100 MB
limit and a 2-minute timeout, then hand the bytes to the parser).

Spark-first framing: the download is a DRIVER-SIDE connector step — the
cluster-shaped work starts at the binaryFile scan over the landed
directory (sources/binary_docs.py, S1/S2). This module is deliberately
stdlib-only (urllib) and streams:

* the size limit is enforced WHILE streaming (a lying Content-Length
  cannot blow memory or disk);
* sha256 is computed on the same pass (the S11 content-address pattern,
  apps/ocr-service/src/ocr_service/storage.py:69-102) and the file lands
  under its content hash via an atomic rename — re-fetching the same
  bytes is idempotent (S12);
* transient failures retry with exponential backoff, total attempts
  bounded.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import time
import urllib.error
import urllib.request

DEFAULT_MAX_BYTES = 100 * 2**20  # parser.go:199 — 100 MB cap
DEFAULT_TIMEOUT = 120            # parser.go:196 — 2 min
_CHUNK = 1 << 16


class FetchTooLarge(RuntimeError):
    """Body exceeded max_bytes (detected mid-stream, not trusted from
    Content-Length)."""


class FetchDeadline(RuntimeError):
    """Total download time exceeded ``timeout`` — the reference enforces
    a TOTAL 2-minute budget (parser.go:196), not a per-read socket
    timeout; a slow-loris server trickling bytes must not hold the
    connector past it (review r5)."""


def fetch_url(
    url: str,
    dest_dir: str,
    max_bytes: int = DEFAULT_MAX_BYTES,
    timeout: float = DEFAULT_TIMEOUT,
    retries: int = 3,
    backoff: float = 0.5,
    suffix: str = "",
) -> dict:
    """Download one URL to ``dest_dir/<sha256[:32]><suffix>`` and return
    ``{"url", "path", "sha256", "bytes", "attempts"}``. Retries
    TRANSIENT failures (connection errors, timeouts, HTTP 5xx/429) with
    exponential backoff; permanent client errors (other 4xx) and a
    too-large body abort immediately — retrying cannot fix either
    (review r5). ``timeout`` is the TOTAL per-attempt download budget,
    matching the reference's 2-minute cap (parser.go:196)."""
    os.makedirs(dest_dir, exist_ok=True)
    last: Exception | None = None
    for attempt in range(1, retries + 1):
        try:
            return _fetch_once(url, dest_dir, max_bytes, timeout, suffix,
                               attempt)
        except FetchTooLarge:
            raise
        except urllib.error.HTTPError as e:
            if e.code not in (429,) and 400 <= e.code < 500:
                raise  # permanent client error — no retry
            last = e
            if attempt < retries:
                time.sleep(backoff * (2 ** (attempt - 1)))
        except (urllib.error.URLError, ConnectionError, TimeoutError,
                FetchDeadline, OSError) as e:
            last = e
            if attempt < retries:
                time.sleep(backoff * (2 ** (attempt - 1)))
    raise RuntimeError(
        f"fetch failed after {retries} attempts: {url}") from last


def _fetch_once(url: str, dest_dir: str, max_bytes: int, timeout: float,
                suffix: str, attempt: int) -> dict:
    h = hashlib.sha256()
    n = 0
    deadline = time.monotonic() + timeout
    fd, tmp = tempfile.mkstemp(dir=dest_dir, prefix=".fetch_")
    try:
        # the urlopen timeout bounds each SOCKET operation; the deadline
        # check below bounds the WHOLE body read. read1 (not read):
        # BufferedReader.read(n) BLOCKS until n bytes accumulate, so a
        # server trickling bytes would keep control away from the
        # deadline check for the whole buffer fill; read1 returns as
        # soon as any data is available.
        with os.fdopen(fd, "wb") as out, urllib.request.urlopen(
                url, timeout=min(timeout, 30)) as resp:
            read1 = getattr(resp, "read1", None)
            while True:
                if time.monotonic() > deadline:
                    raise FetchDeadline(
                        f"{url}: download exceeded {timeout}s total")
                chunk = read1(_CHUNK) if read1 else resp.read(_CHUNK)
                if not chunk:
                    break
                n += len(chunk)
                if n > max_bytes:
                    raise FetchTooLarge(
                        f"{url}: body exceeds {max_bytes} bytes")
                h.update(chunk)
                out.write(chunk)
        digest = h.hexdigest()
        final = os.path.join(dest_dir, digest[:32] + suffix)
        os.replace(tmp, final)  # atomic; idempotent for identical bytes
        return {"url": url, "path": final, "sha256": digest, "bytes": n,
                "attempts": attempt}
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def fetch_all(urls: list[str], dest_dir: str, **kw) -> list[dict]:
    """Sequential driver-side fetch of a URL list (the reference worker
    processes its queue one message at a time, parser.go:193). Failed
    URLs are reported, not raised — one bad URL must not sink the batch
    (the per-file degradation rule every ingest here follows)."""
    out = []
    for u in urls:
        try:
            out.append(fetch_url(u, dest_dir, **kw))
        except Exception as e:  # noqa: BLE001 — reported per URL
            out.append({"url": u, "path": None, "error": str(e)})
    return out
