"""Extra benchmarks for the optimization rounds (guide §1.4: noop-sink
isolation; bench.py itself is FROZEN for driver measurement).

Times named operators/queries with `df.write.format("noop")` so the
computation is measured, not the sink, labels each job
(setJobDescription), and prints one JSON line:

  {"sf_dir": ..., "cpus": N, "times": {"name": [s1, s2, ...]}}

Usage:
  python bench_extra.py [--reps 2] [names...]

Default names: the headline queries plus the full-scale families.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FULL_KNOBS = {
    "SPARK_GRAFT_MINHASH_PERMS": "128",
    "SPARK_GRAFT_MINHASH_ROWS_PER_BAND": "8",
    "SPARK_GRAFT_SIMHASH_BAND_POP": "500",
}

HEADLINE = [
    "q1_pricing_summary", "j1_inner_equi_join", "j6_broadcast_dim_join",
    "j10_disjunctive_identity_lookup", "w5_confidence_ranked_best",
    "j5_reconciliation_diff", "dd_minhash_lsh", "dd_embed_cosine",
    "dd_simhash", "sim_ivf_topk", "t5_fuzzy_trigram_search", "tx_quality",
    "mm_media_features", "stream_window_counts",
]
FULL = ["dd_minhash_full", "dd_simhash_full", "dd_embed_cosine_full",
        "t5_fuzzy_full", "embed_unlabeled_pairs_full"]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def builders(spark, sf_dir):
    from deepseek_ocr_vllm_spark.plans import REGISTRY
    from deepseek_ocr_vllm_spark.plans.queries_ml import (
        dd_embed_cosine_full, dd_minhash_full, dd_simhash_full,
        embed_pairs_unlabeled)
    from deepseek_ocr_vllm_spark.plans.queries_text import t5_fuzzy_full

    out = {}
    for name in HEADLINE:
        # headline queries run at DEFAULT knobs, exactly like bench.py's
        # bench_queries (bench.py only sets FULL_KNOBS inside the
        # full-scale sections and restores them after)
        fn, _sql = REGISTRY[name]
        out[name] = (lambda fn=fn: noop(fn(spark, sf_dir)))

    def with_knobs(f):
        saved = {k: os.environ.get(k) for k in FULL_KNOBS}
        os.environ.update(FULL_KNOBS)
        try:
            f()
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def run_pair(builder):
        result, _cand = builder(spark, sf_dir)
        noop(result)

    out["dd_minhash_full"] = lambda: with_knobs(
        lambda: run_pair(dd_minhash_full))
    out["dd_simhash_full"] = lambda: with_knobs(
        lambda: run_pair(dd_simhash_full))
    out["dd_embed_cosine_full"] = lambda: with_knobs(
        lambda: run_pair(dd_embed_cosine_full))
    out["t5_fuzzy_full"] = lambda: with_knobs(lambda: run_pair(t5_fuzzy_full))

    def run_unlabeled():
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select("vec_id", "embedding"))
        noop(embed_pairs_unlabeled(emb, k=16, n_iter=3).distinct())

    out["embed_unlabeled_pairs_full"] = lambda: with_knobs(run_unlabeled)
    return out


def _encode_png_rgb_filtered(w: int, h: int, pix, ftype: int) -> bytes:
    """RGB8 PNG encoder applying ONE filter type to every scanline
    (vectorized filtering — the predictor uses only RECONSTRUCTED bytes,
    which at encode time are the known source pixels) + stdlib deflate."""
    import struct
    import zlib

    import numpy as np

    from deepseek_ocr_vllm_spark.operators.multimodal import PNG_SIG

    bpp = 3
    flat = pix.reshape(h, w * bpp).astype(np.int32)
    prev = np.zeros((h, w * bpp), np.int32)
    prev[1:] = flat[:-1]
    a = np.zeros_like(flat)
    a[:, bpp:] = flat[:, :-bpp]
    c = np.zeros_like(flat)
    c[:, bpp:] = prev[:, :-bpp]
    if ftype == 0:
        pred = np.zeros_like(flat)
    elif ftype == 1:
        pred = a
    elif ftype == 2:
        pred = prev
    elif ftype == 3:
        pred = (a + prev) >> 1
    else:
        p = a + prev - c
        pa, pb, pc = abs(p - a), abs(p - prev), abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a,
                        np.where(pb <= pc, prev, c))
    filt = ((flat - pred) & 255).astype(np.uint8)
    raws = b"".join(bytes([ftype]) + filt[r].tobytes() for r in range(h))

    def chunk(cb):
        return (struct.pack(">I", len(cb) - 4) + cb
                + struct.pack(">I", zlib.crc32(cb)))

    ihdr = b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIG + chunk(ihdr) + chunk(b"IDAT" + zlib.compress(raws))
            + chunk(b"IEND"))


def bench_png_filters(spark) -> dict:
    """VERDICT r5 #1 evidence: MB/s of the full decode path per PNG FILTER
    class. The fixture corpus emits filter-0 stored-block PNGs; real
    encoders emit mostly sub/paeth rows, so this bench feeds ~256 KB
    RGB8 PNGs deflate-compressed with each filter type through
    extract_media_features (bench.py's mm_media_scale is frozen, so the
    filter classes live here). r6 decode: filter 0/2 numpy, 1 per-lane
    cumsum, 3/4 bytes-level recurrence."""
    import hashlib
    import inspect
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepseek_ocr_vllm_spark.operators import multimodal

    w, h, count = 320, 270, 24  # ~259 KB of pixel data per image
    tag = hashlib.sha256(
        (inspect.getsource(multimodal)
         + inspect.getsource(_encode_png_rgb_filtered)
         + f"{w}x{h}x{count}").encode()).hexdigest()[:8]
    cache = os.path.join(tempfile.gettempdir(), f"bench_pngfilters_{tag}")
    done = os.path.join(cache, ".complete")
    if not os.path.exists(done):
        shutil.rmtree(cache, ignore_errors=True)
        rng = np.random.RandomState(20260821)
        for ftype in range(5):
            rows = {"doc_id": [], "payload": [], "meta": []}
            for i in range(count):
                # mix of smooth gradient + noise: realistic filter gains,
                # non-trivial deflate
                base = np.add.outer(np.arange(h) * 2,
                                    np.arange(w * 3)).astype(np.int64)
                pix = ((base % 256) + rng.randint(0, 32,
                                                  size=(h, w * 3))) % 256
                png = _encode_png_rgb_filtered(
                    w, h, pix.astype(np.uint8), ftype)
                rows["doc_id"].append(ftype * count + i)
                rows["payload"].append(png)
                rows["meta"].append({
                    "content_type": "image/png",
                    "size_bytes": len(png),
                    "sha16": hashlib.sha256(png).hexdigest()[:16],
                })
            sub = os.path.join(cache, f"filter_{ftype}")
            os.makedirs(sub, exist_ok=True)
            schema = pa.schema([
                pa.field("doc_id", pa.int64()),
                pa.field("payload", pa.binary()),
                pa.field("meta", pa.struct([
                    pa.field("content_type", pa.string()),
                    pa.field("size_bytes", pa.int64()),
                    pa.field("sha16", pa.string()),
                ])),
            ])
            pq.write_table(pa.Table.from_pydict(rows, schema=schema),
                           os.path.join(sub, "media.parquet"))
        open(done, "w").close()

    from deepseek_ocr_vllm_spark.operators.multimodal import (
        extract_media_features)

    out = {}
    mb = w * h * 3 * count / (1024 * 1024)
    for ftype in range(5):
        src = spark.read.parquet(os.path.join(cache, f"filter_{ftype}"))
        best = None
        for _ in range(2):
            t0 = time.time()
            df = extract_media_features(src)
            # mean luma must be non-null for every row: decode ENGAGED
            n_ok = df.filter("content_mean is not null").count()
            el = time.time() - t0
            best = el if best is None or el < best else best
            assert n_ok == count, (ftype, n_ok)
        out[f"filter_{ftype}"] = {
            "sec": round(best, 3), "rows": count,
            "pixel_mb": round(mb, 1),
            "mb_per_sec": round(mb / best, 1),
        }
    return out


def calibration_sec(n_turns: int = 10_000) -> float:
    """Window-drift calibration kernel (VERDICT r5 #5, adapted —
    bench.py is frozen so the field lives here): one single-process
    pure-Python extract over a pinned deterministic slice. Timing-only
    code; its value divided between two measurement windows estimates
    the host drift factor so cross-window bench numbers can be
    normalized post hoc."""
    from deepseek_ocr_vllm_spark import fixtures
    from deepseek_ocr_vllm_spark.extraction import vectorized

    texts = list(fixtures.gen_transcripts(n_turns)["text"])
    vectorized.extract_batch(texts[:1000])  # warm imports/memo, untimed
    t0 = time.time()
    vectorized.extract_batch(texts)
    return round(time.time() - t0, 3)


def main():
    args = sys.argv[1:]
    if args and args[0] == "calibration":
        print(json.dumps({"calibration_sec": calibration_sec()}))
        return
    reps = 2
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from deepseek_ocr_vllm_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()
    b = builders(spark, sf_dir)
    b["png_filter_scale"] = None  # handled specially below
    names = args or (HEADLINE + FULL)
    if "png_filter_scale" in names:
        names = [n for n in names if n != "png_filter_scale"]
        print(json.dumps({"png_filter_scale": bench_png_filters(spark)}))
        if not names:
            return
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            b[name]()
            el = round(time.time() - t0, 3)
            times[name].append(el)
            print(f"## {name}: {el}s", file=sys.stderr, flush=True)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "reps": reps,
                      "times": times}))


if __name__ == "__main__":
    main()
