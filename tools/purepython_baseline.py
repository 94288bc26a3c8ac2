"""Pure-Python multiprocessing baseline for the extraction kernel.

Measures aggregate turns/sec of ``extraction.vectorized.extract_batch`` at
several process counts with NO Spark — isolates the machine's memory-bus
scaling curve from the job's. Each worker pre-loads its own slice file,
all workers start extraction together on a barrier, and only the extract
phase is timed (aggregate = total rows / slowest worker).

Feeds the "Why N" table in BENCH/BASELINE.md (see tools/scaling_run.py):
the default PROCS sweep covers the published 1..32 curve, including the
local[1]→local[4] pair the scaling evidence rests on. Override with
SPARK_GRAFT_PP_PROCS=comma,separated,counts.

Usage: python tools/purepython_baseline.py [rows_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
PROCS = tuple(
    int(x) for x in
    os.environ.get("SPARK_GRAFT_PP_PROCS", "1,2,4,8,16,32").split(",")
)


def _worker(path: str, barrier, out) -> None:
    import pyarrow.parquet as pq

    from deepseek_ocr_vllm_spark.extraction import vectorized

    texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
    vectorized.extract_batch(texts[:2000])  # warm imports/memo
    barrier.wait()
    t0 = time.time()
    vectorized.extract_batch(texts)
    out.put((len(texts), time.time() - t0))


def main() -> None:
    total_rows = ROWS * max(PROCS)
    cache = os.path.join(
        tempfile.gettempdir(), f"bench_transcripts_{total_rows}.parquet")
    if not os.path.exists(cache):
        from deepseek_ocr_vllm_spark import fixtures

        fixtures.write_transcripts_parquet(cache, total_rows)

    import pyarrow.parquet as pq

    work = tempfile.mkdtemp(prefix="ppbase_")
    try:
        tbl = pq.read_table(cache, columns=["text"])
        # every worker processes the SAME rows: fixture conv lengths are
        # Zipf-skewed, so distinct slices are not comparable work units
        slice_path = os.path.join(work, "slice.parquet")
        pq.write_table(tbl.slice(0, ROWS), slice_path)
        del tbl

        ctx = mp.get_context("spawn")
        results = {}
        # round 0 is an unmeasured warm-up: page cache + spawn infra (the
        # first round otherwise reads ~20% slow regardless of proc count)
        for rnd, p in enumerate((2,) + PROCS):
            barrier = ctx.Barrier(p)
            out = ctx.Queue()
            procs = [
                ctx.Process(target=_worker, args=(slice_path, barrier, out))
                for i in range(p)
            ]
            for pr in procs:
                pr.start()
            got = [out.get() for _ in procs]
            for pr in procs:
                pr.join()
            rows = sum(r for r, _ in got)
            slowest = max(e for _, e in got)
            if rnd == 0:
                continue
            results[p] = {
                "rows": rows,
                "aggregate_rows_per_sec": round(rows / slowest, 1),
                "per_core": round(rows / slowest / p, 1),
            }
            print(json.dumps({"procs": p, **results[p]}))
        effs = {}
        for lo, hi in zip(PROCS, PROCS[1:]):
            effs[f"efficiency_{lo}_to_{hi}"] = round(
                (results[hi]["aggregate_rows_per_sec"]
                 / results[lo]["aggregate_rows_per_sec"]) / (hi / lo), 2)
        print(json.dumps(effs))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
