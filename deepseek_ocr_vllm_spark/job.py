"""spark-submit entry point.

Usage (cluster):
  zip -r pkg.zip deepseek_ocr_vllm_spark
  spark-submit --py-files pkg.zip -m deepseek_ocr_vllm_spark.job \
      --input /data/transcripts --output /data/extracted --buckets 4096

Usage (local sandbox):
  python -m deepseek_ocr_vllm_spark.job --gen-turns 100000 \
      --output /tmp/extract_out --master 'local[32]'
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

from . import fixtures, pipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description="PySpark main-content extraction job")
    p.add_argument("--input", help="transcripts parquet path (conv_id, turn_idx, role, text, tool, ts)")
    p.add_argument("--gen-turns", type=int, default=0,
                   help="synthesize a deterministic transcripts table of ~N turns instead of --input")
    p.add_argument("--output", required=True)
    p.add_argument("--buckets", type=int, default=None,
                   help="bucket/task count; default auto-sizes from input "
                        "bytes (~256MB/bucket, floor = cores) and is pinned "
                        "in the output's _job_meta.json for resume safety")
    p.add_argument("--run-id", type=int, default=1)
    p.add_argument("--max-buckets", type=int, default=None,
                   help="process at most K pending buckets (wave draining / kill simulation)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    spark = get_spark(master=args.master)
    input_path = args.input
    if args.gen_turns:
        input_path = os.path.join(tempfile.gettempdir(),
                                  f"transcripts_{args.gen_turns}.parquet")
        if not os.path.exists(input_path):
            fixtures.write_transcripts_parquet(input_path, args.gen_turns)
    if not input_path:
        p.error("--input or --gen-turns required")

    summary = pipeline.run_extraction(
        spark, input_path, args.output,
        n_buckets=args.buckets, run_id=args.run_id, max_buckets=args.max_buckets,
    )
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
